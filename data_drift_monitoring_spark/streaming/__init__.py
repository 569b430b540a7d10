from .monitor import start_monitor, windowed_event_counts  # noqa: F401
