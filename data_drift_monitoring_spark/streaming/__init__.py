from .curate import curate_batch, start_curation  # noqa: F401
from .monitor import (  # noqa: F401
    alerts_from_verdicts,
    alerts_to_messages,
    kafka_stream,
    parse_kafka_sequences,
    start_monitor,
    windowed_event_counts,
)
