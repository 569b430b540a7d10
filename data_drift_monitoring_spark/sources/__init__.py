"""Sources/sinks: table IO with snapshot versioning, and the resumable
per-partition manifest (SURVEY.md §2.1 S1-S9)."""
