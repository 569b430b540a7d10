"""Pipeline assembly: the end-to-end check run (reference's
POST /check_quality, SURVEY.md §3.2) and the reference-snapshot job
(scripts/init_baseline.py, §3.3)."""
