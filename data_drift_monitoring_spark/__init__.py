"""data_drift_monitoring_spark — a PySpark-native schema/constraint validation
and distribution-drift engine.

A from-scratch, idiomatic-Spark re-expression of the capabilities of the
reference repo ``Abhay030405/data-drift-monitoring`` ("Neural Watch",
FastAPI + pandas, single node): quality checks (missing values, duplicates,
outliers, schema validation), drift detection (PSI / KS / chi-square /
Jensen-Shannon), weighted quality scoring and versioned baselines — rebuilt
as distributed DataFrame pipelines that run per-partition over Iceberg-style
tables of pre-tokenized training sequences.

Design rules (see SURVEY.md):
- Declarative DataFrame plans; Catalyst picks the physical strategy.
- One wide aggregation pass instead of the reference's 4+ sequential scans.
- Broadcast joins for dimensions and reference histograms.
- Arrow-vectorized pandas UDFs only where built-ins cannot express the
  semantics (per-row token-array equality); never per-row Python.
- Salted two-level aggregation for skewed keys.
- Resumable per-partition manifests with lineage.
"""

__version__ = "0.1.0"
