"""traffic_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query & data-processing capabilities of
the reference repo YaxuanSeanZhang/Traffic-Data-Pipeline (an R batch ETL +
modeling pipeline over MnDOT loop-detector data) as an idiomatic PySpark
DataFrame/SQL engine, extended with the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session    — SparkSession factory tuned for the workload
    schemas    — explicit StructTypes for every persisted table
    sources/   — parquet/star-schema readers, sensor-feed derivation, XML config
    operators/ — relational operators from SURVEY.md §2 (agg, impute, SCD-2,
                 roll-up, QAQC, comparison, calendar spine)
    functions/ — text analysis, dedup, similarity-search column functions
    ml/        — per-node seasonal model (applyInPandas; GAM stand-in)
    streaming/ — Structured Streaming wrappers over the same batch logic
    multimodal/— binary-column (image/audio) plumbing with stubbed decoders
    pipeline   — nightly orchestration runners (backfill/incremental gating)

Everything is built on pyspark.sql DataFrames — no RDD usage — so Catalyst
handles predicate/projection pushdown, join strategy, and AQE handles skew
at scale.
"""

__version__ = "0.1.0"
