"""Parquet readers for the shared star-schema fixtures.

Mirrors the reference's JDBC table scans (S7,
/root/reference/R/_pull_data.R:144-145) but on parquet: the scan is lazy and
Catalyst pushes filters + column pruning down to the parquet reader, which
replaces every manual SELECT-column-list / WHERE-clause the reference embeds
in its dbGetQuery strings (S8, /root/reference/R/_analyze_data.R:325-330).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one fixture table under ``sf_dir``.

    ``events.ts`` has been written by different fixture generations as
    parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    outright) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark
    reads as TIMESTAMP_NTZ). Normalize both to a plain session-zone
    TimestampType so every consumer — batch, streaming, and the DuckDB
    oracles, which all treat the column as naive-UTC — sees one type.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The engine's timestamp semantics are naive-UTC end to end: fixture
    # stamps are naive-UTC wall clocks and the DuckDB oracles treat them the
    # same. Every session-zone-aware expression (the NTZ cast below,
    # date_trunc/window bucketing, formatted output) captures the zone at
    # ANALYSIS time, and the external driver imports this module under a
    # vanilla SparkSession whose zone is the JVM default — on a non-UTC host
    # every events.ts instant would shift by the zone offset. load_table is
    # the one choke point every query passes through before analysis, so pin
    # the runtime conf here (the driver contract: engine confs are set inside
    # load_table, not assumed from the session builder).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    try:
        df = spark.read.parquet(path)
    except Exception as exc:
        # Only the TIMESTAMP(NANOS) schema rejection gets the legacy-flag
        # retry; anything else (missing path, corrupt footer) re-raises as
        # itself instead of surfacing a confusing second error from the
        # fallback read
        if "NANOS" not in str(exc):
            raise
        # TIMESTAMP(NANOS) fixtures: re-read with the nanos-as-long escape
        # hatch. The flag is captured at relation creation (the returned
        # DataFrame keeps working after restore), so scope it to this read
        # instead of mutating the session: otherwise every later parquet
        # read would silently see TIMESTAMP(NANOS) columns as bigint.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # integer division: nanosecond epochs exceed 2^53, so a float
        # division here silently lands ±1 microsecond off
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        # wall-clock values carry over unchanged: load_table pinned the
        # session zone to UTC before this cast was analyzed, so the naive-UTC
        # fixture stamps become the matching UTC instants on any host JVM
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
