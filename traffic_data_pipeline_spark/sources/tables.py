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

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as nanos-since-epoch longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert to a
    microsecond TimestampType here, so every consumer sees a plain
    timestamp column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # The flag is captured at relation creation (the returned DataFrame
        # keeps working after restore), so scope it to this read instead of
        # mutating the session: otherwise every later parquet read would
        # silently see TIMESTAMP(NANOS) columns as bigint. Not safe against
        # concurrent reads in other driver threads during this call.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        from pyspark.sql import functions as F

        # integer division: nanosecond epochs exceed 2^53, so a float
        # division here silently lands ±1 microsecond off
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
