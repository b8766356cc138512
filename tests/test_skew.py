"""Salted-join equivalence: identical rows to the plain join under heavy
key skew, for inner and left shapes including unmatched big-side keys."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key holding ~90% of the fact + a key with no dim match
    big = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit("hot"))
        .when(F.col("id") < 9_500, F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .otherwise(F.lit("orphan")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k1", 3), ("k2", 4), ("k5", 5)],
        "k string, dim_val int",
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain(skewed, how):
    big, small = skewed
    plain = big.join(small, ["k"], how)
    salted = salted_join(big, small, ["k"], how=how, salt=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_actually_spreads(skewed, spark):
    big, small = skewed
    from traffic_data_pipeline_spark.operators.skew import SALT_COL
    b = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).cast("int"),
    )
    spread = (b.filter(F.col("k") == "hot")
              .groupBy(SALT_COL).count().collect())
    assert len(spread) == 8  # the hot key occupies every salt bucket
    counts = [r["count"] for r in spread]
    assert max(counts) < 9_000 * 0.5  # no bucket holds the whole key


def test_unsupported_join_type_rejected(skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="full")
