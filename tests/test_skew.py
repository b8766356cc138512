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


def test_colliding_salt_column_and_overlap_guard(spark):
    # a pre-existing '_salt' column must not break the join
    big = spark.createDataFrame([("a", 1, 7), ("b", 2, 8)],
                                "k string, payload int, _salt int")
    small = spark.createDataFrame([("a", 10)], "k string, dim_val int")
    out = salted_join(big, small, ["k"], how="left", salt=4)
    assert sorted(out.columns) == ["_salt", "dim_val", "k", "payload"]
    assert out.count() == 2
    got = {r.k: (r._salt, r.dim_val) for r in out.collect()}
    assert got == {"a": (7, 10), "b": (8, None)}  # user's _salt untouched

    # overlapping non-key columns are rejected up front, not at join time
    small2 = spark.createDataFrame([("a", 1)], "k string, payload int")
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(big, small2, ["k"])


def test_salted_join_property_random_skew(spark):
    """Property-style sweep: randomized skewed inputs x {inner,left} give
    exactly the plain join's multiset of rows."""
    import random

    rnd = random.Random(7)
    for trial in range(4):
        n_keys = rnd.randint(1, 6)
        keys = [f"k{i}" for i in range(n_keys)]
        hot = rnd.choice(keys)
        big_rows = [(hot if rnd.random() < 0.8 else rnd.choice(keys),
                     rnd.randint(0, 5)) for _ in range(rnd.randint(1, 200))]
        dim_keys = rnd.sample(keys, rnd.randint(0, n_keys))
        small_rows = [(k, i) for i, k in enumerate(dim_keys)]
        big = spark.createDataFrame(big_rows, "k string, payload int")
        small = (spark.createDataFrame(small_rows, "k string, dim_val int")
                 if small_rows else
                 spark.createDataFrame([], "k string, dim_val int"))
        for how in ("inner", "left"):
            plain = big.join(small, ["k"], how)
            salted = salted_join(big, small, ["k"], how=how,
                                 salt=rnd.choice([2, 5, 16]))
            assert salted.exceptAll(plain).count() == 0, (trial, how)
            assert plain.exceptAll(salted).count() == 0, (trial, how)
