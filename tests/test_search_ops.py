"""Search & linkage operators: blocking recall and ranking structure.

The DuckDB oracle test already pins fixture-data parity; these tests pin
the *algorithmic* guarantees on adversarial inputs the fixtures don't
contain (very short names, where q-gram blocking would lose recall).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.plans.search_ops import (
    _deletion_keys,
    q_doc_bm25_search,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# deliberately adversarial for gram-based blocking: ≤3-char strings,
# transposed pairs, shared-prefix families, and a couple of far-apart names
_NAMES = [
    "ab", "ba", "abc", "axc", "bc", "a", "x",
    "red bolt", "old bolt", "red bolts", "blue bolt",
    "small gizmo", "small gizmos", "large widget",
]


def test_symmetric_delete_blocking_is_recall_complete(spark):
    df = spark.createDataFrame([(n,) for n in _NAMES], ["name"])
    keyed = df.select("name", F.explode(_deletion_keys(F.col("name"))).alias("k"))
    a = keyed.select(F.col("name").alias("name_a"), "k")
    b = keyed.select(F.col("name").alias("name_b"), "k")
    got = {
        (r.name_a, r.name_b)
        for r in (
            a.join(b, "k")
            .filter(F.col("name_a") < F.col("name_b"))
            .distinct()
            .withColumn("d", F.levenshtein("name_a", "name_b"))
            .filter(F.col("d") <= 2)
            .collect()
        )
    }
    want = {
        tuple(sorted((x, y)))
        for i, x in enumerate(_NAMES)
        for y in _NAMES[i + 1:]
        if _lev(x, y) <= 2
    }
    assert got == want


def test_spark_levenshtein_matches_reference_dp(spark):
    rows = spark.createDataFrame(
        [(x, y) for x in _NAMES for y in _NAMES], ["a", "b"]
    ).withColumn("d", F.levenshtein("a", "b")).collect()
    for r in rows:
        assert r.d == _lev(r.a, r.b), (r.a, r.b)


def test_bm25_ranking_structure(spark):
    out = q_doc_bm25_search(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(out) <= 20
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)
    # every returned doc matched at least one query term
    assert all(r.tf_spark + r.tf_join + r.tf_vector + r.tf_stream > 0
               for r in out)


def test_sketch_profile_tracks_exact_answers(spark):
    """Since the round-5 oracle conversion the query emits exact values
    plus sketch witnesses; this test independently recomputes the exact
    answers in DuckDB and asserts the witnesses hold (the in-plan 5%
    bound is the same contract, now hash-gated too)."""
    import duckdb

    from traffic_data_pipeline_spark.plans.search_ops import (
        q_doc_sketch_profile,
    )

    sf = "/root/testdata/sf0.01"
    got = {r.source: r for r in q_doc_sketch_profile(spark, sf).collect()}
    exact = duckdb.sql(f"""
        WITH toks AS (
          SELECT source, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
          FROM read_parquet('{sf}/documents.parquet'))
        SELECT source, COUNT(DISTINCT t) AS d
        FROM toks WHERE t <> '' GROUP BY 1
    """).fetchall()
    meds = duckdb.sql(f"""
        SELECT source, median(n_chars), quantile_cont(n_chars, 0.95)
        FROM read_parquet('{sf}/documents.parquet') GROUP BY 1
    """).fetchall()
    for source, d in exact:
        assert got[source].n_distinct_tokens == d, (source, d)
        assert got[source].hll_ok, (source, d)
    for source, p50, p95 in meds:
        # the emitted quantiles are exact (lerp + ROUND 6 contract); the
        # GK sketch's agreement is carried by the in-plan witness
        assert abs(got[source].p50_chars - p50) <= 1e-6, source
        assert abs(got[source].p95_chars - p95) <= 1e-6, source
        assert got[source].tdigest_ok, source
