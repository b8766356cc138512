"""Search & linkage queries: BM25 ranking, edit-distance record linkage,
and two analytic shapes (priced-order top-k, grouped exact quantiles).

These extend the engine past the reference's aggregation surface into the
retrieval/linkage operations a training-data pipeline runs next to dedup:
score documents against a term query (corpus triage, boilerplate hunting),
link near-identical catalog names (entity resolution before joining
vendor feeds), and profile value distributions exactly.

Scale notes (audited in PLANS.md):

- BM25 keeps term frequencies inside per-row array HOFs (``F.filter`` over
  the token array) — the token stream is never exploded, so the only data
  movement is a one-row global-stats broadcast and the final top-k
  (``TakeOrderedAndProject``, no global sort).
- The linkage join blocks on symmetric-delete keys (SymSpell): edit
  distance ≤ 2 between two strings implies some ≤2-deletion variant of one
  equals a ≤2-deletion variant of the other, so an equi-join on variant
  keys is recall-COMPLETE — unlike q-gram count filters, which lose recall
  below ~(q·d + q - 1) chars, i.e. for exactly the short catalog names this
  operates on. Variants are O(len²) per distinct name; the join runs on the
  distinct-name vocabulary (dedup before the quadratic step), not the row
  stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.functions.text import token_array
from traffic_data_pipeline_spark.plans.queries import dsum, register
from traffic_data_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# BM25 keyword search
# ---------------------------------------------------------------------------

# constants + base CTE single-sourced in plans/oracle_ctes.py (the staged
# RRF oracle composes them too, and cannot import this module at body
# time); re-exported here under their historical names.
from traffic_data_pipeline_spark.plans.oracle_ctes import (  # noqa: E402
    _BM25_BASE_SQL,
    BM25_B,
    BM25_K1,
    BM25_TERMS,
)

BM25_TOP_K = 20


def _bm25_oracle() -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(l, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{t}"
        for t in BM25_TERMS
    )
    # identical term order + operation order to the Spark expression so the
    # float arithmetic is bit-reproducible across engines
    score = " + ".join(
        f"ln((n - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        f" * ((tf_{t} * {BM25_K1 + 1.0}) / (tf_{t} + {BM25_K1}"
        f" * (1.0 - {BM25_B} + {BM25_B} * (doclen / avgdl))))"
        for t in BM25_TERMS
    )
    base = _BM25_BASE_SQL.format(tf_cols=tf_cols, df_cols=df_cols)
    tf_out = ", ".join(f"CAST(tf_{t} AS INTEGER) AS tf_{t}" for t in BM25_TERMS)
    return f"""
WITH {base}
SELECT doc_id, CAST(doclen AS INTEGER) AS doclen, {tf_out},
       ROUND({score}, 4) AS bm25
FROM base, stats
ORDER BY {score} DESC, doc_id
LIMIT {BM25_TOP_K}
"""


@register("doc_bm25_search", _bm25_oracle())
def q_doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of the corpus against a fixed term query, top-20.

    Term frequencies are array HOFs over the per-row token array — the
    token stream never explodes, so the per-doc pass is narrow. Corpus
    stats (N, avgdl, per-term df) aggregate map-side to ONE row and
    broadcast back; the ranking is a top-k (TakeOrderedAndProject), not a
    global sort. The score polynomial is evaluated in a fixed term order
    with the same association as the DuckDB oracle; every non-ln
    operation is then IEEE-identical, and the ln calls (the one
    libm-dependent piece — neither engine's ln is correctly rounded;
    ~1% of arguments differ by 1 ulp, measured in
    tests/test_boundaries.py) are washed out by the ROUND before
    hashing, whose boundary-flip probability per value is ~1 ulp / the
    rounding quantum (~1e-10 — zero flips in 2M measured values).
    """
    def tf(term):
        # NOTE: the lambda must take exactly ONE parameter — a two-arg
        # lambda makes pyspark's filter() pass (element, index) instead
        return F.array_size(
            F.filter(token_array(F.col("text")), lambda x: x == F.lit(term))
        )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.array_size(token_array(F.col("text"))).alias("doclen"),
        *[tf(t).alias(f"tf_{t}") for t in BM25_TERMS],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("doclen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    score = None
    for t in BM25_TERMS:
        idf = F.log(
            (F.col("n") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"tf_{t}")
        w = (tf * F.lit(BM25_K1 + 1.0)) / (
            tf
            + F.lit(BM25_K1)
            * (
                F.lit(1.0)
                - F.lit(BM25_B)
                + F.lit(BM25_B) * (F.col("doclen") / F.col("avgdl"))
            )
        )
        term = idf * w
        score = term if score is None else score + term
    ranked = j.select(
        "doc_id",
        F.col("doclen").cast("int").alias("doclen"),
        *[F.col(f"tf_{t}").cast("int").alias(f"tf_{t}") for t in BM25_TERMS],
        F.round(score, 4).alias("bm25"),
        score.alias("_raw"),
    )
    return (
        ranked.orderBy(F.col("_raw").desc(), "doc_id")
        .limit(BM25_TOP_K)
        .drop("_raw")
    )


# ---------------------------------------------------------------------------
# Edit-distance record linkage (symmetric-delete blocking)
# ---------------------------------------------------------------------------

_LINKAGE_ORACLE = """
WITH names AS (
  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts FROM part GROUP BY 1)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


def _deletion_keys(col):
    """All strings reachable from ``col`` by deleting ≤2 characters, as a
    deduplicated array expression (SymSpell key set, d=2). O(len²) keys
    per value — bounded by name length, independent of table size."""
    del1 = lambda s: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            F.substring(s, i + 1, F.length(s)),
        ),
    )
    one = del1(col)
    two = F.flatten(F.transform(one, lambda v: del1(v)))
    return F.array_distinct(F.concat(F.array(col), one, two))


@register("part_name_linkage", _LINKAGE_ORACLE)
def q_part_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage: distinct part names within Levenshtein
    distance 2 of each other, with per-name row counts — the entity-
    resolution step run before joining noisy catalog feeds.

    The pair search runs on the DISTINCT-name vocabulary (dedup before the
    quadratic step: the vocabulary grows with the name domain, not the row
    count). Blocking is symmetric-delete (SymSpell): ed(s,t) ≤ 2 implies a
    ≤2-deletion variant of s equals a ≤2-deletion variant of t, so the
    variant-key equi-join is recall-complete — q-gram count filters are NOT
    for strings this short (the count bound max(|s|,|t|)−q+1−q·d goes
    non-positive under ~11 chars at q=3, d=2). Candidates then verify with
    one native ``levenshtein`` call per pair. The oracle is the brute-force
    all-pairs join — feasible at oracle scale, and exactly what the
    blocking must reproduce.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    keyed = names.select(
        "p_name", "n_parts", F.explode(_deletion_keys(F.col("p_name"))).alias("k")
    )
    a = keyed.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a"), "k"
    )
    b = keyed.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b"), "k"
    )
    cand = (
        a.join(b, "k")
        .filter(F.col("name_a") < F.col("name_b"))
        .drop("k")
        .distinct()
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        cand.withColumn("dist", dist.cast("int"))
        .filter(F.col("dist") <= 2)
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
    )


# ---------------------------------------------------------------------------
# Priced-order top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

_Q3_DATE = "1998-07-01"
_Q3_SEGMENT = "BUILDING"

_Q3_ORACLE = f"""
SELECT o.o_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
  AND o.o_orderdate < DATE '{_Q3_DATE}'
  AND l.l_shipdate > DATE '{_Q3_DATE}'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


@register("shipping_priority", _Q3_ORACLE)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top unshipped-revenue orders for one market
    segment. The segment filter reduces customer to a broadcast side; the
    only shuffle moving fact data is the orderkey aggregation, and the
    final ranking is a top-k (TakeOrderedAndProject), never a global sort.
    Revenue is decimal-exact, so the top-10 cutoff and tie-order are
    bit-identical cross-engine. Both date filters push to the parquet
    scans.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < _Q3_DATE)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > _Q3_DATE)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Grouped exact quantiles
# ---------------------------------------------------------------------------

_QUANTILES_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95
FROM lineitem
GROUP BY l_returnflag
"""


@register("lineitem_quantiles", _QUANTILES_ORACLE)
def q_lineitem_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped EXACT quantiles of the price distribution — the
    distribution-profiling pass run before choosing outlier thresholds.
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both linearly
    interpolate at rank p·(n−1) over the sorted values — but with
    DIFFERENT lerp forms (a + (b−a)·f vs a·(1−f) + b·f), which can
    disagree by 1 ulp (DEVIATIONS.md float-parity note); the ROUND to
    6 dp on both sides is what makes the emitted quantiles equal.
    At 100 TB the same query swaps ``percentile`` → ``percentile_approx``
    (t-digest sketch, map-side mergeable, no per-group sort) — documented
    rather than registered because the sketch's answers are
    engine-specific; the exact form is the oracle-checkable one.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile(col, array(...)) call: each percentile() aggregate
    # keeps its own value->count map as aggregation state, so four scalar
    # calls quadruple the per-partition state and the merge work (measured
    # 3.5s -> 1.5s at sf0.1 on a ~600k-distinct-value column)
    qs = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D, 0.95D))"
        ).alias("_q"),
    )
    return qs.select(
        "l_returnflag",
        "n",
        F.round(F.col("_q")[0], 6).alias("p25"),
        F.round(F.col("_q")[1], 6).alias("p50"),
        F.round(F.col("_q")[2], 6).alias("p75"),
        F.round(F.col("_q")[3], 6).alias("p95"),
    )


@register("lineitem_quantiles_approx")
def q_lineitem_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile-profiling pass in its at-scale form: one
    ``percentile_approx`` sketch per group instead of the exact
    value->count map whose state grows with distinct values (~600k here).
    Same output shape as lineitem_quantiles; accuracy pinned against the
    exact twin in tests/test_approx_percentiles.py (rank error
    <= n/accuracy). Rows-only by design — sketch answers are
    engine-specific, the exact form keeps the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(
            "l_extendedprice",
            F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75), F.lit(0.95)),
            F.lit(10000),
        ).alias("_q"),
    )
    return qs.select(
        "l_returnflag",
        "n",
        F.round(F.col("_q")[0], 6).alias("p25"),
        F.round(F.col("_q")[1], 6).alias("p50"),
        F.round(F.col("_q")[2], 6).alias("p75"),
        F.round(F.col("_q")[3], 6).alias("p95"),
    )


# ---------------------------------------------------------------------------
# Per-user event-time rolling window (RANGE frame)
# ---------------------------------------------------------------------------

_ROLLING_ORACLE = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_value_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
"""


@register("events_rolling_24h", _ROLLING_ORACLE)
def q_events_rolling_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-24-hour rolling count/sum at every event — the
    event-TIME range frame (every event sees exactly the events within
    24h of ITS timestamp), not the bucketed approximation a hopping
    window gives. One shuffle on user_id + one sort carries both
    aggregates; the frame bound is on unix microseconds so Spark's
    rangeBetween and DuckDB's RANGE BETWEEN agree exactly. Sum is
    decimal-exact (frame content is deterministic, but pre-aggregation
    within the frame is not ordered). At corpus scale the partition key
    is the user — no global sort anywhere."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double")
        .alias("sum_value_24h"),
    )


# ---------------------------------------------------------------------------
# Late-shipment counts by priority (TPC-H Q12 shape)
# ---------------------------------------------------------------------------

_LATE_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS late_ratio
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@register("late_shipments", _LATE_ORACLE)
def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on this schema: per order priority, how many line
    items shipped more than 90 days after the order date. The orderkey
    join is the only fact shuffle; the conditional counts combine
    map-side into 5 rows. The ratio is one double division of two exact
    integers — deterministic cross-engine."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
    ).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(late).cast("bigint").alias("n_late"),
            (F.sum(late).cast("double") / F.count(F.lit(1))).alias("late_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Sketch profile (HLL + t-digest) — genuinely engine-specific, rows-only
# ---------------------------------------------------------------------------


_SKETCH_PROFILE_ORACLE = """
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
    FROM documents)
  WHERE token != ''),
tok_agg AS (
  SELECT d.source, CAST(COUNT(DISTINCT t.token) AS BIGINT) AS n_distinct_tokens
  FROM toks t JOIN documents d USING (doc_id) GROUP BY 1),
len_agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(quantile_cont(n_chars, 0.50), 6) AS p50_chars,
         ROUND(quantile_cont(n_chars, 0.95), 6) AS p95_chars
  FROM documents GROUP BY 1)
SELECT l.source, l.n_docs,
       COALESCE(t.n_distinct_tokens, 0) AS n_distinct_tokens,
       l.p50_chars, l.p95_chars,
       TRUE AS hll_ok, TRUE AS tdigest_ok
FROM len_agg l LEFT JOIN tok_agg t USING (source)
"""


@register("doc_sketch_profile", _SKETCH_PROFILE_ORACLE)
def q_doc_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sketch profile: HyperLogLog++ distinct-token estimate
    and GK char-length quantiles — the constant-memory profiling pass
    that replaces exact distinct/percentile at 100 TB (both sketches are
    map-side mergeable, so that plan is one map-side-combined shuffle to
    |sources| rows; the exact forms need the full stream).

    Oracle contract (VERDICT r4 ask #7 — previously rows-only): sketch
    ESTIMATES are engine-specific (DuckDB's approx_count_distinct gives
    a different number for the same set), so the emitted columns are the
    EXACT per-source values plus in-plan witnesses ``hll_ok`` /
    ``tdigest_ok`` asserting each sketch lands within the 5% bound the
    accuracy test pins (tests/test_search_ops.py). A sketch regression
    flips a boolean and hash-mismatches the gate instead of hiding
    behind a rows-only row. The exact branches exist for the gate; the
    production 100 TB form is this plan minus them (sketches only) —
    the sketch paths still execute and are still what the witnesses
    measure. Exact quantiles follow the lineitem_quantiles lerp
    contract: ROUND(…, 6) on both engines (DEVIATIONS.md)."""
    from traffic_data_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(docs).join(docs.select("doc_id", "source"), "doc_id")
    tok_agg = tok.groupBy("source").agg(
        F.countDistinct("token").alias("n_distinct_tokens"),
        F.approx_count_distinct("token", 0.02).alias("_hll"),
    )
    len_agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("percentile(n_chars, array(0.50D, 0.95D))").alias("_qx"),
        F.percentile_approx("n_chars", F.array(F.lit(0.5), F.lit(0.95)), 10_000)
        .alias("_qs"),
    )
    exact = F.coalesce(F.col("n_distinct_tokens"), F.lit(0)).cast("bigint")
    est = F.coalesce(F.col("_hll"), F.lit(0))
    # a source whose docs produce zero tokens must still appear in the
    # profile (with 0 distinct tokens), not vanish — hence the LEFT join,
    # and both witnesses treat the empty set as trivially in-bound
    within = [
        (
            F.abs(F.col("_qs")[i].cast("double") - F.col("_qx")[i])
            <= 0.05 * F.col("_qx")[i] + F.lit(2.0)
        )
        for i in range(2)
    ]
    return len_agg.join(tok_agg, "source", "left").select(
        "source",
        "n_docs",
        exact.alias("n_distinct_tokens"),
        F.round(F.col("_qx")[0], 6).alias("p50_chars"),
        F.round(F.col("_qx")[1], 6).alias("p95_chars"),
        (F.abs(est - exact) <= 0.05 * exact).alias("hll_ok"),
        (within[0] & within[1]).alias("tdigest_ok"),
    )


# ---------------------------------------------------------------------------
# Per-stratum exact-quota sampling
# ---------------------------------------------------------------------------

_QUOTA = 10

_QUOTA_ORACLE = f"""
SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents)
WHERE rk <= {_QUOTA}
"""


@register("doc_sample_quota", _QUOTA_ORACLE)
def q_doc_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (eval-set construction):
    rank docs inside each source by md5(doc_id) — a stable pseudo-random
    order every engine reproduces — and keep the first k. Complements the
    hash-Bernoulli sampler (`doc_sample_stratified`), which gives an
    EXPECTED rate, not an exact count. One shuffle on source; the window
    sort is per-stratum. At corpus scale a stratum is one partition's
    worth of keys — if strata are huge, pre-filter with the Bernoulli
    sampler at ~2-3x the quota rate first, then rank the survivors (the
    ranks of the k smallest hashes are unchanged: ranking by hash and
    subsetting by hash-threshold commute when the threshold keeps > k
    rows per stratum — make the slack generous and assert the per-stratum
    count)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _QUOTA)
        .select("source", "doc_id", F.col("rk").cast("bigint").alias("rk"))
    )


# ---------------------------------------------------------------------------
# One-stop corpus report
# ---------------------------------------------------------------------------

_REPORT_ORACLE = """
WITH s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(COUNT(DISTINCT source) AS DOUBLE) AS n_sources,
         CAST(COUNT(*) - COUNT(DISTINCT md5(trim(regexp_replace(
              lower(text), '[^a-z0-9]+', ' ', 'g')))) AS DOUBLE)
           AS exact_dup_docs,
         CAST(SUM(len(list_filter(string_split_regex(lower(text),
              '[^a-z0-9]+'), t -> t <> ''))) AS DOUBLE) AS total_ws_tokens,
         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS pct_en
  FROM documents)
SELECT 'exact_dup_docs' AS metric, exact_dup_docs AS value FROM s
UNION ALL SELECT 'mean_chars', mean_chars FROM s
UNION ALL SELECT 'n_docs', n_docs FROM s
UNION ALL SELECT 'n_sources', n_sources FROM s
UNION ALL SELECT 'pct_en', pct_en FROM s
UNION ALL SELECT 'total_ws_tokens', total_ws_tokens FROM s
"""


@register("corpus_report", _REPORT_ORACLE)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus health report a pipeline owner checks first: doc and
    source counts, exact-dup count, token total, mean length, language
    mix — ONE aggregation pass over the table (the two count-distincts
    share it via Catalyst's expand), unpivoted with stack() to
    (metric, value) rows. All six metrics are exact integer counts or a
    single double division, so the cross-engine hash is stable."""
    docs = load_table(spark, sf_dir, "documents")
    from traffic_data_pipeline_spark.functions.text import normalize

    s = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        (F.count(F.lit(1))
         - F.countDistinct(F.md5(normalize(F.col("text")))))
        .cast("double").alias("exact_dup_docs"),
        F.sum(F.array_size(token_array(F.col("text"))))
        .cast("double").alias("total_ws_tokens"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1)))
        .alias("mean_chars"),
        (F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
         / F.count(F.lit(1))).alias("pct_en"),
    )
    return s.selectExpr(
        "stack(6, "
        "'exact_dup_docs', exact_dup_docs, "
        "'mean_chars', mean_chars, "
        "'n_docs', n_docs, "
        "'n_sources', n_sources, "
        "'pct_en', pct_en, "
        "'total_ws_tokens', total_ws_tokens) AS (metric, value)"
    )


# ---------------------------------------------------------------------------
# Length-bucketed batch assignment (inference serving prep)
# ---------------------------------------------------------------------------

_BATCH_BUCKET = 64   # token-length bucket width
_BATCH_SIZE = 32     # docs per inference batch

_BATCH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents),
bucketed AS (
  SELECT doc_id, n_tokens,
         CAST(n_tokens // {_BATCH_BUCKET} AS BIGINT) AS bucket,
         ROW_NUMBER() OVER (PARTITION BY n_tokens // {_BATCH_BUCKET}
                            ORDER BY n_tokens, doc_id) AS rk
  FROM toks)
SELECT doc_id, n_tokens, bucket,
       CAST((rk - 1) // {_BATCH_SIZE} AS BIGINT) AS batch_id,
       CAST(MAX(n_tokens) OVER (PARTITION BY bucket, (rk - 1) // {_BATCH_SIZE})
            - n_tokens AS BIGINT) AS pad_tokens
FROM bucketed
"""


@register("doc_batch_by_length", _BATCH_ORACLE)
def q_doc_batch_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching: group docs into fixed-size
    batches of similar token length so padding-to-batch-max wastes the
    fewest tokens — the standard serving/embedding-job prep. Docs are
    bucketed by token count, ranked within the bucket (by length then id,
    so batches are deterministic), cut into fixed batches, and each
    row reports its padding cost against the batch max. One shuffle on
    the bucket key carries the rank and both windows. At corpus scale the
    bucket count is bounded (max_len / width), so add a salt to the rank
    partition if a single bucket outgrows one task's sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_size(token_array(F.col("text"))).cast("bigint")
        .alias("n_tokens"),
    )
    bucket = (F.col("n_tokens") / _BATCH_BUCKET).cast("bigint")
    wrk = Window.partitionBy("bucket").orderBy("n_tokens", "doc_id")
    b = toks.withColumn("bucket", bucket).withColumn(
        "batch_id",
        ((F.row_number().over(wrk) - 1) / _BATCH_SIZE).cast("bigint"),
    )
    wb = Window.partitionBy("bucket", "batch_id")
    return b.select(
        "doc_id", "n_tokens", "bucket", "batch_id",
        (F.max("n_tokens").over(wb) - F.col("n_tokens")).cast("bigint")
        .alias("pad_tokens"),
    )


# ---------------------------------------------------------------------------
# Quality tiers via broadcast quantile thresholds
# ---------------------------------------------------------------------------

_TIERS_ORACLE = """
WITH q AS (
  SELECT round(quantile_cont(n_chars, 0.25), 6) AS q1,
         round(quantile_cont(n_chars, 0.50), 6) AS q2,
         round(quantile_cont(n_chars, 0.75), 6) AS q3
  FROM documents)
SELECT CAST(CAST(d.n_chars > q.q1 AS INTEGER)
            + CAST(d.n_chars > q.q2 AS INTEGER)
            + CAST(d.n_chars > q.q3 AS INTEGER) AS BIGINT) AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(d.n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(len(list_filter(string_split_regex(lower(d.text),
            '[^a-z0-9]+'), t -> t <> ''))) AS BIGINT) AS total_tokens
FROM documents d, q
GROUP BY 1
"""


@register("doc_quality_tiers", _TIERS_ORACLE)
def q_doc_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile tiering without a global sort: `ntile()` would funnel the
    whole corpus through ONE ordered partition, so instead the three
    quartile thresholds aggregate to a single broadcast row and each doc
    buckets itself with three comparisons — the discretization pattern
    that survives 100 TB. Per-tier doc counts, char range, and token
    totals come from one map-side-combined aggregate. The thresholds
    ROUND to 6 dp in BOTH engines before comparing: DuckDB's
    quantile_cont lerps as a*(1-f) + b*f, which can drift 1 ulp from
    Spark's a + (b-a)*f even on repeated values (hypothesis-found;
    DEVIATIONS.md float-parity note) — an unrounded threshold 1 ulp
    below an integer n_chars value would flip that doc's tier. True
    quartiles of integer data are quarter-valued, hence 6-dp-exact:
    the rounded thresholds are fully deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    q = docs.agg(
        F.round(F.expr("percentile(n_chars, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(n_chars, 0.50)"), 6).alias("q2"),
        F.round(F.expr("percentile(n_chars, 0.75)"), 6).alias("q3"),
    )
    tier = (
        (F.col("n_chars") > F.col("q1")).cast("int")
        + (F.col("n_chars") > F.col("q2")).cast("int")
        + (F.col("n_chars") > F.col("q3")).cast("int")
    ).cast("bigint")
    return (
        docs.crossJoin(F.broadcast(q))
        .select(tier.alias("tier"), "n_chars",
                F.array_size(token_array(F.col("text"))).alias("_nt"))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("_nt").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Forecast revenue delta (TPC-H Q6 shape) and large-volume customers (Q18)
# ---------------------------------------------------------------------------


@register("forecast_revenue", """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue_delta,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: what revenue would an across-the-board discount
    change have moved. Pure scan-filter-aggregate — every predicate
    (date range, discount band, quantity cap) reaches the parquet scan
    as a pushed filter, and the decimal-exact sum collapses map-side to
    one row. The canonical 'is pushdown working' probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"))
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_Q18_MIN_QTY = 250

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > {_Q18_MIN_QTY})
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(b.total_qty AS DOUBLE) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("large_volume_customers", _Q18_ORACLE)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind outsized orders. The quantity
    roll-up happens FIRST (map-side-combined, one shuffle on orderkey)
    and the HAVING filter shrinks it to the handful of big orders before
    any join — so the orders/customer joins broadcast the filtered side
    instead of shuffling the fact twice. l_quantity sums as integers in
    this fixture but is typed double for cross-engine stability."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# Per-detector lag-1 autocorrelation (time-series diagnostics)
# ---------------------------------------------------------------------------


def _autocorr_oracle() -> str:
    from traffic_data_pipeline_spark.plans.queries import AGG15_CTES

    return f"""
WITH {AGG15_CTES},
lagged AS (
  SELECT sensor, volume_sum AS x,
         LAG(volume_sum) OVER (PARTITION BY sensor ORDER BY w_start) AS y
  FROM agg15),
sums AS (
  SELECT sensor, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM lagged WHERE y IS NOT NULL GROUP BY 1)
SELECT sensor, n AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN ROUND((n * sxy - sx * sy)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
       END AS autocorr_lag1
FROM sums
"""


@register("sensor_autocorr", _autocorr_oracle())
def q_sensor_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-detector lag-1 autocorrelation of the 15-minute volume series —
    the smoothness diagnostic run before choosing imputation windows
    (high r1 justifies neighbor-based infill; see operators/impute.py).
    One sensor-partitioned window provides the lag; every accumulator is
    an exact INTEGER sum (volume_sum is int), so the Pearson ratio is one
    deterministic double expression per sensor and the oracle hash is
    exact. Zero-variance series (constant volume) yield NULL rather than
    a 0/0."""
    from traffic_data_pipeline_spark.operators.aggregate import (
        aggregate_detector,
    )
    from traffic_data_pipeline_spark.plans.queries import sensor_readings
    from pyspark.sql import Window

    agg = aggregate_detector(sensor_readings(spark, sf_dir))
    w = Window.partitionBy("sensor").orderBy("start_datetime")
    lagged = agg.select(
        "sensor",
        F.col("volume_sum").alias("x"),
        F.lag("volume_sum").over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    s = lagged.groupBy("sensor").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = F.round(
        cov / F.sqrt(var_x.cast("double") * var_y.cast("double")), 6
    )
    return s.select(
        "sensor",
        F.col("n").alias("n_pairs"),
        # two comparisons, not a product: var_x*var_y overflows BIGINT at
        # realistic series magnitudes (~1e13 per side) in both engines
        F.when((var_x > 0) & (var_y > 0), r).alias("autocorr_lag1"),
    )


# ---------------------------------------------------------------------------
# Corridor peak hour (argmax over the hour-of-day profile)
# ---------------------------------------------------------------------------


def _peak_oracle() -> str:
    from traffic_data_pipeline_spark.plans.queries import NODEFACT_CTES

    return f"""
WITH {NODEFACT_CTES},
byhour AS (
  SELECT corridor_route, CAST(hour(ts) AS INTEGER) AS hour_of_day,
         CAST(SUM(volume_sum) AS BIGINT) AS total_volume
  FROM lvl2 WHERE corridor_route IS NOT NULL
  GROUP BY 1, 2),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY corridor_route
                               ORDER BY total_volume DESC, hour_of_day) AS rk
  FROM byhour)
SELECT corridor_route, hour_of_day AS peak_hour, total_volume AS peak_volume
FROM ranked WHERE rk = 1
"""


@register("corridor_peak_hour", _peak_oracle())
def q_corridor_peak_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-corridor peak hour: the hour-of-day with the highest summed
    volume across the month — the argmax every traffic report leads
    with. The hour-of-day profile is a 24-row-per-corridor aggregate
    (map-side combined), so the argmax window ranks a tiny frame; volume
    sums are exact integers and ties break to the earlier hour, making
    the argmax deterministic cross-engine (max_by() is not, on ties)."""
    from traffic_data_pipeline_spark.operators.rollup import two_level_rollup
    from traffic_data_pipeline_spark.plans.queries import _node_fact
    from pyspark.sql import Window

    roll = two_level_rollup(_node_fact(spark, sf_dir), "hour")
    byhour = (
        roll.filter(F.col("corridor_route").isNotNull())
        .groupBy(
            "corridor_route",
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(F.sum("volume_sum").cast("bigint").alias("total_volume"))
    )
    w = Window.partitionBy("corridor_route").orderBy(
        F.col("total_volume").desc(), "hour_of_day"
    )
    return (
        byhour.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "corridor_route",
            F.col("hour_of_day").alias("peak_hour"),
            F.col("total_volume").alias("peak_volume"),
        )
    )


# ---------------------------------------------------------------------------
# Raw-feed scrub (U3) over a doubled delivery
# ---------------------------------------------------------------------------


def _scrub_oracle() -> str:
    from traffic_data_pipeline_spark.sources.sensor import SENSOR_VIEW_SQL

    return f"""
WITH readings AS ({SENSOR_VIEW_SQL}),
doubled AS (
  SELECT * FROM readings
  UNION ALL
  SELECT * FROM readings WHERE CAST(sensor AS BIGINT) % 7 = 0),
raw AS (
  SELECT sensor, CAST(COUNT(*) AS BIGINT) AS raw_rows
  FROM doubled GROUP BY 1),
scrubbed AS (
  SELECT sensor, CAST(COUNT(*) AS BIGINT) AS scrubbed_rows FROM (
    SELECT DISTINCT sensor, start_datetime FROM doubled)
  GROUP BY 1)
SELECT r.sensor, r.raw_rows, s.scrubbed_rows,
       r.raw_rows - s.scrubbed_rows AS dupes_removed
FROM raw r JOIN scrubbed s USING (sensor)
"""


@register("sensor_scrub", _scrub_oracle())
def q_sensor_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 (scrub_sensor) as a registered query: double-deliver a subset
    of the raw feed (API-retry simulation, the situation the reference
    calls scrub for at R/_pull_data.R:436), dedupe on the
    (sensor, reading-time) key, and report per-sensor raw/scrubbed/dupe
    counts. The scrub is one shuffle on the key with map-side combine;
    the count join is sensor-sized."""
    from traffic_data_pipeline_spark.operators.aggregate import scrub_sensor
    from traffic_data_pipeline_spark.plans.queries import sensor_readings

    r = sensor_readings(spark, sf_dir)
    doubled = r.unionByName(
        r.filter(F.col("sensor").cast("bigint") % 7 == 0)
    )
    raw = doubled.groupBy("sensor").agg(F.count(F.lit(1)).alias("raw_rows"))
    scrubbed = (
        scrub_sensor(doubled)
        .groupBy("sensor")
        .agg(F.count(F.lit(1)).alias("scrubbed_rows"))
    )
    return (
        raw.join(scrubbed, "sensor")
        .select(
            "sensor", "raw_rows", "scrubbed_rows",
            (F.col("raw_rows") - F.col("scrubbed_rows")).alias("dupes_removed"),
        )
    )


# ---------------------------------------------------------------------------
# Hot-key join through explicit salting (driver-visible skew tooling)
# ---------------------------------------------------------------------------


@register("events_salted_enrich", """
WITH dim AS (
  SELECT event_type,
         CAST(1.0 + (length(event_type) % 3) * 0.25 AS DOUBLE) AS weight
  FROM (SELECT DISTINCT event_type FROM events))
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value * d.weight AS DECIMAL(18,6))) AS DOUBLE)
         AS weighted_value
FROM events e JOIN dim d USING (event_type)
GROUP BY 1
""")
def q_events_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew shape AQE cannot fix, run through the explicit salt: five
    event types over the whole fact means every key is a hot key — a
    plain shuffle join lands the stream on 5 reducers regardless of
    cluster width. salted_join spreads each key over 16 deterministic
    buckets (small side replicated 16x — the price), and the result is
    row-identical to the plain join, which is exactly what the DuckDB
    oracle checks. The weight dim derives deterministically from the type
    name so the query needs no side input."""
    from traffic_data_pipeline_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = (
        ev.select("event_type").distinct()
        .select(
            "event_type",
            (1.0 + (F.length("event_type") % 3) * 0.25).alias("weight"),
        )
    )
    j = salted_join(ev, dim, ["event_type"], salt=16)
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value") * F.col("weight")).alias("weighted_value"),
    )


# ---------------------------------------------------------------------------
# Train/val/test split leakage audit
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
           AS content_key,
         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 < 80 THEN 'train'
              WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents),
leaks AS (
  SELECT content_key,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
         CAST(MIN(doc_id) AS BIGINT) AS example_doc
  FROM assigned GROUP BY 1 HAVING COUNT(DISTINCT split) > 1)
SELECT * FROM leaks
"""


@register("split_leakage_audit", _SPLIT_ORACLE)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test leakage audit: after a deterministic hash split
    (80/10/10 on md5(doc_id), the same reproducible assignment
    doc_sample_stratified uses), find content groups whose exact
    duplicates land in MORE THAN ONE split — the eval-contamination bug
    every training pipeline must check before it trusts a benchmark
    number. One aggregation on the content key (map-side combined); the
    HAVING filter returns only the offending groups. Near-dup leakage is
    the same query over dedup_minhash_canonical's components instead of
    the exact key."""
    from traffic_data_pipeline_spark.functions.text import normalize

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    assigned = docs.select(
        "doc_id",
        F.md5(normalize(F.col("text"))).alias("content_key"),
        split.alias("split"),
    )
    return (
        assigned.groupBy("content_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_splits") > 1)
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users (DAU/WAU)
# ---------------------------------------------------------------------------


@register("events_rolling_wau", """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
spread AS (
  SELECT user_id, d + CAST(k.k AS INTEGER) AS window_day
  FROM user_days, (SELECT unnest(generate_series(0, 6)) AS k) k),
counts AS (
  SELECT strftime(window_day, '%Y-%m-%d') AS window_day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM spread GROUP BY 1),
dau AS (
  SELECT strftime(d, '%Y-%m-%d') AS window_day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM user_days GROUP BY 1)
SELECT c.window_day, COALESCE(a.dau, 0) AS dau, c.wau
FROM counts c LEFT JOIN dau a USING (window_day)
""")
def q_events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day (WAU) next to same-day DAU.
    Rolling COUNT DISTINCT is not expressible as a window frame (distinct
    aggregates are unsupported in frames, and summing daily distincts
    overcounts) — the scalable formulation dedupes to user-DAYS first
    (the only full-cardinality shuffle), then each user-day replicates
    into the 7 trailing windows it serves and a plain count-distinct per
    window finishes. Replication is 7x the user-day table, not 7x the
    event stream."""
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    spread = user_days.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
        "d",
    ).select("user_id", F.date_add("d", F.col("k")).alias("window_day"))
    counts = spread.groupBy("window_day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = user_days.groupBy(F.col("d").alias("window_day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return (
        counts.join(dau, "window_day", "left")
        .select(
            F.date_format("window_day", "yyyy-MM-dd").alias("window_day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
        )
    )


# ---------------------------------------------------------------------------
# RFM customer scoring (broadcast-threshold quintiles)
# ---------------------------------------------------------------------------

_RFM_ORACLE = """
WITH base AS (
  SELECT o.o_custkey AS custkey,
         date_diff('day', MAX(o.o_orderdate),
                   (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
           AS monetary
  FROM orders o GROUP BY 1),
q AS (
  SELECT quantile_cont(frequency, 0.5) AS f_med,
         quantile_cont(monetary, 0.5) AS m_med,
         quantile_cont(recency_days, 0.5) AS r_med
  FROM base)
SELECT b.custkey, CAST(b.recency_days AS BIGINT) AS recency_days,
       b.frequency, b.monetary,
       CASE WHEN b.recency_days <= q.r_med AND b.frequency > q.f_med
                 AND b.monetary > q.m_med THEN 'champion'
            WHEN b.recency_days <= q.r_med THEN 'recent'
            WHEN b.frequency > q.f_med OR b.monetary > q.m_med
              THEN 'lapsing_valuable'
            ELSE 'hibernating' END AS segment
FROM base b, q
"""


@register("customer_rfm", _RFM_ORACLE)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order,
    against the global max date), frequency, and decimal-exact monetary
    total, segmented against median thresholds. Both scalars — the
    global max date and the three medians — aggregate to one broadcast
    row each, so the fact shuffles exactly once (the customer roll-up);
    no global sort, no window over the whole table. Threshold comparisons
    against exact medians of integer-ish values are deterministic
    cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("_maxd"))
    base = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.first("_maxd"), F.max("o_orderdate"))
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            dsum(F.col("o_totalprice")).alias("monetary"),
        )
    )
    q = base.agg(
        F.expr("percentile(frequency, 0.5)").alias("f_med"),
        F.expr("percentile(monetary, 0.5)").alias("m_med"),
        F.expr("percentile(recency_days, 0.5)").alias("r_med"),
    )
    j = base.crossJoin(F.broadcast(q))
    seg = (
        F.when(
            (F.col("recency_days") <= F.col("r_med"))
            & (F.col("frequency") > F.col("f_med"))
            & (F.col("monetary") > F.col("m_med")),
            "champion",
        )
        .when(F.col("recency_days") <= F.col("r_med"), "recent")
        .when(
            (F.col("frequency") > F.col("f_med"))
            | (F.col("monetary") > F.col("m_med")),
            "lapsing_valuable",
        )
        .otherwise("hibernating")
    )
    return j.select(
        "custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        "frequency",
        "monetary",
        seg.alias("segment"),
    )


# ---------------------------------------------------------------------------
# Journey mining: most common 3-step event paths
# ---------------------------------------------------------------------------


@register("events_top_paths", """
WITH seq AS (
  SELECT user_id, event_type AS s1,
         LEAD(event_type, 1) OVER w AS s2,
         LEAD(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
paths AS (
  SELECT s1 || '>' || s2 || '>' || s3 AS path,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE s3 IS NOT NULL GROUP BY 1)
SELECT path, n FROM paths ORDER BY n DESC, path LIMIT 10
""")
def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey mining: the 10 most common 3-step event-type paths across
    users. Two LEADs over one user-partitioned sort produce every
    consecutive triple without self-joins (a 3-way join on adjacency
    would shuffle the stream three times); the count combines map-side to
    |type|^3 <= 125 rows and the top-10 is a TakeOrderedAndProject.
    Tie-break on the path string keeps the cutoff deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).filter(F.col("s3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "s1", "s2", "s3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Imputation quality report and corridor speed reliability
# ---------------------------------------------------------------------------


def _impute_report_oracle() -> str:
    from traffic_data_pipeline_spark.plans.queries import IMPUTE_CTES

    return f"""
WITH {IMPUTE_CTES}
SELECT sensor,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN volume_pct_null > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_degraded,
       CAST(SUM(CASE WHEN volume_sum_impute IS DISTINCT FROM volume_sum
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
       CAST(SUM(CASE WHEN volume_sum_impute IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unrecoverable,
       CAST(SUM(CAST(COALESCE(volume_sum_impute, 0)
                     - COALESCE(volume_sum, 0) AS BIGINT)) AS BIGINT)
         AS volume_added
FROM s3 GROUP BY 1
"""


@register("impute_quality_report", _impute_report_oracle())
def q_impute_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Imputation accounting per sensor: how many 15-min windows were
    degraded (any nulls), how many the cascade changed, how many stayed
    unrecoverable after all three stages, and the net volume the
    imputation added — the report that tells an operator whether the
    cascade is filling honest gaps or inventing traffic. One aggregation
    over the already-computed impute output; every measure is an exact
    integer."""
    from traffic_data_pipeline_spark.operators.aggregate import (
        aggregate_detector,
    )
    from traffic_data_pipeline_spark.operators.impute import impute
    from traffic_data_pipeline_spark.plans.queries import sensor_readings

    agg = aggregate_detector(sensor_readings(spark, sf_dir))
    imp = impute(agg.select("sensor", "start_datetime",
                            "volume_sum", "volume_pct_null",
                            "occupancy_sum", "occupancy_pct_null"))
    changed = ~F.col("volume_sum_impute").eqNullSafe(F.col("volume_sum"))
    return imp.groupBy("sensor").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(F.when(F.col("volume_pct_null") > 0, 1).otherwise(0))
        .cast("bigint").alias("n_degraded"),
        F.sum(F.when(changed, 1).otherwise(0)).cast("bigint")
        .alias("n_imputed"),
        F.sum(F.when(F.col("volume_sum_impute").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_unrecoverable"),
        F.sum(
            F.coalesce("volume_sum_impute", F.lit(0)).cast("bigint")
            - F.coalesce("volume_sum", F.lit(0)).cast("bigint")
        ).cast("bigint").alias("volume_added"),
    )


def _reliability_oracle() -> str:
    from traffic_data_pipeline_spark.plans.queries import NODEFACT_CTES

    return f"""
WITH {NODEFACT_CTES}
SELECT corridor_route,
       CAST(COUNT(speed) AS BIGINT) AS n_obs,
       ROUND(quantile_cont(speed, 0.50), 6) AS p50_speed,
       ROUND(quantile_cont(speed, 0.05), 6) AS p05_speed,
       CASE WHEN quantile_cont(speed, 0.05) > 0 THEN
         ROUND(quantile_cont(speed, 0.50) / quantile_cont(speed, 0.05), 6)
       END AS reliability_ratio
FROM lvl2
WHERE corridor_route IS NOT NULL AND speed IS NOT NULL
GROUP BY 1
"""


@register("corridor_reliability", _reliability_oracle())
def q_corridor_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corridor travel reliability: median over 5th-percentile speed —
    the planning-time index shape (how much worse the worst hours are
    than a typical hour). Exact grouped percentiles in ONE shared-state
    percentile call per group; the ratio is a single double division of
    two interpolated order statistics, bit-equal across engines. At
    100 TB the same query swaps in percentile_approx."""
    from traffic_data_pipeline_spark.operators.rollup import two_level_rollup
    from traffic_data_pipeline_spark.plans.queries import _node_fact

    roll = two_level_rollup(_node_fact(spark, sf_dir), "hour")
    qs = (
        roll.filter(F.col("corridor_route").isNotNull()
                    & F.col("speed").isNotNull())
        .groupBy("corridor_route")
        .agg(
            F.count("speed").alias("n_obs"),
            F.expr("percentile(speed, array(0.50D, 0.05D))").alias("_q"),
        )
    )
    return qs.select(
        "corridor_route",
        "n_obs",
        F.round(F.col("_q")[0], 6).alias("p50_speed"),
        F.round(F.col("_q")[1], 6).alias("p05_speed"),
        # a fully-congested corridor (p05 == 0) gets NULL, not Inf: Spark
        # and DuckDB disagree on double x/0 (NULL vs error), so the guard
        # lives in BOTH formulations — same move as the autocorr variance
        # and cosine-norm guards
        F.when(F.col("_q")[1] > 0,
               F.round(F.col("_q")[0] / F.col("_q")[1], 6))
        .alias("reliability_ratio"),
    )


@register("events_type_hour_cube", """
WITH e AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod, value FROM events)
SELECT event_type, hod,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(hod) AS INTEGER) AS g_hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM e GROUP BY CUBE (event_type, hod)
""")
def q_events_type_hour_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (grouping sets) over the event stream: counts and
    decimal-exact value sums at (type x hour-of-day), per-type, per-hour,
    and grand-total grains in ONE pass — the OLAP primitive behind
    dashboard rollups. Spark plans an Expand (4 grouping-set rows per
    input row) feeding a single map-side-combined aggregate: one shuffle
    total, where four separate GROUP BYs would scan and shuffle four
    times. grouping() flags disambiguate subtotal NULLs from data NULLs
    (event_type/hod are non-null here, but the flags are part of the
    operator's contract)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("hod"), "value")
    return (
        e.cube("event_type", "hod")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("hod").cast("int").alias("g_hod"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select("event_type", "hod", "g_type", "g_hod",
                "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# Monthly order trend with month-over-month deltas
# ---------------------------------------------------------------------------


@register("orders_monthly_trend", """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1, 2)
SELECT strftime(month, '%Y-%m-%d') AS month, o_orderpriority, n_orders,
       revenue,
       n_orders - LAG(n_orders) OVER (PARTITION BY o_orderpriority
                                      ORDER BY month) AS mom_orders_delta
FROM monthly
""")
def q_orders_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order counts and decimal-exact revenue per priority, with
    the month-over-month delta as a LAG over the AGGREGATED frame — the
    reporting shape where the window runs on |months|x|priorities| rows
    (hundreds), not the fact: aggregate first, window later. The fact
    shuffles once for the roll-up; the trend window sorts the tiny
    result."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    monthly = (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    return monthly.select(
        F.date_format("month", "yyyy-MM-dd").alias("month"),
        "o_orderpriority",
        "n_orders",
        "revenue",
        (F.col("n_orders") - F.lag("n_orders").over(w))
        .alias("mom_orders_delta"),
    )


# ---------------------------------------------------------------------------
# VARIANT-typed JSON extraction (Spark 4 binary JSON)
# ---------------------------------------------------------------------------


@register("events_variant_extract", """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 AS k_mod7,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS max_k
FROM events
GROUP BY 1
""")
def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload access through Spark 4's VARIANT type: parse_json
    once into the binary variant encoding, then typed try_variant_get
    path reads — at scale this beats per-path get_json_object (which
    re-parses the JSON string for every path; variant parses once and
    its field reads are offset lookups). Semantically identical to the
    string path, so the existing DuckDB JSON oracle still hash-matches;
    events_json_extract keeps the classic formulation for comparison."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("_v"))
    k = F.try_variant_get(F.col("_v"), "$.k", "int")
    return (
        v.select((k % 7).alias("k_mod7"), k.alias("_k"))
        .groupBy("k_mod7")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_k").cast("bigint").alias("min_k"),
            F.max("_k").cast("bigint").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Outage report: gaps-and-islands over the 15-min series
# ---------------------------------------------------------------------------


def _uptime_oracle() -> str:
    from traffic_data_pipeline_spark.plans.queries import AGG15_CTES

    return f"""
WITH {AGG15_CTES},
marked AS (
  SELECT sensor, w_start,
         CASE WHEN epoch(w_start)
                   - LAG(epoch(w_start)) OVER (PARTITION BY sensor
                                               ORDER BY w_start) = 900
              THEN 0 ELSE 1 END AS new_island
  FROM agg15),
islands AS (
  SELECT sensor, w_start,
         SUM(new_island) OVER (PARTITION BY sensor ORDER BY w_start
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM marked),
sized AS (
  SELECT sensor, island_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         strftime(MIN(w_start), '%Y-%m-%d %H:%M:%S') AS island_start
  FROM islands GROUP BY 1, 2)
SELECT sensor,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(n_windows) AS BIGINT) AS longest_island,
       MIN(island_start) AS first_seen
FROM sized GROUP BY 1
"""


@register("sensor_uptime_islands", _uptime_oracle())
def q_sensor_uptime_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outage reporting as gaps-and-islands: consecutive 15-min windows
    (exactly 900s apart) form islands via the classic lag-diff + running
    cumsum, then per-sensor island counts and the longest unbroken run.
    The lag, the cumsum, and the island roll-up all ride ONE sensor
    exchange + sort; complements the streaming gap detector
    (streaming/stateful.py), which finds the same boundaries
    incrementally with per-key state."""
    from traffic_data_pipeline_spark.operators.aggregate import (
        aggregate_detector,
    )
    from traffic_data_pipeline_spark.plans.queries import sensor_readings
    from pyspark.sql import Window

    agg = aggregate_detector(sensor_readings(spark, sf_dir)).select(
        "sensor", F.col("start_datetime").alias("w_start")
    )
    wo = Window.partitionBy("sensor").orderBy("w_start")
    marked = agg.select(
        "sensor", "w_start",
        F.when(
            F.unix_timestamp("w_start")
            - F.lag(F.unix_timestamp("w_start")).over(wo) == 900,
            0,
        ).otherwise(1).alias("new_island"),
    )
    islands = marked.withColumn(
        "island_id",
        F.sum("new_island").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sized = islands.groupBy("sensor", "island_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.date_format(F.min("w_start"), "yyyy-MM-dd HH:mm:ss")
        .alias("island_start"),
    )
    return sized.groupBy("sensor").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("n_windows").cast("bigint").alias("longest_island"),
        F.min("island_start").alias("first_seen"),
    )


# ---------------------------------------------------------------------------
# Exact phrase search (positional match, in-row)
# ---------------------------------------------------------------------------

PHRASE = ("slow", "hash", "batch")


@register("doc_phrase_search", """
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS l
  FROM documents),
hits AS (
  SELECT doc_id,
         list_filter(generate_series(1, greatest(len(l) - 2, 0)),
                     g -> l[g] = 'slow' AND l[g+1] = 'hash'
                          AND l[g+2] = 'batch') AS pos
  FROM tl)
SELECT doc_id,
       CAST(len(pos) AS BIGINT) AS n_occurrences,
       CAST(pos[1] AS BIGINT) AS first_pos
FROM hits WHERE len(pos) > 0
""")
def q_doc_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('slow hash batch'): every doc containing the
    three tokens CONSECUTIVELY, with occurrence count and first match
    position — the positional constraint BM25's bag-of-words scoring
    cannot express. Runs as the POSITIONAL INVERTED INDEX: tokens
    posexplode once, each phrase term's posting list filters out
    (tiny — term-frequency-sized, not corpus-sized), positions shift so
    a phrase start is an EQUI key, and two co-keyed joins verify
    adjacency. Everything after the one token_array call is whole-stage
    codegen; the tempting in-row formulation (filter a position sequence
    with three element_at probes per start) is an interpreted
    higher-order lambda that CollapseProject re-inlines per reference —
    measured 3.9s vs 0.4s for this plan at sf0.1. At 100 TB the
    posting lists shuffle co-keyed on (doc, position); the corpus
    itself never moves. posexplode is 0-based, the oracle 1-based —
    first_pos converts at the end."""
    t0, t1, t2 = PHRASE
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    ).select(
        "doc_id",
        F.posexplode(token_array(F.col("text"))).alias("p", "t"),
    )
    p0 = tok.filter(F.col("t") == t0).select("doc_id", F.col("p").alias("g"))
    p1 = tok.filter(F.col("t") == t1) \
        .select("doc_id", (F.col("p") - 1).alias("g"))
    p2 = tok.filter(F.col("t") == t2) \
        .select("doc_id", (F.col("p") - 2).alias("g"))
    hits = p0.join(p1, ["doc_id", "g"]).join(p2, ["doc_id", "g"])
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        (F.min("g") + 1).cast("bigint").alias("first_pos"),
    )
