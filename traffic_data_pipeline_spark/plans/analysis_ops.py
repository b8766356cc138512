"""Round-3 continuation: distribution analytics and robust-statistics
extension queries (driver-mandated first-class surface) — Bloom-filter
decontamination (the broadcast-bitset scale path of doc_decontaminate),
lexical-diversity profiling (token entropy + type/token ratio),
per-source KL-divergence corpus drift, time-weighted linear
interpolation of sensor gaps, MAD-based robust anomaly detection,
sweep-line session concurrency, degree-ordered triangle counting over
the LSH duplicate graph, and two adversarial join shapes from the
decision-support canon (small-quantity revenue, idle-rich-customer
anti-join) — each with a DuckDB oracle.

Registered into the same QUERIES/ORACLES dicts as plans/queries.py.
Cross-engine exactness tactics (same playbook as plans/mining_ops.py):
md5-prefix integers wherever both engines must hash identically (the
Bloom positions are fully deterministic, so even the false-positive set
is oracle-checked); rational comparisons instead of AVG thresholds
(2·q·n < Σ, never q < Σ/n); decimal accumulation for money; log2 only
in final rounded projections (the BM25 precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.functions.tmpdirs import cached_dir_valid
from traffic_data_pipeline_spark.functions.text import ngram_array, token_array
from traffic_data_pipeline_spark.operators.rangejoin import overlap_join
from traffic_data_pipeline_spark.plans.queries import register
from traffic_data_pipeline_spark.sources.tables import load_table

from traffic_data_pipeline_spark.plans.oracle_ctes import (  # noqa: E402
    _GRAMS8_CTE,
)

_TOK_CTE = """
toks AS (
  SELECT doc_id, source, token FROM (
    SELECT doc_id, source,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
    FROM documents)
  WHERE token != '')
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (broadcast-bitset scale path)
# ---------------------------------------------------------------------------

BLOOM_M = 16384   # bits in the filter (512 32-bit words)
BLOOM_K = 3       # hash probes per gram


def _bloom_pos(gram, i: int):
    """Probe i's bit position for a gram: first 8 hex chars of
    md5(i|gram) as a 32-bit integer, mod the filter width. Deterministic
    and engine-agnostic (the SimHash/shard-assign md5-prefix trick), so
    the oracle reproduces the exact bitset — false positives included."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), gram)), 1, 8), 16, 10)
        .cast("bigint") % BLOOM_M
    )


@register("doc_decontaminate_bloom", f"""
WITH {_GRAMS8_CTE},
bpos AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || gram), 1, 8)
              AS BIGINT) % {BLOOM_M} AS p
  FROM (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
       unnest(generate_series(0, {BLOOM_K - 1})) t(i)),
words AS (
  SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS mask
  FROM bpos GROUP BY 1),
cpos AS (
  SELECT doc_id, gram,
         CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || gram), 1, 8)
              AS BIGINT) % {BLOOM_M} AS p
  FROM grams, unnest(generate_series(0, {BLOOM_K - 1})) t(i)
  WHERE doc_id % 97 <> 0),
ghit AS (
  SELECT doc_id, gram,
         CASE WHEN SUM(CASE WHEN (mask >> CAST(p % 32 AS INTEGER)) & 1 = 1
                            THEN 1 ELSE 0 END) = {BLOOM_K}
              THEN 1 ELSE 0 END AS hit
  FROM cpos LEFT JOIN words ON w = p // 32
  GROUP BY 1, 2)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(hit) AS BIGINT) AS n_bloom_hits,
       CAST(CASE WHEN SUM(hit) > 0 THEN 1 ELSE 0 END AS INTEGER)
         AS contaminated
FROM ghit GROUP BY 1
""")
def q_doc_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination: the scale path of doc_decontaminate.
    The benchmark side (doc_id % 97 == 0) is folded into a 16384-bit
    Bloom bitset (3 md5-derived probes per 8-gram) packed as 64-bit
    words; the corpus side probes the bitset instead of joining the gram
    strings. Same flag semantics as the exact join up to Bloom false
    positives — and because the probe hashes are engine-agnostic md5
    prefixes, the oracle replays the exact bitset, so even the FP set is
    value-checked (tests pin no-false-negatives vs doc_decontaminate).

    Scale shape: the exact join ships the benchmark GRAM STRINGS to every
    probe task; here the broadcast is a constant-size bitset (2 KiB at
    m=16384, a few MiB at eval-suite scale with m sized for FP<1e-6) that
    never grows with gram length. The corpus side is one per-doc gram
    dedup shuffle, then a narrow ×k position explode and a broadcast
    equi-join on the word index — no corpus data moves. This is the same
    shape Spark's own runtime bloom-filter join pushes into scans
    (spark.sql.optimizer.runtime.bloomFilter.enabled), applied at the
    application level where the "build side" is a benchmark corpus."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", token_array(F.col("text")).alias("tok"))
    # benchmark docs are excluded BEFORE the dedup shuffle — their grams
    # would ride the exchange only to be filtered out afterwards (the
    # doc_id predicate also pushes below the tokenize projection to the
    # scan, so neither branch tokenizes the other's docs)
    grams = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.explode(ngram_array("tok", 8)).alias("gram"))
        .dropDuplicates(["doc_id", "gram"])
    )
    bench_pos = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(F.array_distinct(ngram_array("tok", 8))).alias("gram"))
        .distinct()
    )
    # build the bitset: k probe positions per gram -> 512 (word, mask) rows.
    # 32-bit words, never 64: a shift of exactly 63 wraps to Long.MIN in
    # the JVM but is a checked overflow error in DuckDB — capping the
    # shift at 31 keeps the packing on both engines' safe path
    probes = F.explode(
        F.array(*[_bloom_pos(F.col("gram"), i) for i in range(BLOOM_K)])
    ).alias("p")
    words = (
        bench_pos.select(probes)
        .distinct()
        .groupBy((F.col("p") / 32).cast("bigint").alias("w"))
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                    "CAST(p % 32 AS INT)))").alias("mask"))
    )
    cpos = grams.select(
        "doc_id", "gram", probes
    )
    ghit = (
        cpos.join(F.broadcast(words),
                  (F.col("p") / 32).cast("bigint") == F.col("w"), "left")
        .groupBy("doc_id", "gram")
        .agg(
            (F.sum(
                F.when(
                    F.expr("(mask >> CAST(p % 32 AS INT)) & 1") == 1, 1
                ).otherwise(0)
            ) == BLOOM_K).cast("int").alias("hit")
        )
    )
    return ghit.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("hit").cast("bigint").alias("n_bloom_hits"),
        (F.sum("hit") > 0).cast("int").alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Lexical diversity (token entropy + type/token ratio)
# ---------------------------------------------------------------------------

@register("doc_lexical_diversity", f"""
WITH {_TOK_CTE},
cnt AS (SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CAST(c * log2(CAST(c AS DOUBLE)) AS DECIMAL(38,18)))
              AS DOUBLE) AS clogc
  FROM cnt GROUP BY 1)
SELECT doc_id, n_tokens, n_types,
       ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
       ROUND(log2(CAST(n_tokens AS DOUBLE)) - clogc / n_tokens, 6)
         AS token_entropy_bits
FROM agg
""")
def q_doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality signals: per-doc Shannon entropy of the
    token distribution (H = log2 n − Σc·log2 c / n — one pass over token
    counts, no per-token probability row) and the type/token ratio.
    Low-entropy docs are template/boilerplate (the signal Gopher's
    repetition filters approximate); the entropy form keeps log2 in the
    final rounded projection only, the BM25 precedent for transcendentals
    in compared values.

    Scale shape: one (doc_id, token) count shuffle with map-side combine,
    then a per-doc re-aggregate on the same key prefix — the second agg
    reuses the first shuffle's partitioning, so the fact moves once.
    Tokens never leave their row as a list; the count stream carries
    16-byte-ish tokens, not documents."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    cnt = (
        docs.select("doc_id", F.explode(token_array(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        # per-row decimal cast -> exact, order-free accumulation (the
        # dsum tactic): a raw double sum's last ulp depends on reduction
        # order and can flip the 6-digit round on one engine only
        F.sum((F.col("c") * F.log2(F.col("c").cast("double")))
              .cast("decimal(38,18)")).cast("double").alias("clogc"),
    )
    return agg.select(
        "doc_id", "n_tokens", "n_types",
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6)
        .alias("type_token_ratio"),
        F.round(
            F.log2(F.col("n_tokens").cast("double"))
            - F.col("clogc") / F.col("n_tokens"), 6
        ).alias("token_entropy_bits"),
    )


# ---------------------------------------------------------------------------
# Per-source KL-divergence corpus drift
# ---------------------------------------------------------------------------

@register("corpus_kl_drift", f"""
WITH {_TOK_CTE},
sc AS (SELECT source, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
gl AS (SELECT token, CAST(SUM(c) AS BIGINT) AS g FROM sc GROUP BY 1),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sc GROUP BY 1),
big AS (SELECT CAST(SUM(c) AS BIGINT) AS big_n FROM sc)
SELECT s.source,
       t.n AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(CAST(SUM(CAST((CAST(s.c AS DOUBLE) / t.n)
                           * log2((CAST(s.c AS DOUBLE) / t.n)
                                  / (CAST(g.g AS DOUBLE) / b.big_n))
                           AS DECIMAL(38,18))) AS DOUBLE), 6) AS kl_bits
FROM sc s
JOIN gl g USING (token)
JOIN tot t USING (source)
CROSS JOIN big b
GROUP BY s.source, t.n
""")
def q_corpus_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-drift profiling: KL(source ‖ corpus) over token unigram
    distributions, per source — the statistic a data-mixture rebalancer
    watches to catch one feed drifting away from the blend (and the
    direction of doc_mixture_rebalance's correction). Every source token
    also appears in the global distribution, so q > 0 and the sum is
    total; log2 stays in the final rounded projection.

    Scale shape: one (source, token) count shuffle (map-side combined);
    the global token marginal re-aggregates that small count stream
    co-keyed on token, so the token-join is a shuffle of counts — never
    raw tokens; per-source totals and the grand total are a handful of
    rows broadcast onto the stream. Sources are few -> the final agg is
    tiny; skew in one giant source stays in the count domain."""
    from traffic_data_pipeline_spark.functions.execution import materialize

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # four consumers (global marginal, per-source totals, grand total, the
    # final join) read the count stream: materialize it once
    sc = materialize(
        docs.select("source", F.explode(token_array(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gl = sc.groupBy("token").agg(F.sum("c").cast("bigint").alias("g"))
    tot = sc.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    big = sc.agg(F.sum("c").cast("bigint").alias("big_n"))
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("g").cast("double") / F.col("big_n")
    return (
        sc.join(gl, "token")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(big))
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            # per-row decimal cast: order-free sum (see clogc above)
            F.round(F.sum((p * F.log2(p / q)).cast("decimal(38,18)"))
                    .cast("double"), 6).alias("kl_bits"),
        )
        .select(F.col("source"), F.col("n").alias("n_tokens"),
                "n_types", "kl_bits")
    )


# ---------------------------------------------------------------------------
# Time-weighted linear interpolation of sensor gaps
# ---------------------------------------------------------------------------

@register("sensor_interpolate", """
WITH base AS (
  SELECT CAST(user_id AS VARCHAR) AS sensor, ts AS start_datetime,
         MAX(CASE WHEN event_type = 'error' THEN NULL
                  ELSE CAST(FLOOR(value) % 25 AS INTEGER) END) AS volume
  FROM events GROUP BY 1, 2),
marked AS (
  SELECT sensor, start_datetime, volume,
         COUNT(volume) OVER (PARTITION BY sensor ORDER BY start_datetime
                             ROWS UNBOUNDED PRECEDING) AS g_prev,
         COUNT(volume) OVER (PARTITION BY sensor ORDER BY start_datetime DESC
                             ROWS UNBOUNDED PRECEDING) AS g_next
  FROM base),
prev AS (
  SELECT sensor, g_prev,
         MAX(CASE WHEN volume IS NOT NULL THEN start_datetime END) AS t0,
         MAX(CASE WHEN volume IS NOT NULL THEN volume END) AS v0
  FROM marked GROUP BY 1, 2),
nxt AS (
  SELECT sensor, g_next,
         MAX(CASE WHEN volume IS NOT NULL THEN start_datetime END) AS t1,
         MAX(CASE WHEN volume IS NOT NULL THEN volume END) AS v1
  FROM marked GROUP BY 1, 2)
SELECT m.sensor, m.start_datetime,
       m.volume AS volume_raw,
       ROUND(CASE
         WHEN m.volume IS NOT NULL THEN CAST(m.volume AS DOUBLE)
         WHEN p.t0 IS NOT NULL AND n.t1 IS NOT NULL THEN
           v0 + (v1 - v0)
                * CAST(epoch_us(m.start_datetime) - epoch_us(p.t0) AS DOUBLE)
                / CAST(epoch_us(n.t1) - epoch_us(p.t0) AS DOUBLE)
       END, 6) AS volume_filled,
       CAST(CASE WHEN m.volume IS NULL AND p.t0 IS NOT NULL
                  AND n.t1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
         AS interpolated
FROM marked m
JOIN prev p USING (sensor, g_prev)
JOIN nxt n USING (sensor, g_next)
""")
def q_sensor_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation of missing detector volumes —
    the gap-fill mode the reference's scaling imputation (F13,
    operators/impute.py) doesn't cover: each NULL reading takes the value
    on the straight line between its nearest non-NULL neighbors in time
    within the same sensor, leading/trailing gaps stay NULL. Readings are
    first collapsed to one row per (sensor, ts) so neighbor order is
    total and engine-independent.

    Scale shape: ONE hash shuffle on sensor, then two sorted window
    passes over the same partitioning (forward and reverse cumulative
    non-NULL counts + last-non-NULL carries — the gaps-and-islands
    rewrite of IGNORE NULLS, which Spark evaluates as `last(col, TRUE)`
    without re-shuffling). No self-join on time ranges, no per-gap
    explode; cost is two in-partition sorts regardless of gap length."""
    ev = load_table(spark, sf_dir, "events")
    base = (
        ev.groupBy(
            F.col("user_id").cast("string").alias("sensor"),
            F.col("ts").alias("start_datetime"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "error", F.lit(None))
                .otherwise((F.floor("value") % 25).cast("int"))
            ).alias("volume")
        )
    )
    return linear_interpolate(base)


def linear_interpolate(base: DataFrame) -> DataFrame:
    """Core of sensor_interpolate over a (sensor, start_datetime, volume)
    frame with one row per (sensor, ts) — exposed separately so property
    tests can drive it with synthetic series."""
    fwd = (
        Window.partitionBy("sensor").orderBy("start_datetime")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy("sensor").orderBy(F.col("start_datetime").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = base.select(
        "sensor", "start_datetime", F.col("volume").alias("volume_raw"),
        F.last("volume", ignorenulls=True).over(fwd).alias("v0"),
        F.last(F.when(F.col("volume").isNotNull(), F.col("start_datetime")),
               ignorenulls=True).over(fwd).alias("t0"),
        F.last("volume", ignorenulls=True).over(bwd).alias("v1"),
        F.last(F.when(F.col("volume").isNotNull(), F.col("start_datetime")),
               ignorenulls=True).over(bwd).alias("t1"),
    )
    # timestamps carry microseconds: unix_micros <-> epoch_us keeps the
    # interpolation weights integer-exact in BOTH engines (unix_timestamp/
    # epoch would truncate vs keep the fraction and diverge)
    ep = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    return carried.select(
        "sensor", "start_datetime", "volume_raw",
        F.round(
            F.when(F.col("volume_raw").isNotNull(),
                   F.col("volume_raw").cast("double"))
            .when(
                F.col("t0").isNotNull() & F.col("t1").isNotNull(),
                F.col("v0")
                + (F.col("v1") - F.col("v0"))
                * (ep("start_datetime") - ep("t0")).cast("double")
                / (ep("t1") - ep("t0")).cast("double"),
            ), 6
        ).alias("volume_filled"),
        (
            F.col("volume_raw").isNull()
            & F.col("t0").isNotNull() & F.col("t1").isNotNull()
        ).cast("int").alias("interpolated"),
    )


# ---------------------------------------------------------------------------
# MAD-based robust anomaly detection
# ---------------------------------------------------------------------------

@register("events_mad_anomaly", """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1),
mad AS (
  SELECT e.event_type, m.med,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY 1, 2)
SELECT e.event_id, e.event_type, e.value,
       ROUND(m.med, 6) AS med,
       ROUND(m.mad, 6) AS mad,
       ROUND((e.value - m.med) / (1.4826 * m.mad), 6) AS robust_z
FROM events e JOIN mad m USING (event_type)
WHERE m.mad > 0 AND abs(e.value - m.med) > 3.5 * 1.4826 * m.mad
""")
def q_events_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: flag events whose value sits more than
    3.5 robust standard deviations (MAD · 1.4826) from the per-type
    median — the estimator that doesn't move when the outliers themselves
    inflate the variance, unlike events_zscore_anomaly's mean/stddev.
    Exact medians via the shared-state percentile aggregate; both engines
    interpolate order statistics identically, and the z-ratio is a single
    rounded double projection.

    Scale shape: two grouped exact-percentile passes (median, then median
    absolute deviation) produce a per-type frame of a few rows that
    broadcasts back onto the fact — the fact itself never shuffles, it is
    scanned twice and filtered on a broadcast predicate. At 100 TB the
    two exact percentiles swap to percentile_approx one-pass sketches
    (the corridor_p85_speed_approx precedent), same join shape."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5D)").alias("mad"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("value") - F.col("med"))
               > 3.5 * 1.4826 * F.col("mad"))
        )
        .select(
            "event_id", "event_type", "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.round((F.col("value") - F.col("med"))
                    / (1.4826 * F.col("mad")), 6).alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# Sweep-line session concurrency
# ---------------------------------------------------------------------------

@register("events_concurrency", """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
               OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid,
         ts
  FROM ordered),
spans AS (
  SELECT MIN(ts) AS s_start, MAX(ts) + INTERVAL 30 MINUTE AS s_end
  FROM sess GROUP BY user_id, sid),
hourly AS (
  SELECT unnest(generate_series(date_trunc('hour', s_start),
                                date_trunc('hour', s_end),
                                INTERVAL 1 HOUR)) AS hour,
         s_start, s_end
  FROM spans),
deltas AS (
  SELECT hour, greatest(s_start, hour) AS t, 1 AS delta
  FROM hourly WHERE hour < s_end
  UNION ALL
  SELECT hour, least(s_end, hour + INTERVAL 1 HOUR) AS t, -1 AS delta
  FROM hourly WHERE hour < s_end),
running AS (
  SELECT hour, delta,
         SUM(delta) OVER (PARTITION BY hour ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas)
SELECT hour,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       CAST(MAX(conc) AS INTEGER) AS peak_concurrency
FROM running GROUP BY 1
""")
def q_events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour — the capacity-planning statistic
    (how many users are on AT ONCE, not how many events) — by sweep line:
    each 30-min-gap session (the events_sessionize frame) emits +1 at its
    start and −1 at its end, a running sum inside each hour gives the
    instantaneous concurrency, and the hour keeps its max. Sessions
    spanning hours are exploded onto the hour spine first with their
    endpoints clamped, so every hour's sweep is self-contained: ends sort
    before starts at the same instant (delta ascending), making
    back-to-back sessions non-concurrent; the running max is invariant
    to any remaining tie order.

    Scale shape: the global ORDER BY that makes naive sweep lines
    single-partition is gone — clamping to the hour spine turns it into a
    per-hour partitioned window, so the sort parallelism is the number of
    hours × AQE coalescing, and no interval self-join (the
    windows-over-union move from the as-of join) appears anywhere."""
    return session_concurrency(load_table(spark, sf_dir, "events"))


def session_concurrency(ev: DataFrame) -> DataFrame:
    """Core of events_concurrency over any frame with (user_id, ts) —
    exposed separately so property tests can drive it with synthetic
    session patterns."""
    from traffic_data_pipeline_spark.operators.sessionize import session_spans

    spans = session_spans(ev).select("s_start", "s_end")
    hourly = spans.select(
        F.explode(
            F.sequence(
                F.date_trunc("hour", "s_start"),
                F.date_trunc("hour", "s_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
        "s_start", "s_end",
    ).filter(F.col("hour") < F.col("s_end"))
    deltas = hourly.select(
        "hour",
        F.explode(
            F.array(
                F.struct(
                    F.greatest("s_start", "hour").alias("t"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    F.least(
                        F.col("s_end"),
                        F.col("hour") + F.expr("INTERVAL 1 HOUR"),
                    ).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e"),
    ).select("hour", F.col("e.t").alias("t"), F.col("e.delta").alias("delta"))
    sweep = (
        Window.partitionBy("hour").orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        deltas.withColumn("conc", F.sum("delta").over(sweep))
        .groupBy("hour")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint").alias("n_sessions"),
            F.max("conc").cast("int").alias("peak_concurrency"),
        )
    )


# ---------------------------------------------------------------------------
# Degree-ordered triangle counting over the LSH duplicate graph
# ---------------------------------------------------------------------------

@register("dedup_cluster_density", None)  # oracle attached below (needs CTEs)
def q_dedup_cluster_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering structure of the near-duplicate graph: triangle count,
    wedge count, and global transitivity over the LSH candidate pairs
    (est_sim ≥ 0.5) — high transitivity means the duplicate relation is
    clique-like (template families, safe to collapse to one canonical);
    low means chains of borderline pairs where a single canonical would
    over-merge. Consumes the session-cached pair stream the whole dedup
    family shares (plans/extensions.doc_lsh_pairs).

    Scale shape: the textbook wedge explosion (a k-clique contributes
    O(k³) wedges through its hottest vertex) is bounded by DEGREE
    ORDERING — every edge is oriented from its (degree, id)-smaller to
    its larger endpoint, wedges form only at the smaller endpoint, so a
    star's hub never centers a wedge and per-vertex work is O(min-deg²).
    Orientation needs one count shuffle for degrees + a broadcast of the
    degree table onto the edge stream; the wedge join and the closing
    edge semi-join are co-keyed equi-joins. Wedge totals come from the
    degree frame arithmetically (Σ d(d−1)/2), not from materializing
    wedges twice."""
    from traffic_data_pipeline_spark.functions.execution import materialize
    from traffic_data_pipeline_spark.plans.extensions import doc_lsh_pairs

    pairs = doc_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    deg = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionAll(pairs.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient each edge low->high by (degree, id); both endpoints' degrees
    # arrive via broadcast (the dedup graph's vertex set is tiny next to
    # the corpus; at 100 TB this becomes a co-keyed join, same plan).
    # The oriented list feeds BOTH sides of the wedge join: materialize
    # it, or each side replays the degree aggregate + two joins
    e = materialize(
        pairs.join(F.broadcast(deg.withColumnRenamed("v", "doc_a")
                               .withColumnRenamed("d", "da")), "doc_a")
        .join(F.broadcast(deg.withColumnRenamed("v", "doc_b")
                          .withColumnRenamed("d", "db")), "doc_b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db"))
                   & (F.col("doc_a") < F.col("doc_b"))),
                F.struct(F.col("doc_a").alias("lo"), F.col("doc_b").alias("hi")),
            ).otherwise(
                F.struct(F.col("doc_b").alias("lo"), F.col("doc_a").alias("hi"))
            ).alias("o")
        )
        .select("o.lo", "o.hi")
    )
    # edge-list-sized build side -> broadcast keeps wedge enumeration
    # shuffle-free; past broadcast range it degrades to a co-keyed
    # sort-merge self-join on lo (same plan, Spark flips on stats)
    wedges = (
        e.alias("x")
        .join(F.broadcast(e.alias("y")),
              (F.col("x.lo") == F.col("y.lo")) & (F.col("x.hi") < F.col("y.hi")))
        .select(F.col("x.hi").alias("a"), F.col("y.hi").alias("b"))
    )
    # wedge endpoints already sorted (a < b by doc id) and the pair stream
    # is canonical doc_a < doc_b, so closing is ONE equi semi-join — an OR
    # of both orientations would fall off the hash-join path entirely
    closed = wedges.join(
        pairs,
        (F.col("a") == F.col("doc_a")) & (F.col("b") == F.col("doc_b")),
        "left_semi",
    )
    tri = closed.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        # integer `div`, not `/`: Spark's / on bigints goes through
        # double, which drops low bits past 2^53 — the oracle's exact
        # // 2 would diverge exactly at the corpus scale this is for
        F.expr("sum(d * (d - 1)) div 2").cast("bigint").alias("n_wedges"),
    )
    edges = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6),
            ).alias("transitivity"),
        )
    )


def _cluster_density_oracle() -> str:
    from traffic_data_pipeline_spark.plans.oracle_ctes import _MINHASH_CTES

    return f"""
WITH {_MINHASH_CTES},
apairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(a.h0 = b.h0 AS INTEGER) + CAST(a.h1 = b.h1 AS INTEGER) +
         CAST(a.h2 = b.h2 AS INTEGER) + CAST(a.h3 = b.h3 AS INTEGER) +
         CAST(a.h4 = b.h4 AS INTEGER) + CAST(a.h5 = b.h5 AS INTEGER) +
         CAST(a.h6 = b.h6 AS INTEGER) + CAST(a.h7 = b.h7 AS INTEGER) AS agree
  FROM band_long a JOIN band_long b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
edges AS (SELECT doc_a, doc_b FROM apairs WHERE agree / 8.0 >= 0.5),
und AS (
  SELECT doc_a AS v FROM edges UNION ALL SELECT doc_b FROM edges),
deg AS (SELECT v, COUNT(*) AS d FROM und GROUP BY 1),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.doc_a = e1.doc_b
  JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges
  FROM deg),
ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
SELECT st.n_nodes, ec.n_edges, st.n_wedges,
       CAST(tri.n_triangles AS BIGINT) AS n_triangles,
       CASE WHEN st.n_wedges > 0 THEN
         ROUND(3.0 * tri.n_triangles / st.n_wedges, 6)
       END AS transitivity
FROM st CROSS JOIN ec CROSS JOIN tri
"""


# ---------------------------------------------------------------------------
# Decision-support join shapes (small-quantity revenue, idle-rich anti-join)
# ---------------------------------------------------------------------------

@register("brand_small_qty_revenue", """
WITH pq AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6))
           AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n_li
  FROM lineitem GROUP BY 1)
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS small_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE CAST(l.l_quantity AS DECIMAL(18,6)) * pq.n_li * 2 < pq.sum_qty
GROUP BY 1
""")
def q_brand_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue per brand (the TPC-H Q17 shape): revenue
    from line items ordering less than half their part's average
    quantity. The correlated AVG subquery is decorrelated into one
    per-part aggregate joined back, and the threshold is the RATIONAL
    comparison 2·q·n < Σq in exact decimals — never q < Σ/n, whose
    double-division boundary can disagree across engines for rows
    sitting exactly on the average.

    Scale shape: the per-part aggregate is a map-side-combined shuffle of
    (partkey, qty) pairs co-keyed with the fact join that follows, so
    AQE plans agg+join on one exchange; the part dimension broadcasts.
    The fact is scanned once, projected to 4 columns (ReadSchema-pruned),
    and only survivors reach the final brand aggregate (tiny)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pq = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("decimal(38,6)").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        li.join(pq, "l_partkey")
        .filter(
            F.col("l_quantity").cast("decimal(18,6)") * F.col("n_li") * 2
            < F.col("sum_qty")
        )
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double").alias("small_revenue"),
        )
    )


LAPSE_CUTOFF = "2001-01-01"  # orders end 2001-08-01: ~7 idle months


@register("idle_rich_customers", f"""
WITH bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6))
           AS sum_bal,
         CAST(COUNT(*) AS BIGINT) AS n_pos
  FROM customer WHERE c_acctbal > 0)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
FROM customer c CROSS JOIN bal
WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * bal.n_pos > bal.sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '{LAPSE_CUTOFF}')
GROUP BY 1
""")
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle rich customers per market segment (the TPC-H Q22 shape):
    customers whose balance beats the average positive balance but who
    have placed no order since the cutoff — the lapsed-high-value cohort
    a win-back campaign targets. The scalar AVG threshold is again the
    rational form bal·n > Σ in exact decimals; the 'no recent order'
    predicate is a null-safe ANTI join, not NOT IN (whose three-valued
    NULL semantics silently empty the result if a custkey is NULL).

    Scale shape: the global (Σ, n) pair is a one-row broadcast
    cross-join onto the customer scan (the sanctioned broadcast-scalar
    pattern); the anti join ships only recent o_custkey — the date
    predicate pushes into the orders scan, so at this dimension ratio
    Spark broadcasts the filtered customer side, and at 100 TB AQE flips
    it to a shuffle anti join on the same plan."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("decimal(38,6)").alias("sum_bal"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    return (
        cust.crossJoin(F.broadcast(bal))
        .filter(
            F.col("c_acctbal").cast("decimal(18,6)") * F.col("n_pos")
            > F.col("sum_bal")
        )
        .join(
            orders.filter(F.col("o_orderdate") >= F.lit(LAPSE_CUTOFF).cast("date"))
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey", "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source duplicate-rate matrix
# ---------------------------------------------------------------------------

@register("source_overlap_matrix", None)  # oracle attached below (needs CTEs)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which feeds copy each other: the near-duplicate pair stream
    aggregated into an unordered source×source matrix (n_pairs + mean
    estimated similarity). A heavy off-diagonal cell means two ingest
    feeds overlap (mirror sites, syndication) and one of them should be
    dropped before dedup spends compute rediscovering it pair by pair;
    the diagonal is each feed's internal redundancy.

    Scale shape: consumes the session-cached LSH pair stream (the
    family's shared artifact — nothing here re-shingles); the
    (doc_id → source) lookup is a two-column projection joined twice,
    broadcast at fixture scale and a co-keyed shuffle join at corpus
    scale (same plan, Spark flips the strategy on size stats). est_sim
    values are multiples of 1/8, so the double sum is EXACT regardless
    of reduction order — the mean needs no decimal detour."""
    from traffic_data_pipeline_spark.plans.extensions import doc_lsh_pairs

    pairs = doc_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b", "est_sim")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    tagged = (
        pairs.join(F.broadcast(src.withColumnRenamed("doc_id", "doc_a")
                               .withColumnRenamed("source", "src_a")), "doc_a")
        .join(F.broadcast(src.withColumnRenamed("doc_id", "doc_b")
                          .withColumnRenamed("source", "src_b")), "doc_b")
    )
    return (
        tagged.select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
            "est_sim",
        )
        .groupBy("source_lo", "source_hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.sum("est_sim") / F.count(F.lit(1)), 6)
            .alias("mean_est_sim"),
        )
    )


def _source_overlap_oracle() -> str:
    from traffic_data_pipeline_spark.plans.oracle_ctes import _MINHASH_CTES

    return f"""
WITH {_MINHASH_CTES},
opairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         (CAST(a.h0 = b.h0 AS INTEGER) + CAST(a.h1 = b.h1 AS INTEGER) +
          CAST(a.h2 = b.h2 AS INTEGER) + CAST(a.h3 = b.h3 AS INTEGER) +
          CAST(a.h4 = b.h4 AS INTEGER) + CAST(a.h5 = b.h5 AS INTEGER) +
          CAST(a.h6 = b.h6 AS INTEGER) + CAST(a.h7 = b.h7 AS INTEGER)) / 8.0
           AS est_sim
  FROM band_long a JOIN band_long b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
kept AS (SELECT * FROM opairs WHERE est_sim >= 0.5),
tagged AS (
  SELECT least(da.source, db.source) AS source_lo,
         greatest(da.source, db.source) AS source_hi,
         k.est_sim
  FROM kept k
  JOIN documents da ON da.doc_id = k.doc_a
  JOIN documents db ON db.doc_id = k.doc_b)
SELECT source_lo, source_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(est_sim) / COUNT(*), 6) AS mean_est_sim
FROM tagged GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Streaming sessionization (session_window + watermark, append mode)
# ---------------------------------------------------------------------------

_SESS_SRC_CACHE: dict[str, str] = {}
FLUSH_USER = -999999  # sentinel advancing the watermark past every session


def _session_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events landing zone with one far-future flush event appended, so an
    availableNow run's watermark passes every real session's end and
    append mode emits ALL of them (the FLUSH_SENSOR pattern from
    queries.stream_source_dir). Built once per sf_dir per process."""
    from traffic_data_pipeline_spark.functions.tmpdirs import scratch_dir

    if not cached_dir_valid(_SESS_SRC_CACHE, sf_dir):
        src = scratch_dir(prefix="tdp_sess_events_")
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "value")
        # two writes, sentinel LAST: the file source consumes files in
        # modification-time order, so a rate-limited / multi-batch read
        # must see every real event before the watermark-advancing flush
        # row — a same-job write could land the flush in an early part
        # file and silently drop later events as late (exactly the
        # stream_source_dir rule this mirrors)
        ev.write.mode("overwrite").parquet(src)
        (ev.agg(F.max("ts").alias("m"))
         .select(
             F.lit(FLUSH_USER).cast("long").alias("user_id"),
             (F.col("m") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
             F.lit(0.0).alias("value"),
         )
         .write.mode("append").parquet(src))
        _SESS_SRC_CACHE[sf_dir] = src
    return _SESS_SRC_CACHE[sf_dir]


@register("streaming_sessionize", """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
               OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid
""")
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T4 streaming face of events_sessionize: session_window on a
    watermarked stream in APPEND mode — the stateful-merging window
    (sessions have no fixed boundaries; late events can MERGE two open
    sessions into one, which is why this needs the session-state store,
    not tumbling-window state). A session only finalizes when the
    watermark passes its close; the landing zone's far-future flush
    event advances it past every real session, so the availableNow run
    emits exactly the batch answer and the batch oracle hash-checks it
    — streaming==batch equivalence, same gate as streaming_15min_agg.

    Scale shape: state is one open session per active user inside the
    watermark horizon (bounded by activity, not history); emission is
    append-only to a distributed sink; shuffle width pinned while the
    checkpoint exists (a checkpointed stream's state width is forever).
    """
    from traffic_data_pipeline_spark.functions.tmpdirs import scratch_dir
    from traffic_data_pipeline_spark.plans.queries import fmt_ts

    src = _session_events_dir(spark, sf_dir)
    sink = scratch_dir(prefix="tdp_sess_sink_")
    ckpt = scratch_dir(prefix="tdp_sess_ckpt_")
    stream = (
        spark.readStream
        .schema("user_id long, ts timestamp, value double")
        .parquet(src)
    )
    from traffic_data_pipeline_spark.operators.sessionize import session_spans

    agg = session_spans(
        stream.withWatermark("ts", "1 hour"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
    )
    from traffic_data_pipeline_spark.plans.queries import run_available_now

    # state width: one open session per active user
    run_available_now(spark, "streaming_sessionize",
                      agg=agg, sink=sink, ckpt=ckpt)
    return spark.read.parquet(sink).filter(F.col("user_id") != FLUSH_USER).select(
        "user_id",
        fmt_ts(F.col("s_start")).alias("session_start"),
        fmt_ts(F.col("s_end")).alias("session_end"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Market-basket pair lift (collocations on the order fact)
# ---------------------------------------------------------------------------

BASKET_MIN_COUNT = 2
BASKET_K = 10


@register("basket_part_pairs", f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
c1 AS (SELECT l_partkey, COUNT(*) AS n1 FROM items GROUP BY 1),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS t FROM items),
c2 AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n2
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
scored AS (
  SELECT c2.part_a, c2.part_b, c2.n2,
         CAST(c2.n2 * t.t AS DOUBLE) / CAST(ca.n1 * cb.n1 AS DOUBLE) AS lift
  FROM c2
  JOIN c1 ca ON ca.l_partkey = c2.part_a
  JOIN c1 cb ON cb.l_partkey = c2.part_b
  CROSS JOIN tot t
  WHERE c2.n2 >= {BASKET_MIN_COUNT})
SELECT part_a, part_b, CAST(n2 AS BIGINT) AS n_orders_both,
       CAST(rk AS INTEGER) AS rk, ROUND(lift, 6) AS lift
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, part_a, part_b) AS rk
      FROM scored)
WHERE rk <= {BASKET_K}
""")
def q_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining: the top-k part pairs by LIFT
    P(ab)/(P(a)P(b)) = n2·T/(n1(a)·n1(b)) over orders containing both —
    doc_collocations' exact-rational scoring applied to the transaction
    fact (one double division of integer counts, so both engines score
    and rank identically; DECIMAL(38,0) products past 2^53).

    Scale shape: the within-order self-join is co-keyed on l_orderkey
    and its fan-out is C(basket,2) — bounded by basket SIZE (single
    digits), not corpus size, which is what makes apriori-style pair
    counting tractable where a part×part join never would be. Item→
    order dedup and the pair count are map-side-combined shuffles; part
    supports are a vocabulary-sized broadcast; T is a one-row scalar;
    top-k is TakeOrderedAndProject over the min-support survivors."""
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.select("l_orderkey", "l_partkey").distinct()
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
    )
    from traffic_data_pipeline_spark.functions.execution import materialize

    items = materialize(items)  # three consumers: both join sides + c1/T
    c1 = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n1"))
    tot = items.agg(F.countDistinct("l_orderkey").alias("t"))
    a = items.select(F.col("l_orderkey").alias("o"),
                     F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("o"),
                     F.col("l_partkey").alias("part_b"))
    c2 = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n2"))
        .filter(F.col("n2") >= BASKET_MIN_COUNT)
    )
    scored = (
        c2.join(F.broadcast(c1.select(F.col("l_partkey").alias("part_a"),
                                      F.col("n1").alias("_n1a"))), "part_a")
        .join(F.broadcast(c1.select(F.col("l_partkey").alias("part_b"),
                                    F.col("n1").alias("_n1b"))), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a", "part_b", "n2",
            ((F.col("n2") * F.col("t")).cast("double")
             / (F.col("_n1a") * F.col("_n1b")).cast("double")).alias("lift"),
        )
    )
    wk = Window.orderBy(F.col("lift").desc(), "part_a", "part_b")
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= BASKET_K)
        .select("part_a", "part_b", F.col("n2").alias("n_orders_both"),
                F.col("rk").cast("int").alias("rk"),
                F.round("lift", 6).alias("lift"))
    )


# ---------------------------------------------------------------------------
# Chi-square distinctive keywords per source
# ---------------------------------------------------------------------------

CHI2_MIN_DF = 5
CHI2_K = 5


@register("source_keywords_chi2", f"""
WITH dt AS (
  SELECT DISTINCT d.doc_id, d.source, t.token
  FROM documents d,
       unnest(list_filter(string_split_regex(lower(d.text), '[^a-z0-9]+'),
                          x -> x != '')) t(token)),
df_st AS (SELECT source, token, COUNT(*) AS a FROM dt GROUP BY 1, 2),
df_t AS (SELECT token, CAST(SUM(a) AS BIGINT) AS dft FROM df_st GROUP BY 1),
ns AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
big AS (SELECT COUNT(*) AS n FROM documents),
pre AS (
  SELECT s.source, s.token, s.a, t.dft, ns.n_s, b.n,
         s.a * (b.n - ns.n_s - t.dft + s.a)
           - (ns.n_s - s.a) * (t.dft - s.a) AS adbc
  FROM df_st s
  JOIN df_t t USING (token)
  JOIN ns USING (source)
  CROSS JOIN big b
  WHERE t.dft >= {CHI2_MIN_DF} AND t.dft < b.n
    AND s.a * b.n > t.dft * ns.n_s),
scored AS (
  SELECT source, token, a, dft,
         CAST(n * adbc * adbc AS DOUBLE)
           / CAST(n_s * (n - n_s) * dft * (n - dft) AS DOUBLE) AS chi2
  FROM pre)
SELECT source, token,
       CAST(a AS BIGINT) AS df_in_source,
       dft AS df_total,
       CAST(rk AS INTEGER) AS rk,
       ROUND(chi2, 6) AS chi2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY chi2 DESC, token) AS rk
      FROM scored)
WHERE rk <= {CHI2_K}
""")
def q_source_keywords_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per feed: for each source, the top-k tokens
    most over-represented by the chi-square statistic on the 2×2
    document-frequency table (χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d))) —
    the feature-selection view of the corpus that tells you WHAT a feed
    is about (and catches boilerplate: a navigation token chi²-bound to
    one source). Numerator and denominator are exact integer products
    with ONE double division at the end, so both engines score and rank
    identically; at corpus scale the products move to DECIMAL(38,0)
    (N⁴ passes 2^63 near N≈55k docs).

    Scale shape: the (doc, token) presence dedup is the only corpus-
    sized shuffle; per-(source, token) and per-token document
    frequencies are map-side-combined count streams joined co-keyed on
    token; source sizes and the grand total broadcast as a handful of
    rows. The rank window partitions by source over the min-df surviving
    vocabulary — never over documents."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    from traffic_data_pipeline_spark.functions.execution import materialize

    dt = (
        docs.select("doc_id", "source",
                    F.explode(token_array(F.col("text"))).alias("token"))
        # source IS part of the presence key: the oracle dedups DISTINCT
        # (doc_id, source, token), and a doc_id duplicated under two
        # sources (dirty ingest) must count once per source in both
        # engines — keying on (doc_id, token) alone would keep one
        # nondeterministic winner
        .dropDuplicates(["doc_id", "source", "token"])
    )
    # the per-(source, token) count stream feeds the token marginal AND
    # the probe side of its own join: materialize it, or the corpus
    # presence-dedup replays once per consumer (measured 9 exchanges -> 4)
    df_st = materialize(
        dt.groupBy("source", "token").agg(F.count(F.lit(1)).alias("a")))
    df_t = df_st.groupBy("token").agg(F.sum("a").cast("bigint").alias("dft"))
    ns = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    big = docs.agg(F.count(F.lit(1)).alias("n"))
    ad_bc = (
        F.col("a") * (F.col("n") - F.col("n_s") - F.col("dft") + F.col("a"))
        - (F.col("n_s") - F.col("a")) * (F.col("dft") - F.col("a"))
    )
    scored = (
        df_st.join(df_t, "token")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(big))
        .filter(
            (F.col("dft") >= CHI2_MIN_DF) & (F.col("dft") < F.col("n"))
            & (F.col("a") * F.col("n") > F.col("dft") * F.col("n_s"))
        )
        .select(
            "source", "token", "a", "dft",
            ((F.col("n") * ad_bc * ad_bc).cast("double")
             / (F.col("n_s") * (F.col("n") - F.col("n_s"))
                * F.col("dft") * (F.col("n") - F.col("dft"))).cast("double"))
            .alias("chi2"),
        )
    )
    wk = Window.partitionBy("source").orderBy(F.col("chi2").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= CHI2_K)
        .select("source", "token",
                F.col("a").cast("bigint").alias("df_in_source"),
                F.col("dft").alias("df_total"),
                F.col("rk").cast("int").alias("rk"),
                F.round("chi2", 6).alias("chi2"))
    )


# ---------------------------------------------------------------------------
# Label-centroid cosine similarity (embeddings)
# ---------------------------------------------------------------------------

@register("label_centroid_similarity", """
WITH e AS (
  SELECT label, g AS pos,
         CAST(CAST(embedding[g] AS DOUBLE) AS DECIMAL(18,6)) AS v
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) t(g)),
cs AS (
  SELECT label, pos, CAST(SUM(v) AS DECIMAL(18,6)) AS s
  FROM e GROUP BY 1, 2),
nrm AS (
  SELECT label, SUM(CAST(s * s AS DECIMAL(38,12))) AS n2
  FROM cs GROUP BY 1),
cnt AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         SUM(CAST(a.s * b.s AS DECIMAL(38,12))) AS dot
  FROM cs a JOIN cs b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2)
SELECT d.label_a, d.label_b, na.n AS n_a, nb.n AS n_b,
       ROUND(CAST(d.dot AS DOUBLE)
             / sqrt(CAST(x.n2 AS DOUBLE) * CAST(y.n2 AS DOUBLE)), 6)
         AS centroid_cosine
FROM dots d
JOIN nrm x ON x.label = d.label_a
JOIN nrm y ON y.label = d.label_b
JOIN cnt na ON na.label = d.label_a
JOIN cnt nb ON nb.label = d.label_b
WHERE x.n2 > 0 AND y.n2 > 0
""")
def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-level semantic geometry: pairwise cosine between per-label
    embedding CENTROIDS — the collapse detector (two labels whose
    centroids read >0.95 are one concept wearing two names; near-zero
    off-diagonals mean the label space is healthy). Cosine is invariant
    to scaling, so the centroid mean is never divided: cos(Σa/n_a, Σb/n_b)
    = cos(Σa, Σb), and every product stays an EXACT decimal (component
    sums are order-free decimal(18,6), pairwise products decimal(38,12))
    with one double division + sqrt in the final rounded projection —
    no cross-engine decimal-division rounding to disagree on. (Float
    components must widen to DOUBLE before the decimal cast on BOTH
    engines: DuckDB's direct FLOAT→DECIMAL scales in float precision
    and drifts a ulp — the same gotcha the similarity oracles pin with
    CAST(embedding[i] AS DOUBLE).)

    Scale shape: the only corpus-sized op is the (label, dim) component
    sum — a posexplode fan-out of dims that aggregates map-side
    (|labels|·|dims| output rows); everything after runs on the
    centroid matrix, which is broadcast-tiny at any corpus size. This
    is the same reduction a distributed k-means E-step uses."""
    emb = load_table(spark, sf_dir, "embeddings")
    cs = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.sum(F.col("v").cast("double").cast("decimal(18,6)"))
             .cast("decimal(18,6)").alias("s"))
    )
    from traffic_data_pipeline_spark.functions.execution import materialize

    cs = materialize(cs)  # feeds norms + both dot sides
    nrm = cs.groupBy("label").agg(
        F.sum((F.col("s") * F.col("s")).cast("decimal(38,12)")).alias("n2"))
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = cs.select(F.col("label").alias("label_a"), "pos",
                  F.col("s").alias("sa"))
    b = cs.select(F.col("label").alias("label_b"),
                  F.col("pos").alias("pos_b"), F.col("s").alias("sb"))
    dots = (
        a.join(F.broadcast(b),
               (F.col("pos") == F.col("pos_b"))
               & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b")
        .agg(F.sum((F.col("sa") * F.col("sb")).cast("decimal(38,12)"))
             .alias("dot"))
    )
    return (
        dots.join(F.broadcast(nrm.select(F.col("label").alias("label_a"),
                                         F.col("n2").alias("_n2a"))), "label_a")
        .join(F.broadcast(nrm.select(F.col("label").alias("label_b"),
                                     F.col("n2").alias("_n2b"))), "label_b")
        .join(F.broadcast(cnt.select(F.col("label").alias("label_a"),
                                     F.col("n").alias("n_a"))), "label_a")
        .join(F.broadcast(cnt.select(F.col("label").alias("label_b"),
                                     F.col("n").alias("n_b"))), "label_b")
        .filter((F.col("_n2a") > 0) & (F.col("_n2b") > 0))
        .select(
            "label_a", "label_b", "n_a", "n_b",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("_n2a").cast("double")
                         * F.col("_n2b").cast("double")), 6
            ).alias("centroid_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection (sensor volume shift)
# ---------------------------------------------------------------------------

@register("sensor_cusum_shift", """
WITH base AS (
  SELECT CAST(user_id AS VARCHAR) AS sensor, ts,
         MAX(CASE WHEN event_type = 'error' THEN NULL
                  ELSE CAST(FLOOR(value) % 25 AS INTEGER) END) AS volume
  FROM events GROUP BY 1, 2),
obs AS (
  SELECT sensor, ts, CAST(volume AS BIGINT) AS v,
         ROW_NUMBER() OVER w AS k,
         SUM(CAST(volume AS BIGINT)) OVER (PARTITION BY sensor ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS sk,
         COUNT(*) OVER (PARTITION BY sensor) AS n,
         SUM(CAST(volume AS BIGINT)) OVER (PARTITION BY sensor) AS sn
  FROM base WHERE volume IS NOT NULL
  WINDOW w AS (PARTITION BY sensor ORDER BY ts)),
scored AS (
  SELECT sensor, ts, k, n, sk, sn,
         abs(n * sk - k * sn) AS stat
  FROM obs WHERE k < n),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY sensor
                               ORDER BY stat DESC, ts) AS rk
  FROM scored)
SELECT sensor,
       CAST(n AS BIGINT) AS n_obs,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS split_ts,
       CAST(k AS BIGINT) AS split_k,
       CAST(stat AS BIGINT) AS cusum_stat,
       ROUND(CAST(sk AS DOUBLE) / k, 6) AS mean_before,
       ROUND(CAST(sn - sk AS DOUBLE) / (n - k), 6) AS mean_after
FROM best WHERE rk = 1
""")
def q_sensor_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection per sensor: the CUSUM/Pettitt-style split
    that maximizes the deviation between the running sum and its
    expected share of the total — where the detector's mean most likely
    SHIFTED (re-aim, lane closure, stuck counter). The statistic is kept
    as the integer |n·S_k − k·S_n| (multiplying the classic
    |S_k − k·μ| through by n), so locating the argmax involves NO
    division and is bit-exact cross-engine; the only doubles are the
    rounded before/after means in the final projection. Readings
    collapse to one row per (sensor, ts) first so the order is total;
    the earliest timestamp wins stat ties.

    Scale shape: ONE sensor exchange carries the ordered cumulative sum,
    the row number, and both per-sensor totals (unbounded-frame window
    aggregates on the same partitioning); the argmax is a rank on the
    same exchange. Four window functions, zero joins, zero extra
    shuffles — at any history length the cost is one in-partition sort.
    """
    ev = load_table(spark, sf_dir, "events")
    base = (
        ev.groupBy(
            F.col("user_id").cast("string").alias("sensor"),
            F.col("ts"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "error", F.lit(None))
                .otherwise((F.floor("value") % 25).cast("int"))
            ).alias("volume")
        )
        .filter(F.col("volume").isNotNull())
    )
    ordered = Window.partitionBy("sensor").orderBy("ts")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = Window.partitionBy("sensor")
    obs = base.select(
        "sensor", "ts",
        F.row_number().over(ordered).alias("k"),
        F.sum(F.col("volume").cast("bigint")).over(running).alias("sk"),
        F.count(F.lit(1)).over(full).alias("n"),
        F.sum(F.col("volume").cast("bigint")).over(full).alias("sn"),
    )
    scored = obs.filter(F.col("k") < F.col("n")).withColumn(
        "stat", F.abs(F.col("n") * F.col("sk") - F.col("k") * F.col("sn")))
    rk = Window.partitionBy("sensor").orderBy(F.col("stat").desc(), "ts")
    from traffic_data_pipeline_spark.plans.queries import fmt_ts

    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "sensor",
            F.col("n").cast("bigint").alias("n_obs"),
            fmt_ts(F.col("ts")).alias("split_ts"),
            F.col("k").cast("bigint").alias("split_k"),
            F.col("stat").cast("bigint").alias("cusum_stat"),
            F.round(F.col("sk").cast("double") / F.col("k"), 6)
            .alias("mean_before"),
            F.round((F.col("sn") - F.col("sk")).cast("double")
                    / (F.col("n") - F.col("k")), 6).alias("mean_after"),
        )
    )


# ---------------------------------------------------------------------------
# Label propagation communities (events transition graph)
# ---------------------------------------------------------------------------

LPA_ITERS = 3


def _lpa_iter_sql(i: int) -> str:
    p = f"lab{i - 1}"
    return f"""
votes{i} AS (
  SELECT e.a AS node, l.label, SUM(e.w) AS w
  FROM und e JOIN {p} l ON l.node = e.b GROUP BY 1, 2),
pick{i} AS (
  SELECT node, label,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY w DESC, label) AS rk
  FROM votes{i}),
lab{i} AS (
  SELECT n.node, COALESCE(p.label, n.node) AS label
  FROM nodes n LEFT JOIN pick{i} p ON p.node = n.node AND p.rk = 1),"""


_LPA_ORACLE = f"""
WITH trans AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
dir AS (
  SELECT src, dst, COUNT(*) AS cnt FROM trans
  WHERE dst IS NOT NULL AND dst <> src GROUP BY 1, 2),
und AS (
  SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS w FROM (
    SELECT src AS a, dst AS b, cnt FROM dir
    UNION ALL
    SELECT dst, src, cnt FROM dir) GROUP BY 1, 2),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
lab0 AS (SELECT node, node AS label FROM nodes),
{"".join(_lpa_iter_sql(i) for i in range(1, LPA_ITERS + 1))}
fin AS (SELECT node, label FROM lab{LPA_ITERS})
SELECT f.node, f.label AS community,
       CAST(c.sz AS BIGINT) AS community_size
FROM fin f
JOIN (SELECT label, COUNT(*) AS sz FROM fin GROUP BY 1) c
  ON c.label = f.label
"""


@register("events_label_prop", _LPA_ORACLE)
def q_events_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    undirected weighted event-transition graph (3 unrolled rounds):
    each node adopts the label carrying the most incident edge weight,
    ties broken by lexicographically smallest label — the two choices
    (synchronous rounds, deterministic ties) that turn LPA's usual
    run-to-run jitter into a bit-reproducible fixpoint both engines
    replay identically, the PageRank determinism playbook applied to
    the semi-supervised op. Communities group event types that flow
    into each other (journey phases).

    Scale shape: per round, the edge list joins the V-row label vector
    (broadcast) and aggregates votes co-keyed on node — the edge list
    moves once per round, exactly PageRank's cost profile; each round's
    vector is materialized so lineage stays flat. The argmax is a rank
    window over the per-node VOTE rows (bounded by distinct incident
    labels, never the corpus)."""
    from traffic_data_pipeline_spark.functions.execution import materialize

    ev = load_table(spark, sf_dir, "events")
    trans = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("dst"),
    )
    dirw = (
        trans.filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    )
    und = materialize(
        dirw.select(F.col("src").alias("a"), F.col("dst").alias("b"), "cnt")
        .unionAll(dirw.select(F.col("dst").alias("a"),
                              F.col("src").alias("b"), "cnt"))
        .groupBy("a", "b").agg(F.sum("cnt").cast("bigint").alias("w"))
    )
    nodes = materialize(
        ev.select(F.col("event_type").alias("node")).distinct())
    lab = nodes.select("node", F.col("node").alias("label"))
    rk = Window.partitionBy("node").orderBy(F.col("w").desc(), "label")
    for _ in range(LPA_ITERS):
        votes = (
            und.join(F.broadcast(lab.withColumnRenamed("node", "b")), "b")
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.sum("w").alias("w"))
        )
        pick = (
            votes.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") == 1).select("node", "label")
        )
        lab = materialize(
            nodes.join(pick, "node", "left")
            .select("node", F.coalesce("label", "node").alias("label"))
        )
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    return (
        lab.join(F.broadcast(sizes), "label")
        .select("node", F.col("label").alias("community"),
                F.col("sz").cast("bigint").alias("community_size"))
    )


# ---------------------------------------------------------------------------
# Welch t-test (A/B experiment readout over events)
# ---------------------------------------------------------------------------

@register("events_ab_ttest", """
WITH g AS (
  SELECT CAST(user_id % 2 AS INTEGER) AS grp,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events),
mom AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS DECIMAL(38,6)) AS s,
         CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS s2
  FROM g GROUP BY 1),
w AS (
  -- NULLIF twins: a one-event cohort (n = 1) or a CONSTANT metric
  -- (both variances exactly 0 — the decimal moments make that exact)
  -- sends var / t_stat / welch_df through 0-divisors where DuckDB IEEE
  -- division emits inf/nan and Spark emits NULL; both must emit NULL
  SELECT a.n AS n_a, b.n AS n_b,
         CAST(a.s AS DOUBLE) / a.n AS m_a,
         CAST(b.s AS DOUBLE) / b.n AS m_b,
         (CAST(a.s2 AS DOUBLE)
          - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE) / a.n)
           / NULLIF(a.n - 1, 0) AS var_a,
         (CAST(b.s2 AS DOUBLE)
          - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE) / b.n)
           / NULLIF(b.n - 1, 0) AS var_b
  FROM mom a JOIN mom b ON a.grp = 0 AND b.grp = 1)
SELECT n_a, n_b,
       ROUND(m_a, 6) AS mean_a, ROUND(m_b, 6) AS mean_b,
       ROUND((m_a - m_b)
             / NULLIF(sqrt(var_a / n_a + var_b / n_b), 0), 6) AS t_stat,
       -- welch_df is a LARGE (~n) full-entropy double: at 6 dp its
       -- shortest decimal string often terminates near the rounding
       -- digit, where the engines' ROUND implementations disagree
       -- (DEVIATIONS.md); 2 dp keeps the flip odds ~ulp/quantum ~ 1e-9
       ROUND((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
             / NULLIF((var_a / n_a) * (var_a / n_a) / NULLIF(n_a - 1, 0)
                + (var_b / n_b) * (var_b / n_b) / NULLIF(n_b - 1, 0), 0), 2)
         AS welch_df
FROM w
""")
def q_events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: Welch's unequal-variance t-test comparing the
    event-value mean between two cohorts (stand-in assignment:
    user_id % 2) — the statistic an A/B platform computes per metric.
    Moments accumulate as EXACT decimals (count, Σv, Σv² — the same
    one-pass mergeable shape as events_zscore_anomaly), so the only
    floating-point work is the final t / Welch-df formula evaluated as
    the IDENTICAL expression tree in both engines: deterministic
    double arithmetic, rounded once.

    Scale shape: one map-side-combined aggregate to TWO rows, then a
    two-row join — the fact is scanned once and never shuffled (the
    2-row aggregate exchange carries only the moment tuples). Adding
    metrics or cohorts widens the tiny frame, not the plan."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    mom = (
        ev.select((F.col("user_id") % 2).cast("int").alias("grp"),
                  v.alias("v"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("decimal(38,6)").alias("s"),
            F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)"))
            .cast("decimal(38,12)").alias("s2"),
        )
    )
    a = mom.filter(F.col("grp") == 0).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"),
        F.col("s2").alias("s2_a"))
    b = mom.filter(F.col("grp") == 1).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"),
        F.col("s2").alias("s2_b"))
    j = a.crossJoin(F.broadcast(b))
    m_a = F.col("s_a").cast("double") / F.col("n_a")
    m_b = F.col("s_b").cast("double") / F.col("n_b")
    # nullif twins: see the oracle's one-event-cohort / constant-metric
    # note (Spark's non-ANSI division already NULLs on a zero divisor;
    # the explicit nullif keeps the contract visible and ANSI-proof)
    var_a = (
        F.col("s2_a").cast("double")
        - F.col("s_a").cast("double") * F.col("s_a").cast("double")
        / F.col("n_a")
    ) / F.nullif(F.col("n_a") - 1, F.lit(0))
    var_b = (
        F.col("s2_b").cast("double")
        - F.col("s_b").cast("double") * F.col("s_b").cast("double")
        / F.col("n_b")
    ) / F.nullif(F.col("n_b") - 1, F.lit(0))
    se_a = var_a / F.col("n_a")
    se_b = var_b / F.col("n_b")
    return j.select(
        "n_a", "n_b",
        F.round(m_a, 6).alias("mean_a"),
        F.round(m_b, 6).alias("mean_b"),
        F.round((m_a - m_b)
                / F.nullif(F.sqrt(se_a + se_b), F.lit(0.0)), 6)
        .alias("t_stat"),
        F.round((se_a + se_b) * (se_a + se_b)
                / F.nullif(
                    se_a * se_a / F.nullif(F.col("n_a") - 1, F.lit(0))
                    + se_b * se_b / F.nullif(F.col("n_b") - 1, F.lit(0)),
                    F.lit(0.0)), 2).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Monthly seasonal index (orders)
# ---------------------------------------------------------------------------

@register("orders_seasonality", """
WITH m AS (
  SELECT CAST(month(o_orderdate) AS INTEGER) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(SUM(rev) AS DECIMAL(38,6)) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_months FROM m)
SELECT m.month, m.n_orders,
       CAST(m.rev AS DOUBLE) AS month_revenue,
       ROUND(CAST(m.rev AS DOUBLE) * t.n_months / CAST(t.total AS DOUBLE), 6)
         AS seasonal_index
FROM m CROSS JOIN tot t
""")
def q_orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonal index: each calendar month's revenue relative to
    a flat-seasonality baseline (index = rev_m · #months / Σrev; 1.0 =
    no seasonality) — the classical-decomposition seasonal factor a
    demand forecaster multiplies back into the trend. Revenue
    accumulates decimal-exact; the index is one double multiply/divide
    of those exact sums, rounded once.

    Scale shape: one map-side-combined aggregate to ≤12 rows + a one-row
    broadcast scalar. Nothing else moves."""
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(F.month("o_orderdate").cast("int").alias("month"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(38,6)").alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    tot = m.agg(F.sum("rev").cast("decimal(38,6)").alias("total"),
                F.count(F.lit(1)).cast("bigint").alias("n_months"))
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            "month", "n_orders",
            F.col("rev").cast("double").alias("month_revenue"),
            F.round(F.col("rev").cast("double") * F.col("n_months")
                    / F.col("total").cast("double"), 6)
            .alias("seasonal_index"),
        )
    )


# ---------------------------------------------------------------------------
# CSV ingest with corrupt-record quarantine
# ---------------------------------------------------------------------------

_CSV_SRC_CACHE: dict[str, str] = {}


def _csv_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """CSV landing zone derived from events: id,epoch-micros,type,value
    lines with every 13th event's value field replaced by a non-numeric
    token (a type-level corruption PERMISSIVE mode must quarantine —
    a merely MISSING field would silently null-fill instead). Built once
    per sf_dir per process (the _dup_events_dir pattern); values travel
    as decimal(18,6) strings so the text round-trip is exact."""
    from traffic_data_pipeline_spark.functions.tmpdirs import scratch_dir

    if not cached_dir_valid(_CSV_SRC_CACHE, sf_dir):
        src = scratch_dir(prefix="tdp_csv_events_")
        ev = load_table(spark, sf_dir, "events")
        lines = ev.select(
            F.concat_ws(
                ",",
                F.col("event_id").cast("string"),
                F.unix_micros(F.col("ts")).cast("string"),
                F.col("event_type"),
                F.when(F.col("event_id") % 13 == 0, F.lit("x"))
                .otherwise(F.col("value").cast("decimal(18,6)").cast("string")),
            ).alias("value")
        )
        lines.write.mode("overwrite").text(src)
        _CSV_SRC_CACHE[sf_dir] = src
    return _CSV_SRC_CACHE[sf_dir]


@register("csv_ingest_quarantine", """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quarantined,
       CAST(SUM(CASE WHEN event_id % 13 <> 0
                     THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
         AS clean_sum
FROM events GROUP BY 1
""")
def q_csv_ingest_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with malformed-row routing: read a comma-delimited
    landing zone in PERMISSIVE mode with columnNameOfCorruptRecord —
    rows whose value field fails the decimal parse keep their parseable
    columns, carry the raw line in the quarantine column, and are
    EXCLUDED from the clean aggregate instead of failing the job (the
    CSV sibling of events_json_rescue; a production variant writes the
    quarantined raw lines to a dead-letter path). The feed synthesis is
    deterministic (every 13th event corrupted), so the oracle computes
    the expected routing split straight from the rule.

    Scale shape: schema-on-read CSV scan (splittable text), one
    map-side-combined aggregate per type. The corrupt-record column adds
    a projection, not a pass."""
    src = _csv_events_dir(spark, sf_dir)
    parsed = (
        spark.read
        .schema("event_id long, ts_us long, event_type string, "
                "value decimal(18,6), _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(src)
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_corrupt").isNotNull().cast("int")).cast("bigint")
        .alias("n_quarantined"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("value")))
        .cast("double").alias("clean_sum"),
    )


# ---------------------------------------------------------------------------
# Rolling WAU via mergeable HLL sketches (sketch twin of events_rolling_wau)
# ---------------------------------------------------------------------------

_WAU_HLL_ORACLE = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
spread AS (
  SELECT user_id, d + CAST(k.k AS INTEGER) AS window_day
  FROM user_days, (SELECT unnest(generate_series(0, 6)) AS k) k)
SELECT strftime(window_day, '%Y-%m-%d') AS window_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
       TRUE AS hll_ok
FROM spread GROUP BY 1
"""


@register("events_rolling_wau_hll", _WAU_HLL_ORACLE)
def q_events_rolling_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rolling-distinct formulation that survives 100×: ONE HLL
    sketch per day (map-side mergeable, constant size), each daily
    sketch replicated into the 7 trailing windows it serves, windows
    finished by hll_union_agg + estimate. The exact twin
    (events_rolling_wau) replicates USER-DAYS — linear in distinct
    users; this replicates DAILY SKETCHES — constant per day — which is
    the difference between shuffling the audience and shuffling ~1.5 KB
    per day at planet-scale DAU.

    Oracle contract (VERDICT r4 ask #7 — previously rows-only): the
    estimate itself is engine-specific, so the emitted columns are the
    EXACT window count plus an in-plan witness ``hll_ok`` asserting the
    sketch estimate lands within the 5% bound the accuracy test pins
    (tests/test_analysis_ops.py). A sketch regression flips the boolean
    and hash-mismatches the gate instead of hiding behind a rows-only
    row. The exact branch exists for the gate; the production 100 TB
    form is this plan minus that branch (sketches only), as documented
    above — the sketch path still executes and is still what ``hll_ok``
    measures.

    Scale shape (sketch branch): one (day, sketch) aggregate over the
    event scan, a 7× explode of the TINY daily-sketch table, one merge
    aggregate to one row per window day."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(F.to_date("ts").alias("d"), "user_id")
    daily = base.groupBy("d").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    sk = (
        daily.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "d", "sk"
        )
        .select(F.date_add("d", F.col("k")).alias("window_day"), "sk")
        .groupBy("window_day")
        .agg(F.expr("hll_union_agg(sk)").alias("m"))
        .select(
            "window_day",
            F.expr("hll_sketch_estimate(m)").cast("bigint").alias("wau_est"),
        )
    )
    exact = (
        base.distinct()
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
            "d",
        )
        .select("user_id", F.date_add("d", F.col("k")).alias("window_day"))
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return exact.join(sk, "window_day").select(
        F.date_format("window_day", "yyyy-MM-dd").alias("window_day"),
        F.col("wau").cast("bigint").alias("wau"),
        (
            F.abs(F.col("wau_est") - F.col("wau"))
            <= 0.05 * F.col("wau")
        ).alias("hll_ok"),
    )


# attach oracles that need CTE strings from extensions (importable only
# after plans.extensions finished registering)
from traffic_data_pipeline_spark.plans.queries import ORACLES  # noqa: E402

ORACLES["dedup_cluster_density"] = _cluster_density_oracle()
ORACLES["source_overlap_matrix"] = _source_overlap_oracle()


# ---------------------------------------------------------------------------
# Interval-overlap join: user sessions x traffic-surge windows
# ---------------------------------------------------------------------------

@register("session_surge_overlap", """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
               OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess0 AS (
  SELECT user_id, ts, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered),
sess AS (
  SELECT user_id, MIN(ts) AS s, MAX(ts) + INTERVAL 30 MINUTE AS e
  FROM sess0 GROUP BY user_id, sid),
hours AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS c FROM events GROUP BY 1),
tot AS (SELECT SUM(c) AS t, COUNT(*) AS n FROM hours),
surge AS (SELECT h FROM hours, tot WHERE 2 * c * n > 3 * t),
isl0 AS (
  SELECT h, CASE WHEN LAG(h) OVER (ORDER BY h) IS NULL
                  OR h - LAG(h) OVER (ORDER BY h) > INTERVAL 1 HOUR
                 THEN 1 ELSE 0 END AS nw
  FROM surge),
isl1 AS (
  SELECT h, SUM(nw) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS gid
  FROM isl0),
isl AS (
  SELECT MIN(h) AS a, MAX(h) + INTERVAL 1 HOUR AS b
  FROM isl1 GROUP BY gid),
ov AS (
  SELECT a, b,
         LEAST(epoch_us(e), epoch_us(b)) - GREATEST(epoch_us(s), epoch_us(a))
           AS ov_us
  FROM sess JOIN isl ON s < b AND a < e)
SELECT strftime(a, '%Y-%m-%d %H:%M:%S') AS island_start,
       strftime(b, '%Y-%m-%d %H:%M:%S') AS island_end,
       COUNT(*) AS n_sessions,
       CAST(SUM(ov_us) AS BIGINT) AS overlap_us
FROM ov GROUP BY 1, 2
""")
def q_session_surge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: which user sessions ran during sitewide
    traffic surges, and for how long. Surge islands are consecutive
    above-1.5x-average hours (the threshold is the exact rational
    2*c*n > 3*t — no average division) merged gaps-and-islands style;
    sessions come from the native session_window. The overlap join is
    the BIN-BUCKETED range join: both interval sets explode onto the
    hour grid and equi-join on the bucket — a hash join of
    O(rows x span-hours) where the naive s < b AND a < e predicate is a
    nested-loop cross product. The island side is tiny here and
    broadcasts; when BOTH sides are large (the 100 TB case) the same
    bucket-key plan shuffle-joins co-keyed on the hour. Exact-touch
    pairs (session ends exactly at island start) carry zero overlap and
    are dropped in both engines by the strict predicate / the
    ov_us > 0 filter; overlap accumulates in integer microseconds."""
    from traffic_data_pipeline_spark.operators.sessionize import session_spans

    ev = load_table(spark, sf_dir, "events")
    sess = session_spans(ev).select(
        "user_id", F.col("s_start").alias("s"), F.col("s_end").alias("e"))
    hours = ev.groupBy(F.date_trunc("hour", "ts").alias("h")) \
        .agg(F.count(F.lit(1)).alias("c"))
    tot = hours.agg(F.sum("c").alias("t"), F.count(F.lit(1)).alias("n"))
    surge = hours.crossJoin(F.broadcast(tot)) \
        .filter(2 * F.col("c") * F.col("n") > 3 * F.col("t")).select("h")
    wo = Window.orderBy("h")
    isl = (
        surge.select(
            "h",
            F.when(F.lag("h").over(wo).isNull()
                   | (F.unix_timestamp("h")
                      - F.unix_timestamp(F.lag("h").over(wo)) > 3600), 1)
            .otherwise(0).alias("nw"))
        .withColumn("gid", F.sum("nw").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("gid")
        .agg(F.min("h").alias("a"),
             (F.max("h") + F.expr("INTERVAL 1 HOUR")).alias("b"))
        .select("a", "b")
    )
    # overlap_join emits each pair in exactly ONE bucket by construction
    # (no dedup pass at all), so two users holding bit-identical session
    # bounds (one event each at the same microsecond) stay two distinct
    # sessions, as the oracle counts
    pairs = overlap_join(sess, isl, "s", "e", "a", "b",
                         broadcast_right=True)
    return pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("ov_us").cast("bigint").alias("overlap_us"),
    ).select(
        F.date_format("a", "yyyy-MM-dd HH:mm:ss").alias("island_start"),
        F.date_format("b", "yyyy-MM-dd HH:mm:ss").alias("island_end"),
        "n_sessions", "overlap_us",
    )
