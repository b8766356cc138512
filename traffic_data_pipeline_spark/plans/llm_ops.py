"""Round-2 training-data-pipeline extensions: as-of join, PII redaction,
Gopher-style repetition signals, token chunking, benchmark
decontamination, per-language heavy hitters.

Same registry/oracle contract as plans/extensions.py. Every query here is
SQL-expressible and carries an exact DuckDB twin; numeric outputs are
integer counts or exactly-representable divisions, so the driver's
value-hash is bit-stable across engines.
"""

from __future__ import annotations

from traffic_data_pipeline_spark.functions.tmpdirs import cached_dir_valid, scratch_dir

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.functions.text import (
    PII_EMAIL_RE,
    PII_PHONE_RE,
    chunk_starts,
    ngram_array,
    pii_counts,
    pii_redact,
    token_array,
)
from traffic_data_pipeline_spark.operators.asof import asof_join
from traffic_data_pipeline_spark.plans.queries import dsum, fmt_ts, register
from traffic_data_pipeline_spark.sources.tables import load_table

from traffic_data_pipeline_spark.plans.oracle_ctes import (  # noqa: E402
    _GRAMS8_CTE,
    _LM_SCORE_SQL,
    _TOK_LIST_CTE,
)


def _spread(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) with the corpus rebalanced across cores first: the
    fixture is one parquet file -> one input partition, and doc-size skew
    wants the same rebalance at corpus scale (same rationale as
    functions.text.tokens)."""
    return docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", token_array(F.col("text")).alias("tok"))



@register("events_asof_join", """
WITH purchases AS (
  SELECT user_id, ts, MAX(value) AS last_purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
clicks AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'click')
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       c.value AS click_value,
       p.last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""")
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click is enriched with the user's most recent
    prior-or-simultaneous purchase value (operators/asof.py — union-tag +
    single window, ONE shuffle on user_id; never a non-equi join). The
    oracle is DuckDB's native ASOF LEFT JOIN, which pins the semantics
    exactly; right-side (user, ts) ties are pre-collapsed with MAX in both
    engines because ASOF leaves the tie choice unspecified."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts", "value"))
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_join(clicks, purchases, key="user_id",
                    left_ts="ts", right_ts="ts",
                    value_col="value", out_col="last_purchase_value")
    return out.select(
        "event_id", "user_id", fmt_ts(F.col("ts")).alias("ts"),
        F.col("value").alias("click_value"), "last_purchase_value",
    )


_PII_ENRICH_SQL = """
  CASE WHEN doc_id % 3 = 0 THEN text
       ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example.com or +1-555-'
            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
  END
"""


@register("doc_pii_redact", f"""
WITH enr AS (
  SELECT doc_id, {_PII_ENRICH_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS INTEGER) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PII_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5,
       CAST(length(regexp_replace(regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{PII_PHONE_RE}', '<PHONE>', 'g')) AS INTEGER)
         AS n_chars_redacted
FROM enr
""")
def q_doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (functions/text.pii_redact): the corpus fixture
    carries no PII, so 2/3 of docs are deterministically salted with a
    synthetic email + phone first — the redactor must then strip exactly
    those and nothing else (md5 of the redacted text is the witness).
    Narrow projection, zero shuffles; patterns are the engine-portable
    regex subset (no lookarounds), so Java and RE2 agree."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = F.when(F.col("doc_id") % 3 == 0, F.col("text")).otherwise(
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"), F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        )
    )
    t = docs.select("doc_id", enriched.alias("t"))
    n_emails, n_phones = pii_counts(F.col("t"))
    red = pii_redact(F.col("t"))
    return t.select(
        "doc_id",
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("int").alias("n_chars_redacted"),
    )


@register("doc_repetition", f"""
WITH {_TOK_LIST_CTE},
big AS (
  SELECT doc_id, array_to_string(l[g:g+1], ' ') AS bg
  FROM tl, unnest(generate_series(1, greatest(len(l) - 1, 0))) s(g)),
cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(MAX(c) AS BIGINT) AS top_count,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
FROM cnt GROUP BY doc_id
""")
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of a doc's bigrams taken
    by its most frequent bigram (high -> boilerplate/spam). Bigrams are an
    in-row array expression (functions/text.ngram_array — no token
    explode-shuffle); the only shuffles are the two doc-keyed aggregates,
    both with map-side partials. The division is count/count, exactly
    representable, so the cross-engine hash holds."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    bigs = docs.select("doc_id", F.explode(ngram_array("tok", 2)).alias("bg"))
    cnt = bigs.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_count"),
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias("top_frac"),
    )


@register("doc_lm_score", _LM_SCORE_SQL)
def q_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram language-model quality score: train add-one-
    smoothed bigram probabilities on the corpus itself, score each doc by
    its mean token log-probability — low scores flag gibberish/boilerplate
    for filtering, the classic LM-perplexity signal next to the heuristic
    quality stats. In-corpus training means every doc bigram hits the
    model table (inner join is lossless).

    Scale shape: bigrams are in-row array projections (no token-stream
    shuffle before counting); the model build is two map-side-combined
    aggregates (bigram, then prefix w1); the vocabulary size is ONE
    broadcast scalar row; scoring joins the bigram stream to the model
    table once, keyed on the bigram — every shuffle is on a
    grouping/join key, nothing is quadratic. Cross-engine float parity:
    identical ln arguments (integer-derived doubles), per-row DECIMAL
    rounding before the order-independent sum (the dsum pattern).
    """
    from traffic_data_pipeline_spark.functions.execution import materialize

    docs = _spread(load_table(spark, sf_dir, "documents"))
    # the bigram stream feeds both the model build and the scoring join
    stream = materialize(
        docs.select("doc_id", F.explode(ngram_array("tok", 2)).alias("bigram")))
    bgc = materialize(
        stream.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_bg")))
    pre = (bgc.groupBy(F.substring_index("bigram", " ", 1).alias("w1"))
           .agg(F.sum("c_bg").alias("c_pre")))
    vocab = (docs.select(F.explode("tok").alias("token"))
             .agg(F.count_distinct("token").alias("v")))
    probs = (
        bgc.withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(pre, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.log((F.col("c_bg") + F.lit(1.0))
                  / (F.col("c_pre") + F.col("v"))).alias("logp"),
        )
    )
    return (
        stream.join(probs, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)), 6,
            ).alias("lm_score"),
        )
    )


@register("doc_chunk", f"""
WITH {_TOK_LIST_CTE},
ch AS (
  SELECT doc_id, (g - 1) // 24 AS chunk_idx, l[g:g+31] AS chunk
  FROM tl, unnest(generate_series(1, greatest(len(l), 1), 24)) s(g))
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(len(chunk) AS INTEGER) AS n_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM ch WHERE len(chunk) > 0
""")
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (32-token chunks, stride 24 -> 8-token
    overlap): the doc -> training-sample splitter. Tokens stay an in-row
    array; chunk starts are a sequence() explode, each chunk a slice — a
    narrow op scaling with output size. md5 of the joined chunk pins exact
    content equality across engines."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    ch = (
        docs.select("doc_id", "tok",
                F.explode(chunk_starts("tok", 24)).alias("g"))
        .select(
            "doc_id",
            F.floor((F.col("g") - 1) / 24).cast("int").alias("chunk_idx"),
            F.slice(F.col("tok"), F.col("g"), 32).alias("chunk"),
        )
        .filter(F.size("chunk") > 0)
    )
    return ch.select(
        "doc_id", "chunk_idx",
        F.size("chunk").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_md5"),
    )


@register("doc_decontaminate", f"""
WITH {_GRAMS8_CTE},
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(CASE WHEN SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
                 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
FROM grams g LEFT JOIN bench b USING (gram)
WHERE g.doc_id % 97 <> 0
GROUP BY g.doc_id
""")
def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: docs whose 8-gram token shingles overlap
    a benchmark set (stand-in: doc_id % 97 == 0 docs) get flagged — the
    pass every pretraining corpus runs against eval suites. The benchmark
    gram set is small by construction, so it broadcasts: the corpus side
    is ONE dedup shuffle, and the probe join moves no corpus data. At
    100 TB the bench side stays driver-bounded (eval suites are MBs);
    if it ever grew past broadcast range the same plan degrades to a
    shuffle join without a rewrite."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", F.explode(ngram_array("tok", 8)).alias("gram"))
    # bench side: tiny by construction — dedup its grams ARRAY-side
    # (array_distinct before the explode), so the corpus gram stream is
    # never computed twice and the bench build needs no shuffle at all
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(F.array_distinct(ngram_array("tok", 8))).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .dropDuplicates(["doc_id", "gram"])
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            "doc_id", "n_grams", "n_hits",
            (F.col("n_hits") > 0).cast("int").alias("contaminated"),
        )
    )


@register("doc_top_tokens", """
WITH toks AS (
  SELECT lang, token FROM (
    SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
    FROM documents)
  WHERE token != ''),
cnt AS (SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY 1, 2),
rk AS (SELECT lang, token, n,
              row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rank
       FROM cnt)
SELECT lang, token, n, CAST(rank AS INTEGER) AS rank
FROM rk WHERE rank <= 10
""")
def q_doc_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy hitters: top-10 tokens by count (ties broken
    lexically, so the ranking is total and engine-stable). Count explodes
    the token stream once with map-side partials; the rank window runs on
    the tiny (lang, token) aggregate, not the stream. At corpus scale the
    exact count is the baseline; a count-min/space-saving sketch slots in
    where the aggregate itself no longer fits."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(token_array(F.col("text"))).alias("token")
    )
    cnt = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("lang", "token", "n", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Event-stream analytics: funnel, retention, streaming dedup
# ---------------------------------------------------------------------------

@register("events_funnel", """
WITH m AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY 1),
c2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN m USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= m.t_view GROUP BY 1),
p2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_buy
  FROM events e JOIN c2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= c2.t_click GROUP BY 1),
stages AS (
  SELECT m.user_id,
         CASE WHEN m.t_view IS NULL THEN 0
              WHEN c2.t_click IS NULL THEN 1
              WHEN p2.t_buy IS NULL THEN 2
              ELSE 3 END AS stage
  FROM m LEFT JOIN c2 USING (user_id) LEFT JOIN p2 USING (user_id))
SELECT CAST(stage AS INTEGER) AS stage, COUNT(*) AS n_users
FROM stages GROUP BY 1
""")
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (view -> click-after-view -> purchase-after-
    click) per user. The oracle builds each stage with a join back to the
    previous stage's first-hit time (three passes); the engine computes
    all three first-hit times as CHAINED WINDOW minima over ONE user_id
    shuffle — each stage's condition references the previous stage's
    window result, so the whole funnel is a single sort + projection.
    That's the formulation that survives a 100x event stream; the join
    form re-shuffles the full stream per stage."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    t_click = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") >= t_view),
               F.col("ts"))
    ).over(w)
    t_buy = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") >= t_click),
               F.col("ts"))
    ).over(w)
    stage = (
        F.when(t_view.isNull(), 0)
        .when(t_click.isNull(), 1)
        .when(t_buy.isNull(), 2)
        .otherwise(3)
    )
    per_user = (
        ev.select("user_id", stage.alias("stage"))
        .groupBy("user_id").agg(F.max("stage").alias("stage"))
    )
    return (per_user.groupBy(F.col("stage").cast("int").alias("stage"))
            .agg(F.count(F.lit(1)).alias("n_users")))


@register("user_retention", """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1),
a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', cohort_day, active_day) AS INTEGER) AS day_k,
       COUNT(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY cohort_day, day_k
""")
def q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each later active day. One shuffle: the cohort day is a window min
    over the SAME user_id partitioning the activity dedup needs, so
    Catalyst reuses the exchange instead of join-shuffling the stream
    twice (the oracle's join form)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    days = ev.select(
        "user_id",
        F.to_date("ts").alias("active_day"),
        F.min(F.to_date("ts")).over(w).alias("cohort_day"),
    ).dropDuplicates(["user_id", "active_day"])
    return (
        days.groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.date_diff("active_day", "cohort_day").cast("int").alias("day_k"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_DUP_EVENTS_CACHE: dict[str, str] = {}


def _dup_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Landing zone simulating at-least-once delivery: every 5th event is
    delivered twice. Built once per sf_dir per process (ingest-side setup,
    like queries.stream_source_dir)."""
    if not cached_dir_valid(_DUP_EVENTS_CACHE, sf_dir):
        src = scratch_dir(prefix="tdp_dup_events_")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type", "value")
        ev.unionByName(ev.filter(F.col("event_id") % 5 == 0)) \
            .write.mode("overwrite").parquet(src)
        _DUP_EVENTS_CACHE[sf_dir] = src
    return _DUP_EVENTS_CACHE[sf_dir]


@register("streaming_dedup", """
WITH src AS (
  SELECT event_id, ts, event_type, value FROM events
  UNION ALL
  SELECT event_id, ts, event_type, value FROM events WHERE event_id % 5 = 0)
SELECT DISTINCT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       event_type, value
FROM src
""")
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once restoration over an at-least-once feed:
    dropDuplicatesWithinWatermark(event_id) on a watermarked stream. The
    oracle rebuilds the duplicated feed in SQL and takes DISTINCT —
    streaming==batch equivalence again. Scale shape: dedup state holds
    only keys younger than the watermark horizon (unbounded-state
    dropDuplicates is exactly what this API exists to avoid), rows emit
    in append mode as they arrive, and the sink lands distributed."""
    src = _dup_events_dir(spark, sf_dir)
    sink = scratch_dir(prefix="tdp_dedup_sink_")
    ckpt = scratch_dir(prefix="tdp_dedup_ckpt_")
    from traffic_data_pipeline_spark.plans.queries import run_available_now

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, event_type string, "
                      "value double")
              .parquet(src))
    dd = (stream.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark(["event_id"]))
    # state = one key per event inside the horizon
    run_available_now(spark, "streaming_dedup", agg=dd, sink=sink, ckpt=ckpt)
    return spark.read.parquet(sink).select(
        "event_id", fmt_ts(F.col("ts")).alias("ts"), "event_type", "value")


@register("doc_pack_sequences", f"""
WITH {_TOK_LIST_CTE},
sized AS (
  SELECT t.doc_id, d.source, CAST(t.doc_id // 1000 AS BIGINT) AS pack_shard,
         CAST(len(t.l) AS BIGINT) AS n_tok
  FROM tl t JOIN documents d USING (doc_id)),
packed AS (
  SELECT doc_id, source, pack_shard, n_tok,
         SUM(n_tok) OVER (PARTITION BY source, pack_shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
  FROM sized)
SELECT doc_id, source, pack_shard,
       CAST(start_off // 64 AS BIGINT) AS seq_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(start_off % 64 AS BIGINT) AS tok_offset
FROM packed
""")
def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate each (source, shard)'s token stream in
    doc_id order and cut it every 64 tokens; a doc's sequence id / offset
    is where its first token lands. This is the packer that turns variable
    -length documents into fixed-length training rows without padding
    waste.

    Scale shape: packing is windowed over (source, pack_shard) — NOT the
    whole source — so parallelism grows with the corpus (each shard packs
    independently; training consumes shards independently, so cross-shard
    sequence continuity buys nothing). One shuffle, integer-only output,
    exact SQL twin."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source",
        F.floor(F.col("doc_id") / 1000).cast("bigint").alias("pack_shard"),
        F.size(token_array(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    w = (Window.partitionBy("source", "pack_shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = sized.withColumn(
        "start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return packed.select(
        "doc_id", "source", "pack_shard",
        F.floor(F.col("start_off") / 64).cast("bigint").alias("seq_id"),
        "n_tok",
        (F.col("start_off") % 64).cast("bigint").alias("tok_offset"),
    )


@register("doc_shard_assign", f"""
WITH {_TOK_LIST_CTE},
sh AS (
  SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tok,
         LENGTH(d.text) AS n_chars,
         CAST('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           % 16 AS shard_id
  FROM tl t JOIN documents d USING (doc_id))
SELECT CAST(shard_id AS INTEGER) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM sh GROUP BY 1
""")
def q_doc_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable output sharding: every doc hashes to one of 16 training
    shards via md5(doc_id) — rerunning the pipeline lands each doc in the
    same shard regardless of cluster size or input order, which is what
    makes incremental re-publishes and resumable training epochs safe.
    The summary per shard doubles as the balance check (hash sharding
    keeps shards within a few percent of each other). A writer pairs this
    with repartition(16, shard_id) so each shard lands as one file set;
    the md5-prefix integer is the same cross-engine hash trick the SimHash
    oracle pins down. One map-side-combined shuffle to 16 rows."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("bigint") % 16).cast("int")
    sized = docs.select(
        "doc_id",
        F.size(token_array(F.col("text"))).cast("bigint").alias("n_tok"),
        F.length("text").cast("bigint").alias("n_chars"),
        shard.alias("shard_id"),
    )
    return sized.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register("events_json_rescue", """
WITH feed AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 13 = 0
              THEN substr(props, 1, LENGTH(props) - 1) ELSE props END AS props
  FROM events),
parsed AS (
  SELECT event_id, event_type,
         CASE WHEN json_valid(props) THEN CAST(props->>'k' AS BIGINT) END AS k
  FROM feed)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
       CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k
FROM parsed GROUP BY 1
""")
def q_events_json_rescue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record routing: parse a JSON feed where some records are
    corrupt (stand-in: drop the closing brace of every 13th event), route
    parse failures to a quarantine count instead of failing the job, and
    aggregate the survivors. get_json_object returns NULL on malformed
    input — the per-row rescue is a projection, no UDF, no job abort; a
    production variant writes the quarantined rows to a dead-letter path
    with the same predicate. The feed synthesis is deterministic so the
    DuckDB twin (json_valid + ->>) checks the exact routing split."""
    ev = load_table(spark, sf_dir, "events")
    feed = ev.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 13 == 0,
               F.expr("substring(props, 1, length(props) - 1)"))
        .otherwise(F.col("props")).alias("props"),
    )
    parsed = feed.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_quarantined"),
        F.sum(F.coalesce(F.col("k"), F.lit(0))).alias("sum_k"),
    )


@register("embedding_quantize", """
WITH scaled AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings),
q AS (
  SELECT e.vec_id, t.i - 1 AS idx,
         CASE WHEN s.mx = 0 THEN 0
              ELSE CAST(FLOOR(CAST(e.embedding[t.i] AS DOUBLE) * (127.0 / s.mx)
                              + 0.5) AS INTEGER) END AS qval
  FROM embeddings e JOIN scaled s USING (vec_id),
       unnest(generate_series(1, len(e.embedding))) t(i))
SELECT vec_id, CAST(idx AS INTEGER) AS idx, qval
FROM q
""")
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    compression step in front of a quantized ANN index (4x smaller than
    float32, dot products in integer SIMD). scale = 127/max|x| per
    vector; qval = floor(x*scale + 0.5) — floor(+0.5) instead of round()
    because the two engines disagree on rounding mode at exact .5 ties,
    while this formula is pure IEEE double arithmetic and bit-identical.
    Narrow op: per-row array max + posexplode, no shuffle; output is the
    long (vec_id, idx, qval) form an index builder consumes."""
    emb = load_table(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding",
                                 lambda x: F.abs(x.cast("double"))))
    flat = emb.select(
        "vec_id", mx.alias("mx"),
        F.posexplode(F.col("embedding")).alias("idx", "val"),
    )
    qval = F.when(F.col("mx") == 0, F.lit(0)).otherwise(
        F.floor(F.col("val").cast("double") * (F.lit(127.0) / F.col("mx"))
                + F.lit(0.5)).cast("int"))
    return flat.select("vec_id", "idx", qval.alias("qval"))


@register("dedup_keep_best", """
WITH keyed AS (
  SELECT doc_id, n_chars,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
           AS content_key
  FROM documents),
ranked AS (
  SELECT doc_id, n_chars, content_key,
         ROW_NUMBER() OVER (PARTITION BY content_key
                            ORDER BY n_chars DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY content_key) AS n_dups
  FROM keyed)
SELECT content_key, doc_id AS kept_doc,
       CAST(n_chars AS BIGINT) AS kept_chars,
       CAST(n_dups AS BIGINT) AS n_dups
FROM ranked WHERE rk = 1
""")
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of exact dedup: within each content-identical group
    keep one canonical document — highest quality wins (stand-in score:
    n_chars; a production pipeline plugs its quality model's score in),
    doc_id as the deterministic tiebreak. One shuffle on content_key;
    rank and group size share the same window exchange. Composes
    functions.dedup.exact_dedup_keys's grouping with a selection policy
    instead of min-id."""
    from traffic_data_pipeline_spark.functions.text import normalize

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "n_chars",
        F.md5(normalize(F.col("text"))).alias("content_key"),
    )
    w = Window.partitionBy("content_key").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    ranked = keyed.select(
        "content_key", "doc_id", "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("content_key")).alias("n_dups"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        F.col("content_key"),
        F.col("doc_id").alias("kept_doc"),
        F.col("n_chars").cast("bigint").alias("kept_chars"),
        F.col("n_dups").cast("bigint").alias("n_dups"),
    )


@register("doc_mixture_rebalance", f"""
WITH {_TOK_LIST_CTE},
sized AS (
  SELECT t.doc_id, d.source, CAST(len(t.l) AS BIGINT) AS n_tok
  FROM tl t JOIN documents d USING (doc_id)),
budget AS (
  SELECT MIN(tok) AS m FROM (
    SELECT source, SUM(n_tok) AS tok FROM sized GROUP BY 1)),
cum AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM sized)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(SUM(n_tok) AS BIGINT) AS tok_before,
       CAST(SUM(CASE WHEN running <= (SELECT m FROM budget)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN running <= (SELECT m FROM budget)
                     THEN n_tok ELSE 0 END) AS BIGINT) AS tok_kept
FROM cum GROUP BY 1
""")
def q_doc_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing under a token budget: every source contributes
    at most the smallest source's token total, taken as a deterministic
    doc_id-ordered prefix (no RNG — reruns keep identical docs). This is
    the knob that stops one over-crawled source from dominating a
    training mix. The budget is a scalar broadcast; the prefix test rides
    the same per-source cumulative-sum window the packer uses. Integer
    counts only, so the oracle hash is exact."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source",
        F.size(token_array(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    budget = sized.groupBy("source").agg(F.sum("n_tok").alias("tok")) \
        .agg(F.min("tok").alias("m"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = sized.withColumn("running", F.sum("n_tok").over(w)) \
        .join(F.broadcast(budget))
    kept = F.when(F.col("running") <= F.col("m"), 1).otherwise(0)
    return cum.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum("n_tok").alias("tok_before"),
        F.sum(kept).alias("n_kept"),
        F.sum(F.when(F.col("running") <= F.col("m"), F.col("n_tok"))
              .otherwise(0)).alias("tok_kept"),
    )


@register("events_zscore_anomaly", """
WITH stats AS (
  SELECT event_type,
         COUNT(value) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS q
  FROM events GROUP BY 1)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN (e.value - t.s / t.n) * (e.value - t.s / t.n)
                          > 9.0 * (t.q / t.n - (t.s / t.n) * (t.s / t.n))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM events e JOIN stats t USING (event_type)
GROUP BY 1
""")
def q_events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outlier flagging per event type. Scale shape: the stats
    side is a map-side-combined aggregate to ONE row per type, broadcast
    back over the stream — the fact is never shuffled (a window over
    5 event types would funnel 100 TB into 5 partitions). Mean/variance
    derive from exact decimal sums, so both engines compute bit-identical
    doubles and the strict > flag cannot flip at the boundary."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        dsum(F.col("value")).alias("s"),
        dsum(F.col("value") * F.col("value")).alias("q"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    mean = F.col("s") / F.col("n")
    var = F.col("q") / F.col("n") - mean * mean
    dev = F.col("value") - mean
    flag = F.when(dev * dev > F.lit(9.0) * var, 1).otherwise(0)
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(flag).cast("bigint").alias("n_anomalies"),
    )


@register("top_supplier", """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""")
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the top
    one(s). The max is a scalar aggregate broadcast against the revenue
    frame — not a global window, which would sort every supplier in one
    partition. Revenue is decimal-exact, so the equality join against the
    max cannot miss by an ulp and the oracle hash holds. Shipdate filter
    reaches the parquet scan as a pushed predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(sup, F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_VOCAB_CTE = _TOK_LIST_CTE + """,
tok AS (SELECT doc_id, unnest(l) AS token FROM tl),
vocab AS (
  SELECT token, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS df
  FROM tok GROUP BY 1 HAVING COUNT(*) >= 5)
"""


@register("vocab_build", f"""
WITH {_VOCAB_CTE}
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_total DESC, token) AS BIGINT)
         AS token_id,
       token, CAST(n_total AS BIGINT) AS n_total, CAST(df AS BIGINT) AS df
FROM vocab
""")
def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary: corpus token counts, a min-count cutoff
    (>= 5), and dense ids by (frequency desc, token). The count aggregate
    is the only full-stream shuffle (map-side combined); the id window
    sorts just the CUTOFF vocabulary — a dimension, not the stream — and
    this is the one shape where a single-partition sort is correct at
    100 TB too, because a vocabulary that doesn't fit one task isn't a
    usable vocabulary. OOV scoring (doc_oov_rate) broadcasts the result
    back against the stream."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode("tok").alias("token"))
    vocab = (tok.groupBy("token")
             .agg(F.count(F.lit(1)).alias("n_total"),
                  F.countDistinct("doc_id").alias("df"))
             .filter(F.col("n_total") >= 5))
    w = Window.orderBy(F.col("n_total").desc(), "token")
    return vocab.select(
        F.row_number().over(w).cast("bigint").alias("token_id"),
        "token", F.col("n_total").cast("bigint").alias("n_total"),
        F.col("df").cast("bigint").alias("df"),
    )


@register("doc_oov_rate", f"""
WITH {_VOCAB_CTE}
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM tok t LEFT JOIN vocab v USING (token)
GROUP BY 1
""")
def q_doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary counts per document against the min-count-5
    vocabulary — the coverage check run before committing to a tokenizer.
    The vocab is broadcast (it is a cutoff dimension); the token stream
    aggregates per doc with map-side partials, so the only full-stream
    shuffle is the final doc_id group-by."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode("tok").alias("token"))
    vocab = (tok.groupBy("token")
             .agg(F.count(F.lit(1)).alias("n_total"))
             .filter(F.col("n_total") >= 5)
             .select("token", F.lit(1).alias("_in")))
    return (tok.join(F.broadcast(vocab), "token", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tok"),
                 F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
                 .alias("n_oov")))


_EVENTS_STREAM_CACHE: dict[str, str] = {}


def _events_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Plain events landing zone for stream-stream queries (ingest-side
    setup, memoized per sf_dir like _dup_events_dir)."""
    if not cached_dir_valid(_EVENTS_STREAM_CACHE, sf_dir):
        src = scratch_dir(prefix="tdp_events_stream_")
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        ).write.mode("overwrite").parquet(src)
        _EVENTS_STREAM_CACHE[sf_dir] = src
    return _EVENTS_STREAM_CACHE[sf_dir]


@register("streaming_click_purchase", """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       p.value AS purchase_value
FROM events c JOIN events p
  ON c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
""")
def q_streaming_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join — the attribution query (purchases
    within 30 minutes of a click, per user) run as two watermarked
    streams joined on user + a time-range predicate. The event-time
    constraint is what makes the state bounded: each side holds only rows
    inside watermark + range, evicting as the watermark advances — an
    unconstrained stream join would buffer both streams forever. Inner
    joins emit eagerly on match, so the availableNow run reproduces the
    batch self-join exactly and the oracle hash-checks streaming==batch,
    like the aggregation and dedup streaming queries.

    streaming==batch holds only while the landing zone fits one
    micro-batch: parquet file order is not time order, so if the file
    source split the feed (maxFilesPerTrigger, a larger fixture), files
    landing in batch 2 with event times behind batch 1's watermark
    (max ts - 1h) would be dropped pre-join and matches silently lost.
    The run asserts single-input-batch execution below rather than
    widening the watermark — the 1-hour state horizon IS the semantics
    under test; a restart mid-feed is the legitimate multi-batch path and
    is covered by the kill-and-resume test, which replays from the
    checkpoint in file-arrival order."""
    from traffic_data_pipeline_spark.plans.queries import run_available_now

    src = _events_stream_dir(spark, sf_dir)
    sink = scratch_dir(prefix="tdp_ssj_sink_")
    ckpt = scratch_dir(prefix="tdp_ssj_ckpt_")
    schema = "event_id long, ts timestamp, user_id long, " \
             "event_type string, value double"
    clicks = (
        spark.readStream.schema(schema).parquet(src)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"), "user_id")
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        spark.readStream.schema(schema).parquet(src)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
                F.col("user_id").alias("p_user_id"),
                F.col("value").alias("purchase_value"))
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr("user_id = p_user_id AND "
               "purchase_ts >= click_ts AND "
               "purchase_ts <= click_ts + interval 30 minutes"),
    )
    # state tracks the watermark horizon, not batch width
    q = run_available_now(spark, "streaming_click_purchase",
                          agg=joined, sink=sink, ckpt=ckpt)
    data_batches = sum(
        1 for p in q.recentProgress if (p["numInputRows"] or 0) > 0)
    if data_batches > 1:
        raise AssertionError(
            f"streaming_click_purchase: landing zone split across "
            f"{data_batches} micro-batches — out-of-time-order files behind "
            f"the watermark can drop matches, so streaming==batch no longer "
            f"holds (see docstring)")
    return spark.read.parquet(sink).select(
        "user_id", "click_id", "purchase_id",
        fmt_ts(F.col("click_ts")).alias("click_ts"),
        fmt_ts(F.col("purchase_ts")).alias("purchase_ts"),
        "purchase_value",
    )


def _corpus_prep_oracle() -> str:
    from traffic_data_pipeline_spark.functions.text import STOPWORDS_EN

    stop = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
WITH {_TOK_LIST_CTE},
keyed AS (
  SELECT doc_id, source, n_chars,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
           AS ck
  FROM documents),
ranked AS (
  SELECT doc_id, source, ck,
         ROW_NUMBER() OVER (PARTITION BY ck
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM keyed),
s1 AS (SELECT doc_id, source FROM ranked WHERE rk = 1),
tok AS (SELECT doc_id, unnest(l) AS token FROM tl),
tok_agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN token IN ({stop}) THEN 1 ELSE 0 END) AS n_stop,
         SUM(length(token)) AS tok_chars
  FROM tok GROUP BY 1),
s2 AS (
  SELECT s1.doc_id, s1.source, t.n_tokens
  FROM s1 JOIN tok_agg t USING (doc_id)
  WHERE t.n_tokens >= 10
    AND t.n_stop / t.n_tokens >= 0.05
    AND t.tok_chars / t.n_tokens BETWEEN 2.0 AND 12.0),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(l[g:g+7], ' ') AS gram
  FROM tl, unnest(generate_series(1, greatest(len(l) - 7, 0))) s(g)),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
dirty AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (gram)
  WHERE g.doc_id % 97 <> 0),
s3 AS (
  SELECT s2.* FROM s2
  WHERE s2.doc_id % 97 <> 0
    AND s2.doc_id NOT IN (SELECT doc_id FROM dirty)),
raw AS (SELECT source, COUNT(*) AS n_raw FROM documents GROUP BY 1),
d1 AS (SELECT source, COUNT(*) AS n_dedup FROM s1 GROUP BY 1),
d2 AS (SELECT source, COUNT(*) AS n_quality FROM s2 GROUP BY 1),
d3 AS (SELECT source, COUNT(*) AS n_final,
              SUM(n_tokens) AS tokens_final
       FROM s3 GROUP BY 1)
SELECT r.source, CAST(r.n_raw AS BIGINT) AS n_raw,
       CAST(COALESCE(d1.n_dedup, 0) AS BIGINT) AS n_dedup,
       CAST(COALESCE(d2.n_quality, 0) AS BIGINT) AS n_quality,
       CAST(COALESCE(d3.n_final, 0) AS BIGINT) AS n_final,
       CAST(COALESCE(d3.tokens_final, 0) AS BIGINT) AS tokens_final
FROM raw r
LEFT JOIN d1 USING (source) LEFT JOIN d2 USING (source)
LEFT JOIN d3 USING (source)
"""


@register("corpus_prep_pipeline", _corpus_prep_oracle())
def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-prep FUNNEL as one composed job (the extension-surface
    sibling of node_qaqc, which composes the whole traffic pipeline):
    exact keep-best dedup -> Gopher-style quality gate -> benchmark
    8-gram decontamination, reported per source as a survivor funnel
    (n_raw -> n_dedup -> n_quality -> n_final + final token budget) —
    the one-line health readout a nightly corpus build publishes.

    Composition reuses each stage's registered shape: the keep-best
    window (one content-key exchange), the token-stats aggregate (one
    token shuffle), the broadcast benchmark-gram probe (corpus grams
    move once); stage survivorship propagates by co-keyed doc_id
    semi/anti joins, so the funnel costs the sum of its stages plus
    joins on an already-small survivor frame — no stage recomputes
    another's work. Quality thresholds are single double divisions of
    exact integers (the doc_quality_filter boundary semantics,
    bit-identical cross-engine)."""
    from traffic_data_pipeline_spark.functions.text import normalize, text_stats

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "source", "n_chars",
        F.md5(normalize(F.col("text"))).alias("ck"))
    w = Window.partitionBy("ck").orderBy(F.col("n_chars").desc(), "doc_id")
    s1 = keyed.withColumn("rk", F.row_number().over(w)) \
        .filter(F.col("rk") == 1).select("doc_id", "source")
    qual = (
        text_stats(docs)
        .filter((F.col("n_tokens") >= 10)
                & F.col("stopword_ratio").isNotNull()
                & (F.col("stopword_ratio") >= 0.05)
                & F.col("mean_token_len").between(2.0, 12.0))
        .select("doc_id", "n_tokens")
    )
    s2 = s1.join(qual, "doc_id")
    toks = _spread(docs)
    grams = toks.select(
        "doc_id", F.explode(ngram_array("tok", 8)).alias("gram"))
    bench = (
        toks.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(F.array_distinct(ngram_array("tok", 8)))
                .alias("gram"))
        .distinct()
    )
    dirty = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .select("doc_id").distinct()
    )
    s3 = s2.filter(F.col("doc_id") % 97 != 0).join(dirty, "doc_id", "left_anti")
    raw = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    d1 = s1.groupBy("source").agg(F.count(F.lit(1)).alias("n_dedup"))
    d2 = s2.groupBy("source").agg(F.count(F.lit(1)).alias("n_quality"))
    d3 = s3.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum("n_tokens").alias("tokens_final"))
    return (
        raw.join(d1, "source", "left").join(d2, "source", "left")
        .join(d3, "source", "left")
        .select(
            "source",
            F.col("n_raw").cast("bigint").alias("n_raw"),
            F.coalesce("n_dedup", F.lit(0)).cast("bigint").alias("n_dedup"),
            F.coalesce("n_quality", F.lit(0)).cast("bigint")
            .alias("n_quality"),
            F.coalesce("n_final", F.lit(0)).cast("bigint").alias("n_final"),
            F.coalesce("tokens_final", F.lit(0)).cast("bigint")
            .alias("tokens_final"),
        )
    )
