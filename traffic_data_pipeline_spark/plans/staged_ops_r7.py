"""Round-7 staging area: operators implemented and oracle-gated NOW but
intentionally NOT registered, honoring the registration freeze until the
round-6 promotion (22 staged r6 ops + the ANN margin-align twin) drains
through the driver's CORRECTNESS window.

Same contract as the two promoted staging areas (plans/staged_ops.py,
plans/staged_ops_r6.py): each op is a Spark callable
``(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column names, so the round-7 promotion is the same mechanical
fold — add the tail fold here, import this module at the end of
plans/queries.py, move STAGED_R7_CAPS into tests/test_plan_shapes.py,
flip the freeze test into a promotion check, and queue the
BENCH_STAGED-costly names into ``__spark_entry__._COSTLY_TAIL``.
tests/test_staged_ops_r7.py runs the identical query-vs-oracle gate at
sf0.01, pins exchange caps, and a freeze-guard test pins that none of
these names leaks into ``__spark_entry__.queries()`` this round.

Operator set (VERDICT r5 ask #6's named gaps + training-data/analytics
gaps after the round-6 sweep):

- ``lang_fertility_drift`` — tokenizer-fertility drift across corpus
  snapshots (the corpus_snapshot_diff old/new convention): per-language
  BPE-per-whitespace-token fertility in each snapshot and the delta —
  the monitor that catches a new crawl shifting token costs before a
  training run budgets against stale counts.
- ``dedup_exact_substring_spans`` — EXACT maximal duplicated token
  spans (Lee et al. 2022's suffix-array dedup semantics re-expressed):
  every 8-token gram shared by >= 2 documents, merged per document into
  maximal [start, end] token spans by gaps-and-islands — the exact form
  of the approximate span op promoted in round 5.
- ``corpus_stratified_sample`` — joint-grain stratified sampling: exact
  Hamilton (largest-remainder) quota allocation at the (source, lang)
  grain against a fixed document budget, then a deterministic
  md5-ranked reservoir pick inside each stratum.
- ``dedup_cross_source_matrix`` — cross-source duplication matrix over
  the shared LSH pair stream: which sources copy from which, as
  unordered source-pair candidate counts and shares.
- ``embedding_ivf_balance_report`` — IVF index health audit: inverted-
  list sizes under the registered deterministic centroid seeding,
  per-list share and imbalance factor vs the uniform ideal — the
  pre-flight that decides whether an IVF index needs re-seeding.
- ``events_value_benford`` — Benford first-digit audit of event values
  per event type: observed digit shares vs log10(1 + 1/d) expectation
  and the chi-square statistic — the classic synthetic-data / fraud
  pre-flight.
- ``events_retention_cohorts`` — cohort retention triangle: users
  cohorted by first-activity date, retention share at day offsets
  0/1/7/14 — the product-analytics readout next to churn hazard.
- ``doc_repetition_profile`` — within-document repetition signals the
  Gopher rule family (doc_gopher_quality) deliberately left out:
  duplicate 3-gram fraction, top-2-gram share, longest same-token run,
  distinct-token ratio.
- ``events_markov_removal_effect`` — Markov attribution: per-channel
  removal effect on the START->purchase absorption probability of the
  user-journey chain, fixed-point iterated with per-step DECIMAL
  quantization so both engines walk the identical orbit.
- ``dedup_threshold_sweep`` — dedup what-if: for each MinHash
  similarity threshold, candidate-pair count, touched-document count,
  and one-round-min-id survivor count — the curve that picks a
  threshold before committing a full dedup run.
- ``corpus_lang_source_coverage`` — joint (lang, source) coverage:
  observed counts vs independence expectation, PMI and lift — the
  corpus-composition diagnostic behind mixture reweighting.
- ``streaming_minhash_index`` — stream-native incremental MinHash index
  maintenance: documents arrive in micro-batches, each batch's band
  keys join the accumulated index, NEW candidate pairs emit per batch;
  the union over batches must equal the batch pair stream exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traffic_data_pipeline_spark.plans.oracle_ctes import (
    _MH_PAIRS_CTE,
    _MINHASH_CTES,
    _TOK_LIST_CTE,
)
from traffic_data_pipeline_spark.sources.tables import load_table

STAGED_R7_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_R7_ORACLES: dict[str, str] = {}


def staged_r7(name: str, oracle: str | None = None):
    def deco(fn):
        STAGED_R7_QUERIES[name] = fn
        if oracle is not None:
            STAGED_R7_ORACLES[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# lang_fertility_drift — tokenizer fertility drift across corpus snapshots
# ---------------------------------------------------------------------------

_BPE_RE_SQL = "'''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+'"


@staged_r7("lang_fertility_drift", f"""
WITH vers AS (
  SELECT doc_id, lang, text, 'old' AS snap
  FROM documents WHERE doc_id % 7 != 0
  UNION ALL
  SELECT doc_id, lang,
         CASE WHEN doc_id % 11 = 0 THEN text || ' [recrawled]'
              ELSE text END AS text,
         'new' AS snap
  FROM documents),
counts AS (
  SELECT snap, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_extract_all(text, {_BPE_RE_SQL})))
              AS BIGINT) AS bpe,
         CAST(SUM(len(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> t != ''))) AS BIGINT) AS ws
  FROM vers GROUP BY 1, 2),
fert AS (
  SELECT snap, lang, n_docs, bpe, ws,
         ROUND(CAST(bpe AS DOUBLE) / NULLIF(ws, 0), 6) AS fertility
  FROM counts)
SELECT n.lang,
       o.n_docs AS n_docs_old, n.n_docs AS n_docs_new,
       o.fertility AS fertility_old, n.fertility AS fertility_new,
       ROUND(n.fertility - o.fertility, 6) AS drift
FROM fert n JOIN fert o ON o.lang = n.lang
WHERE n.snap = 'new' AND o.snap = 'old'
""")
def q_lang_fertility_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility drift across corpus snapshots (VERDICT r5 ask
    #6): per language, BPE-ish subword tokens per whitespace token in
    the previous crawl vs the current one, and the delta. A fertility
    jump means the new crawl's text costs more LLM tokens per word
    (encoding drift, boilerplate shift, language contamination) — the
    monitor a token-budgeted training run checks before trusting
    historical token counts. Snapshots follow corpus_snapshot_diff's
    deterministic convention (old = doc_id % 7 != 0; new = all docs
    with every 1-in-11 text re-crawled — the appended marker changes
    both token counts, so drift is provably nonzero at the fixture).

    Determinism: integer token-count sums; ONE ROUND-6 division per
    (snapshot, lang); drift subtracts the two ROUNDED fertilities
    (order-free). NULLIF guards an all-symbol language (ws = 0).

    Scale shape: the two snapshot projections are narrow passes over
    the same scan (regexp counts in-row, no explode), ONE
    (snap, lang) map-side-combined aggregate, and a #langs-row
    self-join — nothing keyed wider than 2 x |langs|.
    """
    from traffic_data_pipeline_spark.functions.text import bpe_token_count
    from traffic_data_pipeline_spark.plans.staged_ops import (
        SNAP_ADD_MOD,
        SNAP_EDIT_MOD,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % SNAP_ADD_MOD != 0).select(
        "doc_id", "lang", "text", F.lit("old").alias("snap"))
    new = docs.select(
        "doc_id", "lang",
        F.when(F.col("doc_id") % SNAP_EDIT_MOD == 0,
               F.concat(F.col("text"), F.lit(" [recrawled]")))
        .otherwise(F.col("text")).alias("text"),
        F.lit("new").alias("snap"))
    vers = old.unionByName(new)
    counted = bpe_token_count(vers, id_col="snap").select(
        "snap", "n_bpe_tokens", "n_ws_tokens").join(
        vers.select("snap", "lang", "text").drop("text"), "snap")
    # bpe_token_count keys by one column; recompute inline instead to
    # keep (snap, lang, doc) granularity without a join — see below
    del counted
    from traffic_data_pipeline_spark.functions.text import (
        BPE_TOKEN_RE,
        TOKEN_SPLIT_RE,
    )

    percounts = vers.select(
        "snap", "lang",
        F.array_size(F.regexp_extract_all(
            F.col("text"), F.lit(BPE_TOKEN_RE), 0)).alias("bpe"),
        F.array_size(
            F.filter(F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE),
                     lambda t: t != "")).alias("ws"))
    fert = percounts.groupBy("snap", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("bpe").cast("bigint").alias("bpe"),
        F.sum("ws").cast("bigint").alias("ws"),
        F.round(F.sum("bpe").cast("double")
                / F.nullif(F.sum("ws").cast("bigint"), F.lit(0).cast("bigint")),
                6).alias("fertility"))
    n = fert.filter(F.col("snap") == "new").select(
        "lang", F.col("n_docs").alias("n_docs_new"),
        F.col("fertility").alias("fertility_new"))
    o = fert.filter(F.col("snap") == "old").select(
        "lang", F.col("n_docs").alias("n_docs_old"),
        F.col("fertility").alias("fertility_old"))
    return (
        n.join(o, "lang")
        .select("lang", "n_docs_old", "n_docs_new",
                "fertility_old", "fertility_new",
                F.round(F.col("fertility_new") - F.col("fertility_old"), 6)
                .alias("drift"))
    )


# ---------------------------------------------------------------------------
# dedup_exact_substring_spans — Lee-et-al-style exact duplicated spans
# ---------------------------------------------------------------------------

SPAN_L = 8        # gram width in tokens (the _GRAMS8_CTE convention)


@staged_r7("dedup_exact_substring_spans", f"""
WITH {_TOK_LIST_CTE},
grams AS (
  SELECT doc_id, g AS i, md5(array_to_string(l[g:g+{SPAN_L - 1}], ' ')) AS gk
  FROM tl, unnest(generate_series(1, greatest(len(l) - {SPAN_L - 1}, 0))) s(g)),
dup AS (
  SELECT gk FROM grams GROUP BY gk HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (
  SELECT g.doc_id, g.i,
         CASE WHEN g.i - LAG(g.i) OVER (PARTITION BY g.doc_id ORDER BY g.i)
                   > {SPAN_L} OR LAG(g.i) OVER (PARTITION BY g.doc_id
                                                ORDER BY g.i) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM grams g JOIN dup USING (gk)),
isl AS (
  SELECT doc_id, i,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM hits)
SELECT doc_id,
       CAST(MIN(i) AS BIGINT) AS span_start,
       CAST(MAX(i) + {SPAN_L - 1} AS BIGINT) AS span_end,
       CAST(MAX(i) - MIN(i) + {SPAN_L} AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_dup_grams
FROM isl GROUP BY doc_id, island
""")
def q_dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT maximal duplicated token spans — the deduplicate-text-
    datasets (Lee et al. 2022) semantics the round-5 approximate span op
    trades away, re-expressed without a suffix array: a position is
    duplicated iff its 8-token gram appears in >= 2 distinct documents,
    and per document, duplicated positions whose windows overlap or
    touch (gap <= 8) merge into ONE maximal [span_start, span_end] token
    span by gaps-and-islands. A suffix array finds the same >= L
    cross-document repeats; the gram-keyed form is the shuffle-friendly
    equivalent (MinHash-LSH : suffix automaton :: this : suffix array)
    and is exact for spans at gram granularity.

    Determinism: md5 gram keys, integer positions, integer island
    arithmetic — no floats anywhere.

    Scale shape: ONE gram-keyed distinct-doc count (map-side combined,
    8-byte hashed keys), a semi-join of positions against the
    duplicated-key set, and ONE per-doc window for the island merge.
    The gram key space grows with the corpus, so bucket occupancy — and
    the pair-free plan here never materializes ANY doc x doc pair.
    """
    from traffic_data_pipeline_spark.functions.text import ngram_array
    from traffic_data_pipeline_spark.plans.llm_ops import _spread

    docs = _spread(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        F.posexplode(ngram_array("tok", SPAN_L)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("i"),
             F.md5("gram").alias("gk"))
    dup = (grams.groupBy("gk")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2).select("gk"))
    w = Window.partitionBy("doc_id").orderBy("i")
    hits = (grams.join(dup, "gk")
            .select("doc_id", "i",
                    F.when(F.lag("i").over(w).isNull()
                           | ((F.col("i") - F.lag("i").over(w)) > SPAN_L),
                           1).otherwise(0).alias("brk")))
    isl = hits.select(
        "doc_id", "i",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"))
    return isl.groupBy("doc_id", "island").agg(
        F.min("i").cast("bigint").alias("span_start"),
        (F.max("i") + (SPAN_L - 1)).cast("bigint").alias("span_end"),
        (F.max("i") - F.min("i") + SPAN_L).cast("bigint")
        .alias("span_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_dup_grams"),
    ).drop("island")


# ---------------------------------------------------------------------------
# corpus_stratified_sample — Hamilton-quota reservoir at (source, lang)
# ---------------------------------------------------------------------------

SAMPLE_BUDGET = 100


@staged_r7("corpus_stratified_sample", f"""
WITH strata AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM strata),
quo AS (
  SELECT s.source, s.lang, s.n,
         CAST(({SAMPLE_BUDGET} * s.n) // t.total AS BIGINT) AS fl,
         CAST(({SAMPLE_BUDGET} * s.n) % t.total AS BIGINT) AS rem
  FROM strata s, tot t),
leftover AS (
  SELECT CAST({SAMPLE_BUDGET} - SUM(fl) AS BIGINT) AS k FROM quo),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source, lang) AS rk
  FROM quo),
quota AS (
  SELECT source, lang,
         LEAST(fl + CASE WHEN rk <= l.k THEN 1 ELSE 0 END, n) AS q
  FROM ranked, leftover l),
picks AS (
  SELECT d.doc_id, d.source, d.lang,
         ROW_NUMBER() OVER (PARTITION BY d.source, d.lang
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                     d.doc_id) AS sample_rank
  FROM documents d)
SELECT p.doc_id, p.source, p.lang,
       CAST(p.sample_rank AS BIGINT) AS sample_rank
FROM picks p JOIN quota q
  ON q.source = p.source AND q.lang = p.lang AND p.sample_rank <= q.q
""")
def q_corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint-grain stratified sampling with exact Hamilton rounding
    (VERDICT r5 ask #6): a fixed document budget is apportioned across
    (source, lang) strata by largest remainder — floor quotas plus one
    extra for the strata with the largest remainders, ties broken by
    (source, lang) — then each stratum's quota is filled by a
    deterministic md5-ranked reservoir (every doc equally likely under
    the hash ordering, identical picks in both engines). This is
    mixture_budget_allocate's Hamilton arithmetic promoted from the lang
    grain to the joint grain AND carried through to actual row
    selection — the sampling job, not just the plan for one.

    Determinism: quotas are exact integer floor/mod arithmetic; the
    leftover ranking and the in-stratum reservoir are total orders
    (md5 text, id tiebreak). No floats anywhere.

    Scale shape: ONE (source, lang) count aggregate (map-side combined,
    #strata rows), the quota arithmetic on that tiny frame (broadcast
    back), and ONE per-stratum rank window over the corpus — the same
    single-exchange shape as doc_sample_quota, now budget-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = strata.agg(F.sum("n").cast("bigint").alias("total"))
    quo = strata.crossJoin(F.broadcast(tot)).select(
        "source", "lang", "n",
        F.expr(f"CAST(({SAMPLE_BUDGET} * n) DIV total AS BIGINT)").alias("fl"),
        F.expr(f"CAST(({SAMPLE_BUDGET} * n) % total AS BIGINT)").alias("rem"))
    leftover = quo.agg(
        (F.lit(SAMPLE_BUDGET).cast("bigint") - F.sum("fl").cast("bigint"))
        .alias("k"))
    wr = Window.orderBy(F.col("rem").desc(), "source", "lang")
    quota = (quo.select("source", "lang", "n", "fl",
                        F.row_number().over(wr).alias("rk"))
             .crossJoin(F.broadcast(leftover))
             .select("source", "lang",
                     F.least(
                         F.col("fl") + F.when(F.col("rk") <= F.col("k"), 1)
                         .otherwise(0),
                         F.col("n")).alias("q")))
    wp = Window.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    picks = docs.select(
        "doc_id", "source", "lang",
        F.row_number().over(wp).alias("sample_rank"))
    return (picks.join(F.broadcast(quota), ["source", "lang"])
            .filter(F.col("sample_rank") <= F.col("q"))
            .select("doc_id", "source", "lang",
                    F.col("sample_rank").cast("bigint").alias("sample_rank")))


# ---------------------------------------------------------------------------
# dedup_cross_source_matrix — who copies from whom
# ---------------------------------------------------------------------------

@staged_r7("dedup_cross_source_matrix", f"""
WITH {_MINHASH_CTES},
{_MH_PAIRS_CTE},
sp AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b
  FROM mpairs m
  JOIN documents da ON da.doc_id = m.doc_a
  JOIN documents db ON db.doc_id = m.doc_b
  WHERE m.agree / 8.0 >= 0.5),
cnt AS (
  SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM sp GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS t FROM cnt)
SELECT c.source_a, c.source_b, c.n_pairs,
       ROUND(CAST(c.n_pairs AS DOUBLE) / t.t, 6) AS pair_share
FROM cnt c, tot t
""")
def q_dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: the shared LSH candidate pair
    stream (est_sim >= 0.5, the family threshold) joined back to each
    side's source label and folded to unordered source pairs — which
    sources duplicate WITHIN themselves (diagonal) and which copy from
    each other (off-diagonal). This is the report that decides
    source-level dedup ordering and licensing attribution before a
    cross-corpus merge.

    Determinism: pair stream is md5-band equality + integer agree
    counts; LEAST/GREATEST canonicalizes the unordered source pair; ONE
    ROUND-6 division by the total.

    Scale shape: rides the session-persisted pair stream (the nightly
    dedup artifact); two broadcast-able dimension joins back to
    documents (doc_id -> source is a projection of the corpus scan, and
    at 100 TB arrives pre-bucketed by doc_id like every pair consumer);
    ONE (source, source) map-side-combined count bounded by |sources|^2.
    """
    from traffic_data_pipeline_spark.plans.extensions import doc_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = doc_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sp = (pairs
          .join(docs.select(F.col("doc_id").alias("doc_a"),
                            F.col("source").alias("src_a")), "doc_a")
          .join(docs.select(F.col("doc_id").alias("doc_b"),
                            F.col("source").alias("src_b")), "doc_b")
          .select(F.least("src_a", "src_b").alias("source_a"),
                  F.greatest("src_a", "src_b").alias("source_b")))
    cnt = sp.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    tot = cnt.agg(F.sum("n_pairs").cast("bigint").alias("t"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "source_a", "source_b", "n_pairs",
        F.round(F.col("n_pairs").cast("double") / F.col("t"), 6)
        .alias("pair_share"))
