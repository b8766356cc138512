"""Round-9 staging area, PROMOTED into the live registry at round 9
(VERDICT r8 ask #1): built and oracle-gated during round 8 behind the
registration freeze, folded into QUERIES/ORACLES once the round-8
promotion (16 staged r8 ops) drained through the driver's CORRECTNESS
window (it did — all 16 earned hash-green rows in CORRECTNESS_r08).

Same contract as the four earlier promoted staging areas
(plans/staged_ops.py, plans/staged_ops_r6.py, plans/staged_ops_r7.py,
plans/staged_ops_r8.py): each op is a Spark callable
``(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column names. The promotion was the established mechanical
fold — the tail fold at the bottom of this module, the import at the
end of plans/queries.py, exchange caps moved into
tests/test_plan_shapes.py::CAPS, the freeze test flipped into a
promotion check, and the two BENCH_STAGED-costly streaming monitors
queued into ``__spark_entry__._COSTLY_TAIL``.
tests/test_staged_ops_r9.py keeps the identical query-vs-oracle gate at
sf0.01 addressing each op by its staged name.

Operator set (VERDICT r7 ask #5's named gaps — the round-9 staging
candidates the round-7 judge and SURVEY.md §7 tail both name):

- ``events_user_ldiversity`` — the l-diversity companion to the
  registered events_user_kanonymity: k-anonymity counts USERS per
  quasi-identifier cell; l-diversity counts distinct SENSITIVE values —
  a cell can hold 50 users who all share one sensitive value, and a
  released row from it still discloses that value for every one of
  them. Same QI (event_type, hour), same bucket-cube output shape, so
  the two audits read side by side.
- ``dedup_impact_by_lang_cc`` — per-language dedup impact under the
  EXACT-CC survivor rule (the dedup_minhash_canonical contract: one
  survivor per connected component, the component's min doc_id), the
  twin of the registered one-round min-id form dedup_impact_by_lang.
  Identical output columns, so the two survivor rules compare
  row-for-row: the CC rule removes strictly more (chains collapse).
- ``streaming_changepoint_monitor`` — events_changepoint_daily
  republished per micro-batch under the streaming_conformal_monitor
  contract: batchId-stamped (type, day) partials, full-row-DISTINCT
  replay dedup, and the SHARED plan owner _changepoint_from_daily —
  after the final batch the published report EQUALS the batch op on the
  full history, whose DuckDB oracle is this op's oracle VERBATIM.

Plus the three round-10 candidates SURVEY.md §7 names, built early into
the same area (each independently oracle-gated, capped, and swept):

- ``events_user_tcloseness`` — the next rung above l-diversity: the
  total-variation distance between each QI cell's sensitive-band
  distribution and the corpus's, bucketed — a cell can be l-diverse and
  still skewed enough that membership discloses the likely value.
- ``dedup_impact_by_source`` — the per-SOURCE marginal of the dedup
  bias audit (same one-round min-id rule and columns as the registered
  per-language form): crawls near-dup against each other within
  sources, and a source losing 3x the average share is the acquisition
  signal, not the language.
- ``streaming_tailindex_monitor`` — events_user_tail_index republished
  per micro-batch: batchId-stamped (type, user) partial counts (state
  is user-dimension-bounded — the WAU-stream state class), the SHARED
  plan owner _tail_index_from_counts, verbatim batch oracle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.functions.tmpdirs import cached_dir_valid
from traffic_data_pipeline_spark.sources.tables import load_table

STAGED_R9_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_R9_ORACLES: dict[str, str] = {}


def staged_r9(name: str, oracle: str | None = None):
    def deco(fn):
        STAGED_R9_QUERIES[name] = fn
        if oracle is not None:
            STAGED_R9_ORACLES[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# events_user_ldiversity — sensitive-value diversity inside each QI cell
# ---------------------------------------------------------------------------


@staged_r9("events_user_ldiversity", """
WITH cells AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(COUNT(DISTINCT CAST(FLOOR(value / 10.0) AS INTEGER))
              AS BIGINT) AS l_values,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
bucketed AS (
  SELECT CASE WHEN l_values = 1 THEN 'l=1'
              WHEN l_values < 5 THEN '2<=l<5'
              WHEN l_values < 10 THEN '5<=l<10'
              ELSE 'l>=10' END AS diversity_bucket,
         l_values, n_events
  FROM cells),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_total FROM cells)
SELECT b.diversity_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(b.l_values) AS BIGINT) AS n_value_slots,
       CAST(SUM(b.n_events) AS BIGINT) AS n_events,
       ROUND(CAST(COUNT(*) AS DOUBLE) / t.n_cells_total, 6) AS cell_share
FROM bucketed b, tot t
GROUP BY 1, t.n_cells_total
""")
def q_events_user_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the event log under the (event_type, hour)
    quasi-identifier — the companion the registered events_user_kanonymity
    needs before a release ships (VERDICT r7 ask #5): k-anonymity counts
    USERS per QI cell, but a cell whose 50 users all carry the SAME
    sensitive value still discloses that value for every one of them
    (the homogeneity attack l-diversity exists to catch). Sensitive
    attribute: the event's value band floor(value/10) — coarse enough
    that diversity is a property of the cell, not of float noise. A cell
    with l=1 releases its band by timing alone even at k>=10; the cube
    counts cells and events per diversity bucket next to the k-anonymity
    buckets, same QI, same output shape, so the two audits read side by
    side. Null-value events carry no sensitive value and are excluded on
    both sides.

    Determinism: the band is floor of one IEEE double division
    (engine-identical); all counts are exact integers over exact QI
    keys; ONE ROUND-6 share per bucket.

    Scale shape: ONE (type, hour) aggregate with a distinct-band count
    (map-side partials on the composite key), then a 4-row bucket fold;
    the cell-total scalar broadcasts. Distinct bands per cell are
    bounded by the band alphabet, so the distinct count never carries
    user-cardinality state (unlike the k-anonymity cell fold, which at
    100 TB swaps to the registered HLL sketch).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    cells = (ev.groupBy("event_type",
                        F.date_trunc("hour", F.col("ts")).alias("hr"))
             .agg(F.countDistinct(
                 F.floor(F.col("value") / 10.0).cast("int"))
                 .cast("bigint").alias("l_values"),
                 F.count(F.lit(1)).cast("bigint").alias("n_events"))
             .localCheckpoint(eager=True))  # bucket fold + total read it
    bucket = (F.when(F.col("l_values") == 1, "l=1")
              .when(F.col("l_values") < 5, "2<=l<5")
              .when(F.col("l_values") < 10, "5<=l<10")
              .otherwise("l>=10"))
    tot = cells.agg(F.count(F.lit(1)).cast("bigint")
                    .alias("n_cells_total"))
    return (cells.select(bucket.alias("diversity_bucket"), "l_values",
                         "n_events")
            .groupBy("diversity_bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                 F.sum("l_values").cast("bigint").alias("n_value_slots"),
                 F.sum("n_events").cast("bigint").alias("n_events"))
            .crossJoin(F.broadcast(tot))
            .select("diversity_bucket", "n_cells", "n_value_slots",
                    "n_events",
                    F.round(F.col("n_cells").cast("double")
                            / F.col("n_cells_total"), 6)
                    .alias("cell_share")))


# ---------------------------------------------------------------------------
# events_user_tcloseness — distributional skew of the sensitive attribute
# ---------------------------------------------------------------------------


@staged_r9("events_user_tcloseness", """
WITH ev AS (
  SELECT event_type, date_trunc('hour', ts) AS hr,
         CAST(FLOOR(value / 10.0) AS INTEGER) AS band
  FROM events WHERE value IS NOT NULL),
corpus AS (
  SELECT band, CAST(COUNT(*) AS BIGINT) AS cb FROM ev GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM ev),
cellband AS (
  SELECT event_type, hr, band, CAST(COUNT(*) AS BIGINT) AS qb
  FROM ev GROUP BY 1, 2, 3),
celln AS (
  SELECT event_type, hr, CAST(SUM(qb) AS BIGINT) AS nc
  FROM cellband GROUP BY 1, 2),
terms AS (
  -- FULL band alphabet per cell: a band absent from the cell still
  -- contributes |0 - P(band)|; the LEFT join against the corpus band
  -- list supplies the zeros
  SELECT cn.event_type, cn.hr, cn.nc,
         CAST(ROUND(ABS(COALESCE(cb2.qb, 0) / CAST(cn.nc AS DOUBLE)
                        - c.cb / CAST(n.nt AS DOUBLE)), 12)
              AS DECIMAL(14,12)) AS term
  FROM celln cn
  CROSS JOIN corpus c
  LEFT JOIN cellband cb2 ON cb2.event_type = cn.event_type
                        AND cb2.hr = cn.hr AND cb2.band = c.band, n),
tvd AS (
  SELECT event_type, hr, MAX(nc) AS n_events,
         ROUND(0.5 * CAST(SUM(term) AS DOUBLE), 6) AS t
  FROM terms GROUP BY 1, 2),
bucketed AS (
  SELECT CASE WHEN t < 0.1 THEN 't<0.1'
              WHEN t < 0.25 THEN '0.1<=t<0.25'
              WHEN t < 0.5 THEN '0.25<=t<0.5'
              ELSE 't>=0.5' END AS tcloseness_bucket,
         n_events, t
  FROM tvd),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells_total FROM tvd)
SELECT b.tcloseness_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(b.n_events) AS BIGINT) AS n_events,
       MAX(b.t) AS max_tvd,
       ROUND(CAST(COUNT(*) AS DOUBLE) / t.n_cells_total, 6) AS cell_share
FROM bucketed b, tot t
GROUP BY 1, t.n_cells_total
""")
def q_events_user_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit under the (event_type, hour) quasi-identifier —
    the rung above l-diversity (SURVEY.md §7's round-10 candidate,
    built early): a QI cell can hold many distinct sensitive values and
    STILL be skewed enough that membership discloses the likely value
    (the skewness attack t-closeness exists to catch). Per cell, the
    total-variation distance between the cell's sensitive-band
    distribution and the corpus's — over the FULL band alphabet, so a
    band absent from the cell contributes its corpus mass — bucketed at
    the conventional 0.1/0.25/0.5 rungs, with cell/event counts and the
    bucket's worst TVD. Same QI, same sensitive band (floor(value/10)),
    same cube shape as events_user_kanonymity / events_user_ldiversity:
    the three release audits read as one table stack.

    Determinism: each |Q - P| term is integer-ratio-derived and
    ROUND-12-quantized into DECIMAL(14,12) before the order-free sum;
    the TVD is ONE ROUND-6 projection, so the bucket thresholds (exact
    binary rationals) compare identical doubles in both engines.

    Scale shape: ONE (type, hour, band) count (map-side-combined; keys
    bounded by cells x band alphabet), the per-cell fan against the
    broadcast band alphabet, and the 4-row bucket fold; the corpus band
    frame and the cell-total scalar broadcast.
    """
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("value").isNotNull())
          .select("event_type",
                  F.date_trunc("hour", F.col("ts")).alias("hr"),
                  F.floor(F.col("value") / 10.0).cast("int").alias("band")))
    cellband = (ev.groupBy("event_type", "hr", "band")
                .agg(F.count(F.lit(1)).cast("bigint").alias("qb"))
                .localCheckpoint(eager=True))  # corpus/celln/terms read it
    corpus = (cellband.groupBy("band")
              .agg(F.sum("qb").cast("bigint").alias("cb")))
    n = corpus.agg(F.sum("cb").cast("bigint").alias("nt"))
    celln = (cellband.groupBy("event_type", "hr")
             .agg(F.sum("qb").cast("bigint").alias("nc")))
    terms = (celln
             .crossJoin(F.broadcast(corpus.select(
                 F.col("band").alias("cband"), "cb")))
             .join(cellband.select(F.col("event_type").alias("ce"),
                                   F.col("hr").alias("ch"),
                                   F.col("band").alias("cband2"), "qb"),
                   (F.col("ce") == F.col("event_type"))
                   & (F.col("ch") == F.col("hr"))
                   & (F.col("cband2") == F.col("cband")), "left")
             .crossJoin(F.broadcast(n))
             .select("event_type", "hr", "nc",
                     F.round(F.abs(
                         F.coalesce("qb", F.lit(0)).cast("double")
                         / F.col("nc")
                         - F.col("cb").cast("double") / F.col("nt")), 12)
                     .cast("decimal(14,12)").alias("term")))
    tvd = (terms.groupBy("event_type", "hr")
           .agg(F.max("nc").alias("n_events"),
                F.round(F.lit(0.5) * F.sum("term").cast("double"), 6)
                .alias("t")))
    bucket = (F.when(F.col("t") < 0.1, "t<0.1")
              .when(F.col("t") < 0.25, "0.1<=t<0.25")
              .when(F.col("t") < 0.5, "0.25<=t<0.5")
              .otherwise("t>=0.5"))
    tvd = tvd.localCheckpoint(eager=True)  # bucket fold + total read it
    tot = tvd.agg(F.count(F.lit(1)).cast("bigint").alias("n_cells_total"))
    return (tvd.select(bucket.alias("tcloseness_bucket"), "n_events", "t")
            .groupBy("tcloseness_bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                 F.sum("n_events").cast("bigint").alias("n_events"),
                 F.max("t").alias("max_tvd"))
            .crossJoin(F.broadcast(tot))
            .select("tcloseness_bucket", "n_cells", "n_events", "max_tvd",
                    F.round(F.col("n_cells").cast("double")
                            / F.col("n_cells_total"), 6)
                    .alias("cell_share")))


# ---------------------------------------------------------------------------
# dedup_impact_by_source — the bias audit's per-source marginal
# ---------------------------------------------------------------------------


def _dedup_impact_source_oracle() -> str:
    from traffic_data_pipeline_spark.plans.oracle_ctes import (
        _MH_PAIRS_CTE,
        _MINHASH_CTES,
    )

    return f"""
WITH {_MINHASH_CTES},
{_MH_PAIRS_CTE},
removed AS (
  SELECT DISTINCT doc_b AS doc_id FROM mpairs WHERE agree / 8.0 >= 0.5),
tl AS (
  SELECT d.doc_id, d.source,
         CAST(len(list_filter(
             string_split_regex(lower(d.text), '[^a-z0-9]+'),
             x -> x != '')) AS BIGINT) AS n_tok,
         CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS gone
  FROM documents d LEFT JOIN removed r ON r.doc_id = d.doc_id)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(gone) AS BIGINT) AS n_removed,
       ROUND(CAST(SUM(gone) AS DOUBLE) / COUNT(*), 6) AS removed_doc_share,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(gone * n_tok) AS BIGINT) AS tokens_removed,
       ROUND(CAST(SUM(gone * n_tok) AS DOUBLE) / NULLIF(SUM(n_tok), 0), 6)
         AS removed_token_share
FROM tl GROUP BY 1
"""


@staged_r9("dedup_impact_by_source")
def q_dedup_impact_by_source(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Dedup fairness audit, per-SOURCE marginal (SURVEY.md §7's
    round-10 candidate, built early): the registered per-language
    audit's other axis — crawls near-dup against each other WITHIN
    sources (mirror sites, syndicated feeds, template farms), so a
    source losing 3x the corpus-average share is the
    stop-paying-for-this-crawl signal where the language audit would
    blame the language. Same one-round min-id survivor rule, same
    session pair stream, same columns (source for lang), so all three
    marginals (lang, source, and the CC twin) stack into one readout.

    Determinism / scale shape: identical to dedup_impact_by_lang — ONE
    removed-id distinct broadcast back, ONE (source) fold with in-row
    token counts.
    """
    from traffic_data_pipeline_spark.functions.text import token_array
    from traffic_data_pipeline_spark.plans.extensions import doc_lsh_pairs

    removed = (doc_lsh_pairs(spark, sf_dir)
               .select(F.col("doc_b").alias("rid")).distinct())
    docs = load_table(spark, sf_dir, "documents")
    gone = F.when(F.col("rid").isNotNull(), 1).otherwise(0)
    return (docs.select("doc_id", "source",
                        F.size(token_array(F.col("text"))).cast("bigint")
                        .alias("n_tok"))
            .join(F.broadcast(removed), docs.doc_id == F.col("rid"), "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(gone).cast("bigint").alias("n_removed"),
                 F.round(F.sum(gone).cast("double") / F.count(F.lit(1)), 6)
                 .alias("removed_doc_share"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"),
                 F.sum(gone * F.col("n_tok")).cast("bigint")
                 .alias("tokens_removed"),
                 F.round(F.sum(gone * F.col("n_tok")).cast("double")
                         / F.nullif(F.sum("n_tok").cast("double"),
                                    F.lit(0.0)), 6)
                 .alias("removed_token_share")))


# ---------------------------------------------------------------------------
# dedup_impact_by_lang_cc — the bias audit under the EXACT-CC survivor rule
# ---------------------------------------------------------------------------


def _dedup_impact_cc_oracle() -> str:
    from traffic_data_pipeline_spark.plans.oracle_ctes import (
        _MH_PAIRS_CTE,
        _MINHASH_CTES,
    )

    return f"""
WITH RECURSIVE {_MINHASH_CTES},
{_MH_PAIRS_CTE},
edges AS (
  SELECT doc_a AS v, doc_b AS w FROM mpairs WHERE agree / 8.0 >= 0.5
  UNION ALL
  SELECT doc_b, doc_a FROM mpairs WHERE agree / 8.0 >= 0.5),
reach(v, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, r.m FROM edges e JOIN reach r ON r.v = e.w),
lbl AS (SELECT v AS doc_id, MIN(m) AS canonical_id FROM reach GROUP BY v),
tl AS (
  SELECT d.doc_id, d.lang,
         CAST(len(list_filter(
             string_split_regex(lower(d.text), '[^a-z0-9]+'),
             x -> x != '')) AS BIGINT) AS n_tok,
         CASE WHEN l.canonical_id <> d.doc_id THEN 1 ELSE 0 END AS gone
  FROM documents d JOIN lbl l ON l.doc_id = d.doc_id)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(gone) AS BIGINT) AS n_removed,
       ROUND(CAST(SUM(gone) AS DOUBLE) / COUNT(*), 6) AS removed_doc_share,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(gone * n_tok) AS BIGINT) AS tokens_removed,
       ROUND(CAST(SUM(gone * n_tok) AS DOUBLE) / NULLIF(SUM(n_tok), 0), 6)
         AS removed_token_share
FROM tl GROUP BY 1
"""


@staged_r9("dedup_impact_by_lang_cc")
def q_dedup_impact_by_lang_cc(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Dedup fairness audit under the EXACT-CC survivor rule (VERDICT r7
    ask #5): per language, the share of documents and of TOKENS removed
    when a doc survives iff it is its connected component's min doc_id —
    the dedup_minhash_canonical contract over the full transitive
    closure of the MinHash-LSH pair graph. The registered
    dedup_impact_by_lang is the one-round min-id twin (removed iff some
    SMALLER-id doc pairs DIRECTLY); this form also removes chain tails
    the one-round rule keeps, so n_removed here >= the twin's per
    language and the DIFFERENCE localizes where chains live. Output
    columns are IDENTICAL to the twin's, so the two survivor rules
    compare row-for-row in one join.

    Rides the shared session pair stream AND the session component
    table (doc_cc_components — the min-label-propagation fixpoint the
    registered canonicalization and split assignment also read, run
    once per session); the oracle computes the same transitive
    closure with a recursive CTE, so chain-shaped clusters that a
    one-round approximation would split must agree too.

    Determinism: removal is exact integer component membership; token
    counts are in-row integers; two ROUND-6 shares per language with a
    NULLIF guard for an all-symbol language slice.

    Scale shape: CC iterations are join + min-agg per round over the
    pair stream (measured ~N^0.26 on the split_cluster_assign probe —
    the same pointer-jumped orbit); the audit itself is ONE (lang) fold
    over the corpus scan with the component labels joined co-keyed on
    doc_id.
    """
    from traffic_data_pipeline_spark.functions.text import token_array
    from traffic_data_pipeline_spark.plans.extensions import (
        doc_cc_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    comp = doc_cc_components(spark, sf_dir)
    gone = F.when(F.col("canonical_id") != F.col("doc_id"), 1).otherwise(0)
    return (docs.select("doc_id", "lang",
                        F.size(token_array(F.col("text"))).cast("bigint")
                        .alias("n_tok"))
            .join(comp, "doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum(gone).cast("bigint").alias("n_removed"),
                 F.round(F.sum(gone).cast("double") / F.count(F.lit(1)), 6)
                 .alias("removed_doc_share"),
                 F.sum("n_tok").cast("bigint").alias("n_tokens"),
                 F.sum(gone * F.col("n_tok")).cast("bigint")
                 .alias("tokens_removed"),
                 F.round(F.sum(gone * F.col("n_tok")).cast("double")
                         / F.nullif(F.sum("n_tok").cast("double"),
                                    F.lit(0.0)), 6)
                 .alias("removed_token_share")))


# ---------------------------------------------------------------------------
# streaming_changepoint_monitor — per-batch changepoint on the event stream
# ---------------------------------------------------------------------------


def _changepoint_seed(spark: SparkSession, state_dir: str,
                      out_dir: str) -> None:
    """Pre-seed the batchId-stamped (type, day) state table and the
    published-report sink (the _conformal_seed contract — the state
    schema is IDENTICAL, only the published frame differs)."""
    from traffic_data_pipeline_spark.streaming.monitor_contract import (
        seed_parquet,
    )

    seed_parquet(
        spark,
        (state_dir, "event_type string, day date, y long, batch_id long"),
        (out_dir, "event_type string, change_d int, score double, "
                  "mean_before double, mean_after double"))


def _changepoint_handle(spark: SparkSession, state_dir: str, out_dir: str):
    """The foreachBatch body, shared with the restart/crash-replay tests
    so the tested handler IS the production handler."""
    from traffic_data_pipeline_spark.plans.staged_ops_r8 import (
        _changepoint_from_daily,
        _stamp,
    )
    from traffic_data_pipeline_spark.streaming.batch_scope import (
        scoped_local_checkpoints,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # scoped: any per-batch localCheckpoint (none today — the owner
        # plan is checkpoint-free; the guard keeps the monitor contract
        # uniform) frees its blocks once the report is published
        with scoped_local_checkpoints(spark):
            part = (batch_df
                    .groupBy("event_type",
                             F.to_date(F.date_trunc("day", F.col("ts")))
                             .alias("day"))
                    .agg(F.count(F.lit(1)).cast("bigint").alias("y")))
            _stamp(part, batch_id).write.mode("append").parquet(state_dir)
            # full-row DISTINCT collapses a crash-replay double-append
            # (same batch_id, identical deterministic partials) before
            # the sum
            daily = (spark.read.parquet(state_dir).distinct()
                     .groupBy("event_type", "day")
                     .agg(F.sum("y").cast("bigint").alias("y")))
            _changepoint_from_daily(daily).write.mode("overwrite") \
                .parquet(out_dir)

    return handle


@staged_r9("streaming_changepoint_monitor")
def q_streaming_changepoint_monitor(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """events_changepoint_daily turned into the always-on monitoring form
    (VERDICT r7 ask #5, the streaming_conformal_monitor contract applied
    to the regime-break readout): events arrive in micro-batches; each
    batch folds its (type, day) partial counts into a batchId-stamped
    state table, recomputes the best single level-shift changepoint over
    the ACCUMULATED history, and republishes it — so after the final
    batch the published (change_d, score, means) rows EQUAL the batch op
    on the full history, and the batch op's DuckDB oracle is this op's
    oracle VERBATIM. Both paths share one plan owner
    (_changepoint_from_daily), so the spine fill, the overflow-safe
    double contrast, and the argmax tiebreak cannot drift between the
    nightly and streaming forms.

    State is calendar-bounded — (type, day) partials, deduped on
    (batch_id, type, day) then merged by sum — so the at-least-once
    foreachBatch caveat is closed the same way as
    streaming_conformal_monitor: a crash between the state append and
    the offset commit replays one batch under the SAME batchId, and
    full-row DISTINCT collapses exactly the double-append.

    Scale shape: per batch, ONE map-side-combined (type, day) count of
    the batch, then the changepoint fold on the calendar-bounded state
    frame; the live registered plan just reads the published report.
    """
    from traffic_data_pipeline_spark.functions.tmpdirs import scratch_dir
    from traffic_data_pipeline_spark.plans.staged_ops_r7 import (
        _ewma_stream_dir,
    )
    from traffic_data_pipeline_spark.streaming.monitor_contract import (
        run_monitor,
    )

    src = _ewma_stream_dir(spark, sf_dir)
    state_dir = scratch_dir(prefix="tdp_chg_state_")
    out_dir = scratch_dir(prefix="tdp_chg_out_")
    ckpt = scratch_dir(prefix="tdp_chg_ckpt_")

    _changepoint_seed(spark, state_dir, out_dir)
    handle = _changepoint_handle(spark, state_dir, out_dir)

    run_monitor(spark, "streaming_changepoint_monitor", src,
                "ts timestamp, event_type string", handle, ckpt)
    return spark.read.parquet(out_dir).select(
        "event_type", "change_d", "score", "mean_before", "mean_after")


# ---------------------------------------------------------------------------
# corpus_epoch_plan — epochs-at-budget / repetition-risk readout per source
# ---------------------------------------------------------------------------

EPOCH_BUDGET_MULT = 3   # training token budget = MULT x corpus tokens
EPOCH_RISK = 4.0        # the ~4-epoch repeated-data degradation rule


@staged_r9("corpus_epoch_plan", f"""
WITH per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> x != ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
         CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(30,12)))
              AS DOUBLE) AS z
  FROM per_src)
SELECT source, n_docs, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / NULLIF(t, 0), 6) AS p_raw,
       ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / NULLIF(z, 0), 6) AS w_temp,
       -- 2 dp: budget-sized full-entropy double (the mixture_budget
       -- round-divergence shape)
       ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / NULLIF(z, 0)
             * {EPOCH_BUDGET_MULT} * t, 2) AS tokens_at_budget,
       ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / NULLIF(z, 0)
             * {EPOCH_BUDGET_MULT} * t / NULLIF(n_tokens, 0), 6) AS epochs,
       ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / NULLIF(z, 0)
             * {EPOCH_BUDGET_MULT} * t / NULLIF(n_tokens, 0), 6)
         > {EPOCH_RISK} AS repetition_risk
FROM per_src, tot
""")
def q_corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch planner for a temperature-sampled training mixture: at a
    token budget of {EPOCH_BUDGET_MULT}x the corpus, how many EPOCHS of
    each source does the sqrt-temperature mixture (the registered
    lang_temperature_weights contract, on the SOURCE axis) actually
    consume — and which sources cross the ~{EPOCH_RISK}-epoch
    repeated-data line where repetition measurably degrades training
    (the data-constrained scaling readout: up-weighting a small source
    is a repetition decision, and this is the table that makes it
    explicit BEFORE the run). tokens_at_budget = w_temp * budget;
    epochs = tokens_at_budget / tokens_available.

    Determinism: token totals are exact integers; alpha is fixed at 1/2
    so the temperature weight is IEEE-exact sqrt (the
    lang_temperature_weights rule — a general pow inherits libm
    rounding); the normalizer accumulates #sources sqrt terms in
    DECIMAL(30,12); tokens_at_budget quantizes at ROUND-2 (budget-sized
    full-entropy double, the mixture_budget shape) and epochs at
    ROUND-6 BEFORE the {EPOCH_RISK}-epoch compare, so the flag decides
    on identical doubles in both engines; NULLIF twins guard the
    zero-token corpus and the zero-token source.

    Scale shape: in-row token counts (no explode), ONE map-side-combined
    per-source aggregate (output rows = #sources), one broadcast
    normalizer row. The corpus streams exactly once.
    """
    from traffic_data_pipeline_spark.functions.text import token_array

    docs = load_table(spark, sf_dir, "documents")
    per_src = (docs.select("source",
                           F.array_size(token_array(F.col("text")))
                           .cast("bigint").alias("n_tok"))
               .groupBy("source")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                    F.sum("n_tok").cast("bigint").alias("n_tokens")))
    tot = per_src.agg(
        F.sum("n_tokens").cast("bigint").alias("t"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))
              .cast("decimal(30,12)")).cast("double").alias("z"))
    w = (F.sqrt(F.col("n_tokens").cast("double"))
         / F.nullif(F.col("z"), F.lit(0.0)))
    need = w * EPOCH_BUDGET_MULT * F.col("t")
    epochs = F.round(need / F.nullif(F.col("n_tokens"), F.lit(0)), 6)
    return (per_src.crossJoin(F.broadcast(tot))
            .select("source", "n_docs", "n_tokens",
                    F.round(F.col("n_tokens").cast("double")
                            / F.nullif(F.col("t"), F.lit(0)), 6)
                    .alias("p_raw"),
                    F.round(w, 6).alias("w_temp"),
                    F.round(need, 2).alias("tokens_at_budget"),
                    epochs.alias("epochs"),
                    (epochs > EPOCH_RISK).alias("repetition_risk")))


# ---------------------------------------------------------------------------
# streaming_tailindex_monitor — per-batch Hill tail index on the event stream
# ---------------------------------------------------------------------------


def _tailindex_seed(spark: SparkSession, state_dir: str,
                    out_dir: str) -> None:
    """Pre-seed the batchId-stamped (type, user) state table and the
    published-report sink. State is USER-dimension-bounded — the
    WAU-stream state class, one partial count row per (batch, type,
    user) — not calendar-bounded like the conformal/changepoint
    monitors; that is the honest cost of a user-grain statistic."""
    from traffic_data_pipeline_spark.streaming.monitor_contract import (
        seed_parquet,
    )

    seed_parquet(
        spark,
        (state_dir, "event_type string, user_id long, c long, "
                    "batch_id long"),
        (out_dir, "event_type string, n_users bigint, k_used bigint, "
                  "x_cut bigint, hill_alpha double"))


def _tailindex_handle(spark: SparkSession, state_dir: str, out_dir: str):
    """The foreachBatch body, shared with the crash-replay test so the
    tested handler IS the production handler."""
    from traffic_data_pipeline_spark.plans.staged_ops_r8 import (
        _stamp,
        _tail_index_from_counts,
    )
    from traffic_data_pipeline_spark.streaming.batch_scope import (
        scoped_local_checkpoints,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # scoped: _tail_index_from_counts's per-batch localCheckpoint
        # frees its blocks once the report is published (batch_scope)
        with scoped_local_checkpoints(spark):
            part = (batch_df
                    .groupBy("event_type", "user_id")
                    .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
            _stamp(part, batch_id).write.mode("append").parquet(state_dir)
            # full-row DISTINCT collapses a crash-replay double-append
            # (same batch_id, identical deterministic partials) before
            # the sum
            uc = (spark.read.parquet(state_dir).distinct()
                  .groupBy("event_type", "user_id")
                  .agg(F.sum("c").cast("bigint").alias("c")))
            _tail_index_from_counts(uc).write.mode("overwrite") \
                .parquet(out_dir)

    return handle


@staged_r9("streaming_tailindex_monitor")
def q_streaming_tailindex_monitor(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """events_user_tail_index turned into the always-on monitoring form
    (SURVEY.md §7's round-10 candidate, built early — the
    streaming_conformal_monitor contract applied to the heavy-tail
    readout): events arrive in micro-batches; each batch folds its
    (type, user) partial counts into a batchId-stamped state table,
    recomputes the Hill tail exponent over the ACCUMULATED history, and
    republishes it — so after the final batch the published alpha rows
    EQUAL the batch op on the full history, and the batch op's DuckDB
    oracle is this op's oracle VERBATIM. Both paths share one plan
    owner (_tail_index_from_counts), so the tail rank, the k clamp,
    and the decimal log sum cannot drift between forms. Hot-key skew is
    BORN at the user grain — this is the monitor that watches it drift.

    State is user-dimension-bounded ((type, user) partials — the
    WAU-stream state class, honest for a user-grain statistic), deduped
    on (batch_id, type, user) then merged by sum, closing the
    at-least-once foreachBatch caveat the standard way.

    Scale shape: per batch, ONE map-side-combined (type, user) count of
    the batch, then the constant-k tail fold on the accumulated
    dimension frame; the live registered plan just reads the published
    report.
    """
    from traffic_data_pipeline_spark.functions.tmpdirs import scratch_dir
    from traffic_data_pipeline_spark.streaming.monitor_contract import (
        run_monitor,
    )

    src = _tail_stream_dir(spark, sf_dir)
    state_dir = scratch_dir(prefix="tdp_tail_state_")
    out_dir = scratch_dir(prefix="tdp_tail_out_")
    ckpt = scratch_dir(prefix="tdp_tail_ckpt_")

    _tailindex_seed(spark, state_dir, out_dir)
    handle = _tailindex_handle(spark, state_dir, out_dir)

    run_monitor(spark, "streaming_tailindex_monitor", src,
                "ts timestamp, event_type string, user_id long",
                handle, ckpt)
    return spark.read.parquet(out_dir).select(
        "event_type", "n_users", "k_used", "x_cut", "hill_alpha")


_TAIL_STREAM_CACHE: dict[str, str] = {}


def _tail_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Landing zone for the user-grain event stream
    (monitor_contract.residue_landing_zone on event_id, with user_id
    kept — the tail monitor needs the user grain the EWMA zone
    drops)."""
    from traffic_data_pipeline_spark.streaming.monitor_contract import (
        residue_landing_zone,
    )

    return residue_landing_zone(
        spark, _TAIL_STREAM_CACHE, sf_dir, "tdp_tail_stream_",
        load_table(spark, sf_dir, "events"), "event_id",
        ["ts", "event_type", "user_id"])


def _late_bind_oracles() -> None:
    """Oracle strings that reuse other modules' oracles verbatim are
    bound lazily (the staged_ops_r8 pattern) to avoid import-order
    traps."""
    from traffic_data_pipeline_spark.plans.staged_ops_r8 import (
        STAGED_R8_ORACLES,
    )

    STAGED_R9_ORACLES["streaming_changepoint_monitor"] = (
        STAGED_R8_ORACLES["events_changepoint_daily"])
    STAGED_R9_ORACLES["streaming_tailindex_monitor"] = (
        STAGED_R8_ORACLES["events_user_tail_index"])
    STAGED_R9_ORACLES["dedup_impact_by_lang_cc"] = (
        _dedup_impact_cc_oracle())
    STAGED_R9_ORACLES["dedup_impact_by_source"] = (
        _dedup_impact_source_oracle())


_late_bind_oracles()


# ---------------------------------------------------------------------------
# Round-9 promotion fold (VERDICT r8 ask #1). Runs at the END of the module
# body so every @staged_r9 registration above is complete before the live
# registry absorbs it, in EVERY import order (the staged_ops/staged_ops_r6/
# staged_ops_r7/staged_ops_r8 fold contract: when queries.py is imported
# first, its bottom import of this module executes this whole fold before
# queries.py finishes; when this module is imported first, the fold's own
# `from plans.queries import ...` below fully executes queries.py — whose
# tail imports are side-effect imports that skip the in-progress import of
# THIS module via sys.modules — and control returns here to fold the
# by-then-complete dicts. Both paths end with the same registry; the
# update is idempotent if both run.)
# ---------------------------------------------------------------------------
from traffic_data_pipeline_spark.plans.queries import (  # noqa: E402
    ORACLES as _LIVE_ORACLES,
    QUERIES as _LIVE_QUERIES,
)

_collide = {n for n in set(_LIVE_QUERIES) & set(STAGED_R9_QUERIES)
            if _LIVE_QUERIES[n] is not STAGED_R9_QUERIES[n]}
if _collide:  # not assert: must survive python -O
    raise RuntimeError(f"staged r9 names collide with registry: {_collide}")
_LIVE_QUERIES.update(STAGED_R9_QUERIES)
_LIVE_ORACLES.update(STAGED_R9_ORACLES)
