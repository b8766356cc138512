"""Round-5 staging area: operators that are implemented and oracle-gated
NOW but intentionally NOT registered in the driver registry, honoring the
round-4 registration freeze (VERDICT r3 ask #3: no net-new ``queries()``
names until the driver's CORRECTNESS window drains the round-3 backlog).

Everything here uses the exact ``register``-style contract — a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus a DuckDB oracle string with
matching column names — so promotion in round 5 is one mechanical step:
move the ``@staged`` entries into the live registry (or import
STAGED_QUERIES/STAGED_ORACLES from plans.queries). Until then
tests/test_staged_ops.py runs the identical query-vs-oracle gate on them
at sf0.01, and a freeze-guard test pins that none of these names leaks
into ``__spark_entry__.queries()`` this round.

Operator set (training-data pipeline gaps after round 3's sweep):

- ``doc_boilerplate_coverage`` — CCNet-style cross-document boilerplate
  detection: 8-gram spans occurring in >= 2 distinct docs are boilerplate;
  per doc, how many token positions they cover.
- ``bpe_merge_step`` — one tokenizer-training step: the top-20 adjacent
  symbol pairs by corpus frequency (the pair a BPE learner would merge).
- ``lineitem_zorder_layout`` — write-side data-layout op: Z-order
  (Morton-interleave) clustering key over two join/filter dims and the
  per-file min/max readout that quantifies 2-D data skipping.
- ``embedding_pca_step`` — one exact (decimal-accumulated) power-iteration
  step of the uncentered Gram operator over the embedding corpus.
- ``embedding_semantic_decontaminate`` — flag corpus vectors semantically
  near a benchmark/eval set (LSH-bucketed candidates + exact cosine), the
  embedding-space sibling of the 8-gram decontaminator.
- ``dedup_sorted_neighborhood`` — SNM blocking (sort-based dedup).
- ``doc_hybrid_search_rrf`` — reciprocal-rank fusion of BM25 + TF-IDF.
- ``split_cluster_assign`` — leakage-safe cluster-level split hashing.
- ``events_decayed_engagement`` — exponential time-decay features.
- ``doc_dsir_importance`` — DSIR-style hashed-n-gram importance weights
  (log p_target/p_raw over hashed bigram buckets).
- ``doc_winnowing_fingerprint`` — winnowing (MOSS) fingerprint selection
  + fingerprint-sharing candidate pairs with a hot-fingerprint cap.
- ``doc_ngram_novelty`` — per-document novel-gram rate (fraction of the
  doc's distinct 3-grams first introduced by this doc).
- ``lang_temperature_weights`` — multilingual temperature sampling
  weights (alpha = 1/2 via IEEE-exact sqrt).
- ``events_rollup_merge`` — incremental view maintenance: mergeable
  partial aggregates (old corpus + trailing delta) whose merge must
  equal the full recompute (the oracle).
- ``doc_paragraph_dedup`` — corpus-wide paragraph-level exact dedup:
  first occurrence (doc order, then position) survives; documents are
  reassembled from surviving segments.
- ``doc_c4_line_filter`` — C4-style line cleaning (word-count, terminal
  punctuation, javascript lines) + page gates (lorem ipsum, braces,
  min surviving lines), every rule exercised AT its boundary.
- ``doc_gopher_quality`` — Gopher-style quality rule family with every
  threshold decided in division-free integer arithmetic.
- ``shard_compaction_plan`` — write-side small-file bin-packing
  manifest (per-source running-byte cut at a target file size).
- ``embedding_jl_projection`` — Johnson-Lindenstrauss 64->8 sign
  projection, decimal-exact, fully in-row.
- ``events_heavy_hitters_cms`` — count-min-sketch heavy hitters, the
  MERGEABLE twin of the exact Misra-Gries pass (md5-window hashes,
  one-sided error surfaced as an overcount column).
- ``sensor_theilsen_trend`` — Theil-Sen robust slope per sensor
  (lower median of pairwise slopes, generated and selected in-row).
- ``embedding_pq_adc`` — product-quantization asymmetric-distance
  top-k scan (8x8 subspaces, 16-centroid codebooks, ADC table
  broadcast; centroid seeds reconstruct exactly).
- ``embedding_margin_align`` — margin-based mutual-NN alignment
  (the Artetxe-Schwenk bitext-mining criterion) between two label
  populations.
- ``events_key_skew_report`` — join/agg skew pre-flight: max key
  share, Gini, hottest key, and a concrete salt-factor
  recommendation per event_type.
- ``streaming_cms_topk`` — the sketch x streaming intersection: the
  count-min sketch built BY the windowed streaming aggregate (state =
  256 cells per open window, key-cardinality-independent), probed for
  per-window heavy hitters after landing.
- ``corpus_snapshot_diff`` — dataset-versioning diff between two
  corpus snapshots (added/removed/changed/steady per source), the
  documents-table face of the reference's SCD-2 config diff.
- ``events_late_arrival_audit`` — watermark pre-flight: replay the
  feed in (synthesized out-of-order) arrival order and report, per
  hour, what a 10-minute and a 1-hour watermark would each drop —
  the measurement behind every hardcoded watermark delay.
- ``mixture_budget_allocate`` — largest-remainder (Hamilton) integer
  apportionment of a fixed training-slot budget across languages by
  temperature weight: quotas sum EXACTLY to the budget.
- ``doc_kanonymity_report`` — k-anonymity risk readout over the
  (lang, source, length-bucket) quasi-identifiers: group sizes,
  under-k row share — the indirect-identifier sibling of pii_redact.
- ``doc_perplexity_buckets`` — CCNet head/middle/tail: per-language
  LM-score terciles via broadcast cutpoints (no per-lang ntile
  window), riding the registered doc_lm_score.
- ``dedup_graph_kcore`` — 2-core of the near-dup pair graph by
  iterative peel (dense template nests vs pairwise chains), completing
  the graph family; fixed-depth unrolled oracle, convergence pinned.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from traffic_data_pipeline_spark.functions.similarity import (
    DOT_DECIMAL,
    dot_product,
)
from traffic_data_pipeline_spark.functions.text import (
    STOPWORDS_EN,
    ngram_array,
    token_array,
    tokens,
)
from traffic_data_pipeline_spark.sources.tables import load_table

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}


def staged(name: str, oracle: str | None = None):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLES[name] = oracle
        return fn
    return deco


def _literal_docs(spark: SparkSession, rows: list[tuple[int, str]]) -> DataFrame:
    """(doc_id, text) literals as a DETERMINISTIC plan (range + explode of
    a struct array), not createDataFrame: an RDD-backed LocalRelation
    doesn't canonicalize, which blocks ReusedExchange for every subtree
    it gets unioned into — each downstream consumer would then re-count
    (and re-run) the shared spread exchange."""
    structs = [
        F.struct(F.lit(i).cast("long").alias("doc_id"),
                 F.lit(t).alias("text"))
        for i, t in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("s"))
        .select("s.doc_id", "s.text")
    )


# ---------------------------------------------------------------------------
# doc_boilerplate_coverage — cross-doc repeated-span (boilerplate) coverage
# ---------------------------------------------------------------------------

# The fixture corpus is word-soup with no natural shared headers, so the
# query runs on an augmented corpus (the dedup_semantic planting pattern,
# FIXTURES.md §8): docs with id < 30 gain a copy at id+300000 prefixed
# with a fixed 12-token header. Header-internal 8-grams then occur in 30
# docs (boilerplate); header->tail boundary grams stay doc-unique. The
# header tokens are outside the fixture vocabulary so original docs are
# untouched.
_BOILER_HEADER = " ".join(f"zq{i:02d}" for i in range(12))
BOILER_MIN_DOCS = 2     # a span in >= this many distinct docs is boilerplate
_GRAM_N = 8

_BOILER_GRAM8 = " ".join(f"zqg{i}" for i in range(8))

_BOILER_CORPUS_CTE = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000, '{_BOILER_HEADER} ' || text
  FROM documents WHERE doc_id < 30
  UNION ALL
  -- boundary pair: ONE 8-gram in EXACTLY BOILER_MIN_DOCS (=2) docs, so
  -- the HAVING >= threshold is exercised AT the threshold, not past it
  SELECT * FROM (VALUES (320000, '{_BOILER_GRAM8} zqta'),
                        (320001, '{_BOILER_GRAM8} zqtb')) v(doc_id, text)),
tl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') AS l
  FROM corpus),
pg AS (  -- one row per (doc, 0-based gram start); grams keep duplicates
  SELECT doc_id, g - 1 AS g0, array_to_string(l[g:g+{_GRAM_N - 1}], ' ') AS gram
  FROM tl, unnest(generate_series(1, greatest(len(l) - {_GRAM_N - 1}, 0))) s(g))
"""


@staged("doc_boilerplate_coverage", f"""
WITH {_BOILER_CORPUS_CTE},
freq AS (
  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM pg)
  GROUP BY gram HAVING COUNT(*) >= {BOILER_MIN_DOCS}),
cov AS (
  SELECT doc_id, CAST(COUNT(DISTINCT p) AS BIGINT) AS n_boiler_tokens
  FROM pg JOIN freq USING (gram),
       unnest(generate_series(pg.g0, pg.g0 + {_GRAM_N - 1})) t(p)
  GROUP BY 1)
SELECT tl.doc_id,
       CAST(len(tl.l) AS BIGINT)            AS n_tokens,
       COALESCE(cov.n_boiler_tokens, 0)     AS n_boiler_tokens,
       ROUND(CAST(COALESCE(cov.n_boiler_tokens, 0) AS DOUBLE)
             / NULLIF(len(tl.l), 0), 6)     AS boiler_ratio
FROM tl LEFT JOIN cov ON cov.doc_id = tl.doc_id
""")
def q_doc_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate detection at span granularity: an 8-gram
    occurring in >= BOILER_MIN_DOCS DISTINCT documents is boilerplate
    (navigation chrome, license headers, template shells); per document,
    report how many token positions any boilerplate gram covers. The
    cleaning step a 100 TB web-corpus run performs before dedup — here as
    the measurement query whose covered-position set IS the removal mask.

    Scale shape: grams stay in-row until ONE (gram)-keyed map-side-combined
    aggregate builds the document-frequency table; the boilerplate subset
    joins back as an equi semi-join on the gram key (never broadcast — the
    gram universe is corpus-sized, the same reasoning as
    doc_ngram_containment's df table); covered positions explode only for
    rows that survive that semi-join (boilerplate hits, a tiny fraction of
    the gram stream), then collapse with one per-doc distinct count.
    No self-joins, no all-pairs anything: cost is linear in corpus grams.
    """
    dp = spark.sparkContext.defaultParallelism
    d0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d0.unionByName(
        d0.filter(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat(F.lit(_BOILER_HEADER + " "), F.col("text")).alias("text"),
        )
    ).unionByName(
        # boundary pair: see the oracle CTE comment
        _literal_docs(spark, [(320000, _BOILER_GRAM8 + " zqta"),
                              (320001, _BOILER_GRAM8 + " zqtb")])
    )
    docs = corpus.repartition(dp, "doc_id").select(
        "doc_id", token_array(F.col("text")).alias("tok"))
    base = docs.select(
        "doc_id", F.size("tok").cast("bigint").alias("n_tokens"))
    pg = docs.select(
        "doc_id", F.posexplode(ngram_array("tok", _GRAM_N)).alias("g0", "gram"))
    freq = (
        pg.dropDuplicates(["doc_id", "gram"])
        .groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= BOILER_MIN_DOCS)
        .select("gram")
    )
    cov = (
        pg.join(freq, "gram", "leftsemi")
        .select("doc_id", F.explode(
            F.sequence(F.col("g0"), F.col("g0") + F.lit(_GRAM_N - 1))
        ).alias("p"))
        .dropDuplicates(["doc_id", "p"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_boiler_tokens"))
    )
    nb = F.coalesce("n_boiler_tokens", F.lit(0).cast("bigint"))
    return (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            nb.alias("n_boiler_tokens"),
            F.round(nb.cast("double")
                    / F.nullif(F.col("n_tokens"), F.lit(0)), 6)
            .alias("boiler_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# bpe_merge_step — one BPE tokenizer-training step (top adjacent pairs)
# ---------------------------------------------------------------------------

BPE_TOP_K = 20


@staged("bpe_merge_step", f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x != '')) AS token
  FROM documents),
wc AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1),
pairs AS (
  SELECT substr(token, CAST(i AS INTEGER), 2) AS pair, c
  FROM wc, unnest(generate_series(1, len(token) - 1)) t(i)
  WHERE len(token) >= 2),
agg AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM pairs GROUP BY 1)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank,
       pair, cnt
FROM agg ORDER BY cnt DESC, pair LIMIT {BPE_TOP_K}
""")
def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding training step: count every adjacent symbol
    pair across the corpus (weighted by word frequency, with in-word
    multiplicity — 'aaa' contributes ('aa') twice) and emit the top-20
    merge candidates. Rank 1 is the pair a BPE learner would merge next;
    a full vocab build iterates this step, re-segmenting after each merge.

    Scale shape: the corpus collapses to the word-frequency table first
    (ONE map-side-combined token aggregate — the same shuffle vocab_build
    pays), so the quadratic-looking pair explode runs over DISTINCT WORDS
    (vocabulary-sized, ~sqrt of corpus tokens by Heaps' law), not the
    token stream. Pair totals aggregate to at most |alphabet|^2 rows
    (~1.3k for [a-z0-9]), so the final top-k rank is a window over a
    frame that fits in one task at ANY corpus scale — the global sort is
    on the ALPHABET-PAIR table, never the data. Later iterations
    re-segment in-row (split on the learned merges) and re-run the same
    two aggregates.
    """
    wc = (
        tokens(load_table(spark, sf_dir, "documents"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        wc.filter(F.length("token") >= 2)
        .select("c", F.explode(F.expr(
            "transform(sequence(1, length(token) - 1),"
            " i -> substring(token, i, 2))"
        )).alias("pair"))
    )
    agg = pairs.groupBy("pair").agg(F.sum("c").cast("bigint").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= BPE_TOP_K)
        .select("rank", "pair", "cnt")
    )


# ---------------------------------------------------------------------------
# lineitem_zorder_layout — Morton-interleave clustering key + skip readout
# ---------------------------------------------------------------------------

_Z_BITS = 8          # bucket each dim to 2^8 cells
_Z_FILES = 16        # report the layout as this many equal key ranges


def _morton_sql(bp: str, bs: str, duck: bool) -> str:
    """Bit-interleave of two _Z_BITS-bit bucket ids, emitted in each
    engine's operator spelling from ONE generator so the two can't drift."""
    if duck:
        terms = [
            f"((({bp} >> {i}) & 1) << {2 * i + 1})"
            f" + ((({bs} >> {i}) & 1) << {2 * i})"
            for i in range(_Z_BITS)
        ]
    else:
        terms = [
            f"shiftleft(shiftright({bp}, {i}) & 1, {2 * i + 1})"
            f" + shiftleft(shiftright({bs}, {i}) & 1, {2 * i})"
            for i in range(_Z_BITS)
        ]
    return " + ".join(terms)


@staged("lineitem_zorder_layout", f"""
WITH mx AS (
  SELECT MAX(l_partkey) AS mp, MAX(l_suppkey) AS ms FROM lineitem),
b AS (
  SELECT l_partkey, l_suppkey,
         (CAST(l_partkey AS BIGINT) * {1 << _Z_BITS}) // (mp + 1) AS bp,
         (CAST(l_suppkey AS BIGINT) * {1 << _Z_BITS}) // (ms + 1) AS bs
  FROM lineitem, mx),
m AS (
  SELECT l_partkey, l_suppkey,
         {_morton_sql('bp', 'bs', duck=True)} AS morton
  FROM b)
SELECT morton // {(1 << (2 * _Z_BITS)) // _Z_FILES} AS file_id,
       CAST(COUNT(*) AS BIGINT)      AS n_rows,
       CAST(MIN(l_partkey) AS BIGINT) AS p_lo,
       CAST(MAX(l_partkey) AS BIGINT) AS p_hi,
       CAST(MIN(l_suppkey) AS BIGINT) AS s_lo,
       CAST(MAX(l_suppkey) AS BIGINT) AS s_hi
FROM m GROUP BY 1
""")
def q_lineitem_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side data-layout operator: a Z-order (Morton bit-interleave)
    clustering key over (l_partkey, l_suppkey), reported as the per-file
    min/max footprint when the table is laid out in {_Z_FILES} equal
    Morton-key ranges. Sorting a write by this key is how a 100 TB table
    gets 2-D data skipping: each parquet file then covers a small
    RECTANGLE of the key space, so a point or range predicate on EITHER
    column prunes most files from the scan (the min/max columns here are
    exactly the footer stats a reader would prune on — linear layouts
    give tight bounds on one column and the full domain on the other).

    All arithmetic is integer-exact (integer `div`, shifts, masks — the
    bucket scale factor widens to BIGINT before multiplying, so the key
    never overflows 32-bit at real partkey cardinalities) and the two
    engine spellings are generated from one Python loop. Plan: one
    broadcast scalar (the two maxima), one projection, one
    {_Z_FILES}-group map-side-combined aggregate — the fact streams once
    with no join and no sort; the SORT this operator implies happens in
    the writer that consumes the key, where Spark's range partitioner
    makes it a sampling pass + one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    mx = li.agg(F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms"))
    scale = 1 << _Z_BITS
    b = li.crossJoin(F.broadcast(mx)).select(
        "l_partkey", "l_suppkey",
        F.expr(f"(CAST(l_partkey AS BIGINT) * {scale}) div (mp + 1)")
        .alias("bp"),
        F.expr(f"(CAST(l_suppkey AS BIGINT) * {scale}) div (ms + 1)")
        .alias("bs"),
    )
    per_file = (1 << (2 * _Z_BITS)) // _Z_FILES
    return (
        b.withColumn("morton", F.expr(_morton_sql("bp", "bs", duck=False)))
        .groupBy(F.expr(f"morton div {per_file}").alias("file_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("l_partkey").cast("bigint").alias("p_lo"),
            F.max("l_partkey").cast("bigint").alias("p_hi"),
            F.min("l_suppkey").cast("bigint").alias("s_lo"),
            F.max("l_suppkey").cast("bigint").alias("s_hi"),
        )
    )


# ---------------------------------------------------------------------------
# embedding_pca_step — one exact power-iteration step of the Gram operator
# ---------------------------------------------------------------------------

@staged("embedding_pca_step", """
WITH elems AS (
  SELECT vec_id, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)),
d0 AS (
  SELECT vec_id, CAST(SUM(CAST(val AS DECIMAL(30,12))) AS DOUBLE) AS d
  FROM elems GROUP BY 1)
SELECT e.pos,
       ROUND(CAST(SUM(CAST(d0.d * e.val AS DECIMAL(30,12))) AS DOUBLE), 6)
         AS component
FROM elems e JOIN d0 ON d0.vec_id = e.vec_id
GROUP BY 1
""")
def q_embedding_pca_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the corpus's top principal
    direction: y = A^T (A x0) over the (uncentered) embedding matrix A,
    from the deterministic all-ones start vector x0. Iterating
    (normalize, repeat — the same driver loop as embedding_kmeans_step /
    the CC pointer-jump, with the convergence probe as the sanctioned
    scalar) converges to the dominant eigenvector of the Gram matrix;
    centering swaps in exact decimal column means without changing the
    plan. The readout a whitening / dimensionality-reduction pass of a
    100 TB embedding corpus starts from.

    Determinism: both inner products accumulate as DECIMAL(30,12) —
    exact, order-free — so every component is bit-identical across
    engines and partitionings (the similarity-module contract); the only
    doubles are deterministic per-row products. Plan: A x0 is a per-row
    projection (zero shuffle); A^T's action is ONE map-side-combined
    aggregate with `dim` output rows. The matrix never materializes and
    nothing quadratic exists: cost is two passes over the corpus
    elements, embarrassingly parallel.
    """
    dp = spark.sparkContext.defaultParallelism
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .repartition(dp, "vec_id")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    ones = F.expr("transform(v, x -> CAST(1.0 AS DOUBLE))")
    rows = (
        emb.withColumn("d0", dot_product(F.col("v"), ones))
        .select("d0", F.posexplode("v").alias("pos0", "val"))
    )
    return (
        rows.groupBy("pos0")
        .agg(F.sum((F.col("d0") * F.col("val")).cast(DOT_DECIMAL))
             .cast("double").alias("y"))
        .select((F.col("pos0") + 1).cast("bigint").alias("pos"),
                F.round("y", 6).alias("component"))
    )


# ---------------------------------------------------------------------------
# embedding_semantic_decontaminate — eval-set similarity flagging
# ---------------------------------------------------------------------------

DECON_TAU = 0.9
_DECON_PLANTED = 25        # corpus ids < this gain a perturbed benchmark twin
_DECON_OFFSET = 200000

# benchmark membership: the fixture's deterministic eval split
# (vec_id % 97 == 0) plus every planted twin
_IS_BENCH_SQL = "(vec_id % 97 = 0 OR vec_id >= {off})".format(off=_DECON_OFFSET)


@staged("embedding_semantic_decontaminate", f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_DECON_OFFSET},
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01 + 0.001)
  FROM embeddings WHERE vec_id < {_DECON_PLANTED} AND vec_id % 97 != 0),
elems AS (
  SELECT vec_id, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS val
  FROM corpus, unnest(generate_series(1, len(embedding))) t(i)),
norms AS (
  SELECT vec_id, CAST(SUM(CAST(val * val AS DECIMAL(30,12))) AS DOUBLE) AS norm_sq
  FROM elems GROUP BY 1),
pd AS (
  SELECT e.vec_id, p.p,
         CAST(SUM(CAST(e.val * (((p.p * 73856093 + e.pos * 19349663) % 1000003)
                                / 1000003.0 - 0.5) AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM elems e, (SELECT unnest(generate_series(0, 7)) AS p) p
  GROUP BY 1, 2),
codes AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
  FROM pd GROUP BY 1),
cand AS (
  SELECT c.vec_id AS cid, b.vec_id AS bid
  FROM codes c JOIN codes b ON c.bucket = b.bucket
  WHERE NOT {_IS_BENCH_SQL.replace("vec_id", "c.vec_id")}
    AND {_IS_BENCH_SQL.replace("vec_id", "b.vec_id")}),
cdots AS (
  SELECT cd.cid, cd.bid,
         CAST(SUM(CAST(q.val * c.val AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM cand cd
  JOIN elems q ON q.vec_id = cd.cid
  JOIN elems c ON c.vec_id = cd.bid AND c.pos = q.pos
  GROUP BY 1, 2),
cos AS (
  SELECT cid, bid, dot / (sqrt(nq.norm_sq) * sqrt(nb.norm_sq)) AS cos
  FROM cdots
  JOIN norms nq ON nq.vec_id = cid
  JOIN norms nb ON nb.vec_id = bid
  WHERE nq.norm_sq > 0 AND nb.norm_sq > 0),
best AS (
  SELECT cid, bid, cos,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY cos DESC, bid) AS rn
  FROM cos WHERE cos >= {DECON_TAU})
SELECT cid AS vec_id, bid AS bench_id, ROUND(cos, 6) AS max_cos
FROM best WHERE rn = 1
""")
def q_embedding_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: flag every corpus vector whose
    cosine to ANY benchmark/eval vector reaches DECON_TAU — the semantic
    sibling of the 8-gram decontaminator, catching paraphrased or
    near-verbatim eval leakage that exact n-grams miss. Benchmark set =
    the fixture's deterministic eval split (vec_id % 97 == 0). The raw
    fixture has no natural cross-set near-dups (max pairwise cosine
    ~0.51), so corpus ids < {_DECON_PLANTED} gain a perturbed benchmark
    twin at id+{_DECON_OFFSET} (x*1.01 + 0.001 per element — the
    dedup_semantic planting, FIXTURES.md §8), cosine ~1 to their source:
    the flag path runs for real.

    Scale shape: benchmark suites are tiny next to a training corpus, so
    the benchmark side (codes + vectors + norms) BROADCASTS and the
    corpus streams through one narrow projection — bucket codes and norms
    are per-row HOFs (zero shuffle, the similarity-module shape), the
    candidate join is broadcast-hash on the 8-bit hyperplane bucket, and
    exact cosines run only on bucket collisions. The corpus never
    self-pairs and never shuffles; the one exchange is the per-corpus-id
    argmax window over FLAGGED candidates only. The oracle mirrors the
    candidate generation exactly (same planes, same integer arithmetic),
    so parity is exact; LSH recall itself is the measured property, read
    off the same machinery as embedding_ann_recall (full-probe = brute
    force).
    """
    dp = spark.sparkContext.defaultParallelism
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    planted = (
        emb.filter((F.col("vec_id") < _DECON_PLANTED)
                   & (F.col("vec_id") % 97 != 0))
        .select(
            (F.col("vec_id") + _DECON_OFFSET).alias("vec_id"),
            F.transform(
                "v", lambda x: x.cast("double") * F.lit(1.01) + F.lit(0.001)
            ).alias("v"),
        )
    )
    from traffic_data_pipeline_spark.functions.similarity import (
        bucket_code,
        norm_sq,
    )

    allv = (
        emb.unionByName(planted)
        .repartition(dp, "vec_id")
        .select(
            "vec_id", "v",
            bucket_code(F.col("v")).alias("bucket"),
            norm_sq(F.col("v")).alias("n2"),
        )
    )
    is_bench = (F.col("vec_id") % 97 == 0) | (F.col("vec_id") >= _DECON_OFFSET)
    corpus = allv.filter(~is_bench)
    bench = allv.filter(is_bench).select(
        F.col("vec_id").alias("bench_id"), F.col("v").alias("bv"),
        F.col("bucket"), F.col("n2").alias("bn2"))
    cand = corpus.join(F.broadcast(bench), "bucket")
    cos = F.when(
        (F.col("n2") > 0) & (F.col("bn2") > 0),
        dot_product(F.col("v"), F.col("bv"))
        / (F.sqrt("n2") * F.sqrt("bn2")),
    )
    flagged = (
        cand.select("vec_id", "bench_id", cos.alias("cos"))
        .filter(F.col("cos") >= DECON_TAU)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("bench_id"))
    return (
        flagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "bench_id", F.round("cos", 6).alias("max_cos"))
    )


# ---------------------------------------------------------------------------
# dedup_sorted_neighborhood — SNM blocking (the sort-based LSH alternative)
# ---------------------------------------------------------------------------

_SNM_WINDOW = 3        # compare each record to the next w-1 in sort order
_SNM_TAU = 0.5         # exact token-set Jaccard verify threshold
_SNM_PLANTED = 30      # ids < this gain a one-token-appended twin
_SNM_OFFSET = 400000


@staged("dedup_sorted_neighborhood", f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_SNM_OFFSET}, text || ' zzdup'
  FROM documents WHERE doc_id < {_SNM_PLANTED}
  UNION ALL
  -- boundary pair: 3-token sets sharing 2 tokens -> Jaccard EXACTLY
  -- 2/4 = 0.5 (an exact binary double in both engines), sitting ON the
  -- >= tau keep filter; the shared 2-token prefix sorts them adjacent
  SELECT * FROM (VALUES (410000, 'zqaa zqbb zqcc'),
                        (410001, 'zqaa zqbb zqdd')) v(doc_id, text)),
tl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') AS l
  FROM corpus),
keyed AS (
  -- COALESCE: a NULL key would sort NULLS LAST here but NULLS FIRST in
  -- Spark's default ascending order — a latent rank divergence on dirty
  -- corpora (no-op on clean data)
  SELECT doc_id, COALESCE(array_to_string(l[1:3], ' '), '') AS k FROM tl),
ranked AS (
  SELECT doc_id, substr(k, 1, 1) AS blk,
         ROW_NUMBER() OVER (PARTITION BY substr(k, 1, 1)
                            ORDER BY k, doc_id) AS r
  FROM keyed),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ranked a JOIN ranked b
    ON a.blk = b.blk AND b.r - a.r BETWEEN 1 AND {_SNM_WINDOW - 1}),
dt AS (SELECT DISTINCT doc_id, unnest(l) AS token FROM tl),
sz AS (SELECT doc_id, COUNT(*) AS n FROM dt GROUP BY 1),
scored AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
  FROM cand c
  JOIN dt ta ON ta.doc_id = c.doc_a
  JOIN dt tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
  GROUP BY 1, 2)
SELECT s.doc_a, s.doc_b,
       ROUND(CAST(s.ni AS DOUBLE) / (za.n + zb.n - s.ni), 6) AS jaccard
FROM scored s
JOIN sz za ON za.doc_id = s.doc_a
JOIN sz zb ON zb.doc_id = s.doc_b
WHERE CAST(s.ni AS DOUBLE) / (za.n + zb.n - s.ni) >= {_SNM_TAU}
""")
def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-Neighborhood-Method dedup (Hernandez & Stolfo 1995): sort
    the corpus by a locality-preserving key (here the first 3 tokens),
    then verify exact token-set Jaccard only between records within
    {_SNM_WINDOW - 1} positions of each other — the sort-based
    alternative to hash blocking, strongest when near-dups share a
    prefix (titles, URLs, addresses). The fixture corpus is planted with
    one-token-appended twins (ids < {_SNM_PLANTED} at +{_SNM_OFFSET},
    Jaccard ~0.97 to their source), which sort adjacent to their source
    by construction, so the window actually catches pairs.

    Scale shape: the sort runs INSIDE first-character blocks
    (row_number partitioned by the key's first symbol — a fixed ~36-way
    split here; production widens the prefix until blocks fit), so no
    global single-partition window exists; the known SNM recall loss at
    block boundaries is deterministic and mirrored exactly by the
    oracle. Neighbor pairing is an EQUI join on (block, rank + offset)
    with the offsets exploded — never a nested-loop rank-range join —
    and the exact verify runs per candidate on in-row token arrays
    (the ngram_jaccard_pairs verify tactic: arrays are doc-bounded, the
    candidate stream is corpus-linear x window width).
    """
    dp = spark.sparkContext.defaultParallelism
    d0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d0.unionByName(
        d0.filter(F.col("doc_id") < _SNM_PLANTED).select(
            (F.col("doc_id") + _SNM_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzdup")).alias("text"),
        )
    ).unionByName(
        # Jaccard-exactly-0.5 boundary pair: see the oracle CTE comment
        _literal_docs(spark, [(410000, "zqaa zqbb zqcc"),
                              (410001, "zqaa zqbb zqdd")])
    )
    tl = corpus.repartition(dp, "doc_id").select(
        "doc_id", token_array(F.col("text")).alias("tok"))
    keyed = tl.select(
        "doc_id", "tok",
        # coalesce: see the oracle's NULL-ordering note
        F.coalesce(F.array_join(F.slice("tok", 1, 3), " "), F.lit(""))
        .alias("k"),
        F.size(F.array_distinct("tok")).alias("n"),
    )
    w = Window.partitionBy("blk").orderBy("k", "doc_id")
    ranked = (
        keyed.withColumn("blk", F.substring("k", 1, 1))
        .withColumn("r", F.row_number().over(w))
    )
    a = ranked.select(
        F.col("doc_id").alias("doc_a"), F.col("tok").alias("ta"),
        F.col("n").alias("na"), "blk",
        F.explode(F.sequence(
            F.col("r") + 1, F.col("r") + (_SNM_WINDOW - 1))).alias("r"),
    )
    b = ranked.select(
        F.col("doc_id").alias("doc_b"), F.col("tok").alias("tb"),
        F.col("n").alias("nb"), "blk", "r")
    ni = F.size(F.array_intersect(F.array_distinct("ta"),
                                  F.array_distinct("tb")))
    jac = ni.cast("double") / (F.col("na") + F.col("nb") - ni)
    return (
        a.join(b, ["blk", "r"])
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _SNM_TAU)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# doc_hybrid_search_rrf — reciprocal-rank fusion of two retrieval rankers
# ---------------------------------------------------------------------------

RRF_K = 60          # the standard RRF smoothing constant
RRF_TOP_K = 10      # fused results returned
_RRF_RANKER_K = 20  # depth of each input ranking


def _hybrid_oracle() -> str:
    # shared constants come from oracle_ctes (NOT search_ops: this runs
    # at module-body time, when search_ops may be mid-import)
    from traffic_data_pipeline_spark.plans.oracle_ctes import (
        _BM25_BASE_SQL,
        BM25_B,
        BM25_K1,
        BM25_TERMS,
    )
    tf_cols = ",\n         ".join(
        f"len(list_filter(l, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS)
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS df_{t}" for t in BM25_TERMS)
    # both score polynomials spell the identical term order + association
    # as the Spark expressions below (the doc_bm25_search contract)
    bm25 = " + ".join(
        f"ln((n - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        f" * ((tf_{t} * {BM25_K1 + 1.0}) / (tf_{t} + {BM25_K1}"
        f" * (1.0 - {BM25_B} + {BM25_B} * (doclen / avgdl))))"
        for t in BM25_TERMS)
    tfidf = " + ".join(
        f"(tf_{t} / CAST(doclen AS DOUBLE)) * ln(n / (df_{t} + 1.0) + 1.0)"
        for t in BM25_TERMS)
    base = _BM25_BASE_SQL.format(tf_cols=tf_cols, df_cols=df_cols)
    return f"""
WITH {base},
scored AS (
  SELECT doc_id, {bm25} AS s1, {tfidf} AS s2
  FROM base, stats WHERE doclen > 0),
ra AS (
  SELECT doc_id, r FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s1 DESC, doc_id) AS r
    FROM scored) WHERE r <= {_RRF_RANKER_K}),
rb AS (
  SELECT doc_id, r FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s2 DESC, doc_id) AS r
    FROM scored) WHERE r <= {_RRF_RANKER_K}),
fused AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         CAST(ra.r AS BIGINT) AS bm25_rank,
         CAST(rb.r AS BIGINT) AS tfidf_rank,
         COALESCE(1.0 / ({RRF_K} + ra.r), 0.0)
           + COALESCE(1.0 / ({RRF_K} + rb.r), 0.0) AS rrf
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
SELECT doc_id, bm25_rank, tfidf_rank, ROUND(rrf, 6) AS rrf_score
FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP_K}
"""


@staged("doc_hybrid_search_rrf", _hybrid_oracle())
def q_doc_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    rank the corpus with TWO scorers over the same query terms — BM25 and
    a length-normalized TF-IDF — and fuse by RRF = sum over rankers of
    1/(k + rank), top-{RRF_TOP_K}. Rank fusion is how production search
    combines lexical and secondary scorers without calibrating score
    scales against each other; swapping the second ranker for an
    embedding-ANN ranking leaves this query's plan unchanged (ranks in,
    ranks out).

    Determinism: both score polynomials evaluate in the identical term
    order and association as the DuckDB oracle (the doc_bm25_search
    contract — non-ln operations IEEE-identical, ln's 1-ulp libm
    divergence washed out by the final ROUND; see DEVIATIONS.md's
    cross-engine float-parity note); ranks are then integers,
    tie-broken by doc_id, and RRF sums rationals of small integers.

    Scale shape: ONE narrow pass computes both scores (the tf columns are
    shared per-row HOFs; corpus stats broadcast as one row); each ranking
    is a TakeOrderedAndProject top-{_RRF_RANKER_K} — never a global
    sort — and the rank window + fusion join run on two
    {_RRF_RANKER_K}-row frames. Fusion cost is independent of corpus
    size by construction.
    """
    from traffic_data_pipeline_spark.plans.search_ops import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
    )

    def tf(term):
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
            .cast("double").alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    j = base.filter(F.col("doclen") > 0).crossJoin(F.broadcast(stats))
    s1 = None
    s2 = None
    for t in BM25_TERMS:
        idf = F.log(
            (F.col("n") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5)) + F.lit(1.0))
        tfc = F.col(f"tf_{t}")
        w1 = idf * (
            (tfc * F.lit(BM25_K1 + 1.0))
            / (tfc + F.lit(BM25_K1)
               * (F.lit(1.0 - BM25_B)
                  + F.lit(BM25_B) * (F.col("doclen") / F.col("avgdl")))))
        w2 = (tfc / F.col("doclen").cast("double")) \
            * F.log(F.col("n") / (F.col(f"df_{t}") + F.lit(1.0)) + F.lit(1.0))
        s1 = w1 if s1 is None else s1 + w1
        s2 = w2 if s2 is None else s2 + w2
    scored = j.select("doc_id", s1.alias("s1"), s2.alias("s2"))

    def topk(col):
        w = Window.orderBy(F.desc("_s"), F.asc("doc_id"))
        return (
            scored.select("doc_id", F.col(col).alias("_s"))
            .orderBy(F.desc("_s"), F.asc("doc_id")).limit(_RRF_RANKER_K)
            .withColumn("r", F.row_number().over(w).cast("bigint"))
            .select("doc_id", "r")
        )

    ra = topk("s1").withColumnRenamed("r", "bm25_rank")
    rb = topk("s2").withColumnRenamed("r", "tfidf_rank")
    fused = (
        ra.join(rb, "doc_id", "full_outer")
        .select(
            "doc_id", "bm25_rank", "tfidf_rank",
            (F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")),
                        F.lit(0.0))
             + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("tfidf_rank")),
                          F.lit(0.0))).alias("rrf"),
        )
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOP_K)
        .select("doc_id", "bm25_rank", "tfidf_rank",
                F.round("rrf", 6).alias("rrf_score"))
    )


# ---------------------------------------------------------------------------
# split_cluster_assign — leakage-safe train/valid/test split assignment
# ---------------------------------------------------------------------------

def _split_cluster_oracle() -> str:
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
bkt AS (
  SELECT doc_id, canonical_id,
         CAST('0x' || substr(md5(CAST(canonical_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 10 AS b
  FROM lbl)
SELECT doc_id, canonical_id,
       CASE WHEN b < 8 THEN 'train'
            WHEN b = 8 THEN 'valid'
            ELSE 'test' END AS split
FROM bkt
"""


@staged("split_cluster_assign", _split_cluster_oracle())
def q_split_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split assignment: hash-assign train/valid/test (8/1/1)
    at the NEAR-DUP CLUSTER level, so a document and its near-duplicates
    can never straddle splits — the remedial operator for what
    split_leakage_neardup AUDITS (a doc-level hash split leaks because
    near-identical pairs fall on both sides). Clusters are the exact
    connected components of the LSH pair graph (est_sim >= 0.5), the same
    frame dedup_minhash_canonical survives; the split key is the md5 of
    the cluster's canonical id, so assignment is deterministic, stable
    under re-runs, and independent of cluster enumeration order.

    Scale shape: reads the session-persisted band index / pair stream /
    COMPONENT TABLE the whole dedup family shares (doc_cc_components —
    the persisted-table stand-ins; the fixpoint runs once per session,
    not per consumer). The CC itself is the pointer-jumped min-label
    propagation (per round one join + one
    min-agg over EDGE-TOUCHED nodes only; isolated docs — the vast
    majority — rejoin as label-self rows without ever iterating), then
    one md5 projection. No new pairwise work: everything quadratic was
    already paid — and cached — by the dedup pass this op rides on. The
    oracle recomputes the identical closure as a recursive CTE, so
    chain-shaped clusters must agree too.
    """
    from traffic_data_pipeline_spark.plans.extensions import (
        doc_cc_components,
    )

    comp = doc_cc_components(spark, sf_dir)
    b = (
        F.conv(F.substring(F.md5(F.col("canonical_id").cast("string")), 1, 8),
               16, 10).cast("bigint") % 10
    )
    return comp.select(
        "doc_id", "canonical_id",
        F.when(b < 8, "train").when(b == 8, "valid").otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# events_decayed_engagement — exponential time-decay feature aggregation
# ---------------------------------------------------------------------------

_DECAY_HALF_LIFE_S = 7 * 24 * 3600     # one week, bucketed


@staged("events_decayed_engagement", f"""
WITH mx AS (SELECT MAX(ts) AS m FROM events),
k AS (
  -- integer microseconds on both sides: Spark's unix_timestamp truncates
  -- fractional seconds while DuckDB's epoch() keeps them, so second-level
  -- age math would bucket a sub-second-offset event differently
  SELECT user_id, value,
         (epoch_us(mx.m) - epoch_us(ts))
           // {_DECAY_HALF_LIFE_S * 1_000_000} AS hl
  FROM events, mx)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(value * power(0.5, hl) AS DECIMAL(30,12)))
                  AS DOUBLE), 6) AS decayed_score
FROM k GROUP BY 1
""")
def q_events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement with exponential time decay — the freshness-
    weighted counter a feature store maintains (recent activity counts
    fully, week-old activity half, and so on). Decay is bucketed to WHOLE
    half-lives (weight = 0.5^floor(age / half_life)): an integer power of
    two is EXACT in binary floating point, so the weight is bit-identical
    across engines — continuous decay (pow with a fractional exponent)
    is the same plan but inherits each engine's libm rounding, the one
    non-determinism this formulation exists to remove. Weighted values
    then accumulate as DECIMAL (order-free, the dsum contract).

    Scale shape: the reference instant is one broadcast scalar (the
    watermark-probe pattern), the weight is a projection, and the whole
    query is ONE map-side-combined per-user aggregate — the fact streams
    once. The incremental form multiplies yesterday's scores by the
    elapsed decay and merges the new day's partial aggregate, same as
    any decayed counter store.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    mx = ev.agg(F.max("ts").alias("m"))
    # exact integer microsecond age (see the oracle's epoch_us note)
    hl = F.expr(
        f"(unix_micros(m) - unix_micros(ts))"
        f" div {_DECAY_HALF_LIFE_S * 1_000_000}")
    return (
        ev.crossJoin(F.broadcast(mx))
        .select("user_id",
                (F.col("value") * F.pow(F.lit(0.5), hl)).alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("wv").cast(DOT_DECIMAL)).cast("double"), 6)
            .alias("decayed_score"),
        )
    )


# ---------------------------------------------------------------------------
# doc_dsir_importance — hashed-n-gram importance weights (DSIR)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 4096       # hashed feature space (2^12)
_DSIR_TARGET_LANG = "en"   # the "target distribution" sample


@staged("doc_dsir_importance", f"""
WITH tl AS (
  -- lang rides the row itself: joining documents back on doc_id would
  -- FAN OUT on duplicate ids (the dirty-corpus case) where Spark's
  -- in-row read does not
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS l
  FROM documents),
pg AS (
  SELECT t.doc_id, t.lang = '{_DSIR_TARGET_LANG}' AS is_t,
         CAST('0x' || substr(md5(array_to_string(l[g:g+1], ' ')), 1, 8)
              AS BIGINT) % {_DSIR_BUCKETS} AS bkt
  FROM tl t,
       unnest(generate_series(1, greatest(len(l) - 1, 0))) s(g)),
cnt AS (
  SELECT bkt,
         CAST(COUNT(*) AS BIGINT) AS cr,
         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct
  FROM pg GROUP BY 1),
tot AS (  -- totals from the token lists directly (== SUM(cr)/SUM(ct))
  SELECT CAST(SUM(greatest(len(l) - 1, 0)) AS BIGINT) AS tr,
         CAST(SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                       THEN greatest(len(l) - 1, 0) ELSE 0 END)
              AS BIGINT) AS tt
  FROM tl),
w AS (
  SELECT bkt,
         ln(CAST((ct + 1) * (tr + {_DSIR_BUCKETS}) AS DOUBLE))
           - ln(CAST((cr + 1) * (tt + {_DSIR_BUCKETS}) AS DOUBLE)) AS lw
  FROM cnt, tot),
per_doc AS (
  SELECT pg.doc_id,
         CAST(SUM(CAST(lw AS DECIMAL(30,12))) AS DOUBLE) AS s
  FROM pg JOIN w USING (bkt) GROUP BY 1)
SELECT t.doc_id,
       CAST(greatest(len(t.l) - 1, 0) AS BIGINT) AS n_feats,
       ROUND(COALESCE(p.s, 0.0), 6)              AS dsir_logweight
FROM tl t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
""")
def q_doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw-corpus
    document by the log importance ratio sum over hashed bigram features,
    log p_target(f) - log p_raw(f), where the target distribution is the
    '{_DSIR_TARGET_LANG}' slice and both feature distributions are
    Laplace-smoothed counts over {_DSIR_BUCKETS} md5-hashed buckets.
    Resampling the corpus proportional to exp(weight) yields a
    target-resembling subset — the selection knob between raw crawl and
    curated mix.

    Determinism: bucket ids are md5-prefix integers (the
    split_cluster_assign hash contract — identical in both engines);
    each feature's log weight is ln of an INTEGER-valued double
    ((ct+1)*(tr+B), widened to bigint BEFORE multiplying, exact below
    2^53 at any realistic bucket count), evaluated in the identical
    term order as the oracle (the doc_bm25_search ln-parity precedent);
    per-doc sums accumulate as DECIMAL(30,12) — order-free.

    Scale shape: the feature table is FIXED-SIZE ({_DSIR_BUCKETS} rows)
    regardless of corpus scale, so the per-bucket weight frame always
    broadcasts; the corpus pays one gram-bucket projection (in-row),
    one map-side-combined bucket aggregate, and one per-doc
    decimal-sum aggregate. Nothing is ever corpus x corpus; the 100 TB
    form streams the fact twice with two narrow shuffles.
    """
    dp = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text")

    def grams(src: DataFrame) -> DataFrame:
        return (
            src.select("doc_id",
                       (F.col("lang") == _DSIR_TARGET_LANG).alias("is_t"),
                       token_array(F.col("text")).alias("l"))
            .select("doc_id", "is_t",
                    F.explode(ngram_array("l", 2)).alias("gram"))
            .select(
                "doc_id", "is_t",
                (F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
                 .cast("bigint") % _DSIR_BUCKETS).alias("bkt"),
            )
        )

    # count lineage: no spread — the bucket aggregate reshuffles by bkt
    # anyway and map-side combine absorbs doc-size skew
    cnt = grams(docs).groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("cr"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("bigint").alias("ct"),
    )
    # totals as an in-row projection aggregate (== SUM over cnt, but with
    # no second pass over the bucket lineage)
    nf = F.greatest(
        F.array_size(token_array(F.col("text"))) - 1, F.lit(0))
    tot = docs.agg(
        F.sum(nf).cast("bigint").alias("tr"),
        F.sum(F.when(F.col("lang") == _DSIR_TARGET_LANG, nf).otherwise(0))
        .cast("bigint").alias("tt"),
    )
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "bkt",
        (F.log(((F.col("ct") + 1) * (F.col("tr") + _DSIR_BUCKETS))
               .cast("double"))
         - F.log(((F.col("cr") + 1) * (F.col("tt") + _DSIR_BUCKETS))
                 .cast("double"))).alias("lw"),
    )
    # scoring lineage: ONE spread, preserved through the explode and the
    # broadcast join, so the per-doc sum and the spine join add no exchange
    spread = docs.repartition(dp, "doc_id")
    per_doc = (
        grams(spread).join(F.broadcast(w), "bkt")
        .groupBy("doc_id")
        .agg(F.sum(F.col("lw").cast(DOT_DECIMAL)).cast("double").alias("s"))
    )
    base = spread.select("doc_id", nf.cast("bigint").alias("n_feats"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id", "n_feats",
            F.round(F.coalesce("s", F.lit(0.0)), 6).alias("dsir_logweight"),
        )
    )


# ---------------------------------------------------------------------------
# doc_winnowing_fingerprint — winnowing (MOSS) fingerprints + pair candidates
# ---------------------------------------------------------------------------

_FP_K = 4          # token-gram width hashed into fingerprint candidates
_FP_W = 3          # winnowing window: one fingerprint (the min) per window
_FP_CAP = 4        # fingerprints in > this many docs are stop-fingerprints
_FP_PLANTED = 30   # ids < this gain a two-token-appended twin
_FP_OFFSET = 500000

# engineered cap-boundary groups (out-of-vocabulary tokens, 6 tokens ->
# 3 grams -> ONE window -> exactly one fingerprint per doc):
# 4 docs share one fingerprint (df == _FP_CAP, kept -> C(4,2) pairs);
# 5 docs share another (df == _FP_CAP + 1, dropped -> zero pairs).
_FP_KEEP_TEXT = "zqfa zqfb zqfc zqfd zqfe zqff"
_FP_DROP_TEXT = "zqga zqgb zqgc zqgd zqge zqgf"
_FP_KEEP_IDS = [510000 + i for i in range(_FP_CAP)]
_FP_DROP_IDS = [511000 + i for i in range(_FP_CAP + 1)]

_FP_LITERAL_SQL = " UNION ALL ".join(
    f"SELECT {i} AS doc_id, '{_FP_KEEP_TEXT}' AS text" for i in _FP_KEEP_IDS
) + " UNION ALL " + " UNION ALL ".join(
    f"SELECT {i} AS doc_id, '{_FP_DROP_TEXT}' AS text" for i in _FP_DROP_IDS
)


@staged("doc_winnowing_fingerprint", f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_FP_OFFSET}, text || ' zzfp zzfq'
  FROM documents WHERE doc_id < {_FP_PLANTED}
  UNION ALL
  {_FP_LITERAL_SQL}),
tl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') AS l
  FROM corpus),
h AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len(l) - {_FP_K - 1}, 0)),
           g -> CAST('0x' || substr(md5(array_to_string(l[g:g+{_FP_K - 1}], ' ')),
                                    1, 8) AS BIGINT)) AS hs
  FROM tl),
fps AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           unnest(CASE
             WHEN len(hs) = 0 THEN []::BIGINT[]
             WHEN len(hs) < {_FP_W} THEN [list_min(hs)]
             ELSE list_transform(
               generate_series(1, len(hs) - {_FP_W - 1}),
               i -> list_min(hs[i:i+{_FP_W - 1}]))
           END) AS fp
    FROM h)),
kept AS (
  SELECT fp FROM fps GROUP BY fp
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {_FP_CAP})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fps a
JOIN kept k ON k.fp = a.fp
JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
""")
def q_doc_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint dedup (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS algorithm): hash every {_FP_K}-token gram, slide a
    {_FP_W}-window over the hash sequence keeping each window's MINIMUM,
    and emit candidate pairs sharing any surviving fingerprint with the
    shared count. Winnowing's guarantee — any match of at least
    {_FP_W + _FP_K - 1} contiguous tokens shares a fingerprint — gives
    recall at a fixed, tunable fraction of the gram stream (~2/(w+1) of
    positions), the storage/recall dial between full-gram containment
    and MinHash sketching. Fingerprints in more than {_FP_CAP} documents
    are dropped as stop-fingerprints (the hot-band-cap tactic, bounding
    any bucket's pair contribution at C({_FP_CAP},2)); the fixture
    plants a group AT the cap (kept) and one past it (dropped), so the
    <= boundary is exercised exactly.

    Determinism: gram hashes are md5-prefix integers (both engines);
    window minima are integer min; the planted twins (ids <
    {_FP_PLANTED} with two appended tokens at +{_FP_OFFSET}) share all
    but the tail-boundary windows with their source, so the pair path
    runs for real. The `sequence()` calls are guarded by CASE on length
    (Spark's sequence(1,0) DESCENDS while DuckDB's generate_series is
    empty — the known divergence).

    Scale shape: hashing, winnowing, and the per-doc fingerprint
    distinct are per-row array HOFs (zero shuffle until the fingerprint
    explode); the inverted fingerprint index is ONE map-side-combined
    aggregate whose doc lists are <= {_FP_CAP} long after the stop
    filter, so each bucket's C(n,2) pairs explode IN-ROW from the
    sorted list — no self-join exists anywhere; one final pair
    aggregate sums shared counts. The LSH band join's audited shape
    with the window-min as the band function and the band join
    replaced by the capped-list combination explode.
    """
    dp = spark.sparkContext.defaultParallelism
    d0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d0.unionByName(
        d0.filter(F.col("doc_id") < _FP_PLANTED).select(
            (F.col("doc_id") + _FP_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzfp zzfq")).alias("text"),
        )
    ).unionByName(
        _literal_docs(spark, [(i, _FP_KEEP_TEXT) for i in _FP_KEEP_IDS]
                      + [(i, _FP_DROP_TEXT) for i in _FP_DROP_IDS])
    )
    h = corpus.repartition(dp, "doc_id").select(
        "doc_id", token_array(F.col("text")).alias("tok")
    ).select(
        "doc_id",
        F.expr(
            f"transform(transform(slice(tok, 1,"
            f" greatest(size(tok) - {_FP_K - 1}, 0)),"
            f" (x, i) -> concat_ws(' ', slice(tok, i + 1, {_FP_K}))),"
            f" g -> cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint))"
        ).alias("hs"),
    )
    win = (
        f"CASE WHEN size(hs) = 0 THEN cast(array() as array<bigint>)"
        f" WHEN size(hs) < {_FP_W} THEN array(array_min(hs))"
        f" ELSE transform(sequence(1, size(hs) - {_FP_W - 1}),"
        f" i -> array_min(slice(hs, i, {_FP_W}))) END"
    )
    # per-doc fingerprint distinct happens IN-ROW (array_distinct before
    # the explode): the oracle's DISTINCT over the exploded stream is the
    # same set, but Spark never pays a corpus-gram-sized dedup shuffle
    fps = h.select(
        "doc_id", F.explode(F.expr(f"array_distinct({win})")).alias("fp"))
    # inverted index and pair generation in ONE fingerprint aggregate:
    # each bucket's doc list is at most _FP_CAP long after the stop-
    # fingerprint filter, so its C(n,2) pairs explode IN-ROW from the
    # sorted list — the fingerprint stream is consumed once and there is
    # no self-join at all (the sorted list is the join)
    pairs = (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= _FP_CAP))
        .select(F.explode(F.expr(
            "flatten(transform(ds, (x, i) ->"
            " transform(slice(ds, i + 2, size(ds)),"
            " y -> struct(x AS doc_a, y AS doc_b))))"
        )).alias("p"))
        .select("p.doc_a", "p.doc_b")
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# doc_ngram_novelty — per-document novel-gram rate
# ---------------------------------------------------------------------------

_NOV_N = 3            # gram width
_NOV_PLANTED = 30     # ids < this gain an exact copy (novelty 0 by design)
_NOV_OFFSET = 600000


@staged("doc_ngram_novelty", f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_NOV_OFFSET}, text
  FROM documents WHERE doc_id < {_NOV_PLANTED}),
tl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') AS l
  FROM corpus),
pg AS (
  SELECT DISTINCT doc_id, array_to_string(l[g:g+{_NOV_N - 1}], ' ') AS gram
  FROM tl, unnest(generate_series(1, greatest(len(l) - {_NOV_N - 1}, 0))) s(g)),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM pg GROUP BY 1),
first AS (SELECT gram, MIN(doc_id) AS fd FROM pg GROUP BY 1),
nov AS (SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
        FROM first GROUP BY 1)
-- docs with zero grams (< N tokens) are OUT by construction in both
-- engines (novelty is undefined for them), not left-joined to NULL:
-- inner semantics can't silently diverge if the fixture gains short docs
SELECT t.doc_id,
       t.n_grams,
       COALESCE(v.n_novel, 0) AS n_novel,
       ROUND(CAST(COALESCE(v.n_novel, 0) AS DOUBLE) / t.n_grams, 6) AS novelty
FROM tot t
LEFT JOIN nov v ON v.doc_id = t.doc_id
""")
def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty profiling: the fraction of a document's
    DISTINCT {_NOV_N}-grams that the corpus sees for the FIRST time in
    this document (first occurrence = minimum doc_id — a deterministic
    stand-in for ingestion order). Streaming this rate over an ingest
    sequence is how corpus curation measures marginal contribution:
    exact copies score 0, boilerplate-heavy additions score low, and the
    cumulative novel-gram count is the corpus's gram-coverage growth
    curve. The fixture plants exact copies of ids < {_NOV_PLANTED} at
    +{_NOV_OFFSET}, which must score novelty 0 (every gram's first
    occurrence is their lower-id source).

    Scale shape: the per-doc gram distinct happens IN-ROW
    (array_distinct before the explode — never a (doc, gram) dedup
    shuffle); the first-occurrence table is ONE map-side-combined MIN
    aggregate over the gram key; per-doc novel counts come from
    regrouping THAT (gram-unique, so corpus-vocabulary-sized) frame by
    its min-doc — the raw gram stream is never joined back. The per-doc
    total and the final join ride the spread's doc_id partitioning, so
    the whole query is the spread plus one gram-keyed aggregate. Docs
    with zero grams (< {_NOV_N} tokens) are excluded by construction in
    BOTH engines rather than left-joined to NULL ratios. No self-joins;
    cost is linear in corpus grams, the novelty twin of vocab_build's
    shuffle budget.
    """
    dp = spark.sparkContext.defaultParallelism
    d0 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d0.unionByName(
        d0.filter(F.col("doc_id") < _NOV_PLANTED).select(
            (F.col("doc_id") + _NOV_OFFSET).alias("doc_id"), "text")
    )
    # per-doc gram distinct is IN-ROW (array_distinct before the explode) —
    # the oracle's SELECT DISTINCT over the exploded stream is the same
    # set, but Spark pays no (doc, gram) dedup shuffle; the per-doc total
    # and the final join both RIDE the spread's doc_id partitioning (and
    # nov regroups by fd, which IS a doc_id), so the whole query costs
    # the spread plus one gram-keyed aggregate
    pg = (
        corpus.repartition(dp, "doc_id")
        .select("doc_id", token_array(F.col("text")).alias("l"))
        .select("doc_id",
                F.explode(F.array_distinct(ngram_array("l", _NOV_N)))
                .alias("gram"))
    )
    tot = pg.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"))
    nov = (
        pg.groupBy("gram").agg(F.min("doc_id").alias("fd"))
        .groupBy(F.col("fd").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    nv = F.coalesce("n_novel", F.lit(0).cast("bigint"))
    return (
        tot.join(nov, "doc_id", "left")
        .select(
            "doc_id", "n_grams",
            nv.alias("n_novel"),
            F.round(nv.cast("double") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# lang_temperature_weights — multilingual temperature sampling (alpha = 1/2)
# ---------------------------------------------------------------------------

@staged("lang_temperature_weights", """
WITH sized AS (
  SELECT lang,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x != '')) AS BIGINT) AS n_tok
  FROM documents),
per_lang AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens
  FROM sized GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
         CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(30,12)))
              AS DOUBLE) AS z
  FROM per_lang)
SELECT lang, n_docs, n_tokens,
       -- NULLIF twins: a zero-token language (all-symbol docs) makes
       -- boost 0/0 and a fully tokenless corpus makes t/z zero — DuckDB
       -- IEEE division emits nan/inf there while Spark emits NULL (the
       -- lang_token_fertility divergence class); both engines emit NULL
       ROUND(CAST(n_tokens AS DOUBLE) / NULLIF(t, 0), 6)         AS p_raw,
       ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / NULLIF(z, 0), 6)   AS w_temp,
       ROUND((sqrt(CAST(n_tokens AS DOUBLE)) / NULLIF(z, 0))
             / NULLIF(CAST(n_tokens AS DOUBLE) / NULLIF(t, 0), 0), 6)
         AS boost
FROM per_lang, tot
""")
def q_lang_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual sampling weights (the mC4 / XLM-R
    alpha-sampling rule): sample language l proportional to p_l^alpha so
    low-resource languages are up-weighted relative to their raw token
    share. alpha is fixed at 1/2 BECAUSE p^0.5 is sqrt — IEEE-754
    requires sqrt correctly rounded, so the weight is bit-identical
    across engines, whereas a general pow(p, 0.3) inherits each libm's
    rounding (the determinism rule fractional exponents always break).
    Emits per language: raw token share, temperature weight, and the
    up/down-sampling boost a mixture loader applies.

    Determinism: per-language token totals are integer; sqrt of an
    exact-below-2^53 integer-valued double is correctly rounded; the
    normalizer accumulates the (at most #languages) sqrt terms as
    DECIMAL(30,12) so the sum is order-free; divisions are then
    deterministic double ops rounded to 6 places.

    Scale shape: in-row token counts (no explode), ONE map-side-combined
    per-language aggregate (output rows = #languages), and a broadcast
    one-row normalizer. The corpus streams exactly once; this is the
    cheapest possible shape for the statistic.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_lang = (
        docs.select("lang",
                    F.array_size(token_array(F.col("text")))
                    .cast("bigint").alias("n_tok"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    tot = per_lang.agg(
        F.sum("n_tokens").cast("bigint").alias("t"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double")).cast(DOT_DECIMAL))
        .cast("double").alias("z"),
    )
    sq = F.sqrt(F.col("n_tokens").cast("double"))
    # nullif twins: see the oracle's zero-token note (Spark's non-ANSI
    # division already NULLs on a zero divisor; the explicit nullif
    # keeps the contract visible and ANSI-mode-proof)
    p_raw = (F.col("n_tokens").cast("double")
             / F.nullif(F.col("t"), F.lit(0)))
    w_temp = sq / F.nullif(F.col("z"), F.lit(0.0))
    return (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang", "n_docs", "n_tokens",
            F.round(p_raw, 6).alias("p_raw"),
            F.round(w_temp, 6).alias("w_temp"),
            F.round(w_temp / F.nullif(p_raw, F.lit(0.0)), 6).alias("boost"),
        )
    )


# ---------------------------------------------------------------------------
# events_rollup_merge — incremental view maintenance via mergeable partials
# ---------------------------------------------------------------------------

_IVM_SPLIT_DAYS = 3     # "new" = the trailing N days; "old" = everything else


@staged("events_rollup_merge", f"""
WITH mx AS (SELECT MAX(ts) AS m FROM events)
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(COUNT(value) AS BIGINT)  AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE), 6) AS total,
       MIN(value)                    AS vmin,
       MAX(value)                    AS vmax,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE)
             / NULLIF(COUNT(value), 0), 6) AS vavg
FROM events
GROUP BY 1, 2
""")
def q_events_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-(type, hour) rollup is
    computed as TWO partial aggregates — the "old" corpus (everything
    before a cutoff {_IVM_SPLIT_DAYS} days behind the watermark, standing
    in for yesterday's persisted rollup) and the "new" trailing delta —
    then MERGED by summing counts and decimal sums and taking min/max of
    mins/maxes. The oracle is the single-pass full recompute, so the
    oracle gate IS the maintenance invariant: merge(partial(old),
    partial(new)) == recompute(all). This is the nightly-pipeline
    contract that lets a 100 TB rollup absorb a day's delta without
    rereading history, and it holds only because every statistic carried
    is map-side mergeable (count/sum/min/max — the mean is DERIVED from
    (sum, n) at read time, never maintained directly, because means
    don't merge).

    Determinism: sums accumulate as DECIMAL(30,12) (order-free, so the
    old/new split point cannot change a digit); the derived mean divides
    the exact decimal-cast-double by a bigint; hours go out as UTC
    strings (the timestamp hash-stability rule).

    Scale shape: one broadcast watermark scalar, one partial aggregate
    keyed (type, hour, epoch-bucket) — map-side combined, so each
    partition contributes one row per group — and one merge aggregate
    over group-cardinality-sized partials. The fact streams once; the
    production form persists the old-side partials and feeds only the
    delta through the same merge.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    mx = ev.agg(F.max("ts").alias("m"))
    # the day→µs product is folded in Python: spelled as int literals it
    # would multiply as INT and overflow under ANSI (the widen-before-
    # multiply rule)
    cutoff_us = F.expr(
        f"unix_micros(m) - {_IVM_SPLIT_DAYS * 86400 * 1_000_000}")
    partials = (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("hour"),
            (F.unix_micros(F.col("ts")) >= cutoff_us).alias("is_new"),
            "value",
        )
        .groupBy("event_type", "hour", "is_new")
        .agg(
            F.count("value").cast("bigint").alias("n"),
            F.sum(F.col("value").cast(DOT_DECIMAL)).alias("s"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    merged = (
        partials.groupBy("event_type", "hour")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s").alias("s"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
    return merged.select(
        "event_type", "hour", "n",
        F.round(F.col("s").cast("double"), 6).alias("total"),
        "vmin", "vmax",
        F.round(F.col("s").cast("double")
                / F.nullif(F.col("n"), F.lit(0)), 6).alias("vavg"),
    )


# ---------------------------------------------------------------------------
# doc_paragraph_dedup — corpus-wide paragraph-level exact dedup
# ---------------------------------------------------------------------------

PARA_TOKENS = 12    # fixed-stride paragraph segmentation (fixture has no \n)

_PARA_SHARED = " ".join(f"zp{i:02d}" for i in range(PARA_TOKENS))

_PARA_CORPUS_CTE = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 700000, text FROM documents WHERE doc_id < 30
  UNION ALL
  SELECT * FROM (VALUES
    (720000, '{_PARA_SHARED} zpta zptb'),
    (720001, '{_PARA_SHARED} zptc')) v(doc_id, text))
"""


@staged("doc_paragraph_dedup", f"""
WITH {_PARA_CORPUS_CTE},
tl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x != '') AS l
  FROM corpus),
para AS (
  SELECT doc_id, t.k AS k,
         array_to_string(
           l[t.k * {PARA_TOKENS} + 1 : t.k * {PARA_TOKENS} + {PARA_TOKENS}],
           ' ') AS para
  FROM tl, unnest(generate_series(0, (len(l) - 1) // {PARA_TOKENS})) t(k)
  WHERE len(l) > 0),
rk AS (
  SELECT doc_id, k, para,
         ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, k) AS r
  FROM para),
kept AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
         string_agg(para, ' ' ORDER BY k) AS dedup_text
  FROM rk WHERE r = 1 GROUP BY 1),
base AS (
  SELECT doc_id,
         CAST(CASE WHEN len(l) = 0 THEN 0
                   ELSE (len(l) - 1) // {PARA_TOKENS} + 1 END AS INT)
           AS n_paras
  FROM tl)
SELECT b.doc_id, b.n_paras,
       CAST(COALESCE(k.n_kept, 0) AS INT) AS n_kept,
       ROUND(CAST(COALESCE(k.n_kept, 0) AS DOUBLE)
             / NULLIF(b.n_paras, 0), 6)   AS kept_ratio,
       COALESCE(k.dedup_text, '')         AS dedup_text
FROM base b LEFT JOIN kept k ON k.doc_id = b.doc_id
""")
def q_doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup across the WHOLE corpus — the standard
    training-data cleanup between document-level dedup and line-level
    filtering: a paragraph (here a fixed 12-token segment,
    since the fixture corpus carries no newlines) survives only at its
    FIRST occurrence in corpus order (doc_id, then position); every later
    copy anywhere in the corpus is dropped, and each document is
    reassembled from its surviving paragraphs in position order.

    The augmented corpus (FIXTURES.md planting pattern) adds full copies
    of docs 0-29 at +700000 — every one of their paragraphs deduplicates
    to n_kept = 0 — plus a literal pair sharing EXACTLY one paragraph
    (the shared 12-token span is a whole segment in both docs:
    kept in 720000, dropped in 720001, while both short tails survive).

    Determinism: first-occurrence is a ROW_NUMBER over (doc_id, k) — a
    total order, no hash ties possible (md5 equality == string equality
    for dedup purposes; a cross-doc md5 collision would need a SHA-broken
    fixture). Reassembly orders by k in both engines; kept_ratio divides
    two exact ints.

    Scale shape: segments spill out of the token array IN-ROW (explode of
    a sequence, no join); ONE hash shuffle keys paragraphs by md5 for the
    first-occurrence window — the same single-shuffle shape as exact doc
    dedup, with md5 keys bounding skew (identical paragraphs DO hot-spot
    one reducer; the hot-band-cap precedent applies if a boilerplate
    paragraph dominates — at that point it IS boilerplate and the
    doc_boilerplate_coverage op is the right tool); one doc_id regroup
    reassembles. The corpus streams once.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = (
        docs.select("doc_id", "text")
        .unionByName(
            docs.filter(F.col("doc_id") < 30)
            .select((F.col("doc_id") + 700000).alias("doc_id"), "text"))
        .unionByName(_literal_docs(spark, [
            (720000, f"{_PARA_SHARED} zpta zptb"),
            (720001, f"{_PARA_SHARED} zptc"),
        ]))
    )
    tl = corpus.select("doc_id", token_array(F.col("text")).alias("l"))
    para = (
        tl.filter(F.size("l") > 0)
        .select(
            "doc_id",
            F.explode(F.expr(
                f"sequence(0, int((size(l) - 1) div {PARA_TOKENS}))"))
            .alias("k"),
            "l")
        .select(
            "doc_id", "k",
            F.array_join(
                F.expr(f"slice(l, k * {PARA_TOKENS} + 1, {PARA_TOKENS})"),
                " ").alias("para"))
    )
    first = F.row_number().over(
        Window.partitionBy(F.md5("para")).orderBy("doc_id", "k"))
    kept = (
        para.withColumn("_r", first)
        .filter(F.col("_r") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "para"))),
                    lambda s: s["para"]),
                " ").alias("dedup_text"))
    )
    base = tl.select(
        "doc_id",
        F.when(F.size("l") == 0, F.lit(0))
        .otherwise(F.expr(f"int((size(l) - 1) div {PARA_TOKENS}) + 1"))
        .cast("int").alias("n_paras"))
    return (
        base.join(kept, "doc_id", "left")
        .select(
            "doc_id", "n_paras",
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            F.round(F.coalesce("n_kept", F.lit(0)).cast("double")
                    / F.nullif(F.col("n_paras"), F.lit(0)), 6)
            .alias("kept_ratio"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"))
    )


# ---------------------------------------------------------------------------
# doc_c4_line_filter — C4-style line-level cleaning + page-level gates
# ---------------------------------------------------------------------------

C4_MIN_WORDS = 5        # keep a line only if it has >= this many words
C4_MIN_KEPT_LINES = 3   # keep a page only if >= this many lines survive

_L_KEEP1 = "alpha beta gamma delta epsilon zeta eta theta."
_L_KEEP5 = "one two three four five."                  # exactly 5 words
_L_DROP4 = "one two three four."                       # 4 words: dropped
_L_NOPUNCT = "this line has plenty of words but no stop mark"
_L_JS = "please enable javascript support to continue browsing here."
_L_JSMIXED = "Please Enable JavaScript Support To Continue Browsing Here."
_L_KEEP2 = "kappa lambda mu nu xi omicron pi rho sigma."
_L_KEEP3 = "tau upsilon phi chi psi omega alpha again today."
_L_LOREM = "standard lorem ipsum filler text appears right here today."
_L_BRACE = "function main() { return zero; }"

# (doc_id, lines): each doc exercises one page-level rule AT its boundary
_C4_DOCS: list[tuple[int, list[str]]] = [
    # exactly C4_MIN_KEPT_LINES survive (KEEP1/KEEP5/KEEP2) -> page kept
    (730000, [_L_KEEP1, _L_KEEP5, _L_DROP4, _L_NOPUNCT, _L_JS, _L_KEEP2]),
    # only 2 survive -> page dropped at the < MIN_KEPT boundary
    (730001, [_L_KEEP1, _L_KEEP2, _L_DROP4]),
    # 4 survive but 'lorem ipsum' appears -> page dropped
    (730002, [_L_KEEP1, _L_KEEP2, _L_KEEP3, _L_LOREM]),
    # 3 survive but '{' appears -> page dropped
    (730003, [_L_KEEP1, _L_KEEP2, _L_KEEP3, _L_BRACE]),
    # mixed-case JavaScript line dropped case-insensitively; page kept
    (730004, [_L_KEEP1, _L_KEEP2, _L_KEEP3, _L_JSMIXED]),
]

_C4_SQL_DOCS = ",\n    ".join(
    "({}, {})".format(
        i, " || chr(10) || ".join("'" + ln + "'" for ln in lines))
    for i, lines in _C4_DOCS)

# line predicate, spelled once per engine: >= C4_MIN_WORDS words, ends in
# terminal punctuation, and no (case-folded) 'javascript'
_C4_SQL_KEEP = f"""list_filter(string_split(text, chr(10)), x ->
      len(list_filter(string_split_regex(trim(x), ' +'), w -> w != ''))
        >= {C4_MIN_WORDS}
      AND regexp_matches(trim(x), '[.!?"]$')
      AND NOT contains(lower(x), 'javascript'))"""


@staged("doc_c4_line_filter", f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {_C4_SQL_DOCS}) v(doc_id, text)),
flt AS (
  SELECT doc_id, text,
         len(string_split(text, chr(10))) AS n_lines,
         {_C4_SQL_KEEP} AS kept
  FROM corpus)
SELECT doc_id,
       CAST(n_lines AS INT)   AS n_lines,
       CAST(len(kept) AS INT) AS n_kept,
       CAST(CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END
            AS INT) AS has_lorem,
       CAST(CASE WHEN contains(text, '{{') THEN 1 ELSE 0 END AS INT)
         AS has_brace,
       CAST(CASE WHEN len(kept) >= {C4_MIN_KEPT_LINES}
                  AND NOT contains(lower(text), 'lorem ipsum')
                  AND NOT contains(text, '{{') THEN 1 ELSE 0 END AS INT)
         AS page_kept,
       COALESCE(array_to_string(kept, chr(10)), '') AS kept_text
FROM flt
""")
def q_doc_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning (the published colossal-clean-crawled-corpus
    rules, re-expressed): a LINE survives only if it has at least
    5 whitespace words, ends in terminal punctuation
    ([.!?"]), and does not mention javascript (case-folded); a PAGE
    survives only if at least 3 lines survive and the
    page contains neither 'lorem ipsum' nor a curly brace. The fixture
    word-soup docs are single unpunctuated lines — C4 correctly drops
    them all — so the planted docs (730000-730004, one per page rule,
    each sitting exactly ON its boundary) carry the rule coverage:
    exactly-5-word and exactly-3-kept-line cases pass, 4-word and
    2-kept-line cases fail, and the JavaScript drop is proven
    case-insensitive.

    Determinism: every decision is a string predicate or an integer
    comparison — no floats anywhere. Word counts split on runs of
    spaces with empties dropped, identically in both engines.

    Scale shape: ENTIRELY in-row — split, filter-lambda, rejoin; zero
    shuffles, zero joins, full whole-stage codegen. At 100 TB this is
    the ideal operator: a pure map over the corpus scan with predicate
    and projection pushdown intact.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(_literal_docs(
        spark, [(i, "\n".join(lines)) for i, lines in _C4_DOCS]))
    n_words = lambda x: F.size(
        F.filter(F.split(F.trim(x), " +"), lambda w: w != ""))
    keep = lambda x: (
        (n_words(x) >= C4_MIN_WORDS)
        & F.trim(x).rlike('[.!?"]$')
        & ~F.lower(x).contains("javascript"))
    flt = corpus.select(
        "doc_id", "text",
        F.size(F.split("text", "\n")).alias("n_lines"),
        F.filter(F.split("text", "\n"), keep).alias("kept"))
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    # flags use when/otherwise, not a bare boolean cast: the oracle's
    # CASE maps a NULL predicate (NULL text) to 0, and a NULL->NULL cast
    # here would diverge on dirty corpora (the dirty-text parity gate)
    return flt.select(
        "doc_id",
        F.col("n_lines").cast("int").alias("n_lines"),
        F.size("kept").cast("int").alias("n_kept"),
        F.when(has_lorem, 1).otherwise(0).cast("int").alias("has_lorem"),
        F.when(has_brace, 1).otherwise(0).cast("int").alias("has_brace"),
        F.when((F.size("kept") >= C4_MIN_KEPT_LINES)
               & ~has_lorem & ~has_brace, 1).otherwise(0)
        .cast("int").alias("page_kept"),
        F.coalesce(F.array_join("kept", "\n"), F.lit(""))
        .alias("kept_text"),
    )


# ---------------------------------------------------------------------------
# doc_gopher_quality — Gopher-style document quality rules (division-free)
# ---------------------------------------------------------------------------

GQ_MIN_WORDS, GQ_MAX_WORDS = 50, 100_000
GQ_MIN_MEANLEN, GQ_MAX_MEANLEN = 3, 10   # mean word length bounds (inclusive)
# frac(words with a letter) >= 0.8  <=>  5 * n_alpha >= 4 * n
# frac(symbols) <= 0.1              <=>  10 * n_sym  <= n
GQ_MIN_STOPWORDS = 2

_w3 = [f"x{i:02d}" for i in range(60)]        # 3-char words
_w4 = [f"xy{i:02d}" for i in range(60)]       # 4-char words
_dg = [str(100 + i) for i in range(20)]       # 3-char pure-digit words

_GQ_PASS50 = " ".join(["the", "a"] + _w4[:48])

# (doc_id, text): one doc per rule, each AT its boundary
_GQ_DOCS: list[tuple[int, str]] = [
    (750000, _GQ_PASS50),                                  # all rules pass
    (750001, " ".join(["the", "a"] + _w4[:47])),           # 49 words: fails
    (750002, " ".join(["the", "and"] + _w3[:48])),         # mean len == 3.0
    (750003, " ".join(["the", "and"] + _w3[:47] + ["xy"])),  # mean < 3
    (750004, " ".join(["the", "a"] + _w4[:38] + _dg[:10])),  # alpha == 0.8
    (750005, " ".join(["the", "a"] + _w4[:37] + _dg[:11])),  # alpha < 0.8
    (750006, " ".join(["the"] + _w4[:49])),                # 1 stopword: fails
    (750007, _GQ_PASS50 + " # # # # #"),                   # sym ratio == 0.1
    (750008, _GQ_PASS50 + " # # # # # #"),                 # sym ratio > 0.1
]

_GQ_SQL_DOCS = ",\n    ".join(f"({i}, '{t}')" for i, t in _GQ_DOCS)

_GQ_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"


@staged("doc_gopher_quality", f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {_GQ_SQL_DOCS}) v(doc_id, text)),
tl AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS l
  FROM corpus),
m AS (
  SELECT doc_id,
         len(l)                                              AS n_words,
         CAST(CASE WHEN l IS NULL THEN NULL
                   ELSE COALESCE(list_sum(list_transform(l, x -> length(x))),
                                 0) END
              AS BIGINT)                                     AS total_chars,
         len(list_filter(l, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(list_filter(l, x -> list_contains({_GQ_STOP_SQL}, x)))
                                                             AS n_stop,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3
                                                             AS n_sym
  FROM tl)
SELECT doc_id,
       CAST(n_words AS INT)  AS n_words,
       total_chars,
       ROUND(CAST(total_chars AS DOUBLE) / NULLIF(n_words, 0), 6)
         AS mean_word_len,
       CAST(n_alpha AS INT)  AS n_alpha,
       CAST(n_stop AS INT)   AS n_stop,
       CAST(n_sym AS INT)    AS n_sym,
       CAST(CASE WHEN n_words >= {GQ_MIN_WORDS}
                  AND n_words <= {GQ_MAX_WORDS} THEN 1 ELSE 0 END AS INT)
         AS ok_nwords,
       CAST(CASE WHEN total_chars >= {GQ_MIN_MEANLEN} * n_words
                  AND total_chars <= {GQ_MAX_MEANLEN} * n_words
                 THEN 1 ELSE 0 END AS INT) AS ok_wordlen,
       CAST(CASE WHEN 5 * n_alpha >= 4 * n_words THEN 1 ELSE 0 END AS INT)
         AS ok_alpha,
       CAST(CASE WHEN 10 * n_sym <= n_words THEN 1 ELSE 0 END AS INT)
         AS ok_sym,
       CAST(CASE WHEN n_stop >= {GQ_MIN_STOPWORDS} THEN 1 ELSE 0 END AS INT)
         AS ok_stop,
       CAST(CASE WHEN n_words >= {GQ_MIN_WORDS}
                  AND n_words <= {GQ_MAX_WORDS}
                  AND total_chars >= {GQ_MIN_MEANLEN} * n_words
                  AND total_chars <= {GQ_MAX_MEANLEN} * n_words
                  AND 5 * n_alpha >= 4 * n_words
                  AND 10 * n_sym <= n_words
                  AND n_stop >= {GQ_MIN_STOPWORDS}
                 THEN 1 ELSE 0 END AS INT) AS passes
FROM m
""")
def q_doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (the published MassiveText
    repetition-free rule family, re-expressed): word count in
    [50, 100000]; mean word length in [3, 10]; at least 80% of words
    contain a letter; symbol-to-word ratio (# plus literal ellipses) at
    most 0.1; at least 2 English stopwords. Emits every intermediate
    statistic plus one flag per rule, so downstream mixtures can
    re-threshold without recomputing.

    EVERY threshold decision is division-free integer arithmetic —
    mean length in [3,10] is total_chars BETWEEN 3*n AND 10*n, the 0.8
    alpha fraction is 5*n_alpha >= 4*n, the 0.1 symbol ratio is
    10*n_sym <= n — so the boundary rows planted at 750000-750008 (one
    per rule, sitting exactly ON the threshold: 50 words, mean exactly
    3.0, alpha exactly 0.8, symbols exactly 0.1, exactly 2 stopwords)
    decide identically in both engines with no float rounding in the
    decision path; the only double emitted (mean_word_len) is a display
    column derived from two exact ints.

    Scale shape: pure in-row projection — token stats fold inside the
    row, zero shuffles, zero joins, whole-stage codegen end to end.
    """
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        _literal_docs(spark, _GQ_DOCS))
    tl = corpus.select(
        "doc_id", "text", token_array(F.col("text")).alias("l"))
    n_words = F.size("l")
    total_chars = F.aggregate(
        F.transform("l", lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"), lambda a, x: a + x)
    n_alpha = F.size(F.filter("l", lambda x: x.rlike("[a-z]")))
    n_stop = F.size(F.filter("l", lambda x: x.isin(*STOPWORDS_EN)))
    m = tl.select(
        "doc_id",
        n_words.alias("n_words"),
        total_chars.alias("total_chars"),
        n_alpha.alias("n_alpha"),
        n_stop.alias("n_stop"),
        (F.length("text") - F.length(F.expr("replace(text, '#', '')"))
         + F.expr("int((length(text) - length(replace(text, '...', '')))"
                  " div 3)")).alias("n_sym"),
    )
    ok_nwords = (F.col("n_words") >= GQ_MIN_WORDS) & \
        (F.col("n_words") <= GQ_MAX_WORDS)
    ok_wordlen = (
        (F.col("total_chars") >= GQ_MIN_MEANLEN * F.col("n_words"))
        & (F.col("total_chars") <= GQ_MAX_MEANLEN * F.col("n_words")))
    ok_alpha = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    ok_sym = 10 * F.col("n_sym") <= F.col("n_words")
    ok_stop = F.col("n_stop") >= GQ_MIN_STOPWORDS
    return m.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
        F.round(F.col("total_chars").cast("double")
                / F.nullif(F.col("n_words"), F.lit(0)), 6)
        .alias("mean_word_len"),
        F.col("n_alpha").cast("int").alias("n_alpha"),
        F.col("n_stop").cast("int").alias("n_stop"),
        F.col("n_sym").cast("int").alias("n_sym"),
        F.when(ok_nwords, 1).otherwise(0).cast("int").alias("ok_nwords"),
        F.when(ok_wordlen, 1).otherwise(0).cast("int").alias("ok_wordlen"),
        F.when(ok_alpha, 1).otherwise(0).cast("int").alias("ok_alpha"),
        F.when(ok_sym, 1).otherwise(0).cast("int").alias("ok_sym"),
        F.when(ok_stop, 1).otherwise(0).cast("int").alias("ok_stop"),
        F.when(ok_nwords & ok_wordlen & ok_alpha & ok_sym & ok_stop, 1)
        .otherwise(0).cast("int").alias("passes"),
    )


# ---------------------------------------------------------------------------
# shard_compaction_plan — write-side small-file bin-packing planner
# ---------------------------------------------------------------------------

COMPACT_TARGET = 4096   # target output-file size in bytes

# planted source whose cumulative sizes hit the target boundary EXACTLY:
# cum-before = 4096 at 600002, 8192 at 600003, 12288 at 600005
_COMPACT_ROWS: list[tuple[int, str, int]] = [
    (760000, "srcz", 2048),
    (760001, "srcz", 2048),
    (760002, "srcz", 4096),
    (760003, "srcz", 1),
    (760004, "srcz", 4095),
    (760005, "srcz", 1),
]

_COMPACT_SQL_ROWS = ",\n    ".join(
    f"({i}, '{s}', {n})" for i, s, n in _COMPACT_ROWS)


@staged("shard_compaction_plan", f"""
WITH corpus AS (
  SELECT doc_id, source, n_chars FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    {_COMPACT_SQL_ROWS}) v(doc_id, source, n_chars)),
cum AS (
  SELECT source, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS c
  FROM corpus)
SELECT source,
       CAST((c - n_chars) // {COMPACT_TARGET} AS INT) AS file_id,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(n_chars) AS BIGINT)  AS total_bytes,
       MIN(doc_id)                   AS first_doc,
       MAX(doc_id)                   AS last_doc,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / {COMPACT_TARGET}, 6)
         AS fill_ratio
FROM cum
GROUP BY 1, 2
""")
def q_shard_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the maintenance job every large
    parquet lake runs: within each source (the write-partition key),
    walk records in doc_id order accumulating byte sizes and open a new
    output file each time the running total crosses a 4096-byte target
    boundary; emit the resulting file manifest (doc span, doc count,
    byte total, fill ratio). A record is assigned by the file index of
    its START offset — floor(cum_before / target) — so a record
    straddling a boundary stays whole in the earlier file and files can
    exceed the target by at most one record, the standard bin-packing
    contract for row-group sizing.

    The planted 'srcz' source hits the boundary EXACTLY three times
    (cum-before of 4096, 8192 and 12288): a record whose start offset
    is precisely k*target must OPEN file k, which the integer floor
    division decides identically in both engines — no float epsilon in
    the cut decision.

    Determinism: all byte arithmetic is BIGINT; the running sum is over
    a total order — doc_id is assumed UNIQUE within a source (the
    fixture's primary key; a duplicate id would make the running-sum
    peer order, and thus the file cut, engine-dependent); fill_ratio
    divides an exact int by a constant.

    Scale shape: ONE hash shuffle on source for the running-sum window
    (per-source ordering, never a global sort — sources are the
    parallel unit exactly as the writer partitions them), then the
    manifest aggregate rides the same partitioning (co-keyed on a
    superset key). Per-source history length bounds window state, and a
    skewed giant source is split by the same salting the writer would
    apply to its files.
    """
    docs = load_table(spark, sf_dir, "documents")
    structs = [
        F.struct(F.lit(i).cast("long").alias("doc_id"),
                 F.lit(s).alias("source"),
                 F.lit(n).cast("long").alias("n_chars"))
        for i, s, n in _COMPACT_ROWS
    ]
    planted = (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("s"))
        .select("s.doc_id", "s.source", "s.n_chars")
    )
    corpus = docs.select("doc_id", "source", "n_chars").unionByName(planted)
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = corpus.withColumn("c", F.sum("n_chars").over(w))
    return (
        cum.withColumn(
            "file_id",
            F.expr(f"int((c - n_chars) div {COMPACT_TARGET})"))
        .groupBy("source", "file_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             F.sum("n_chars").cast("bigint").alias("total_bytes"),
             F.min("doc_id").alias("first_doc"),
             F.max("doc_id").alias("last_doc"))
        .withColumn(
            "fill_ratio",
            F.round(F.col("total_bytes").cast("double") / COMPACT_TARGET, 6))
    )


# ---------------------------------------------------------------------------
# embedding_jl_projection — Johnson-Lindenstrauss random sign projection
# ---------------------------------------------------------------------------

JL_K = 8   # output dimensionality

# Fixed Rademacher sign matrix s(pos, j) over 1-based input dim pos and
# output dim j, from a deterministic integer formula both engines compute
# bit-identically (production would key signs off a seeded hash; the
# formula IS such a hash, just a transparent one).
_JL_COLS_SQL = ",\n  ".join(
    f"ROUND(CAST(SUM(CASE WHEN j = {j} THEN CAST(sv AS DECIMAL(30,12)) END)"
    f" AS DOUBLE) / sqrt({JL_K}.0), 6) AS p{j}"
    for j in range(JL_K))


@staged("embedding_jl_projection", f"""
WITH elems AS (
  SELECT vec_id, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)),
sgn AS (
  SELECT vec_id, js.j,
         CASE WHEN ((pos * 73 + js.j * 151) % 7) % 2 = 0
              THEN val ELSE -val END AS sv
  FROM elems, (SELECT unnest(generate_series(0, {JL_K - 1})) AS j) js)
SELECT vec_id,
  {_JL_COLS_SQL}
FROM sgn GROUP BY vec_id
""")
def q_embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64 -> 8 with a
    fixed Rademacher (+-1) sign matrix: p_j = sum_i s(i,j) * v_i /
    sqrt(8). The sparse-JL/database-friendly variant — no dense Gaussian
    matrix, just sign flips and sums — which preserves pairwise
    distances within (1 +- eps) w.h.p. and is the standard cheap
    pre-step before clustering or LSH at corpus scale.

    Determinism: the sign matrix is a transparent integer formula (no
    engine RNG); sign application is exact (IEEE negation); each signed
    term is cast to DECIMAL(30,12) and accumulated order-free; the final
    divide by sqrt(8) uses the correctly-rounded IEEE sqrt both engines
    guarantee. Cast-to-decimal rounding (half-away-from-zero) is
    symmetric under negation, so sign-then-cast agrees across engines.

    Scale shape: ENTIRELY in-row — each output coordinate folds over
    the embedding array inside the row (transform + aggregate, no
    explode, no shuffle, no join). The 100 TB plan is a pure map; the
    8-wide output is what downstream ANN then buckets.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    def _signed(j):
        # closure factory: a default-arg lambda would change the arity
        # pyspark infers for the higher-order function
        def apply_sign(x, i):
            return (
                F.when(((((i + 1) * 73 + j * 151) % 7) % 2) == 0,
                       x.cast("double"))
                .otherwise(-x.cast("double"))
                .cast(DOT_DECIMAL))
        return F.transform("embedding", apply_sign)

    cols = []
    for j in range(JL_K):
        signed = _signed(j)
        total = F.aggregate(
            signed, F.lit(0).cast(DOT_DECIMAL),
            lambda a, x: (a + x).cast(DOT_DECIMAL))
        cols.append(
            F.round(total.cast("double") / F.sqrt(F.lit(float(JL_K))), 6)
            .alias(f"p{j}"))
    return emb.select("vec_id", *cols)


# ---------------------------------------------------------------------------
# batch 4: sketch/robust/ANN/alignment/preflight operators
# ---------------------------------------------------------------------------

CMS_D = 4            # count-min rows (independent hash functions)
CMS_W = 64           # counters per row -> 256 cells total
CMS_TOP = 10


def _cms_rb(key):
    """The d x w hash family as an explodable struct array: bucket r of a
    key is the r-th disjoint 8-hex-char window of md5(key) mod w —
    bit-identical in Spark and DuckDB (no engine RNG, no libm).  Shared
    by the batch CMS and its streaming twin so the hash family is
    defined exactly once."""
    h = F.md5(key.cast("string"))
    return F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            (F.conv(F.substring(h, 1 + 8 * r, 8), 16, 10)
             .cast("bigint") % CMS_W).alias("b"))
        for r in range(CMS_D)
    ])


@staged("events_heavy_hitters_cms", f"""
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c,
         md5(CAST(user_id AS VARCHAR)) AS h
  FROM events GROUP BY 1),
cells AS (
  SELECT counts.*, r.r,
         CAST('0x' || substr(h, 1 + 8 * r.r, 8) AS BIGINT) % {CMS_W} AS b
  FROM counts, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r) r),
sketch AS (
  SELECT r, b, CAST(SUM(c) AS BIGINT) AS cell FROM cells GROUP BY 1, 2),
est AS (
  SELECT cl.user_id, MIN(s.cell) AS est, MAX(cl.c) AS exact
  FROM cells cl JOIN sketch s ON s.r = cl.r AND s.b = cl.b
  GROUP BY 1)
SELECT user_id, est, exact, est - exact AS overcount
FROM est ORDER BY est DESC, user_id LIMIT {CMS_TOP}
""")
def q_events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters — the MERGEABLE twin of the exact
    Misra-Gries pass (events_heavy_hitters): d=4 x w=64
    counters, est(k) = min_r sketch[r][h_r(k)].  The sketch is a plain
    (row, bucket) SUM aggregate, so at 100 TB it map-side-combines to
    4*64 cells per task and merges associatively across any
    partitioning — the property Misra-Gries lacks (its merge needs a
    re-prune) and the reason production telemetry pipelines ship CMS.

    Cross-engine determinism: the d hash functions are the four disjoint
    8-hex-char windows of md5(key) taken mod w — md5 of the decimal
    string rendering is bit-identical in Spark (conv(substring(...)))
    and DuckDB (CAST('0x'||substr(...))), so both engines build the
    SAME 256-cell sketch and the same estimates; no engine RNG, no
    banker's rounding anywhere.  Top-10 selection is totally
    ordered (est DESC, user_id) so the LIMIT is deterministic.

    CMS guarantee surfaced in the output: overcount = est - exact >= 0
    always (one-sided error); tests assert it row-wise and pin the merge
    property (sketch(A ++ B) = sketch(A) + sketch(B)) brute-force.

    Scale shape: ONE key-grouped aggregate (the same shuffle the exact
    count needs), a 256-cell broadcast, and a TakeOrdered top-k — no
    global sort, no second wide shuffle.  The exact-count column is the
    fixture-scale audit; the 100 TB variant drops it and keeps only the
    sketch + probe side.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    cells = counts.select(
        "user_id", "c",
        F.explode(_cms_rb(F.col("user_id"))).alias("rb"),
    ).select("user_id", "c", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    sketch = cells.groupBy("r", "b").agg(
        F.sum("c").cast("bigint").alias("cell"))
    est = (
        cells.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("user_id")
        .agg(F.min("cell").alias("est"), F.max("c").alias("exact"))
    )
    return (
        est.select("user_id", "est", "exact",
                   (F.col("est") - F.col("exact")).alias("overcount"))
        .orderBy(F.col("est").desc(), F.asc_nulls_last("user_id"))
        .limit(CMS_TOP)
    )


@staged("sensor_theilsen_trend", """
WITH readings AS (
SELECT CAST(user_id AS VARCHAR)                                    AS sensor,
       CAST(ts AS DATE)                                            AS reading_date,
       CASE WHEN event_type = 'error' THEN NULL
            ELSE CAST(FLOOR(value) % 25 AS INTEGER) END            AS volume
FROM events),
daily AS (
  SELECT sensor,
         CAST(date_diff('day', DATE '1995-01-01', reading_date) AS BIGINT) AS x,
         CAST(SUM(volume) AS BIGINT) AS y
  FROM readings
  WHERE volume IS NOT NULL AND reading_date IS NOT NULL
        AND sensor IS NOT NULL
  GROUP BY sensor, reading_date),
days AS (SELECT sensor, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
pairs AS (
  SELECT a.sensor,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON b.sensor = a.sensor AND a.x < b.x),
ranked AS (
  SELECT sensor, slope,
         ROW_NUMBER() OVER (PARTITION BY sensor ORDER BY slope) AS rk,
         COUNT(*) OVER (PARTITION BY sensor) AS n_pairs
  FROM pairs)
SELECT r.sensor, d.n_days, CAST(r.n_pairs AS BIGINT) AS n_pairs,
       ROUND(r.slope, 6) AS ts_slope
FROM ranked r JOIN days d ON d.sensor = r.sensor
WHERE r.rk = (r.n_pairs + 1) // 2
""")
def q_sensor_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per sensor: the (lower-)median of all
    pairwise slopes of daily volume — the screening statistic that,
    unlike the least-squares twin (sensor_volume_trend), shrugs off the
    outlier days a stuck detector writes (29.3% breakdown point vs 0).
    The reference's per-node GAM (ref R/_analyze_data.R:206-225) is what
    this screen feeds; a robust slope that disagrees in sign with the
    LSQ slope is exactly the detector whose history needs the model.

    Determinism: each slope is ONE IEEE division of two exact bigint
    differences — correctly rounded, bit-identical across engines.  The
    median is the LOWER median (rank (n+1) div 2 of the ascending sort):
    a picked element, never an interpolated average, so even-count
    groups cannot hit the two-engine midpoint-arithmetic trap.  Ties in
    slope permute only equal values, so the rank-k VALUE is unique even
    though row order under ties is not.

    Scale shape: NO self-join — each sensor's (x, y) series is gathered
    once (sorted struct array; x is unique within a sensor so the sort
    is total) and the d*(d-1)/2 pair slopes explode IN-ROW via an
    indexed transform-over-suffix-slice (the winnowing-pairs trick);
    the lower median is element_at over the in-row sort_array.  Cost is
    sum_s d_s^2/2 with d_s the per-sensor history length — bounded per
    GROUP, not by corpus size (a 10-year daily history is ~6.7M slopes
    in one row, ~53 MB — at the task ceiling; longer histories swap in
    Siegel repeated medians or a deterministic pair sample, and the
    n_days readout is what that decision reads).  Two key-grouped
    aggregates total: (sensor, day), then (sensor) — the oracle's
    window/self-join formulation is the SEMANTIC twin, not the plan.
    """
    from traffic_data_pipeline_spark.sources.sensor import sensor_readings

    daily = (
        sensor_readings(spark, sf_dir)
        # reading_date non-null alongside volume: a NULL date would ride
        # into the in-row point array as a NULL x (NULL slopes the
        # oracle's a.x < b.x pair join silently excludes); NULL sensor
        # excluded too — groupBy groups NULL keys where the oracle's
        # equi self-join drops them (a NULL detector id is not a series)
        .filter(F.col("volume").isNotNull()
                & F.col("reading_date").isNotNull()
                & F.col("sensor").isNotNull())
        .groupBy("sensor", "reading_date")
        .agg(F.sum("volume").cast("bigint").alias("y"))
        .select(
            "sensor",
            F.datediff(F.col("reading_date"), F.lit("1995-01-01"))
            .cast("bigint").alias("x"),
            "y")
    )
    pts = daily.groupBy("sensor").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sort_array(F.collect_list(F.struct("x", "y"))).alias("pts"))
    n = F.size("pts")
    slopes = F.flatten(F.transform(
        "pts",
        lambda p1, i: F.transform(
            F.slice(F.col("pts"), i + 2, n - i - 1),
            lambda p2: (p2.y - p1.y).cast("double")
                       / (p2.x - p1.x).cast("double"))))
    mid = F.floor((F.size("slopes") + 1) / 2).cast("int")
    return (
        pts.select("sensor", "n_days", F.sort_array(slopes).alias("slopes"))
        .filter(F.size("slopes") > 0)
        .select("sensor", "n_days",
                F.size("slopes").cast("bigint").alias("n_pairs"),
                F.round(F.element_at("slopes", mid), 6).alias("ts_slope"))
    )


# ---------------------------------------------------------------------------
# embedding_pq_adc — product-quantization ADC scan
# ---------------------------------------------------------------------------

PQ_M = 8             # subspaces
PQ_DSUB = 8          # dims per subspace (8 x 8 = the 64-dim fixture width)
PQ_K = 16            # centroids per subspace codebook
PQ_QUERY_ID = 0      # query vector (also codebook seed 0 — ADC==exact for it)
PQ_TOP = 10

# single-sourced with the live embedding oracles via plans/oracle_ctes.py:
# elems = (vec_id, pos, val) spread, decimal-exact accumulation pattern
# (NOT imported from extensions.py — that edge would close an import
# cycle through queries.py's tail; oracle_ctes has no plans imports)
from traffic_data_pipeline_spark.plans.oracle_ctes import (  # noqa: E402
    _EMB_CTES,
)

_PQ_SQL = f"""
WITH {_EMB_CTES},
sub AS (
  SELECT vec_id, CAST(FLOOR((pos - 1) / {PQ_DSUB}.0) AS INTEGER) AS m,
         (pos - 1) % {PQ_DSUB} AS j, val
  FROM elems),
cent AS (SELECT vec_id AS cid, m, j, val FROM sub WHERE vec_id < {PQ_K}),
d2 AS (
  SELECT s.vec_id, s.m, c.cid,
         CAST(SUM(CAST((s.val - c.val) * (s.val - c.val)
                       AS DECIMAL(30,12))) AS DOUBLE) AS d2
  FROM sub s JOIN cent c ON c.m = s.m AND c.j = s.j
  GROUP BY 1, 2, 3),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                 ORDER BY d2, cid) AS rk FROM d2)
  WHERE rk = 1),
qd2 AS (SELECT m, cid, d2 FROM d2 WHERE vec_id = {PQ_QUERY_ID}),
adc AS (
  SELECT k.vec_id,
         CAST(SUM(CAST(q.d2 AS DECIMAL(30,12))) AS DOUBLE) AS adc_d2
  FROM codes k JOIN qd2 q ON q.m = k.m AND q.cid = k.code
  GROUP BY 1),
exact AS (
  SELECT s.vec_id,
         CAST(SUM(CAST((s.val - q.val) * (s.val - q.val)
                       AS DECIMAL(30,12))) AS DOUBLE) AS exact_d2
  FROM sub s JOIN sub q ON q.vec_id = {PQ_QUERY_ID}
                       AND q.m = s.m AND q.j = s.j
  GROUP BY 1)
SELECT a.vec_id, ROUND(a.adc_d2, 6) AS adc_d2, ROUND(e.exact_d2, 6) AS exact_d2
FROM adc a JOIN exact e ON e.vec_id = a.vec_id
WHERE a.vec_id <> {PQ_QUERY_ID}
ORDER BY a.adc_d2, a.vec_id LIMIT {PQ_TOP}
"""


@staged("embedding_pq_adc", _PQ_SQL)
def q_embedding_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization asymmetric-distance (ADC) top-k scan — the
    memory-bound ANN shape (Jegou et al., PQ for NN search): each vector
    is stored as M=8 one-byte codes (64x smaller than float32); a query
    precomputes an M x K table of query-subvector-to-centroid distances
    and scans codes summing table lookups — no float math touches the
    corpus at query time.  Complements the recall-oriented IVF/LSH ANN
    ops with the COMPRESSION-oriented one.

    The codebook is a transparent stand-in: the subvectors of vectors
    vec_id < 16 serve as the K=16 centroids per subspace (a trained
    k-means codebook plugs into the same frame — embedding_kmeans_step
    IS that trainer).  Because vector 0 is both the query and centroid
    0, its codes reconstruct it exactly, pinning ADC==exact for the
    planted case (tested).

    Determinism: each per-(vec, subspace, centroid) distance is a
    decimal-exact sum of identically-rounded doubles; code assignment
    is argmin with cid tiebreak over identical doubles; the ADC total
    re-sums the 8 table doubles through DECIMAL(30,12) so it is
    order-free.  Top-10 is totally ordered (adc_d2, vec_id) — vectors
    sharing all 8 codes tie EXACTLY in adc_d2, so the id tiebreak is
    load-bearing.

    Scale shape: code assignment is corpus x (M*K broadcast) — one
    narrow pass, map-side; at 100 TB codes are computed once at ingest
    and persisted (8 bytes/vector).  The query-time scan is codes x
    (M x K broadcast table) + a TakeOrdered top-k: zero shuffles per
    query beyond the final k-row gather.  The exact_d2 column is the
    fixture-scale audit the production scan drops.
    """
    # Round-11 (guide §4.2): the (vec x subspace x centroid) pipeline —
    # posexplode + broadcast-join + decimal d2 aggregate + argmin window
    # + two more decimal re-aggregations — becomes ONE mapInArrow pass
    # against the driver-collected K x dim codebook (a bounded
    # creation-time artifact, the sanctioned scalar-collect class). The
    # kernel computes the identical DECIMAL(30,12)-exact unit sums,
    # codes and ADC/exact totals per vector (exactness proof:
    # functions/arrowmath.py); the only remaining Spark work is the
    # TakeOrdered top-k — zero shuffles.
    from traffic_data_pipeline_spark.functions.arrowmath import (
        collect_codebook,
        pq_adc_frame,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = collect_codebook(emb, PQ_K)
    return (
        pq_adc_frame(emb, cb, PQ_DSUB, PQ_QUERY_ID)
        .filter(F.col("vec_id") != PQ_QUERY_ID)
        # order on the PRE-round adc total: the oracle's ORDER BY binds
        # the CTE column, so rounding before the cut would let two
        # totals that differ only past 1e-6 straddle rank k differently
        .orderBy("adc_d2", "vec_id")
        .limit(PQ_TOP)
        .select("vec_id", F.round("adc_d2", 6).alias("adc_d2"),
                F.round("exact_d2", 6).alias("exact_d2"))
    )


# ---------------------------------------------------------------------------
# embedding_margin_align — margin-based mutual-NN alignment (bitext mining)
# ---------------------------------------------------------------------------

ALIGN_LAB_A = 0
ALIGN_LAB_B = 1
ALIGN_K = 4          # neighborhood size for the margin normalizer
ALIGN_CAL_CAP = 64   # per-side deterministic sample cap (VERDICT r6 ask
                     # #3): bounds the brute pair stream at CAP^2 so the
                     # calibration anchor runs at ANY corpus size; does
                     # not bind at the sf0.01 gate (sides are 50/46)

_ALIGN_SQL = f"""
WITH {_EMB_CTES},
la AS MATERIALIZED (
  SELECT e.vec_id FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
  WHERE e.label = {ALIGN_LAB_A} AND len(e.embedding) > 0 AND n.norm_sq > 0
  ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id LIMIT {ALIGN_CAL_CAP}),
lb AS MATERIALIZED (
  SELECT e.vec_id FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
  WHERE e.label = {ALIGN_LAB_B} AND len(e.embedding) > 0 AND n.norm_sq > 0
  ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id LIMIT {ALIGN_CAL_CAP}),
pairs AS (
  SELECT ea.vec_id AS a_id, eb.vec_id AS b_id,
         CAST(SUM(CAST(ea.val * eb.val AS DECIMAL(30,12))) AS DOUBLE)
           / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
  FROM elems ea
  JOIN la ON la.vec_id = ea.vec_id
  JOIN elems eb ON eb.pos = ea.pos
  JOIN lb ON lb.vec_id = eb.vec_id
  JOIN norms na ON na.vec_id = ea.vec_id
  JOIN norms nb ON nb.vec_id = eb.vec_id
  GROUP BY ea.vec_id, eb.vec_id, na.norm_sq, nb.norm_sq),
fwd AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
                               ORDER BY cosine DESC, b_id) AS rk
  FROM pairs),
bwd AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY b_id
                               ORDER BY cosine DESC, a_id) AS rk
  FROM pairs),
ka AS (
  SELECT a_id, CAST(SUM(CAST(cosine AS DECIMAL(30,12))) AS DOUBLE)
                 / {ALIGN_K} AS knn_a
  FROM fwd WHERE rk <= {ALIGN_K} GROUP BY 1),
kb AS (
  SELECT b_id, CAST(SUM(CAST(cosine AS DECIMAL(30,12))) AS DOUBLE)
                 / {ALIGN_K} AS knn_b
  FROM bwd WHERE rk <= {ALIGN_K} GROUP BY 1)
SELECT f.a_id, f.b_id, ROUND(f.cosine, 6) AS cosine,
       ROUND(f.cosine / NULLIF((ka.knn_a + kb.knn_b) / 2, 0), 6) AS margin
FROM fwd f
JOIN bwd ON bwd.a_id = f.a_id AND bwd.b_id = f.b_id AND bwd.rk = 1
JOIN ka ON ka.a_id = f.a_id
JOIN kb ON kb.b_id = f.b_id
WHERE f.rk = 1
"""


@staged("embedding_margin_align", _ALIGN_SQL)
def q_embedding_margin_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based mutual-nearest-neighbor alignment (the
    Artetxe-Schwenk bitext-mining criterion behind CCMatrix/LASER
    corpora): across two populations A (label 0) and B (label 1), keep
    pairs (a, b) where each is the other's nearest neighbor, scored by
    margin = cos(a,b) / mean of the two k-NN neighborhoods' cosines —
    the ratio test that suppresses hubs (vectors close to EVERYTHING
    score margin ~1 and rank last; genuinely aligned pairs score > 1).
    In a training-data pipeline this is the parallel-corpus miner; the
    same shape aligns caption<->image or query<->doc embedding pools.

    Determinism: cosines follow the repo's decimal-dot contract
    (order-free DECIMAL(30,12) dot, IEEE sqrt, one division); the k-NN
    normalizer re-sums the top-4 cosine DOUBLES through DECIMAL(30,12)
    (order-free) and divides by the exact power of two; argmax uses
    (cosine DESC, id) total order.  Every margin is therefore ONE
    identically-rounded double expression in both engines.

    Scale shape (BOUNDED, VERDICT r6 ask #3): this is the CALIBRATION
    ANCHOR for the registered production path
    ``embedding_margin_align_ann`` — each side is first capped to a
    deterministic md5-ranked sample of ALIGN_CAL_CAP vectors
    (TakeOrdered, the doc_sample_quota hash-order contract), so the
    brute pair stream is at most CAP x CAP rows AT ANY CORPUS SIZE and
    the plan survives 100x data as a constant-cost recall probe. The
    cap does not bind at the sf0.01 oracle gate (sides are 50/46), so
    the registered results — and the ANN twin's recall pin — are the
    full brute semantics there; both rank windows and the two
    normalizer aggregates still ride the ONE pair stream.
    """
    from traffic_data_pipeline_spark.functions.similarity import norm_sq

    emb = load_table(spark, sf_dir, "embeddings")
    # NULL/empty/zero-norm vectors are excluded on BOTH sides: the
    # oracle's explode-based pair CTE silently drops NULL/empty arrays,
    # and a zero norm would put an engine-dependent NaN into the rank
    # windows — the explicit symmetric guard is the dirty-data contract
    clean = emb.filter(F.size("embedding") > 0).filter(
        norm_sq(F.col("embedding")) > 0)
    # norms hoisted to the per-side frames: computed |A| + |B| times, not
    # |A| x |B| times inside the pair stream (2.4x on the staged bench);
    # orderBy(md5).limit compiles to TakeOrderedAndProject — the exact
    # deterministic cap without a single-partition window
    a = (clean.filter(F.col("label") == ALIGN_LAB_A).select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"),
        F.sqrt(norm_sq(F.col("embedding"))).alias("na"))
        .orderBy(F.md5(F.col("a_id").cast("string")), "a_id")
        .limit(ALIGN_CAL_CAP))
    b = (clean.filter(F.col("label") == ALIGN_LAB_B).select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"),
        F.sqrt(norm_sq(F.col("embedding"))).alias("nb"))
        .orderBy(F.md5(F.col("b_id").cast("string")), "b_id")
        .limit(ALIGN_CAL_CAP))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .select(
            "a_id", "b_id",
            (dot_product(F.col("va"), F.col("vb"))
             / (F.col("na") * F.col("nb"))).alias("cosine"))
    )
    wf = Window.partitionBy("a_id").orderBy(F.col("cosine").desc(), "b_id")
    wb = Window.partitionBy("b_id").orderBy(F.col("cosine").desc(), "a_id")
    # the k-NN normalizers ride the SAME two window exchanges as the
    # ranks (unordered full-partition sums of the top-k rows) — no
    # separate aggregate, no re-join
    top_f = F.when(F.col("rk_f") <= ALIGN_K,
                   F.col("cosine").cast(DOT_DECIMAL))
    top_b = F.when(F.col("rk_b") <= ALIGN_K,
                   F.col("cosine").cast(DOT_DECIMAL))
    ranked = (
        pairs.select(
            "a_id", "b_id", "cosine",
            F.row_number().over(wf).alias("rk_f"),
            F.row_number().over(wb).alias("rk_b"))
        .select(
            "a_id", "b_id", "cosine", "rk_f", "rk_b",
            (F.sum(top_f).over(Window.partitionBy("a_id"))
             .cast(DOT_DECIMAL).cast("double") / ALIGN_K).alias("knn_a"),
            (F.sum(top_b).over(Window.partitionBy("b_id"))
             .cast(DOT_DECIMAL).cast("double") / ALIGN_K).alias("knn_b"))
    )
    return (
        ranked.filter((F.col("rk_f") == 1) & (F.col("rk_b") == 1))
        .select(
            "a_id", "b_id", F.round("cosine", 6).alias("cosine"),
            # NULLIF twin: an all-orthogonal neighborhood makes the
            # normalizer exactly 0 — emit NULL in both engines rather
            # than an engine-dependent NaN/inf (or an ANSI error)
            F.round(F.col("cosine")
                    / F.nullif((F.col("knn_a") + F.col("knn_b")) / 2,
                               F.lit(0.0)), 6)
            .alias("margin"))
    )


# ---------------------------------------------------------------------------
# embedding_margin_align_ann — the ANN-candidate form of the margin aligner
# ---------------------------------------------------------------------------

ALIGN_NB = 16      # LSH bands
ALIGN_RMAX = 6     # hyperplanes allotted per band (ALIGN_NB * ALIGN_RMAX = 96)
ALIGN_TARGET = 8   # target B-side occupancy per band bucket (sets code width)

_ALIGN_ANN_SQL = f"""
WITH {_EMB_CTES},
la AS (
  SELECT e.vec_id FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
  WHERE e.label = {ALIGN_LAB_A} AND len(e.embedding) > 0 AND n.norm_sq > 0),
lb AS (
  SELECT e.vec_id FROM embeddings e JOIN norms n ON n.vec_id = e.vec_id
  WHERE e.label = {ALIGN_LAB_B} AND len(e.embedding) > 0 AND n.norm_sq > 0),
rb AS (
  SELECT CAST(LEAST(GREATEST(CEIL(LOG2(GREATEST(
           COUNT(*) / {ALIGN_TARGET}.0, 1.0))), 1), {ALIGN_RMAX}) AS INTEGER) AS r
  FROM lb),
side AS (SELECT vec_id FROM la UNION ALL SELECT vec_id FROM lb),
pd AS (
  SELECT e.vec_id, p.p,
         CAST(SUM(CAST(e.val * (((p.p * 73856093 + e.pos * 19349663) % 1000003)
                                / 1000003.0 - 0.5) AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM elems e
  JOIN side s ON s.vec_id = e.vec_id,
       (SELECT unnest(generate_series(0, {ALIGN_NB * ALIGN_RMAX - 1})) AS p) p
  GROUP BY 1, 2),
codes AS (
  SELECT vec_id, CAST(p // {ALIGN_RMAX} AS INTEGER) AS band,
         CAST(SUM(CASE WHEN (p % {ALIGN_RMAX}) < r AND dot >= 0
                       THEN (CAST(1 AS BIGINT) << CAST(p % {ALIGN_RMAX} AS INTEGER))
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS code
  FROM pd, rb GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT ca.vec_id AS a_id, cb.vec_id AS b_id
  FROM codes ca
  JOIN la ON la.vec_id = ca.vec_id
  JOIN codes cb ON cb.band = ca.band AND cb.code = ca.code
  JOIN lb ON lb.vec_id = cb.vec_id),
pairs AS (
  SELECT cd.a_id, cd.b_id,
         CAST(SUM(CAST(ea.val * eb.val AS DECIMAL(30,12))) AS DOUBLE)
           / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cosine
  FROM cand cd
  JOIN elems ea ON ea.vec_id = cd.a_id
  JOIN elems eb ON eb.vec_id = cd.b_id AND eb.pos = ea.pos
  JOIN norms na ON na.vec_id = cd.a_id
  JOIN norms nb ON nb.vec_id = cd.b_id
  GROUP BY cd.a_id, cd.b_id, na.norm_sq, nb.norm_sq),
fwd AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
                               ORDER BY cosine DESC, b_id) AS rk
  FROM pairs),
bwd AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY b_id
                               ORDER BY cosine DESC, a_id) AS rk
  FROM pairs),
ka AS (
  SELECT a_id, CAST(SUM(CAST(cosine AS DECIMAL(30,12))) AS DOUBLE)
                 / COUNT(*) AS knn_a
  FROM fwd WHERE rk <= {ALIGN_K} GROUP BY 1),
kb AS (
  SELECT b_id, CAST(SUM(CAST(cosine AS DECIMAL(30,12))) AS DOUBLE)
                 / COUNT(*) AS knn_b
  FROM bwd WHERE rk <= {ALIGN_K} GROUP BY 1)
SELECT f.a_id, f.b_id, ROUND(f.cosine, 6) AS cosine,
       ROUND(f.cosine / NULLIF((ka.knn_a + kb.knn_b) / 2, 0), 6) AS margin
FROM fwd f
JOIN bwd ON bwd.a_id = f.a_id AND bwd.b_id = f.b_id AND bwd.rk = 1
JOIN ka ON ka.a_id = f.a_id
JOIN kb ON kb.b_id = f.b_id
WHERE f.rk = 1
"""


def _align_band_codes_df(side, id_alias, planes, rb):
    """(id, band, code) rows for one population: the oracle's elems x
    planes shape. The 96 plane dots run as ONE narrow explode ->
    broadcast-grid -> two map-side-combined aggregates pipeline (decimal
    terms, codegen hash aggs) instead of 96 interpreted HOF folds inside
    a single projection — the expression-tree form took Catalyst ~30 s
    to analyze PER QUERY at any scale; this shape is milliseconds of
    planning and keyed rows stay at N x NB_PLANES. The adaptive width r
    masks each band to its low r bits exactly like the oracle's
    (p % RMAX) < r predicate."""
    el = side.select(F.col("vec_id").alias(id_alias),
                     F.posexplode("embedding").alias("pos0", "val"))
    w = ((((F.col("p").cast("bigint") * 73856093
            + (F.col("pos0") + 1).cast("bigint") * 19349663) % 1000003)
          / 1000003.0) - 0.5)
    # planes masked out by the adaptive width are never computed at all
    # (the oracle computes then discards them — same candidate sets):
    # at the fixture's r=3 this halves the element x plane grid
    live_planes = (planes.crossJoin(F.broadcast(rb))
                   .filter((F.col("p") % ALIGN_RMAX) < F.col("r"))
                   .select("p"))
    pd = (
        el.crossJoin(F.broadcast(live_planes))
        .select(id_alias, "p",
                (F.col("val").cast("double") * w).cast(DOT_DECIMAL)
                .alias("term"))
        .groupBy(id_alias, "p")
        .agg(F.sum("term").cast(DOT_DECIMAL).cast("double").alias("dot")))
    return (
        pd.groupBy(id_alias,
                   F.expr(f"CAST(p DIV {ALIGN_RMAX} AS INT)").alias("band"))
        .agg(F.sum(
            F.when(F.col("dot") >= 0,
                   F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                          f"CAST(p % {ALIGN_RMAX} AS INT))"))
            .otherwise(F.lit(0).cast("bigint"))).alias("code")))


@staged("embedding_margin_align_ann", _ALIGN_ANN_SQL)
def q_embedding_margin_align_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN-candidate form of ``embedding_margin_align`` (VERDICT r5
    ask #2): identical margin/mutuality semantics, but the |A| x |B|
    brute-force pair stream — the registry's one measured-quadratic plan,
    ~N^1.8 at SCALING.md — is replaced by banded random-hyperplane LSH
    candidates, so the pair stream is ~N * k and the plan survives 100x
    data. Pinned against the brute twin at sf0.01 in
    tests/test_margin_align_ann.py (pair recall 21/23 = 0.91 measured).

    Candidate rule (deterministic, replicated exactly by the DuckDB
    oracle): ALIGN_NB=16 bands over 96 fixed pseudo-noise hyperplanes
    (the embedding_ann_lsh plane family); each band's code keeps
    r = clamp(ceil(log2(|B| / ALIGN_TARGET)), 1, ALIGN_RMAX) sign bits,
    so the number of band buckets GROWS with the B side (2^r ~ |B|/8)
    and per-band bucket occupancy stays ~ALIGN_TARGET — candidates per
    vector stay ~NB * TARGET instead of ~|B|. A pair is a candidate if
    ANY band code matches. The margin normalizer averages the top
    min(ALIGN_K, #candidates) candidate cosines (the brute twin always
    has >= K partners; the ANN twin may retrieve fewer).

    Determinism: plane dots and cosines follow the decimal-dot contract;
    the code width r is one integer computed identically from COUNT(*);
    ranks use the (cosine DESC, id) total order — every emitted margin is
    ONE identically-rounded double expression in both engines.

    Scale shape: the code build is a narrow in-row pass over the two
    label slices (96 decimal plane dots per row, embarrassingly
    parallel); candidates come from ONE (band, code) equi-join whose
    bucket occupancy is held at ~TARGET by the adaptive width; exact
    cosines are computed on candidates only; the rank windows and
    normalizers then ride the candidate stream exactly as the brute twin
    rides its full pair stream. At 100 TB the brute twin is the
    correctness oracle on samples; THIS is the plan that runs.
    """
    from traffic_data_pipeline_spark.functions.execution import materialize

    emb = load_table(spark, sf_dir, "embeddings")
    # Spread-then-materialize (the ann_lsh_pairs discipline): a
    # single-file scan is ONE partition and everything downstream is
    # per-row compute. Repartition BEFORE the norm filters so even the
    # norm_sq HOFs run 32-way. The cache is read five times (the r
    # scalar, two code builds, two pair join-backs).
    from traffic_data_pipeline_spark.functions.similarity import norm_sq

    clean = materialize(
        emb.select("vec_id", "embedding", "label")
        .filter(F.col("label").isin(ALIGN_LAB_A, ALIGN_LAB_B))
        .repartition(spark.sparkContext.defaultParallelism, F.col("vec_id"))
        .filter(F.size("embedding") > 0)
        .filter(norm_sq(F.col("embedding")) > 0)
        .select("vec_id", "embedding", "label",
                F.sqrt(norm_sq(F.col("embedding"))).alias("nrm")))
    a = clean.filter(F.col("label") == ALIGN_LAB_A).select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"),
        F.col("nrm").alias("na"))
    b = clean.filter(F.col("label") == ALIGN_LAB_B).select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"))
    # adaptive code width from the B-side cardinality — ONE broadcast
    # scalar, no driver round-trip
    rb = clean.filter(F.col("label") == ALIGN_LAB_B).agg(
        F.least(
            F.greatest(
                F.ceil(F.log2(F.greatest(
                    F.count(F.lit(1)) / ALIGN_TARGET, F.lit(1.0)))),
                F.lit(1).cast("bigint")),
            F.lit(ALIGN_RMAX).cast("bigint")).cast("int").alias("r"))
    planes = spark.range(ALIGN_NB * ALIGN_RMAX).select(
        F.col("id").cast("int").alias("p"))
    a_codes = _align_band_codes_df(
        clean.filter(F.col("label") == ALIGN_LAB_A), "a_id", planes, rb)
    b_codes = _align_band_codes_df(
        clean.filter(F.col("label") == ALIGN_LAB_B), "b_id", planes, rb)
    cand = (a_codes.join(b_codes, ["band", "code"])
            .select("a_id", "b_id").distinct())
    pairs = (
        cand.join(a, "a_id").join(b, "b_id")
        .select(
            "a_id", "b_id",
            (dot_product(F.col("va"), F.col("vb"))
             / (F.col("na") * F.col("nb"))).alias("cosine"))
    )
    wf = Window.partitionBy("a_id").orderBy(F.col("cosine").desc(), "b_id")
    wb = Window.partitionBy("b_id").orderBy(F.col("cosine").desc(), "a_id")
    pa, pb = Window.partitionBy("a_id"), Window.partitionBy("b_id")
    top_f = F.when(F.col("rk_f") <= ALIGN_K,
                   F.col("cosine").cast(DOT_DECIMAL))
    top_b = F.when(F.col("rk_b") <= ALIGN_K,
                   F.col("cosine").cast(DOT_DECIMAL))
    # normalizers ride the SAME two partition exchanges as the ranks; the
    # divisor is COUNT of the top rows = min(K, #candidates), never K
    # blindly — an a with 2 candidates averages 2 cosines in both engines
    ranked = (
        pairs.select(
            "a_id", "b_id", "cosine",
            F.row_number().over(wf).alias("rk_f"),
            F.row_number().over(wb).alias("rk_b"))
        .select(
            "a_id", "b_id", "cosine", "rk_f", "rk_b",
            (F.sum(top_f).over(pa).cast(DOT_DECIMAL).cast("double")
             / F.count(top_f).over(pa)).alias("knn_a"),
            (F.sum(top_b).over(pb).cast(DOT_DECIMAL).cast("double")
             / F.count(top_b).over(pb)).alias("knn_b"))
    )
    return (
        ranked.filter((F.col("rk_f") == 1) & (F.col("rk_b") == 1))
        .select(
            "a_id", "b_id", F.round("cosine", 6).alias("cosine"),
            F.round(F.col("cosine")
                    / F.nullif((F.col("knn_a") + F.col("knn_b")) / 2,
                               F.lit(0.0)), 6)
            .alias("margin"))
    )


# ---------------------------------------------------------------------------
# events_key_skew_report — pre-flight join/agg skew diagnostics
# ---------------------------------------------------------------------------

@staged("events_key_skew_report", """
WITH kc AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY c, user_id) AS i,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY c DESC, user_id) AS rk_desc
  FROM kc),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT)                       AS n_keys,
         CAST(SUM(c) AS BIGINT)                         AS n_rows,
         CAST(MAX(c) AS BIGINT)                         AS max_c,
         MAX(CASE WHEN rk_desc = 1 THEN user_id END)    AS top_key,
         CAST(SUM(CAST(i AS HUGEINT) * c) AS HUGEINT)   AS s_ic
  FROM ranked GROUP BY 1)
SELECT event_type, n_keys, n_rows, max_c, top_key,
       ROUND(CAST(max_c AS DOUBLE) / n_rows, 6) AS max_share,
       ROUND(CAST(max_c * n_keys AS DOUBLE) / n_rows, 6) AS skew_ratio,
       CAST((max_c * n_keys - 1) // n_rows + 1 AS BIGINT) AS salt_factor,
       ROUND(CAST(2 * s_ic - (n_keys + 1) * CAST(n_rows AS HUGEINT) AS DOUBLE)
             / CAST(n_keys * CAST(n_rows AS HUGEINT) AS DOUBLE), 6) AS gini
FROM agg
""")
def q_events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg skew pre-flight: per event_type, the key-distribution
    diagnostics a 100 TB job reads BEFORE choosing its physical plan —
    max key share (does one key dominate a shuffle partition?), skew
    ratio max/avg (the salting multiplier), a concrete salt_factor
    recommendation (ceil of that ratio — the number of salt buckets
    that levels the hottest key to the average), the hottest key
    itself (for AQE skew-join hints or a broadcast-salting hybrid),
    and the Gini coefficient of the count distribution (0 = uniform;
    near 1 = a handful of keys carry everything).  This is the
    measurement step behind events_salted_enrich's hardcoded salt.

    Determinism: everything until the final division is INTEGER — the
    Gini numerator 2*sum(i*c) - (n+1)*sum(c) accumulates in
    DECIMAL(38,0) (HUGEINT in the oracle; the sensor_volume_trend
    precedent — sum(i*c) overflows BIGINT once n_keys*max_c*n_keys
    passes ~9e18) and ONE double division rounds identically in both
    engines.  salt_factor is exact integer ceil-division (floor-div on
    positive integers, no doubles).  The argmax key uses the
    (c DESC, user_id) total order.

    Scale shape: ONE (type, key) aggregate shuffle — the same shuffle
    the skewed join itself would pay, run on a sample partition train
    in practice — then both rank windows share one (event_type)
    exchange and collapse to #types rows.  Nothing here is corpus-wide
    state: the report is 5 numbers per type.
    """
    ev = load_table(spark, sf_dir, "events")
    kc = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    # asc_nulls_last on the key tiebreaks: Spark defaults ASC to
    # NULLS FIRST where DuckDB defaults to NULLS LAST — a NULL key tying
    # at a rank boundary would otherwise diverge the engines (the
    # fixture has no NULL keys; the guard is the dirty-data contract)
    wi = Window.partitionBy("event_type").orderBy(
        "c", F.asc_nulls_last("user_id"))
    wd = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.asc_nulls_last("user_id"))
    ranked = kc.select(
        "event_type", "user_id", "c",
        F.row_number().over(wi).alias("i"),
        F.row_number().over(wd).alias("rk_desc"))
    big = "decimal(38,0)"
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_c"),
        F.max(F.when(F.col("rk_desc") == 1, F.col("user_id"))).alias("top_key"),
        F.sum(F.col("i").cast(big) * F.col("c")).cast(big).alias("s_ic"),
    )
    n_keys, n_rows, max_c = F.col("n_keys"), F.col("n_rows"), F.col("max_c")
    gini_num = (F.lit(2).cast(big) * F.col("s_ic")
                - (n_keys + 1).cast(big) * n_rows.cast(big))
    return agg.select(
        "event_type", "n_keys", "n_rows", "max_c", "top_key",
        F.round(max_c.cast("double") / n_rows, 6).alias("max_share"),
        F.round((max_c * n_keys).cast("double") / n_rows, 6).alias("skew_ratio"),
        (F.expr("(max_c * n_keys - 1) div n_rows") + 1).cast("bigint")
        .alias("salt_factor"),
        F.round(gini_num.cast("double")
                / (n_keys.cast(big) * n_rows.cast(big)).cast("double"), 6)
        .alias("gini"))


# ---------------------------------------------------------------------------
# streaming_cms_topk — windowed count-min heavy hitters over the stream
# ---------------------------------------------------------------------------

CMS_WIN_S = 21600    # 6-hour tumbling windows (epoch-aligned, both engines)
CMS_STREAM_TOP = 5


@staged("streaming_cms_topk", f"""
WITH ev AS (
  SELECT TIMESTAMP '1970-01-01 00:00:00'
           + to_seconds(FLOOR(epoch(ts) / {CMS_WIN_S}) * {CMS_WIN_S}) AS w,
         user_id
  FROM events WHERE ts IS NOT NULL),
counts AS (
  SELECT w, user_id, CAST(COUNT(*) AS BIGINT) AS c,
         md5(CAST(user_id AS VARCHAR)) AS h
  FROM ev GROUP BY 1, 2),
cells AS (
  SELECT counts.*, r.r,
         CAST('0x' || substr(h, 1 + 8 * r.r, 8) AS BIGINT) % {CMS_W} AS b
  FROM counts, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS r) r),
sketch AS (
  SELECT w, r, b, CAST(SUM(c) AS BIGINT) AS cell
  FROM cells GROUP BY 1, 2, 3),
est AS (
  SELECT cl.w, cl.user_id, MIN(s.cell) AS est, MAX(cl.c) AS exact
  FROM cells cl
  JOIN sketch s ON s.w = cl.w AND s.r = cl.r AND s.b = cl.b
  GROUP BY 1, 2),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY w
                               ORDER BY est DESC, user_id) AS rk
  FROM est)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS w_start, user_id, est, exact,
       est - exact AS overcount, CAST(rk AS INTEGER) AS rank
FROM ranked WHERE rk <= {CMS_STREAM_TOP}
""")
def q_streaming_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch x streaming intersection: per 6-hour tumbling window,
    the count-min sketch is built BY THE STREAM — each event increments
    its d=4 (row, bucket) cells inside the windowed streaming
    aggregate — and the heavy-hitter probe reads the landed sketch.
    This is the production telemetry shape: the stream maintains ONLY
    the fixed 256-cell-per-window sketch (state is windows-in-horizon x
    256, independent of key cardinality — the whole point vs streaming
    a per-key count), windows finalize under the watermark, and any
    consumer probes the landed cells for any key set later.

    The hash family is _cms_rb — the SAME function the batch CMS uses,
    so the streaming sketch is cell-for-cell the batch sketch
    (streaming==batch is the oracle gate, like every streaming query
    here).  Tumbling windows are epoch-aligned in both engines
    (floor(epoch/21600) in the oracle).  Event-time-less rows are
    excluded explicitly on both sides: a NULL ts cannot be windowed by
    a watermark, and the batch twin must agree.  Probe-side selection
    per window is totally ordered (est DESC, user_id NULLS LAST — the
    asc_nulls_last guard again).

    Scale shape: the streaming aggregate map-side-combines per
    micro-batch before touching state (the CMS merge property the batch
    twin pins brute-force); the probe is one batch key-count aggregate
    plus a broadcast of the landed sketch (windows x 256 rows) and a
    per-window rank.  Restart recovery is the plain windowed-count
    state machinery streaming_15min_agg already restart-tests.
    """
    from traffic_data_pipeline_spark.functions.tmpdirs import scratch_dir
    from traffic_data_pipeline_spark.plans.analysis_ops import (
        _session_events_dir,
    )
    from traffic_data_pipeline_spark.plans.queries import (
        fmt_ts,
        run_available_now,
    )

    src = _session_events_dir(spark, sf_dir)
    sink = scratch_dir(prefix="tdp_cms_sink_")
    ckpt = scratch_dir(prefix="tdp_cms_ckpt_")
    stream = (
        spark.readStream
        .schema("user_id long, ts timestamp, value double")
        .parquet(src)
    )
    win = F.window("ts", f"{CMS_WIN_S} seconds")
    cells = (
        stream.filter(F.col("ts").isNotNull())
        .withWatermark("ts", "1 hour")
        .select("ts", F.explode(_cms_rb(F.col("user_id"))).alias("rb"))
        .groupBy(win.alias("win"), F.col("rb.r").alias("r"),
                 F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cell"))
    )
    # state: one row per (window, cell) — 256 per open window
    run_available_now(spark, "streaming_cms_topk",
                      agg=cells, sink=sink, ckpt=ckpt)
    sketch = (
        spark.read.parquet(sink)
        .select(F.col("win.start").alias("w"), "r", "b", "cell")
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    counts = (
        ev.select(F.window("ts", f"{CMS_WIN_S} seconds")
                  .getField("start").alias("w"), "user_id")
        .groupBy("w", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    probe = counts.select(
        "w", "user_id", "c",
        F.explode(_cms_rb(F.col("user_id"))).alias("rb"),
    ).select("w", "user_id", "c",
             F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    est = (
        probe.join(F.broadcast(sketch), ["w", "r", "b"])
        .groupBy("w", "user_id")
        .agg(F.min("cell").alias("est"), F.max("c").alias("exact"))
    )
    wrk = Window.partitionBy("w").orderBy(
        F.col("est").desc(), F.asc_nulls_last("user_id"))
    return (
        est.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= CMS_STREAM_TOP)
        .select(fmt_ts(F.col("w")).alias("w_start"), "user_id",
                "est", "exact",
                (F.col("est") - F.col("exact")).alias("overcount"),
                F.col("rk").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# corpus_snapshot_diff — dataset versioning: what changed since last crawl
# ---------------------------------------------------------------------------

# deterministic stand-ins for two corpus versions read from one fixture:
# "old" = every doc except the 1-in-7 residue (yesterday's crawl missed
# them); "new" = every doc, with every 1-in-11 doc's text edited (the
# re-crawl changed them). Residues are coprime so the add/change/steady
# classes all materialize, including their overlap.
SNAP_ADD_MOD = 7
SNAP_EDIT_MOD = 11


@staged("corpus_snapshot_diff", f"""
WITH old AS (
  SELECT doc_id, source, md5(text) AS content_key
  FROM documents WHERE doc_id % {SNAP_ADD_MOD} != 0),
new AS (
  SELECT doc_id, source,
         md5(CASE WHEN doc_id % {SNAP_EDIT_MOD} = 0
                  THEN text || ' [recrawled]' ELSE text END) AS content_key
  FROM documents),
diff AS (
  SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
         COALESCE(n.source, o.source) AS source,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN n.content_key != o.content_key THEN 'changed'
              ELSE 'steady' END AS change
  FROM old o FULL OUTER JOIN new n ON n.doc_id = o.doc_id)
SELECT source, change, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM diff GROUP BY 1, 2
""")
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff between two corpus snapshots — the
    "what changed since the last crawl" report every periodically
    refreshed training corpus needs before deciding what to re-process:
    added / removed / changed (same doc_id, different content hash) /
    steady, per source.  This is the documents-table face of the SCD-2
    snapshot diff the reference runs nightly over detector config
    (ref R/_pull_data.R:153-199): same keyed full-outer compare, content
    equality by hash instead of per-attribute unpivot.

    The two versions are deterministic projections of the one fixture
    (coprime residues plant all four classes, including docs that are
    BOTH newly-seen and edited — classified 'added', the dominant key
    rule).  A production run points the two scans at yesterday's and
    today's partitions; the diff plan is identical.

    Determinism: classification is md5 equality and NULL-side checks —
    no floats, no ordering anywhere; the report is a straight
    (source, class) count with min/max doc_id witnesses.

    Scale shape: two narrow hashed projections of the same scan, ONE
    co-keyed full-outer join on doc_id (both sides hash-partition the
    same way; at 100 TB the two snapshot scans arrive pre-bucketed by
    doc_id from the writer and the join is shuffle-free), one
    map-side-combined group-count.  Content hashing pushes into the
    scan; nothing is corpus-wide state.
    """
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % SNAP_ADD_MOD != 0).select(
        F.col("doc_id").alias("o_id"), F.col("source").alias("o_src"),
        F.md5("text").alias("o_key"))
    new = docs.select(
        F.col("doc_id").alias("n_id"), F.col("source").alias("n_src"),
        F.md5(F.when(F.col("doc_id") % SNAP_EDIT_MOD == 0,
                     F.concat(F.col("text"), F.lit(" [recrawled]")))
              .otherwise(F.col("text"))).alias("n_key"))
    diff = (
        old.join(new, F.col("n_id") == F.col("o_id"), "full_outer")
        .select(
            F.coalesce("n_id", "o_id").alias("doc_id"),
            F.coalesce("n_src", "o_src").alias("source"),
            F.when(F.col("o_id").isNull(), F.lit("added"))
            .when(F.col("n_id").isNull(), F.lit("removed"))
            .when(F.col("n_key") != F.col("o_key"), F.lit("changed"))
            .otherwise(F.lit("steady")).alias("change"))
    )
    return diff.groupBy("source", "change").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"))


# ---------------------------------------------------------------------------
# events_late_arrival_audit — "what would this watermark drop" pre-flight
# ---------------------------------------------------------------------------

LATE_DELAYS_S = (600, 3600)      # candidate watermark delays: 10 min, 1 h


@staged("events_late_arrival_audit", f"""
WITH feed AS (
  SELECT ts, event_id,
         event_id + CASE WHEN event_id % 13 = 0 THEN 50
                         WHEN event_id % 7 = 0 THEN 3
                         ELSE 0 END AS apos
  FROM events WHERE ts IS NOT NULL),
arr AS (
  SELECT ts,
         MAX(ts) OVER (ORDER BY apos, event_id
                       ROWS UNBOUNDED PRECEDING) AS frontier
  FROM feed),
flags AS (
  SELECT ts,
         CAST((epoch_us(frontier) - epoch_us(ts)) // 1000000 AS BIGINT)
           AS lateness_s
  FROM arr)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN lateness_s > {LATE_DELAYS_S[0]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped_10m,
       CAST(SUM(CASE WHEN lateness_s > {LATE_DELAYS_S[1]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped_1h,
       CAST(MAX(lateness_s) AS BIGINT) AS max_lateness_s
FROM flags GROUP BY 1
""")
def q_events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark pre-flight: replay the feed in ARRIVAL order (a
    deterministic out-of-order permutation of event_id — see below) and
    measure each row's lateness
    against the running event-time frontier, i.e. exactly the quantity
    `withWatermark(delay)` compares when deciding to drop.  Per
    event-hour: how many rows a 10-minute and a 1-hour watermark would
    each discard, and the worst lateness seen.  This is the measurement
    that picks the delay constant every streaming query here hardcodes
    — too short silently drops data, too long bloats every stateful
    operator's horizon — and the observability report a production
    stream emits continuously (Spark only exposes the aggregate
    numDroppedRows; this is the per-window, per-threshold breakdown).
    Sibling of events_key_skew_report: both are the pre-flights a
    100 TB streaming deployment runs before fixing its constants.

    Determinism: the frontier is a running MAX over the (unique,
    gap-free) event_id total order — no timestamps are compared across
    engines except by exact integer epoch subtraction; flags are
    integer comparisons; the report is integer counts.

    Scale shape: the arrival-order prefix max runs as the TWO-PASS
    distributed cummax — a running max INSIDE each arrival shard
    (event_id div 1000, the micro-batch stand-in; partitioned window),
    plus a prefix max ACROSS shards computed on the #shards-row
    per-shard maxima (the only unpartitioned window in the plan runs
    over that tiny frame, never the data) and broadcast back.  No
    global data sort, no single-partition data window; at 100 TB the
    stream runs the same recurrence incrementally with the frontier as
    one scalar of state — precisely what the watermark operator itself
    does.  One map-side-combined hour aggregate finishes the report.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # the fixture's event_id is perfectly time-ordered (every lateness
    # would be 0 and the audit vacuous), so the feed synthesizes
    # deterministic out-of-order arrival — every 13th event arrives 50
    # positions late (hours of lateness at fixture density), every 7th
    # arrives 3 late (minutes) — the streaming_dedup at-least-once
    # synthesis precedent, mirrored exactly in the oracle
    apos = (F.col("event_id")
            + F.when(F.col("event_id") % 13 == 0, F.lit(50))
            .when(F.col("event_id") % 7 == 0, F.lit(3))
            .otherwise(F.lit(0))).cast("bigint")
    feed = ev.select("ts", "event_id", apos.alias("apos"))
    shard = F.floor(F.col("apos") / 1000).cast("bigint")
    win = (Window.partitionBy("shard").orderBy("apos", "event_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    in_shard = feed.select("ts", "apos", "event_id",
                           shard.alias("shard")).select(
        "ts", "shard", F.max("ts").over(win).alias("in_max"))
    wprior = (Window.orderBy("shard")
              .rowsBetween(Window.unboundedPreceding, -1))
    prior = (
        feed.groupBy(shard.alias("shard"))
        .agg(F.max("ts").alias("shard_max"))
        .select("shard", F.max("shard_max").over(wprior).alias("prior_max"))
    )
    flags = (
        in_shard.join(F.broadcast(prior), "shard")
        .select(
            "ts",
            # exact integer microseconds, floor-div'd ONCE: truncating
            # each side separately (unix_timestamp) disagrees with
            # truncating the difference whenever sub-second parts
            # straddle a second boundary
            F.expr("(unix_micros(greatest(in_max, prior_max))"
                   " - unix_micros(ts)) div 1000000")
            .cast("bigint").alias("lateness_s"))
    )
    from traffic_data_pipeline_spark.plans.queries import fmt_ts

    return flags.groupBy(
        fmt_ts(F.date_trunc("hour", F.col("ts"))).alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("lateness_s") > LATE_DELAYS_S[0], 1).otherwise(0))
        .cast("bigint").alias("dropped_10m"),
        F.sum(F.when(F.col("lateness_s") > LATE_DELAYS_S[1], 1).otherwise(0))
        .cast("bigint").alias("dropped_1h"),
        F.max("lateness_s").cast("bigint").alias("max_lateness_s"))


# ---------------------------------------------------------------------------
# mixture_budget_allocate — largest-remainder integer budget allocation
# ---------------------------------------------------------------------------

_ALLOC_BUDGET = 100_000    # training-slot budget to split across languages


@staged("mixture_budget_allocate", f"""
WITH per_lang AS (
  SELECT lang,
         CAST(SUM(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  x -> x != ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(30,12)))
              AS DOUBLE) AS z
  FROM per_lang),
b AS (
  -- NULLIF: a fully tokenless corpus (z = 0) must yield NULL ideals in
  -- BOTH engines, not DuckDB inf vs Spark NULL (the
  -- lang_token_fertility divergence class)
  SELECT lang, n_tokens,
         sqrt(CAST(n_tokens AS DOUBLE)) / NULLIF(z, 0) * {_ALLOC_BUDGET}
           AS ideal
  FROM per_lang, tot),
r AS (
  SELECT lang, n_tokens, ideal,
         CAST(floor(ideal) AS BIGINT) AS base_quota,
         ideal - floor(ideal)         AS frac,
         {_ALLOC_BUDGET} - SUM(CAST(floor(ideal) AS BIGINT)) OVER () AS rem,
         ROW_NUMBER() OVER (ORDER BY ideal - floor(ideal) DESC, lang) AS rn
  FROM b)
SELECT lang, n_tokens,
       -- 2 dp: ideal is a LARGE (~budget-sized) full-entropy double,
       -- the round-divergence danger shape (DEVIATIONS.md float note)
       ROUND(ideal, 2) AS ideal_slots,
       base_quota,
       CAST(CASE WHEN rn <= rem THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base_quota + CASE WHEN rn <= rem THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r
""")
def q_mixture_budget_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer mixture-budget allocation by the largest-remainder
    (Hamilton) method: split a fixed training-slot budget of
    {_ALLOC_BUDGET} across languages proportional to the temperature
    weights (alpha = 1/2, the lang_temperature_weights rule), with every
    quota an INTEGER and the quotas summing EXACTLY to the budget — the
    step that turns sampling weights into the concrete per-source row
    budgets a mixture loader or shard writer executes. floor() of each
    ideal share first, then the leftover slots go to the largest
    fractional remainders (ties broken by language ascending), the
    classic apportionment rule.

    Determinism: ideal shares are sqrt (IEEE-correctly-rounded) over a
    DECIMAL-accumulated normalizer, spelled in the identical term order
    as the oracle; floor/remainder arithmetic is then exact (the floor
    of a double below 2^53 is integer-exact); the remainder rank is
    deterministic under the (frac DESC, lang) tie-break, and the
    leftover count is an exact integer window sum.

    Scale shape: the corpus collapses to the per-language token totals
    (ONE in-row-counted map-side-combined aggregate, the
    lang_temperature_weights shuffle); everything after runs on the
    #languages-row frame — the unpartitioned rank/sum windows touch
    ONLY that tiny frame (the events_late_arrival_audit precedent), so
    the allocation is corpus-size-independent. The 100 TB form is the
    same two stages; the per-language frame never grows past the
    language inventory.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_lang = (
        docs.select("lang",
                    F.array_size(token_array(F.col("text")))
                    .cast("bigint").alias("n_tok"))
        .groupBy("lang")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    tot = per_lang.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double")).cast(DOT_DECIMAL))
        .cast("double").alias("z"))
    # nullif: see the oracle's tokenless-corpus note
    ideal = (F.sqrt(F.col("n_tokens").cast("double"))
             / F.nullif(F.col("z"), F.lit(0.0))
             * F.lit(_ALLOC_BUDGET))
    base = F.floor(ideal).cast("bigint")
    frac = ideal - F.floor(ideal)
    w_all = Window.partitionBy()
    r = (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang", "n_tokens", ideal.alias("ideal"),
            base.alias("base_quota"), frac.alias("frac"),
        )
        .withColumn("rem",
                    F.lit(_ALLOC_BUDGET) - F.sum("base_quota").over(w_all))
        .withColumn("rn", F.row_number().over(
            Window.orderBy(F.desc("frac"), F.asc("lang"))))
    )
    extra = F.when(F.col("rn") <= F.col("rem"), 1).otherwise(0)
    return r.select(
        "lang", "n_tokens",
        F.round("ideal", 2).alias("ideal_slots"),
        "base_quota",
        extra.cast("bigint").alias("extra"),
        (F.col("base_quota") + extra).cast("bigint").alias("quota"),
    )


# ---------------------------------------------------------------------------
# doc_kanonymity_report — quasi-identifier k-anonymity risk readout
# ---------------------------------------------------------------------------

K_ANON = 5          # groups smaller than this are re-identification risks


@staged("doc_kanonymity_report", f"""
WITH g AS (
  SELECT lang, source,
         CAST(floor(n_chars / 100.0) AS BIGINT) AS size_bucket,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM documents GROUP BY 1, 2, 3)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(k) AS BIGINT)   AS min_k,
       CAST(SUM(k) AS BIGINT)   AS n_rows,
       CAST(SUM(CASE WHEN k < {K_ANON} THEN k ELSE 0 END) AS BIGINT)
         AS n_at_risk_rows,
       ROUND(CAST(SUM(CASE WHEN k < {K_ANON} THEN k ELSE 0 END) AS DOUBLE)
             / SUM(k), 6) AS risk_share
FROM g GROUP BY 1, 2
""")
def q_doc_kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over the release quasi-identifiers
    (lang, source, coarse length bucket): a row whose QI combination is
    shared by fewer than {K_ANON} rows is re-identifiable by linkage —
    the privacy-side sibling of the PII redactor (pii_redact removes
    direct identifiers; THIS measures indirect ones). Per (lang,
    source): how many QI groups exist, the smallest group, and the
    row count / share sitting in under-k groups — the readout that
    decides which attributes to generalize or suppress before a corpus
    release. The k < {K_ANON} boundary is exercised by the natural
    fixture (groups of size exactly 4 AND exactly 5 both occur at
    sf0.01 — pinned by test), so the strict-< rule can't silently
    flip cross-engine.

    Determinism: the length bucket is floor of an identically-rounded
    IEEE division — n_chars/100.0 is not exact in binary for general
    n_chars, but both engines compute the same correctly-rounded
    quotient, and it IS exact at the bucket boundaries (n_chars a
    multiple of 100), which is what makes the floor agree
    (NULL n_chars propagates to a NULL bucket, one
    group in BOTH engines — SQL GROUP BY and Spark groupBy agree on
    NULL grouping); everything else is integer counting; the one
    division is count/count with a never-zero denominator (every group
    holds >= 1 row).

    Scale shape: two nested map-side-combined aggregates — (QI) then
    (lang, source) — each strictly reducing cardinality; no joins, no
    windows, no data sort. The first aggregate's key count is bounded
    by the QI domain, not the corpus; this is the cheapest shape the
    statistic admits and it survives any scale unchanged.
    """
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy(
            "lang", "source",
            F.floor(F.col("n_chars") / F.lit(100.0)).cast("bigint")
            .alias("size_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    risk = F.sum(F.when(F.col("k") < K_ANON, F.col("k")).otherwise(0))
    return g.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("k").cast("bigint").alias("min_k"),
        F.sum("k").cast("bigint").alias("n_rows"),
        risk.cast("bigint").alias("n_at_risk_rows"),
        F.round(risk.cast("double") / F.sum("k"), 6).alias("risk_share"),
    )


# ---------------------------------------------------------------------------
# doc_perplexity_buckets — CCNet head/middle/tail by per-lang LM terciles
# ---------------------------------------------------------------------------

def _perp_oracle() -> str:
    # composed from the shared oracle text (plans/oracle_ctes.py), NOT a
    # module-time ORACLES["doc_lm_score"] read: that lookup broke when
    # llm_ops was the first plans module imported (its registration only
    # lands after its own body resumes past the queries.py tail)
    from traffic_data_pipeline_spark.plans.oracle_ctes import _LM_SCORE_SQL
    return f"""
WITH lab AS (
  SELECT lm.doc_id, d.lang, lm.lm_score
  FROM ({_LM_SCORE_SQL}) lm
  JOIN documents d ON d.doc_id = lm.doc_id),
cuts AS (
  SELECT lang,
         ROUND(quantile_cont(lm_score, CAST(1 AS DOUBLE) / 3), 6) AS c1,
         ROUND(quantile_cont(lm_score, CAST(2 AS DOUBLE) / 3), 6) AS c2
  FROM lab GROUP BY 1)
SELECT lab.doc_id, lab.lang, lab.lm_score,
       CAST(CAST(lab.lm_score > cuts.c1 AS INTEGER)
            + CAST(lab.lm_score > cuts.c2 AS INTEGER) AS BIGINT) AS tier,
       CASE CAST(lab.lm_score > cuts.c1 AS INTEGER)
            + CAST(lab.lm_score > cuts.c2 AS INTEGER)
         WHEN 2 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS tier_name
FROM lab JOIN cuts ON cuts.lang = lab.lang
"""


@staged("doc_perplexity_buckets", _perp_oracle())
def q_doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): bucket every
    document into per-LANGUAGE perplexity terciles of the bigram LM
    score (doc_lm_score — higher mean log-prob = more fluent), the
    standard coarse quality partition a web corpus ships with: train on
    head+middle, hold tail for filtering experiments. Riding the
    registered LM score means the model build is shared work, and the
    buckets inherit its cross-engine bit-parity.

    Determinism: tercile cutpoints aggregate per language from the
    bit-identical lm_score doubles; the two engines pick the same two
    order statistics but lerp DIFFERENTLY (1-ulp drift possible even on
    repeated values — DEVIATIONS.md float-parity note), so probabilities
    are spelled CAST(k AS DOUBLE)/3 for identical literals and the
    cutpoints ROUND to 6 dp on both sides before comparing — the
    rounded-cutpoint contract test_percentile_interpolation_rounded_parity pins — a doc landing exactly ON
    a cutpoint (frac = 0 positions) tiers by strict >, identically in
    both engines. Docs with no bigrams (< 2 tokens) have no LM score
    and are excluded by construction in both engines.

    Scale shape: the tier assignment is the doc_quality_tiers pattern —
    NO per-language ntile window (which would funnel each language
    through ONE ordered partition): cutpoints collapse to a
    #languages-row frame that always BROADCASTS, and each doc buckets
    itself with two comparisons in-row. The one scale-sensitive piece
    is the exact `percentile` aggregate (per-group value buffer); the
    100 TB swap is `percentile_approx` with the same plan — the
    registered approx-twin precedent (corridor_p85_speed_approx) — at
    which point every stage is map-side mergeable.
    """
    from traffic_data_pipeline_spark.plans.llm_ops import q_doc_lm_score

    lm = q_doc_lm_score(spark, sf_dir).select("doc_id", "lm_score")
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    lab = lm.join(langs, "doc_id")
    cuts = lab.groupBy("lang").agg(
        F.round(F.expr("percentile(lm_score, CAST(1 AS DOUBLE) / 3)"), 6)
        .alias("c1"),
        F.round(F.expr("percentile(lm_score, CAST(2 AS DOUBLE) / 3)"), 6)
        .alias("c2"),
    )
    tier = ((F.col("lm_score") > F.col("c1")).cast("int")
            + (F.col("lm_score") > F.col("c2")).cast("int"))
    return (
        lab.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id", "lang", "lm_score",
            tier.cast("bigint").alias("tier"),
            F.when(tier == 2, "head").when(tier == 1, "middle")
            .otherwise("tail").alias("tier_name"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_graph_kcore — k-core of the near-dup pair graph (iterative peel)
# ---------------------------------------------------------------------------

KCORE_K = 2           # minimum within-subgraph degree
_KCORE_UNROLL = 6     # oracle peel depth — COUPLED TO THE FIXTURE SCALE:
                      # Spark peels to a true fixpoint at any sf, but the
                      # oracle unrolls exactly this many rounds, so it is
                      # exact only while the fixture's near-dup graph
                      # converges within the bound (pinned by the
                      # brute-force test at sf0.01). The oracle is
                      # self-checking: its final round asserts
                      # e{N-1} == e{N} (equal edge counts) and raises a
                      # DuckDB error naming this constant if a larger sf
                      # ever needs deeper peeling — a depth overrun reads
                      # as an oracle-depth artifact, not an engine bug.


def _kcore_oracle() -> str:
    from traffic_data_pipeline_spark.plans.oracle_ctes import (
        _MH_PAIRS_CTE,
        _MINHASH_CTES,
    )
    # AS MATERIALIZED on every peel CTE: each e{{i}} is referenced twice
    # (its keep-set and the next round) and sits on the expensive MinHash
    # chain — inlining would re-derive that chain exponentially across
    # the unroll
    rounds = []
    for i in range(_KCORE_UNROLL):
        rounds.append(f"""
k{i} AS MATERIALIZED (
  SELECT src FROM e{i} GROUP BY src HAVING COUNT(*) >= {KCORE_K}),
e{i + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i} e
  JOIN k{i} a ON a.src = e.src
  JOIN k{i} b ON b.src = e.dst)""")
    return f"""
WITH {_MINHASH_CTES},
{_MH_PAIRS_CTE},
e0 AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM mpairs WHERE agree / 8.0 >= 0.5
  UNION ALL
  SELECT doc_b, doc_a FROM mpairs WHERE agree / 8.0 >= 0.5),
{",".join(rounds)},
depth_ok AS (
  -- convergence witness: the last two peel rounds must agree, else the
  -- unroll is too shallow for this fixture and the result would silently
  -- under-peel — fail loudly with the diagnosis instead
  SELECT CASE
    WHEN (SELECT COUNT(*) FROM e{_KCORE_UNROLL - 1})
         = (SELECT COUNT(*) FROM e{_KCORE_UNROLL}) THEN 1
    ELSE CAST(error('dedup_graph_kcore oracle: _KCORE_UNROLL={_KCORE_UNROLL} '
               'too shallow for this scale factor — the peel has not '
               'converged; raise the constant in plans/staged_ops.py')
          AS INTEGER)
  END AS ok)
SELECT src AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS core_degree
FROM e{_KCORE_UNROLL}, depth_ok
WHERE depth_ok.ok = 1
GROUP BY 1
"""


@staged("dedup_graph_kcore", _kcore_oracle())
def q_dedup_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the near-dup pair graph: repeatedly peel nodes
    whose within-subgraph degree falls below {KCORE_K} until a fixpoint —
    the maximal subgraph where EVERY document has at least {KCORE_K}
    surviving near-duplicates. Completes the graph family (exact CC,
    PageRank, LPA, triangles): where connected components find the
    near-dup CLUSTERS, the k-core isolates their DENSE INTERIORS — the
    template/boilerplate nests worth manual review (a chain of pairwise
    matches has an empty 2-core; a template family survives it), and the
    standard seed for higher-k peeling and densest-subgraph heuristics.
    Emits each surviving doc with its within-core degree.

    Scale shape: rides the session-persisted LSH pair stream the whole
    dedup family shares (no new pairwise work); each peel round is ONE
    map-side-combined degree aggregate plus two equi semi-joins on the
    edge list — edges move once per round, the keep-set is the (much
    smaller) surviving-node frame, and `localCheckpoint` cuts lineage
    between rounds with the round count as the sanctioned scalar probe
    (the connected-components loop contract, functions/similarity.py).
    Peel depth is bounded by the degeneracy ordering — single digits on
    real near-dup graphs; the brute-force test pins convergence within
    the oracle's {_KCORE_UNROLL}-round unroll, so the fixed-depth oracle
    is exact, not approximate.
    """
    from traffic_data_pipeline_spark.plans.extensions import doc_lsh_pairs

    # iterate on the UNDIRECTED pair list (half the rows of a doubled
    # edge list — halves every checkpoint and shuffle); degrees come
    # from exploding both endpoints inside the aggregate
    # no initial checkpoint: the shared pair stream is already
    # session-persisted; round 1 reads it in place and the first
    # FILTERED frame is what's worth materializing
    pairs = doc_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")

    def degrees(p):
        return (
            p.select(F.explode(F.array("doc_a", "doc_b")).alias("v"))
            .groupBy("v").agg(F.count(F.lit(1)).alias("deg")))

    prev = -1
    while True:
        # checkpoint the keep-set BEFORE probing: the probe and both
        # semi-joins would otherwise each re-run the degree aggregate
        # (3x per round — measured 18.8 s -> 6 s at sf0.1)
        keep = (
            degrees(pairs).filter(F.col("deg") >= KCORE_K).select("v")
            .localCheckpoint(eager=True)
        )
        n = keep.count()        # sanctioned convergence probe (CC contract)
        if n == prev:
            break
        prev = n
        pairs = (
            pairs.join(keep.withColumnRenamed("v", "doc_a"),
                       "doc_a", "leftsemi")
            .join(keep.withColumnRenamed("v", "doc_b"), "doc_b", "leftsemi")
            .localCheckpoint(eager=True)
        )
    return degrees(pairs).select(
        F.col("v").alias("doc_id"),
        F.col("deg").cast("bigint").alias("core_degree"))


# ---------------------------------------------------------------------------
# Round-5 promotion fold (VERDICT r4 ask #1). This runs at the END of the
# module body so every @staged registration above is complete before the
# live registry absorbs it, in EVERY import order: when queries.py is
# imported first its bottom `import staged_ops` executes this whole module
# (including this fold) before queries.py finishes; when this module is
# imported first, the fold's own `from plans.queries import ...` below
# fully executes queries.py — whose tail imports of the staged modules are
# side-effect imports with no attribute access, so the in-progress import
# of THIS module is skipped via sys.modules — and control returns here to
# fold the by-then-complete dicts (ADVICE r5: this import, not the
# now-removed mid-file extensions import, is what completes queries.py on
# this path). Both paths end with the same registry; the update is
# idempotent if both run.
# ---------------------------------------------------------------------------
from traffic_data_pipeline_spark.plans.queries import (  # noqa: E402
    ORACLES as _LIVE_ORACLES,
    QUERIES as _LIVE_QUERIES,
)

_collide = {n for n in set(_LIVE_QUERIES) & set(STAGED_QUERIES)
            if _LIVE_QUERIES[n] is not STAGED_QUERIES[n]}
if _collide:  # not assert: must survive python -O (ADVICE r5)
    raise RuntimeError(f"staged names collide with registry: {_collide}")
_LIVE_QUERIES.update(STAGED_QUERIES)
_LIVE_ORACLES.update(STAGED_ORACLES)
