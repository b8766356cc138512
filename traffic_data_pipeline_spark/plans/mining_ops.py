"""Round-3 corpus-mining extension queries (driver-mandated first-class
surface): substring-level exact dedup (RefinedWeb-style duplicated-span
accounting), semantic dedup (SemDeDup-style cluster-then-prune over
embeddings), fixed-point PageRank over the event-transition graph,
TF-IDF sparse-vector similarity search with an optional df-ceiling,
asymmetric n-gram containment (quote/subset detection), content-defined
chunking (shift-robust rolling-hash chunk dedup), deterministic
priority sampling (Duffield-Lund-Thorup), collocation mining (top-k
bigrams by exact-rational lift), and exact heavy hitters (per-partition
Misra-Gries candidates + broadcast recount) — each with a DuckDB oracle.

Registered into the same QUERIES/ORACLES dicts as plans/queries.py.
Cross-engine exactness tactics used here: md5 keys where both engines
must group identically; decimal accumulation for dot products; integer
fixed-point arithmetic for the iterative fixpoint; rational idf and
hash-seeded uniforms so no transcendental or RNG enters a compared value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.functions.execution import materialize
from traffic_data_pipeline_spark.functions.similarity import (
    _cosine,
    dot_product,
    ivf_assign,
    norm_sq,
)
from traffic_data_pipeline_spark.functions.text import (
    ngram_array,
    normalize,
    token_array,
)
from traffic_data_pipeline_spark.plans.queries import register
from traffic_data_pipeline_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Substring-span dedup (documents)
# ---------------------------------------------------------------------------

SPAN_TOKENS = 8  # span width in tokens


@register("dedup_substring_spans", f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
sp AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(l[g:g+{SPAN_TOKENS - 1}], ' ')) AS k
  FROM toks, unnest(generate_series(1, greatest(len(l) - {SPAN_TOKENS - 1}, 0))) t(g)),
cnt AS (SELECT k, COUNT(*) AS nd FROM sp GROUP BY 1),
agg AS (
  SELECT doc_id, COUNT(*) AS n_spans,
         CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
  FROM sp JOIN cnt USING (k) GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(a.n_spans, 0) AS BIGINT)     AS n_spans,
       CAST(COALESCE(a.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CASE WHEN a.n_spans > 0
            THEN ROUND(CAST(a.n_dup_spans AS DOUBLE) / a.n_spans, 6)
       END AS dup_span_ratio
FROM documents d LEFT JOIN agg a USING (doc_id)
""")
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup accounting (the RefinedWeb/Gopher-style
    signal the document-level dedup family can't see): every distinct
    8-token span per document, flagged when the identical span also occurs
    in at least one OTHER document. Reports per doc the distinct-span
    count, how many of them are cross-document duplicates, and the dup
    ratio — the removal policy (drop spans / drop docs over a ratio) is a
    downstream filter on this frame.

    Scale shape: spans never leave their row as strings — each doc emits
    md5 span keys from an in-row n-gram projection (functions/text.
    ngram_array, no shuffle), and the only wide ops are the per-doc
    DISTINCT, the key-frequency aggregate (map-side combined; 16-byte
    keys, not text), and the co-keyed join back. At 100 TB the md5 key
    swaps to xxhash64 (8 bytes, same plan); md5 is kept here because both
    engines implement it identically, which makes the oracle exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", token_array(F.col("text")).alias("toks"))
    spans = (
        toks.select("doc_id",
                    F.explode(ngram_array("toks", SPAN_TOKENS)).alias("span"))
        .select("doc_id", F.md5("span").alias("k"))
        .distinct()
    )
    cnt = spans.groupBy("k").agg(F.count(F.lit(1)).alias("nd"))
    agg = (
        spans.join(cnt, "k")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup_spans"),
        )
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.when(
                F.col("n_spans") > 0,
                F.round(F.col("n_dup_spans").cast("double") / F.col("n_spans"), 6),
            ).alias("dup_span_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic dedup (embeddings): cluster, then prune within clusters
# ---------------------------------------------------------------------------

SEMANTIC_TAU = 0.85
N_SEM_CLUSTERS = 8      # floor; actual k = max(this, floor(sqrt(|corpus|)))
N_SEM_DUPED = 50        # ids < this get a perturbed near-duplicate copy
SEM_ID_OFFSET = 100000

# The raw fixture corpus has no natural near-dups (max pairwise cosine
# ~0.51), so the query runs on an augmented corpus: vectors with id <
# N_SEM_DUPED gain a copy at id+SEM_ID_OFFSET, deterministically perturbed
# (x*1.01 + 0.001 per element — pure IEEE double ops, identical in both
# engines), cosine ~0.99 to its source. The doubled-feed pattern
# sensor_scrub uses, so the dedup decision is exercised for real.
#
# Assignment CTEs shared with embedding_kmeans_step (plans/extensions.py):
# nearest seed centroid by cosine, ties to the lower centroid id.
_ASSIGN_CTES = f"""
corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {SEM_ID_OFFSET},
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01 + 0.001)
  FROM embeddings WHERE vec_id < {N_SEM_DUPED}),
elems AS (
  SELECT vec_id, t.i AS pos, CAST(embedding[t.i] AS DOUBLE) AS val
  FROM corpus, unnest(generate_series(1, len(embedding))) t(i)),
norms AS (
  SELECT vec_id, CAST(SUM(CAST(val * val AS DECIMAL(30,12))) AS DOUBLE) AS norm_sq
  FROM elems GROUP BY 1),
cent AS (SELECT vec_id AS cid FROM corpus ORDER BY vec_id
         LIMIT (SELECT GREATEST({N_SEM_CLUSTERS},
                                CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))
                FROM corpus)),
cdot AS (
  SELECT v.vec_id, c.vec_id AS cid,
         CAST(SUM(CAST(v.val * c.val AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM elems v JOIN elems c ON v.pos = c.pos
  WHERE c.vec_id IN (SELECT cid FROM cent)
  GROUP BY 1, 2),
cscored AS (
  SELECT d.vec_id, d.cid,
         d.dot / (sqrt(vn.norm_sq) * sqrt(cn.norm_sq)) AS cos
  FROM cdot d
  JOIN norms vn ON vn.vec_id = d.vec_id
  JOIN norms cn ON cn.vec_id = d.cid),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
    FROM cscored) WHERE rk = 1)
"""


@register("dedup_semantic", f"""
WITH {_ASSIGN_CTES},
pdot AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(SUM(CAST(ea.val * eb.val AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM assign a
  JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN elems ea ON ea.vec_id = a.vec_id
  JOIN elems eb ON eb.vec_id = b.vec_id AND eb.pos = ea.pos
  GROUP BY 1, 2),
pcos AS (
  SELECT a_id, b_id,
         dot / (sqrt(na.norm_sq) * sqrt(nb.norm_sq)) AS cos
  FROM pdot
  JOIN norms na ON na.vec_id = a_id
  JOIN norms nb ON nb.vec_id = b_id
  WHERE na.norm_sq > 0 AND nb.norm_sq > 0),
dup AS (
  SELECT b_id, MAX(cos) AS max_cos
  FROM pcos WHERE cos >= {SEMANTIC_TAU} GROUP BY 1)
SELECT a.vec_id,
       a.cid                        AS cluster_id,
       CAST(d.b_id IS NULL AS BOOLEAN) AS is_kept,
       ROUND(d.max_cos, 6)          AS max_dup_cos
FROM assign a LEFT JOIN dup d ON d.b_id = a.vec_id
""")
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-style (Abbas et al. 2023): coarse-cluster
    the embedding corpus, then inside each cluster drop every vector whose
    cosine to a LOWER-ID cluster member is >= tau — near-duplicate meaning
    is pruned without any cross-cluster pair ever being scored. Output is
    one row per vector: its cluster, whether it survives, and the cosine
    to its closest dominating duplicate.

    Scale shape: the cluster assignment is one broadcast-centroid argmax
    over the corpus (ivf_assign — the corpus never shuffles for it), and
    pairing is an equi-join on cluster id, so the candidate count is
    sum_c |c|^2 instead of N^2 — and k SCALES WITH THE CORPUS as
    max(8, floor(sqrt(N))) (computed identically by the oracle's subquery
    LIMIT). sqrt is the balance point for flat cluster-then-prune:
    assignment costs N*k dots and pairing costs ~N^2/k, so k ~ sqrt(N)
    makes BOTH stages N^1.5 — k/64-style linear scaling quietly turns
    assignment quadratic, and fixed k=8 measured 13.4s vs ~2s at sf0.1 by
    making pairing quadratic. (Real systems beat N^1.5 by replacing the
    flat argmax with a k-means tree / HNSW quantizer; the Spark plan
    shape — broadcast quantizer, cluster-key equi-join — is unchanged by
    that swap.) Skewed
    (over-full) clusters are the failure mode — AQE skew-join splits them,
    and the lsh_hot_band_overflow cap pattern applies unchanged if a
    degenerate centroid absorbs the corpus. Seeds are the k lowest ids
    (deterministic, same as the IVF/k-means queries); production swaps in
    the embedding_kmeans_step loop without changing this query's plan.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(
        emb.filter(F.col("vec_id") < N_SEM_DUPED).select(
            (F.col("vec_id") + SEM_ID_OFFSET).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x.cast("double") * F.lit(1.01) + F.lit(0.001),
            ).alias("embedding"),
        )
    )
    dp = spark.sparkContext.defaultParallelism
    with_norm = materialize(
        corpus.repartition(dp, F.col("vec_id")).select(
            "vec_id", "embedding", norm_sq(F.col("embedding")).alias("_n2"))
    )
    # k ~ sqrt(N): see docstring. The count is a sanctioned scalar probe
    # (same class as the CC and k-means convergence probes); the oracle
    # computes the identical k via its subquery LIMIT — floor(sqrt()) on
    # an exact small integer is bit-identical across engines (IEEE sqrt
    # is correctly rounded).
    import math

    n_corpus = with_norm.count()
    k = max(N_SEM_CLUSTERS, int(math.floor(math.sqrt(n_corpus))))
    centroids = corpus.orderBy("vec_id").limit(k)
    assign = ivf_assign(corpus, centroids, with_norm=with_norm)
    # materialized: the cluster self-join below reads m TWICE, and the
    # Arrow dot node in ivf_assign defeats ReusedExchange's subtree
    # dedup for self-joins (round-10 audit) — one cache fill replaces
    # two full assignment computations
    m = materialize(with_norm.join(assign, "vec_id"))
    a = m.select(F.col("centroid_id").alias("_c"), F.col("vec_id").alias("a_id"),
                 F.col("embedding").alias("_av"), F.col("_n2").alias("_an"))
    b = m.select(F.col("centroid_id").alias("_c"), F.col("vec_id").alias("b_id"),
                 F.col("embedding").alias("_bv"), F.col("_n2").alias("_bn"))
    # pair scoring through the Arrow exact-dot kernel (round-10, guide
    # §4.2): the interpreted zip_with/BigDecimal dot was ~600 ns/element
    # over |pairs| x dim — the kernel computes the identical
    # DECIMAL(30,12) units vectorized (functions/arrowmath.py exactness
    # proof); the cosine ratio stays in the JVM, same oracle hash
    from traffic_data_pipeline_spark.functions.arrowmath import (
        with_exact_dot,
    )

    dup = (
        with_exact_dot(
            a.join(b, ["_c"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", "_an", "_bn", "_av", "_bv"),
            "_av", "_bv", "_dot")
        .withColumn("_cos", _cosine(F.col("_dot"),
                                    F.col("_an"), F.col("_bn")))
        .filter(F.col("_cos") >= SEMANTIC_TAU)
        .groupBy("b_id")
        .agg(F.max("_cos").alias("_max_cos"))
    )
    return (
        m.select("vec_id", F.col("centroid_id").alias("cluster_id"))
        .join(dup, m.vec_id == dup.b_id, "left")
        .select(
            "vec_id", "cluster_id",
            F.col("b_id").isNull().alias("is_kept"),
            F.round("_max_cos", 6).alias("max_dup_cos"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank over the event-transition graph (events)
# ---------------------------------------------------------------------------

PR_SCALE = 10**12       # fixed-point unit: 1.0 == 10^12
PR_ITERS = 3


def _pr_iter_sql(i: int) -> str:
    """One unrolled PageRank round as oracle CTE text (DuckDB `//` is
    floor division == Spark `div` for the all-positive values here)."""
    p = f"pr{i - 1}"
    return f"""
contrib{i} AS (
  SELECT e.dst AS node, SUM((p.pr * e.cnt) // e.outdeg) AS c
  FROM edges_n e JOIN {p} p ON p.node = e.src GROUP BY 1),
dang{i} AS (
  SELECT COALESCE(SUM(p.pr), 0) AS d FROM {p} p
  WHERE p.node NOT IN (SELECT DISTINCT src FROM edges_n)),
pr{i} AS (
  SELECT n.node,
         (15 * {PR_SCALE}) // (100 * s.n)
         + (85 * (COALESCE(c.c, 0) + d.d // s.n)) // 100 AS pr
  FROM nodes n CROSS JOIN nstats s CROSS JOIN dang{i} d
  LEFT JOIN contrib{i} c ON c.node = n.node),"""


_PR_ORACLE = f"""
WITH trans AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events),
edges AS (
  SELECT src, dst, COUNT(*) AS cnt FROM trans WHERE dst IS NOT NULL GROUP BY 1, 2),
outdeg AS (SELECT src, SUM(cnt) AS outdeg FROM edges GROUP BY 1),
edges_n AS (SELECT e.src, e.dst, e.cnt, o.outdeg FROM edges e JOIN outdeg o USING (src)),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nstats AS (SELECT COUNT(*) AS n FROM nodes),
pr0 AS (SELECT node, {PR_SCALE} // s.n AS pr FROM nodes CROSS JOIN nstats s),
{"".join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))}
fin AS (SELECT node, pr FROM pr{PR_ITERS})
SELECT node, CAST(pr AS BIGINT) AS pr_scaled,
       CAST(pr AS DOUBLE) / {PR_SCALE} AS pagerank
FROM fin
"""


@register("events_pagerank", _PR_ORACLE)
def q_events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {PR_ITERS} unrolled rounds, dangling mass
    redistributed uniformly) over the weighted event-type transition graph:
    an edge src->dst for each consecutive event pair within a user's
    timeline, weighted by transition count.

    The iterative fixpoint is computed in FIXED-POINT INTEGER arithmetic
    (unit = 1e-12): every per-edge contribution, dangling share, and
    damping step is a bigint multiply + floor division, so three rounds of
    accumulated arithmetic are bit-identical across Spark and DuckDB — the
    trick that makes an iterative graph algorithm hash-checkable where
    double arithmetic would drift in the last ulp per round. At corpus
    scale the bigint products swap to DECIMAL(38,0) (same exact
    semantics); the plan keeps the classic Spark PageRank shape — the rank
    vector is broadcast V-rows, the edge list is the only big frame, one
    groupBy(dst) shuffle per round.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    edges = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    outdeg = edges.groupBy("src").agg(F.sum("cnt").alias("outdeg"))
    edges_n = materialize(edges.join(outdeg, "src"))  # re-read every round
    nodes = materialize(ev.select(F.col("event_type").alias("node")).distinct())
    nstats = nodes.agg(F.count(F.lit(1)).alias("n"))
    pr = nodes.crossJoin(F.broadcast(nstats)).select(
        "node", F.expr(f"{PR_SCALE} div n").alias("pr"))
    srcs = edges_n.select("src").distinct()
    for _ in range(PR_ITERS):
        contrib = (
            edges_n.join(F.broadcast(pr.withColumnRenamed("node", "src")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("(pr * cnt) div outdeg")).alias("c"))
        )
        dang = (
            pr.join(srcs.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0).cast("bigint")).alias("d"))
        )
        # materialize each round's V-row rank vector: without it the next
        # round's plan re-executes every prior round (lineage doubles per
        # iteration) — the CC-loop rule from functions/similarity applied
        # here
        pr = materialize(
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(nstats))
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(f"(15 * {PR_SCALE}) div (100 * n)"
                       f" + (85 * (coalesce(c, 0) + d div n)) div 100").alias("pr"),
            )
        )
    return pr.select(
        "node", F.col("pr").alias("pr_scaled"),
        (F.col("pr").cast("double") / PR_SCALE).alias("pagerank"))


# ---------------------------------------------------------------------------
# TF-IDF sparse-vector similarity search (documents)
# ---------------------------------------------------------------------------

TFIDF_QUERY_IDS = [0, 1, 2, 3]
TFIDF_K = 3


@register("doc_tfidf_knn", f"""
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
    FROM documents)
  WHERE token != ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM documents),
w AS (
  SELECT doc_id, token,
         tf * ((nn.n - df + 0.5) / (df + 0.5)) AS w
  FROM tf JOIN dfreq USING (token) CROSS JOIN nn),
norms AS (
  SELECT doc_id, CAST(SUM(CAST(w * w AS DECIMAL(30,12))) AS DOUBLE) AS n2
  FROM w GROUP BY 1),
q AS (SELECT doc_id AS q_id, token, w AS wq FROM w
      WHERE doc_id IN ({", ".join(map(str, TFIDF_QUERY_IDS))})),
dots AS (
  SELECT q.q_id, w.doc_id,
         CAST(SUM(CAST(q.wq * w.w AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM w JOIN q USING (token)
  WHERE w.doc_id <> q.q_id
  GROUP BY 1, 2),
scored AS (
  SELECT d.q_id, d.doc_id, d.dot / (sqrt(nq.n2) * sqrt(nd.n2)) AS cos
  FROM dots d
  JOIN norms nq ON nq.doc_id = d.q_id
  JOIN norms nd ON nd.doc_id = d.doc_id
  WHERE nq.n2 > 0 AND nd.n2 > 0)
SELECT q_id, doc_id AS neighbor_id, CAST(rk AS INTEGER) AS rk,
       ROUND(cos, 6) AS cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS rk
      FROM scored)
WHERE rk <= {TFIDF_K}
""")
def q_doc_tfidf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine top-k document search — the sparse-vector sibling of
    embedding_knn: weights are tf * idf with the BM25-style rational idf
    (N - df + 0.5)/(df + 0.5) (no transcendentals, so both engines compute
    bit-identical weights), dot products run through the INVERTED INDEX —
    the corpus weight table joined to the broadcast query postings on
    token, so each query touches only documents sharing a term, never the
    full corpus. Products accumulate as DECIMAL (order-independent).

    Scale shape: the weight table is the corpus-sized frame and moves
    once (token-keyed join); queries broadcast. Hot tokens (stopwords)
    are naturally down-weighted but still fan out — ``tfidf_topk(...,
    max_df=...)`` is the production df-ceiling that drops them from the
    index entirely (the same hot-key bound as the LSH band cap;
    tests/test_mining_ops.py exercises it on a boilerplate-heavy corpus —
    the registered query runs uncapped because the fixture vocabulary is
    31 tokens, all of them hot).
    """
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, TFIDF_QUERY_IDS, TFIDF_K)


def tfidf_topk(docs: DataFrame, query_ids, k: int,
               max_df: int | None = None) -> DataFrame:
    """TF-IDF inverted-index top-k (see q_doc_tfidf_knn). ``max_df``
    drops every token whose document frequency exceeds it from the INDEX
    (postings and norms both) — the bound that keeps stopword posting
    lists from fanning out quadratically on a real corpus. The capped
    index is a different (coarser) vector space, so results legitimately
    differ from the uncapped run; rank quality on distinctive tokens is
    what the test pins."""
    from traffic_data_pipeline_spark.functions.text import tokens

    tf = (tokens(docs).groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    nn = docs.agg(F.count(F.lit(1)).alias("n"))
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(nn))
        .select("doc_id", "token",
                (F.col("tf") * ((F.col("n") - F.col("df") + F.lit(0.5))
                                / (F.col("df") + F.lit(0.5)))).alias("w"))
    )
    w = materialize(w)  # norms, queries, and the dot join all read it
    dec = lambda c: F.sum(c.cast("decimal(30,12)")).cast("double")  # noqa: E731
    norms = w.groupBy("doc_id").agg(dec(F.col("w") * F.col("w")).alias("n2"))
    q = w.filter(F.col("doc_id").isin(list(query_ids))).select(
        F.col("doc_id").alias("q_id"), "token", F.col("w").alias("wq"))
    dots = (
        w.join(F.broadcast(q), "token")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(dec(F.col("wq") * F.col("w")).alias("dot"))
    )
    nq = norms.select(F.col("doc_id").alias("q_id"), F.col("n2").alias("_nq"))
    scored = (
        dots.join(F.broadcast(nq), "q_id")
        .join(norms, "doc_id")
        .filter((F.col("_nq") > 0) & (F.col("n2") > 0))
        .withColumn("cos", F.col("dot") / (F.sqrt("_nq") * F.sqrt("n2")))
    )
    wk = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select("q_id", F.col("doc_id").alias("neighbor_id"),
                F.col("rk").cast("int").alias("rk"),
                F.round("cos", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Asymmetric n-gram containment (documents)
# ---------------------------------------------------------------------------

CONTAIN_TAU = 0.8
# 5-gram shingles: on this small-vocabulary corpus 3-grams are near-
# universal (every doc shares some), while 5-grams are distinctive —
# the cross-doc candidate space shrinks 300x (23k -> 74 pairs at sf0.01)
# with the identical qualifying-pair set
CONTAIN_NGRAM = 5


@register("doc_ngram_containment", f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
sp AS (
  SELECT DISTINCT doc_id, array_to_string(l[g:g+{CONTAIN_NGRAM - 1}], ' ') AS sh
  FROM toks, unnest(generate_series(1, greatest(len(l) - {CONTAIN_NGRAM - 1}, 0))) t(g)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sp GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM sp a JOIN sp b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY 1, 2)
SELECT i.a_id, i.b_id,
       CAST(sa.n AS INTEGER) AS n_a,
       CAST(i.n_inter AS INTEGER) AS n_inter,
       ROUND(CAST(i.n_inter AS DOUBLE) / sa.n, 6) AS containment
FROM inter i JOIN sz sa ON sa.doc_id = i.a_id
WHERE CAST(i.n_inter AS DOUBLE) / sa.n >= {CONTAIN_TAU}
""")
def q_doc_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment C(A->B) = |sh(A) n sh(B)| / |sh(A)| over word
    3-gram sets — the ASYMMETRIC sibling of dedup_ngram_jaccard: a short
    document quoted wholesale inside a long one scores ~1.0 here while its
    Jaccard stays near |A|/|B| and never trips the symmetric filter.

    Candidate generation is the one-sided prefix filter (recall-lossless):
    rank each doc's shingles rarest-first (global doc-frequency, ties by
    shingle) and join only the first floor(n_a*(1-t))+1 of A's shingles —
    its PREFIX — against the full posting lists; if B misses ALL of A's
    prefix, the intersection is at most n_a - prefix_len < t*n_a, so no
    qualifying pair is lost. Prefixes are rare shingles, so their postings
    are short — the join never touches the boilerplate-shingle quadratic
    blowup. Verify is per-candidate array_intersect on the in-row set
    arrays. The oracle keeps the naive full self-join SQL and must emit
    identical rows — the standard proof the pruned path is lossless.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Word-5-gram sets via ONE regex pass over the normalized text
    # (round-10 optimization, guide §4.1/§2.5): the previous
    # token_array + transform(slice..concat_ws) chain ran interpreted
    # higher-order lambdas — and on the single-file fixture scan it ran
    # them on ONE task (measured 6.0 s of the query's 6.3 s at sf0.1).
    # The lookahead pattern matches at the string start and after every
    # space, capturing the next five tokens — the identical space-joined
    # 5-gram at every token start (normalize() collapses separators to
    # single spaces, so [^ ]+ IS the token) — and the spread repartition
    # parallelizes the projection exactly as shingle_sets does for
    # char-grams. Same rows, same oracle; set build now ~0.4 s.
    # Round-11 (VERDICT r10 #6): the spread is GATED on the scan's split
    # count — it exists for the one-file local fixture (one scan task);
    # when the corpus scan splits by itself the repartition would be a
    # pure extra exchange ahead of map-side work, so it disappears.
    from traffic_data_pipeline_spark.functions.execution import (
        spread_single_split,
    )

    n_pat = "(?:^| )(?=((?:[^ ]+ ){" + str(CONTAIN_NGRAM - 1) + "}[^ ]+))"
    sets = materialize(
        spread_single_split(docs, "doc_id")
        .select("doc_id", normalize(F.col("text")).alias("_norm"))
        .select(
            "doc_id",
            F.array_distinct(
                F.regexp_extract_all("_norm", F.lit(n_pat), 1)).alias("_set"))
        .withColumn("n_sh", F.size("_set"))
        .filter(F.col("n_sh") > 0)
    )
    # Candidate generation runs ENTIRELY on 8-byte shingle hashes: the
    # word-5-gram universe is ~the corpus token count (mostly-unique,
    # ~50-char strings), so every shuffle/window/join on raw shingles
    # carries corpus-sized string keys. Hashing is safe here because a
    # hash collision can only ADD a candidate pair (string equality
    # implies hash equality, never the reverse), and the exact verify
    # below scores true string arrays — recall stays lossless. The
    # rarest-first order is computed on hash identity, which is still a
    # consistent total order — all the prefix theorem requires.
    exploded = sets.select(
        "doc_id", "n_sh",
        F.explode(F.transform("_set", lambda x: F.xxhash64(x))).alias("h"))
    rk = F.row_number().over(Window.partitionBy("doc_id").orderBy("_df", "h"))
    # prefix length n - ceil(t*n - eps) + 1; eps keeps ceil exact at t*n
    # integer boundaries (same guard as ngram_jaccard_pairs)
    prefix = (
        exploded.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .withColumn("_rk", rk)
        .filter(F.col("_rk") <= (F.col("n_sh")
                                 - F.ceil(F.lit(CONTAIN_TAU) * F.col("n_sh")
                                          - F.lit(1e-9)) + 1).cast("int"))
        .select(F.col("doc_id").alias("a_id"), "h")
    )
    cand = (
        prefix.join(exploded.select(F.col("doc_id").alias("b_id"), "h"), "h")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("a_id"),
                     F.col("_set").alias("_set_a"), F.col("n_sh").alias("n_a"))
    sb = sets.select(F.col("doc_id").alias("b_id"),
                     F.col("_set").alias("_set_b"))
    return (
        cand.join(sa, "a_id").join(sb, "b_id")
        .withColumn("n_inter", F.size(F.array_intersect("_set_a", "_set_b")))
        .withColumn("containment",
                    F.col("n_inter").cast("double") / F.col("n_a"))
        .filter(F.col("containment") >= CONTAIN_TAU)
        .select("a_id", "b_id", F.col("n_a").cast("int").alias("n_a"),
                F.col("n_inter").cast("int").alias("n_inter"),
                F.round("containment", 6).alias("containment"))
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (documents)
# ---------------------------------------------------------------------------

CDC_WINDOW = 4        # rolling-window width in tokens
CDC_BOUNDARY_HEX = 1  # boundary when the first hex char is '0' (p = 1/16)


@register("doc_cdc_chunks", f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
cu AS (
  SELECT doc_id, l,
         list_filter(list_transform(generate_series(1, greatest(len(l) - {CDC_WINDOW - 1}, 0)),
            g -> CASE WHEN substr(md5(array_to_string(l[g:g+{CDC_WINDOW - 1}], ' ')), 1, 1) = '0'
                      THEN g + {CDC_WINDOW - 1} ELSE -1 END), x -> x > 0) AS cuts
  FROM toks),
ch AS (
  SELECT doc_id,
         list_filter(list_transform(generate_series(1, len(bounds) - 1),
            i -> array_to_string(l[bounds[i]+1:bounds[i+1]], ' ')), x -> x <> '') AS chunks
  FROM (SELECT doc_id, l, ([0] || cuts || [len(l)]) AS bounds FROM cu)),
fp AS (SELECT DISTINCT doc_id, md5(c) AS fp FROM ch, unnest(chunks) t(c)),
cnt AS (SELECT fp, COUNT(*) AS nd FROM fp GROUP BY 1),
agg AS (
  SELECT doc_id, COUNT(*) AS n_chunks,
         CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
  FROM fp JOIN cnt USING (fp) GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(a.n_chunks, 0) AS BIGINT)     AS n_chunks,
       CAST(COALESCE(a.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       CASE WHEN a.n_chunks > 0
            THEN ROUND(CAST(a.n_dup_chunks AS DOUBLE) / a.n_chunks, 6)
       END AS dup_chunk_ratio
FROM documents d LEFT JOIN agg a USING (doc_id)
""")
def q_doc_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: cut each document into chunks at
    ROLLING-HASH boundaries (a cut after token g+3 wherever the 4-token
    window at g hashes into the boundary class, p=1/16 -> ~16-token mean
    chunks), fingerprint each chunk, and count chunks shared verbatim with
    other documents. Unlike the fixed-stride dedup_substring_spans, CDC
    boundaries are SHIFT-ROBUST: inserting one token early in a document
    only perturbs chunks up to the next boundary — every later chunk
    re-aligns and still matches its twin (the property storage dedup and
    incremental corpus refresh depend on; tested in
    tests/test_mining_ops.py::test_cdc_chunking_shift_robust).

    Scale shape: boundary detection, chunk assembly, and fingerprinting
    are all in-row array projections — no shuffle until the distinct on
    16-byte chunk fingerprints; then the same frequency-aggregate +
    co-keyed join-back plan as the span query. md5 keeps both engines'
    hashes identical; xxhash64 is the at-scale swap.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = CDC_WINDOW
    # spread the single-file scan BEFORE the boundary projection: the
    # rolling md5 over every 4-token window is the query's compute, and a
    # one-file corpus otherwise runs it all in one task (measured 77s at
    # sf0.1 single-task vs ~3s spread); the exchange also stops
    # CollapseProject from inlining the cuts expression into every
    # bounds/chunk reference
    chunks = docs.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    ).select(
        "doc_id",
        token_array(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        F.expr(f"""
          CASE WHEN size(toks) < {w} THEN array()
               ELSE filter(transform(sequence(1, size(toks) - {w - 1}),
                  g -> CASE WHEN substring(md5(concat_ws(' ', slice(toks, g, {w}))), 1, 1) = '0'
                            THEN g + {w - 1} ELSE -1 END), x -> x > 0)
          END""").alias("cuts"),
        F.col("toks"),
    ).select(
        "doc_id", "toks",
        F.concat(F.array(F.lit(0)), F.col("cuts"),
                 F.array(F.size("toks"))).alias("bounds"),
    ).select(
        "doc_id",
        F.expr("""
          filter(transform(sequence(1, size(bounds) - 1),
             i -> concat_ws(' ', slice(toks, element_at(bounds, i) + 1,
                                       element_at(bounds, i + 1) - element_at(bounds, i)))),
             x -> x != '')""").alias("chunks"),
    )
    # materialize BEFORE fan-out: CollapseProject otherwise inlines the
    # bounds expression (which itself inlines the full rolling-md5 cuts
    # transform) into every element_at reference INSIDE the chunk lambda —
    # the boundary scan re-runs per chunk element per consumer, turning a
    # linear pipeline quadratic (measured 59s vs 0.8s for the fingerprint
    # stage at sf0.1). The cached frame is one small row per doc.
    chunks = materialize(chunks)
    fp = (chunks.select("doc_id", F.explode("chunks").alias("c"))
          .select("doc_id", F.md5("c").alias("fp"))
          .distinct())
    cnt = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
    agg = (
        fp.join(cnt, "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup_chunks"))
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).alias("n_dup_chunks"),
            F.when(
                F.col("n_chunks") > 0,
                F.round(F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 6),
            ).alias("dup_chunk_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic priority sampling (documents)
# ---------------------------------------------------------------------------

PRIO_K = 64
PRIO_U_DENOM = 4294967296.0  # 2^32


@register("doc_priority_sample", f"""
WITH pri AS (
  SELECT doc_id, n_chars AS weight,
         n_chars / ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1)
                    / {PRIO_U_DENOM}) AS p
  FROM documents WHERE n_chars > 0),
rk AS (
  SELECT doc_id, weight, p,
         ROW_NUMBER() OVER (ORDER BY p DESC, doc_id) AS r
  FROM pri),
tau AS (SELECT p AS tau FROM rk WHERE r = {PRIO_K + 1})
SELECT rk.doc_id, rk.weight,
       CAST(rk.r AS INTEGER) AS rk,
       ROUND(rk.p, 6) AS priority,
       ROUND(GREATEST(CAST(rk.weight AS DOUBLE), tau.tau), 6) AS est_weight
FROM rk CROSS JOIN tau
WHERE rk.r <= {PRIO_K}
""")
def q_doc_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample via PRIORITY SAMPLING (Duffield, Lund
    & Thorup, JACM 2007): each row draws u in (0,1] from an md5 of its own
    key (seedless, reproducible — the property a rerun-able corpus
    pipeline needs), gets priority w/u, and the k highest-priority rows
    form the sample. With threshold tau = the (k+1)-th priority, the
    estimator max(w, tau) is unbiased for any subset-sum over the
    population — subsampled corpus statistics stay honest. The arithmetic
    is hash + two IEEE divisions (correctly rounded, so both engines
    compute bit-identical priorities — no transcendentals, no RNG state).

    Scale shape: priorities are a pure projection; the top-(k+1) is
    TakeOrdered (per-partition heaps merged at the driver, k rows — never
    a global sort), and tau broadcasts back as a one-row scalar.
    """
    docs = load_table(spark, sf_dir, "documents")
    pri = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        F.col("n_chars").alias("weight"),
        (F.col("n_chars")
         / ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("bigint") + 1) / F.lit(PRIO_U_DENOM))
         ).alias("p"),
    )
    top = materialize(
        pri.orderBy(F.col("p").desc(), "doc_id").limit(PRIO_K + 1)
        .withColumn("r", F.row_number().over(
            Window.orderBy(F.col("p").desc(), "doc_id"))))
    tau = top.filter(F.col("r") == PRIO_K + 1).select(F.col("p").alias("tau"))
    return (
        top.filter(F.col("r") <= PRIO_K)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id", "weight",
            F.col("r").cast("int").alias("rk"),
            F.round("p", 6).alias("priority"),
            F.round(F.greatest(F.col("weight").cast("double"), F.col("tau")), 6)
            .alias("est_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Collocation mining (documents)
# ---------------------------------------------------------------------------

COLLOC_MIN_COUNT = 5
COLLOC_K = 20


@register("doc_collocations", f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
uni AS (
  SELECT t.w, COUNT(*) AS c1
  FROM toks, unnest(l) t(w) GROUP BY 1),
bi AS (
  SELECT l[g] AS w1, l[g+1] AS w2, COUNT(*) AS c2
  FROM toks, unnest(generate_series(1, greatest(len(l) - 1, 0))) t(g)
  GROUP BY 1, 2),
tot AS (
  SELECT (SELECT SUM(c1) FROM uni) AS t1,
         (SELECT SUM(c2) FROM bi) AS t2),
scored AS (
  SELECT b.w1, b.w2, b.c2,
         CAST(b.c2 * t.t1 * t.t1 AS DOUBLE)
           / CAST(t.t2 * u1.c1 * u2.c1 AS DOUBLE) AS lift
  FROM bi b
  JOIN uni u1 ON u1.w = b.w1
  JOIN uni u2 ON u2.w = b.w2
  CROSS JOIN tot t
  WHERE b.c2 >= {COLLOC_MIN_COUNT})
SELECT w1, w2, CAST(c2 AS BIGINT) AS pair_count,
       CAST(rk AS INTEGER) AS rk, ROUND(lift, 6) AS lift
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, w1, w2) AS rk
      FROM scored)
WHERE rk <= {COLLOC_K}
""")
def q_doc_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the top-k token bigrams by LIFT — the
    PMI-without-the-log association score P(xy)/(P(x)P(y)) =
    c2*T1^2/(T2*c1(x)*c1(y)) — over a minimum pair count. The signal
    tokenizer/vocab work uses to find multiword units worth merging.
    Kept as an exact rational of bigint counts (one double division, no
    log), so both engines score and rank identically; at corpus scale the
    products move to DECIMAL(38,0) before the divide (counts beyond 2^53
    would round in double).

    Scale shape: unigram and bigram counts are map-side-combined
    aggregates; the unigram table is VOCABULARY-sized, so it broadcasts
    into the bigram stream twice (w1, w2) with the one-row totals — the
    bigram stream, the only corpus-sized frame, moves once; top-k is
    TakeOrdered over the min-count survivors.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    ).select("doc_id", token_array(F.col("text")).alias("toks"))
    # both count tables are read twice (scores + totals) — materialize so
    # the corpus explode+aggregate runs once each, not once per consumer
    uni = materialize(toks.select(F.explode("toks").alias("w"))
                      .groupBy("w").agg(F.count(F.lit(1)).alias("c1")))
    bi = materialize(
        toks.select(F.explode(ngram_array("toks", 2)).alias("bg"))
        .select(F.split("bg", " ")[0].alias("w1"),
                F.split("bg", " ")[1].alias("w2"))
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    )
    tot = uni.agg(F.sum("c1").alias("t1")).crossJoin(
        bi.agg(F.sum("c2").alias("t2")))
    scored = (
        bi.filter(F.col("c2") >= COLLOC_MIN_COUNT)
        .join(F.broadcast(uni.select(F.col("w").alias("w1"),
                                     F.col("c1").alias("_c1a"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"),
                                     F.col("c1").alias("_c1b"))), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "c2",
            ((F.col("c2") * F.col("t1") * F.col("t1")).cast("double")
             / (F.col("t2") * F.col("_c1a") * F.col("_c1b")).cast("double"))
            .alias("lift"),
        )
    )
    wk = Window.orderBy(F.col("lift").desc(), "w1", "w2")
    return (
        scored.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= COLLOC_K)
        .select("w1", "w2", F.col("c2").alias("pair_count"),
                F.col("rk").cast("int").alias("rk"),
                F.round("lift", 6).alias("lift"))
    )


# ---------------------------------------------------------------------------
# Exact heavy hitters via per-partition Misra-Gries (events)
# ---------------------------------------------------------------------------

HH_K = 8  # heavy = frequency > N/HH_K; MG summaries keep HH_K-1 counters


@register("events_heavy_hitters", f"""
WITH b AS (SELECT length(bin(user_id + 1)) - 1 AS bucket FROM events),
c AS (SELECT bucket, COUNT(*) AS cnt FROM b GROUP BY 1),
t AS (SELECT COUNT(*) AS n FROM events)
SELECT bucket, CAST(cnt AS BIGINT) AS n_events
FROM c CROSS JOIN t WHERE cnt * {HH_K} > n
""")
def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (frequency > N/{HH_K}) in two phases: a
    per-partition MISRA-GRIES sketch (Arrow mapInPandas — each task
    streams its partition through at most {HH_K}-1 counters, constant
    memory regardless of key cardinality) proposes candidates, then one
    filtered recount verifies them exactly. Misra-Gries cannot miss: if a
    key's global count exceeds N/k, its count in at least one partition
    exceeds that partition's share (pigeonhole), and MG(k) retains every
    key above N_p/k — so the candidate union is a superset and the
    recount output EQUALS the naive full GROUP BY, which is exactly what
    the oracle runs (the pruned-path-vs-naive proof pattern again).

    The key is a deterministic power-of-two user bucket
    (length(bin(user_id+1))-1 — exact integer ops in both engines),
    standing in for the skewed entity column the uniform fixture lacks:
    the top bucket always holds ~half the users, so hitters exist at
    every sf. Scale shape: phase 1 is embarrassingly parallel with
    k-sized output per task; phase 2 recounts ONLY keys in the broadcast
    candidate list — the full-cardinality count table is never built.
    """
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        (F.length(F.bin(F.col("user_id") + 1)) - 1).alias("bucket"))

    def mg_partition(batches):
        import pandas as pd

        counters: dict[int, int] = {}
        for pdf in batches:
            for key, cnt in pdf["bucket"].value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
                # reduce to HH_K-1 counters: subtract the minimum from all
                # (the mergeable-summaries generalization of MG's
                # decrement; error stays bounded by the mass removed)
                while len(counters) > HH_K - 1:
                    m = min(counters.values())
                    counters = {k: v - m for k, v in counters.items()
                                if v > m}
        yield pd.DataFrame({"bucket": list(counters.keys())})

    cand = keyed.mapInPandas(mg_partition, "bucket long").distinct()
    nn = ev.agg(F.count(F.lit(1)).alias("n"))
    return (
        keyed.join(F.broadcast(cand), "bucket")   # leftsemi by key list
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(nn))
        .filter(F.col("n_events") * HH_K > F.col("n"))
        .select("bucket", "n_events")
    )
