"""Round-3 corpus-mining extension queries (driver-mandated first-class
surface): substring-level exact dedup (RefinedWeb-style duplicated-span
accounting), semantic dedup (SemDeDup-style cluster-then-prune over
embeddings), TF-IDF sparse-vector similarity search, and fixed-point
PageRank over the event-transition graph — each with a DuckDB oracle.

Registered into the same QUERIES/ORACLES dicts as plans/queries.py.
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
from traffic_data_pipeline_spark.functions.text import ngram_array, token_array
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
N_SEM_CLUSTERS = 8
N_SEM_DUPED = 50       # ids < this get a perturbed near-duplicate copy
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
cent AS (SELECT vec_id AS cid FROM corpus ORDER BY vec_id LIMIT {N_SEM_CLUSTERS}),
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
    sum_c |c|^2 instead of N^2: with k scaled as N/const, per-cluster
    membership stays bounded and the pair stream grows linearly. Skewed
    (over-full) clusters are the failure mode — AQE skew-join splits them,
    and the lsh_hot_band_overflow cap pattern applies unchanged if a
    degenerate centroid absorbs the corpus. Seeds are the 8 lowest ids
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
    centroids = corpus.orderBy("vec_id").limit(N_SEM_CLUSTERS)
    assign = ivf_assign(corpus, centroids, with_norm=with_norm)
    m = with_norm.join(assign, "vec_id")
    a = m.select(F.col("centroid_id").alias("_c"), F.col("vec_id").alias("a_id"),
                 F.col("embedding").alias("_av"), F.col("_n2").alias("_an"))
    b = m.select(F.col("centroid_id").alias("_c"), F.col("vec_id").alias("b_id"),
                 F.col("embedding").alias("_bv"), F.col("_n2").alias("_bn"))
    dup = (
        a.join(b, ["_c"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("_cos", _cosine(dot_product(F.col("_av"), F.col("_bv")),
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
