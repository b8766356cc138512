"""Similarity search over embedding columns (driver extension surface):
brute-force cosine top-k baseline + random-hyperplane LSH bucketing as the
scale path.

Float determinism: dot products and squared norms are accumulated as
DECIMAL over the exploded (vector, position) stream, so the resulting
cosine is bit-identical across engines and partitionings (same rationale
as plans/queries.dsum). At fixture scale (500 x 64-dim) the explode-join
materializes ~2M rows — trivial. At corpus scale the brute-force path is
the per-bucket verifier behind the LSH candidate generator, never the
global strategy.

LSH planes are pure integer arithmetic
(((p*73856093 + j*19349663) % 1000003) / 1000003 - 0.5) — deterministic,
engine-agnostic, and seedable without any RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOT_DECIMAL = "decimal(30,12)"
N_PLANES = 8


def vector_elements(df: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Explode to (id, pos 1-based, val double)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)),
    ).select(
        F.col(id_col),
        (F.col("pos") + 1).alias("pos"),
        F.col("col").cast("double").alias("val"),
    )


def vector_norms(elems: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Deterministic squared norm per vector (decimal accumulation)."""
    return elems.groupBy(id_col).agg(
        F.sum((F.col("val") * F.col("val")).cast(DOT_DECIMAL))
        .cast("double").alias("norm_sq")
    )


def cosine_pairs(q_elems: DataFrame, c_elems: DataFrame,
                 q_norms: DataFrame, c_norms: DataFrame) -> DataFrame:
    """Exact cosine for every (query, corpus) pair present in the inputs.

    elems frames: (vec_id, pos, val). Output: q_id, c_id, cosine.
    """
    q = q_elems.select(F.col("vec_id").alias("q_id"), "pos",
                       F.col("val").alias("qv"))
    c = c_elems.select(F.col("vec_id").alias("c_id"), "pos",
                       F.col("val").alias("cv"))
    dots = (
        q.join(c, "pos")
        .groupBy("q_id", "c_id")
        .agg(F.sum((F.col("qv") * F.col("cv")).cast(DOT_DECIMAL))
             .cast("double").alias("dot"))
    )
    return (
        dots.join(q_norms.select(F.col("vec_id").alias("q_id"),
                                 F.col("norm_sq").alias("qn")), "q_id")
        .join(c_norms.select(F.col("vec_id").alias("c_id"),
                             F.col("norm_sq").alias("cn")), "c_id")
        .select(
            "q_id", "c_id",
            (F.col("dot") / (F.sqrt("qn") * F.sqrt("cn"))).alias("cosine"),
        )
    )


def knn_bruteforce(df: DataFrame, query_ids, k: int = 5,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Top-k cosine neighbors for each query vector (self excluded).

    Deterministic ranking: (cosine DESC, c_id ASC) row_number <= k.
    """
    from pyspark.sql import Window

    elems = vector_elements(df, vec_col, id_col)
    norms = vector_norms(elems, id_col)
    q_elems = elems.filter(F.col(id_col).isin(list(query_ids)))
    pairs = cosine_pairs(q_elems, elems, norms, norms).filter(
        F.col("q_id") != F.col("c_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def lsh_bucket_codes(df: DataFrame, n_planes: int = N_PLANES,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Random-hyperplane LSH: n_planes sign bits -> integer bucket code.

    Plane weights are the deterministic integer-arithmetic pseudo-noise
    above; the per-(vector, plane) dot is a decimal-accumulated aggregate.
    """
    elems = vector_elements(df, vec_col, id_col)
    planes = (
        elems.select(id_col, "pos", "val")
        .join(
            # plane table: (p, pos) weights — generated in-engine, no RNG
            elems.sparkSession.range(n_planes).select(F.col("id").alias("p"))
            .crossJoin(elems.select("pos").distinct()),
            "pos",
        )
        .withColumn(
            "w",
            ((F.col("p") * 73856093 + F.col("pos") * 19349663) % 1000003)
            / 1000003.0 - 0.5,
        )
    )
    dots = (
        planes.groupBy(id_col, "p")
        .agg(F.sum((F.col("val") * F.col("w")).cast(DOT_DECIMAL))
             .cast("double").alias("dot"))
    )
    return dots.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("dot") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))"))
            .otherwise(0)
        ).alias("bucket")
    )


def ann_lsh_pairs(df: DataFrame, n_planes: int = N_PLANES, min_cosine: float = 0.0,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN via LSH buckets: candidate pairs share a bucket code, then exact
    cosine on candidates only. Output: doc pairs with cosine >= min_cosine."""
    codes = lsh_bucket_codes(df, n_planes, vec_col, id_col)
    a = codes.select(F.col(id_col).alias("q_id"), "bucket")
    b = codes.select(F.col(id_col).alias("c_id"), "bucket")
    cand = a.join(b, "bucket").filter(F.col("q_id") < F.col("c_id")) \
            .select("q_id", "c_id").distinct()
    elems = vector_elements(df, vec_col, id_col)
    norms = vector_norms(elems, id_col)
    # exact cosine on candidate pairs ONLY — the pair space never appears
    dots = (
        cand
        .join(elems.select(F.col(id_col).alias("q_id"), "pos",
                           F.col("val").alias("qv")), "q_id")
        .join(elems.select(F.col(id_col).alias("c_id"), "pos",
                           F.col("val").alias("cv")), ["c_id", "pos"])
        .groupBy("q_id", "c_id")
        .agg(F.sum((F.col("qv") * F.col("cv")).cast(DOT_DECIMAL))
             .cast("double").alias("dot"))
    )
    return (
        dots
        .join(norms.select(F.col(id_col).alias("q_id"), F.col("norm_sq").alias("qn")), "q_id")
        .join(norms.select(F.col(id_col).alias("c_id"), F.col("norm_sq").alias("cn")), "c_id")
        .select("q_id", "c_id",
                (F.col("dot") / (F.sqrt("qn") * F.sqrt("cn"))).alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )
