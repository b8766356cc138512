"""Similarity search over embedding columns (driver extension surface):
brute-force cosine top-k baseline + random-hyperplane LSH bucketing as the
scale path.

Execution shape: every dot product / squared norm is a higher-order
function (`zip_with` + `aggregate`) evaluated per row inside whole-stage
codegen — vectors never explode into (id, pos, val) element rows, so the
only shuffles are the candidate joins on ids/bucket codes. (An earlier
formulation exploded elements and re-grouped per pair: that shuffles
|pairs| x dim rows — at 100 TB the element stream IS the corpus, several
times over.)

Float determinism: products are accumulated as DECIMAL, which is exact and
therefore order-independent — the resulting cosine is bit-identical across
engines and partitionings (same rationale as plans/queries.dsum), so the
DuckDB oracles (which still use their own unnest-SQL) hash-match.

LSH planes are pure integer arithmetic
(((p*73856093 + pos*19349663) % 1000003) / 1000003 - 0.5), pos 1-based —
deterministic, engine-agnostic, seedable without any RNG.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.functions.execution import materialize

DOT_DECIMAL = "decimal(30,12)"
N_PLANES = 8


def _dec_sum(arr: Column) -> Column:
    """Exact (order-independent) sum of a decimal array -> double."""
    return F.aggregate(
        arr, F.lit(0).cast(DOT_DECIMAL),
        lambda acc, x: (acc + x).cast(DOT_DECIMAL),
    ).cast("double")


def dot_product(a: Column, b: Column) -> Column:
    """Decimal-exact dot product of two array<float|double> columns."""
    return _dec_sum(F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DOT_DECIMAL)
    ))


def norm_sq(a: Column) -> Column:
    """Decimal-exact squared L2 norm."""
    return dot_product(a, a)


def _plane_dot(vec: Column, p: int) -> Column:
    """Dot of a vector with deterministic pseudo-noise plane ``p``."""
    # pos must widen to bigint BEFORE the multiply: int*19349663 overflows
    # 32-bit at position >= 111 (ANSI mode throws), i.e. on any embedding
    # wider than 110 dims — the fixtures' 64 dims masked it
    weights = lambda v, pos: (  # noqa: E731
        v.cast("double")
        * (((F.lit(p).cast("bigint") * 73856093
             + pos.cast("bigint") * 19349663) % 1000003)
           / 1000003.0 - 0.5)
    ).cast(DOT_DECIMAL)
    return _dec_sum(F.zip_with(vec, F.sequence(F.lit(1), F.size(vec)), weights))


def _cosine(dot: Column, n2a: Column, n2b: Column) -> Column:
    """Cosine with a zero-norm guard: an all-zero vector scores NULL
    (dropped by every >= threshold filter) instead of raising
    DIVIDE_BY_ZERO under Spark 4's default ANSI mode."""
    return F.when((n2a > 0) & (n2b > 0), dot / (F.sqrt(n2a) * F.sqrt(n2b)))


def bucket_code(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane LSH: n_planes sign bits -> integer bucket code,
    computed in one projection (no explode, no shuffle)."""
    bits = [
        F.when(_plane_dot(vec, p) >= 0,
               F.lit(1 << p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        for p in range(n_planes)
    ]
    return reduce(lambda x, y: x + y, bits)


def lsh_bucket_codes(df: DataFrame, n_planes: int = N_PLANES,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(id, bucket) per vector."""
    return df.select(F.col(id_col),
                     bucket_code(F.col(vec_col), n_planes).alias("bucket"))


def knn_bruteforce(df: DataFrame, query_ids, k: int = 5,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   exclude_same: str | None = None) -> DataFrame:
    """Top-k cosine neighbors for each query vector (self excluded).

    The query side is a handful of rows — broadcast it and score the
    corpus in a single narrow pass; ranking is the only shuffle
    (partitionBy query). Deterministic: (cosine DESC, c_id ASC).
    ``exclude_same`` names a column whose value must DIFFER between query
    and candidate (hard-negative mining: same-label pairs are excluded
    before ranking) — one owner of the brute-force shape for both the
    kNN and hard-negative surfaces.
    """
    from pyspark.sql import Window

    extra = [F.col(exclude_same)] if exclude_same else []
    # corpus-side repartition: the per-pair decimal dot products below are
    # the cost, and a single-file scan would run them in one task.
    # (Round-11 note: routing this norm through the Arrow kernel was
    # A/B'd and REVERTED — the projection is consumed by both join
    # sides, so the Python node runs 2-4x per query and its fixed
    # round-trip cost exceeds the interpreted HOF's at any |rows| the
    # bench sees; the per-PAIR dots below stay on the Arrow kernel,
    # where |pairs| x dim does pay.)
    with_norm = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    ).select(
        F.col(id_col), F.col(vec_col), *extra,
        norm_sq(F.col(vec_col)).alias("_n2"),
    )
    q = with_norm.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"),
        F.col("_n2").alias("_qn"),
        *([F.col(exclude_same).alias("_qx")] if exclude_same else []),
    )
    c = with_norm.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("_cv"),
        F.col("_n2").alias("_cn"),
        *([F.col(exclude_same).alias("_cx")] if exclude_same else []),
    )
    flt = F.col("q_id") != F.col("c_id")
    if exclude_same:
        flt = flt & (F.col("_qx") != F.col("_cx"))
    from traffic_data_pipeline_spark.functions.arrowmath import (
        with_exact_dot,
    )

    pairs = (
        with_exact_dot(
            c.crossJoin(F.broadcast(q)).filter(flt)
            .select("q_id", "c_id", "_qn", "_cn", "_qv", "_cv"),
            "_qv", "_cv", "_dot")
        .select("q_id", "c_id",
                _cosine(F.col("_dot"),
                        F.col("_qn"), F.col("_cn")).alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


def ann_lsh_pairs(df: DataFrame, n_planes: int = N_PLANES, min_cosine: float = 0.0,
                  vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN via LSH buckets: candidate pairs share a bucket code, then exact
    cosine on candidates only — the O(n^2) pair space never materializes.

    One vector = one bucket code, so the bucket self-join yields each pair
    at most once (no dedup needed). Hot buckets are the skew risk: AQE
    skew-join splits them at runtime.
    """
    from traffic_data_pipeline_spark.functions.arrowmath import (
        with_vec_stats,
    )

    # Spread vectors across tasks first: a single-file scan is ONE
    # partition, and the exact-cosine pass below (vectorized decimal
    # kernels over |candidates| x dim elements) is the query's dominant
    # compute — serial, it was 2.2s of a 4s query at sf0.1. Explicit
    # count: AQE would coalesce the small shuffle back to one partition.
    # Bucket codes + norms in ONE Arrow pass (round-11, guide §4.2):
    # the n_planes+1 interpreted HOF folds per row are the vectorized
    # with_vec_stats kernel now (identical DECIMAL(30,12) contract).
    coded = materialize(
        with_vec_stats(
            df.repartition(df.sparkSession.sparkContext.defaultParallelism,
                           F.col(id_col))
            .select(F.col(id_col), F.col(vec_col)),
            vec_col, norm_alias="_n2", bucket_alias="bucket",
            n_planes=n_planes,
        ))  # self-joined below: one materialization, two cache readers
    a = coded.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"),
                     F.col("_n2").alias("_qn"), "bucket")
    b = coded.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("_cv"),
                     F.col("_n2").alias("_cn"), "bucket")
    from traffic_data_pipeline_spark.functions.arrowmath import (
        with_exact_dot,
    )

    return (
        with_exact_dot(
            a.join(b, "bucket")
            .filter(F.col("q_id") < F.col("c_id"))
            .select("q_id", "c_id", "_qn", "_cn", "_qv", "_cv"),
            "_qv", "_cv", "_dot")
        .select("q_id", "c_id",
                _cosine(F.col("_dot"),
                        F.col("_qn"), F.col("_cn")).alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str = "vec_id",
                         max_iters: int = 30) -> DataFrame:
    """Exact connected components by min-label propagation to fixpoint.

    ``nodes``: one row per id; ``edges``: (q_id, c_id) undirected pairs.
    Returns (id_col, canonical_id) where canonical_id is the component's
    minimum id. The fixpoint loop runs on the edge-induced subgraph only
    (isolated nodes are their own canonical id by definition and rejoin
    after convergence) — on a sparse near-dup graph that keeps each
    round's frames |V_edges|-sized, not corpus-sized.

    Iterative algorithms are driver-loop-shaped by necessity (GraphX's
    Pregel runs the same supersteps): each round is one join + min-agg
    taking every node to min(own label, neighbors' labels), followed by a
    pointer-jumping hop (label <- label of own label, a labels self-join)
    that compresses chains — path halving turns O(diameter) rounds into
    ~O(log diameter) (measured 8 -> 4 rounds on a chain-heavy near-dup
    graph). Every round localCheckpoints — the plan stays flat instead of
    growing by one join per round — and the convergence probe is a scalar
    sum over the checkpointed frame's change flags, the sanctioned
    driver-side scalar shape. Stopping when the NEIGHBOR step changes
    nothing is exact: that fixpoint forces equal labels across every
    edge, i.e. the component minimum everywhere (the jump only
    accelerates; it cannot change a converged labeling).
    """
    sym = edges.select(F.col("q_id").alias("src"), F.col("c_id").alias("dst"))
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # Iterate over edge-touched nodes ONLY: near-dup graphs are sparse, so
    # most of a corpus is isolated vertices whose label can never change —
    # carrying them through every round's joins multiplies each iteration
    # by |V|/|V_edges| for nothing (at 100 TB that ratio is enormous; the
    # fixture corpus is ~60% isolated). Isolated nodes rejoin as
    # label-self rows at the end.
    labels = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    ).localCheckpoint()
    for _ in range(max_iters):
        nmin = (
            sym.join(labels.select(F.col("v").alias("dst"), "lbl"), "dst")
            .groupBy("src").agg(F.min("lbl").alias("nlbl"))
        )
        stepped = (
            labels.join(nmin.select(F.col("src").alias("v"), "nlbl"),
                        "v", "left")
            .select(
                "v",
                F.least("lbl", F.coalesce("nlbl", "lbl")).alias("_new"),
                (F.coalesce("nlbl", F.col("lbl")) < F.col("lbl"))
                .cast("long").alias("_chg"),
            )
        )
        hop = stepped.select(F.col("v").alias("_k"),
                             F.col("_new").alias("_hop"))
        new = (
            stepped.join(hop, stepped["_new"] == hop["_k"], "left")
            .select(
                "v",
                F.least("_new", F.coalesce("_hop", "_new")).alias("lbl"),
                "_chg",
            )
            .localCheckpoint()
        )
        changed = new.agg(F.sum("_chg")).collect()[0][0]
        # rebinding drops the previous round's checkpoint reference; its
        # blocks are reclaimed by the ContextCleaner once the proxy GCs.
        # For very long loops over large label tables, an explicit
        # persist/unpersist pair would bound peak storage deterministically
        labels = new.select("v", "lbl")
        if not changed:
            break
    return (
        nodes.select(F.col(id_col).alias("v"))
        .join(labels, "v", "left")
        .select(
            F.col("v").alias(id_col),
            F.coalesce("lbl", F.col("v")).alias("canonical_id"),
        )
    )


def embedding_near_dup(df: DataFrame, threshold: float = 0.85,
                       n_planes: int = N_PLANES,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       exact_components: bool = True) -> DataFrame:
    """Embedding-cosine near-duplicate grouping (driver extension).

    Candidates come from the LSH buckets; edges are exact-cosine pairs
    >= threshold. The default iterates min-id label propagation to
    fixpoint (connected_components), so chains collapse to one canonical
    id per component — exact semantics at similar measured cost to the
    approximation (2.5s vs 1.6s at sf0.1; the CC loop converges in a few
    rounds because near-dup graphs are shallow). ``exact_components=
    False`` stops after the first round — each vector's canonical id is
    the minimum among itself and its DIRECT neighbors, the bounded
    three-shuffle compromise some pipelines prefer when any iteration is
    off the table; it splits chains (a~b~c with a!~c gets two labels).
    Output: one row per vector (id, canonical_id).
    """
    pairs = materialize(ann_lsh_pairs(df, n_planes, threshold, vec_col, id_col)
                        .select("q_id", "c_id"))  # read twice by the union below
    if exact_components:
        return connected_components(df.select(id_col), pairs, id_col)
    neigh = pairs.unionByName(
        pairs.select(F.col("c_id").alias("q_id"), F.col("q_id").alias("c_id"))
    ).withColumnRenamed("q_id", id_col)
    return (
        df.select(id_col)
        .join(neigh, id_col, "left")
        .groupBy(id_col)
        .agg(
            F.least(F.col(id_col),
                    F.coalesce(F.min("c_id"), F.col(id_col)))
            .alias("canonical_id")
        )
    )


def ivf_assign(df: DataFrame, centroids: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id",
               with_norm: DataFrame | None = None) -> DataFrame:
    """IVF inverted-list assignment: each vector -> its nearest centroid by
    cosine (ties to the smaller centroid id). Centroids broadcast; the only
    shuffle is the per-vector argmax (K rows per vector, K small).
    ``with_norm`` (id, vec, _n2) lets callers that already computed the
    corpus norm projection pass it in instead of re-running the decimal
    HOF pass over the whole corpus — the module's dominant cost."""
    c = centroids.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"),
        norm_sq(F.col(vec_col)).alias("_cn"),
    )
    if with_norm is None:
        # corpus x K centroid dots are the cost; spread a single-file scan
        with_norm = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        ).select(F.col(id_col), F.col(vec_col),
                 norm_sq(F.col(vec_col)).alias("_n2"))
    v = with_norm
    # corpus x K dots through the Arrow exact-dot kernel (round-10,
    # guide §4.2): identical DECIMAL(30,12) per-element units, vectorized
    # (functions/arrowmath.py); the cosine ratio stays in the JVM
    from traffic_data_pipeline_spark.functions.arrowmath import (
        with_exact_dot,
    )

    scored = (
        with_exact_dot(
            v.crossJoin(F.broadcast(c))
            .select(id_col, "_n2", "_cid", "_cn",
                    F.col(vec_col).alias("_v"), "_cvec"),
            "_v", "_cvec", "_dot")
        .withColumn("_cos", _cosine(F.col("_dot"),
                                    F.col("_n2"), F.col("_cn")))
    )
    return scored.groupBy(id_col).agg(
        F.max_by("_cid", F.struct(F.col("_cos"), (-F.col("_cid")).alias("_nid")))
        .alias("centroid_id")
    )


def knn_ivf(df: DataFrame, query_ids, k: int = 5,
            n_centroids: int = 8, n_probe: int = 8,
            vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_centroids
    inverted lists, probe only each query's n_probe nearest lists, exact
    cosine inside them. With n_probe == n_centroids this is EXACTLY
    brute-force (every list probed) — the registered driver query runs it
    that way against the brute-force SQL oracle; reduced-probe recall is
    unit-tested.

    Centroid seeding is deterministic (the n_centroids lowest ids) — a
    production system would k-means/k-means|| these; the plumbing
    (broadcast centroids, inverted-list join, per-list exact rerank) is
    identical and that is what the scale design cares about: the corpus
    is scanned once for assignment, and queries touch only their probed
    lists instead of the whole corpus.
    """
    from pyspark.sql import Window

    centroids = df.orderBy(id_col).limit(n_centroids)
    # ONE corpus norm projection feeds assignment, queries, and members —
    # materialized because three consumers otherwise re-run the decimal
    # HOF pass (the query's dominant compute) once each
    with_norm = materialize(df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    ).select(F.col(id_col), F.col(vec_col),
             norm_sq(F.col(vec_col)).alias("_n2")))
    assign = ivf_assign(df, centroids, vec_col, id_col, with_norm=with_norm)
    q = with_norm.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv"),
        F.col("_n2").alias("_qn"),
    )
    # probe lists per query
    c = centroids.select(F.col(id_col).alias("_cid"),
                         F.col(vec_col).alias("_cvec"),
                         norm_sq(F.col(vec_col)).alias("_cn"))
    wq = Window.partitionBy("q_id").orderBy(
        F.col("_ccos").desc(), F.col("_cid"))
    probes = (
        q.crossJoin(F.broadcast(c))
        .withColumn("_ccos", _cosine(dot_product(F.col("_qv"), F.col("_cvec")),
                                     F.col("_qn"), F.col("_cn")))
        .withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("q_id", "_qv", "_qn", F.col("_cid").alias("centroid_id"))
    )
    # candidates = members of probed lists
    members = assign.join(
        with_norm.select(F.col(id_col), F.col(vec_col).alias("_cv"),
                         F.col("_n2").alias("_cn2")),
        id_col,
    ).select(F.col(id_col).alias("c_id"), "centroid_id", "_cv", "_cn2")
    from traffic_data_pipeline_spark.functions.arrowmath import (
        with_exact_dot,
    )

    pairs = (
        with_exact_dot(
            probes.join(members, "centroid_id")
            .filter(F.col("q_id") != F.col("c_id"))
            .select("q_id", "c_id", "_qn", "_cn2", "_qv", "_cv"),
            "_qv", "_cv", "_dot")
        .select("q_id", "c_id",
                _cosine(F.col("_dot"),
                        F.col("_qn"), F.col("_cn2")).alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )
