"""IVF ANN behavior tests: full-probe equivalence to brute force (also
driver-gated via the SQL oracle) and reduced-probe candidate discipline."""

from __future__ import annotations

import pytest

from traffic_data_pipeline_spark.functions.similarity import (
    ivf_assign,
    knn_bruteforce,
    knn_ivf,
)
from traffic_data_pipeline_spark.sources.tables import load_table

QUERIES = list(range(10))


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").cache()
    yield e
    e.unpersist()


def test_full_probe_equals_bruteforce(emb):
    bf = knn_bruteforce(emb, QUERIES, k=5)
    ivf = knn_ivf(emb, QUERIES, k=5, n_centroids=8, n_probe=8)
    assert bf.exceptAll(ivf).count() == 0
    assert ivf.exceptAll(bf).count() == 0


def test_assignment_covers_corpus(emb, spark):
    centroids = emb.orderBy("vec_id").limit(8)
    assign = ivf_assign(emb, centroids)
    assert assign.count() == emb.count()
    n_lists = assign.select("centroid_id").distinct().count()
    assert 1 < n_lists <= 8


def test_reduced_probe_subset_and_exact_scores(emb):
    """Reduced probing returns fewer-or-equal rows; every returned score
    must equal the brute-force cosine for that pair (IVF approximates by
    pruning candidates, never by approximating the metric)."""
    bf = {(r.q_id, r.c_id): r.cosine
          for r in knn_bruteforce(emb, QUERIES, k=50).collect()}
    rows = knn_ivf(emb, QUERIES, k=5, n_centroids=8, n_probe=2).collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, 0)
        per_q[r.q_id] += 1
        if (r.q_id, r.c_id) in bf:
            assert r.cosine == pytest.approx(bf[(r.q_id, r.c_id)], abs=1e-12)
    assert all(n <= 5 for n in per_q.values())


def test_connected_components_chain(spark):
    """A path graph a-b-c-d: one-round min-id splits it (d -> c), the
    fixpoint loop must collapse everything to the global min."""
    from traffic_data_pipeline_spark.functions.similarity import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(6)], "vec_id bigint")
    # chain 0-1-2-3, separate pair 4-5
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "q_id bigint, c_id bigint")
    got = {r.vec_id: r.canonical_id
           for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}
