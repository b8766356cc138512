"""Hot-band cap: the one input that breaks an LSH band join at corpus
scale is a degenerate bucket (empty strings, template boilerplate) whose
d members emit d(d-1)/2 candidate rows. The cap must bound that join
while losing ONLY pairs whose every shared band is hot — and the overflow
accounting must say exactly what was skipped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.functions.dedup import (
    lsh_hot_band_overflow,
    lsh_pairs_from_bands,
    minhash_bands,
    minhash_signatures,
    shingle_sets,
)

N_BOILER = 40
CAP = 10


@pytest.fixture(scope="module")
def boiler_bands(spark):
    """A boilerplate-heavy corpus: N_BOILER docs sharing one template
    (one band bucket of size >= N_BOILER in every band), plus distinct
    near-dup pairs and singletons that the cap must leave untouched."""
    template = ("subscribe to our newsletter terms of service apply "
                "all rights reserved contact us at example dot com")
    rows = [(i, template) for i in range(N_BOILER)]
    for j in range(10):
        # each pair's body is unique to the pair (no cross-pair phrasing,
        # or the pair docs would form their own hot bucket)
        base = " ".join(f"w{j}q{k}z{(j * 31 + k * 7) % 97}"
                        for k in range(14))
        rows.append((100 + 2 * j, base + " alpha"))
        rows.append((101 + 2 * j, base + " beta"))
    for j in range(10):
        rows.append((200 + j, f"totally unrelated singleton text {j} "
                              f"nothing here repeats elsewhere {j * 17}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bands = minhash_bands(minhash_signatures(shingle_sets(docs)))
    bands.persist().count()
    yield bands
    bands.unpersist()


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_cap_is_a_pure_subset_and_keeps_non_boiler_recall(boiler_bands):
    full = _pairs(lsh_pairs_from_bands(boiler_bands, min_sim=0.5))
    capped = _pairs(lsh_pairs_from_bands(boiler_bands, min_sim=0.5,
                                         max_bucket=CAP))
    assert capped <= full                      # the cap never invents pairs
    boiler_ids = set(range(N_BOILER))
    lost = full - capped
    # every lost pair involves only boilerplate docs (their buckets are the
    # hot ones); identical-template content belongs to exact dedup anyway
    assert lost, "fixture must actually trip the cap"
    assert all(a in boiler_ids and b in boiler_ids for a, b in lost)
    # 100% recall on the non-boilerplate near-dup pairs
    non_boiler_full = {(a, b) for a, b in full if a not in boiler_ids}
    assert non_boiler_full  # the alpha/beta variants are near-dups
    assert non_boiler_full <= capped


def test_cap_at_max_bucket_size_is_identity(boiler_bands):
    full = _pairs(lsh_pairs_from_bands(boiler_bands, min_sim=0.5))
    relaxed = _pairs(lsh_pairs_from_bands(boiler_bands, min_sim=0.5,
                                          max_bucket=N_BOILER + 50))
    assert relaxed == full


def test_bounded_join_size(boiler_bands):
    """No surviving band bucket exceeds the cap, so any band's join
    contribution is at most C(cap, 2) — the property that holds at any
    corpus size."""
    hot = (boiler_bands.groupBy("band_key")
           .agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") > CAP).select("band_key"))
    survivors = (boiler_bands.join(hot, "band_key", "left_anti")
                 .groupBy("band_key").agg(F.count(F.lit(1)).alias("n")))
    assert survivors.agg(F.max("n")).first()[0] <= CAP


def test_overflow_accounting_matches_first_principles(boiler_bands):
    row = lsh_hot_band_overflow(boiler_bands, max_bucket=CAP).first()
    counts = (boiler_bands.groupBy("band_key")
              .agg(F.count(F.lit(1)).alias("n")).collect())
    hot_keys = {r.band_key for r in counts if r.n > CAP}
    assert row.n_hot_bands == len(hot_keys)
    assert row.n_band_rows_skipped == sum(r.n for r in counts
                                          if r.band_key in hot_keys)
    per_doc = (boiler_bands.filter(F.col("band_key").isin(hot_keys))
               .groupBy("doc_id").agg(F.count(F.lit(1)).alias("lost"))
               .collect())
    assert row.n_docs_capped == len(per_doc)
    assert row.n_docs_blinded == sum(1 for r in per_doc if r.lost == 4)
    # all-identical boilerplate agrees on every band -> fully blinded
    assert row.n_docs_blinded >= N_BOILER
