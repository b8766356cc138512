"""Oracle gate + semantic checks for the round-10 staging area
(plans/staged_ops_r10.py) — the same query-vs-oracle compare every
registered query passes, run BEFORE these names enter the driver
registry, plus a freeze guard pinning that they stay out of it this
round (the round-9 promotion backlog drains first)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.oracle import assert_matches_oracle
from traffic_data_pipeline_spark.plans.staged_ops_r10 import (
    STAGED_R10_ORACLES,
    STAGED_R10_QUERIES,
)


@pytest.mark.parametrize("name", sorted(STAGED_R10_ORACLES))
def test_staged_r10_matches_oracle(spark, sf_dir_oracle, name):
    assert_matches_oracle(
        STAGED_R10_QUERIES[name](spark, sf_dir_oracle),
        STAGED_R10_ORACLES[name], sf_dir_oracle)


# Exchange budgets (the test_plan_shapes contract, applied at staging
# time): (max hash exchanges, min broadcast exchanges) in the live plan
# at the smoke fixture. Fold into tests/test_plan_shapes.py at promotion.
STAGED_R10_CAPS = {
    "events_user_deltapresence": (2, 1),  # live plan reads the
                                          # checkpointed (pu, pr) cell
                                          # frame: the 4-row bucket fold
                                          # + cell-total broadcast (the
                                          # Expand multi-distinct cell
                                          # fold is paid at build)
    "dedup_impact_by_lang_source": (3, 1),  # rides the cached pair
                                          # stream; ONE removed-id
                                          # distinct (broadcast back) +
                                          # ONE (lang, source) fold
    "streaming_rfm_monitor": (0, 0),      # live plan reads the published
                                          # cube parquet; per-batch folds
                                          # + the shared shard-rank cube
                                          # run inside foreachBatch
    "events_qi_generalization_ladder": (1, 0),  # live plan reads the
                                          # checkpointed (gran, type,
                                          # cell) k frame: the 3-row
                                          # rung fold (the in-row ladder
                                          # explode + Expand distinct
                                          # fold are paid at build)
    "streaming_deltapresence_monitor": (0, 0),  # live plan reads the
                                          # published cube parquet;
                                          # per-batch distincts + the
                                          # shared cell fold run inside
                                          # foreachBatch
}


@pytest.mark.parametrize("name", sorted(STAGED_R10_CAPS))
def test_staged_r10_exchange_budget(spark, sf_dir, name):
    from tests import test_plan_shapes as shapes

    max_exch, min_bcast = STAGED_R10_CAPS[name]
    exch, bcast = shapes._count_live(STAGED_R10_QUERIES[name](spark, sf_dir))
    assert exch <= max_exch, (
        f"{name}: {exch} hash exchanges (cap {max_exch})")
    assert bcast >= min_bcast, (
        f"{name}: {bcast} broadcast exchanges (expected >= {min_bcast})")


def test_staged_r10_names_not_registered():
    """Round-9 registration freeze: round-10 staged ops must not leak
    into the driver registry until the round-9 promotion backlog drains
    and round 10 promotes them."""
    import __spark_entry__ as e

    live = set(e.queries())
    assert set(STAGED_R10_QUERIES).isdisjoint(live)
    assert set(STAGED_R10_ORACLES) == set(STAGED_R10_QUERIES)
    assert set(STAGED_R10_CAPS) == set(STAGED_R10_QUERIES)


def test_deltapresence_buckets_partition_cells(spark, sf_dir_oracle):
    """Bucket rows partition the QI cell universe (n_cells sums to the
    distinct (type, hour) cells, cell_share sums to 1), user masses obey
    private <= public per bucket, and the exact-integer edge buckets
    carry their defining deltas (0.0 at delta=0, 1.0 at delta=1)."""
    from traffic_data_pipeline_spark.sources.tables import load_table

    rows = STAGED_R10_QUERIES["events_user_deltapresence"](
        spark, sf_dir_oracle).collect()
    assert rows
    n_cells = (load_table(spark, sf_dir_oracle, "events")
               .filter(F.col("user_id").isNotNull())
               .select("event_type",
                       F.date_trunc("hour", F.col("ts")).alias("hr"))
               .distinct().count())
    assert sum(r.n_cells for r in rows) == n_cells
    assert abs(sum(r.cell_share for r in rows) - 1.0) < 1e-6
    labels = {"delta=0", "0<delta<0.5", "0.5<=delta<1", "delta=1"}
    assert {r.delta_bucket for r in rows} <= labels
    by = {r.delta_bucket: r for r in rows}
    for r in rows:
        assert r.n_private_users <= r.n_public_users, r.delta_bucket
    if "delta=0" in by:
        assert by["delta=0"].max_delta == 0.0
        assert by["delta=0"].n_private_users == 0
    if "delta=1" in by:
        assert by["delta=1"].max_delta == 1.0
        assert (by["delta=1"].n_private_users
                == by["delta=1"].n_public_users)
    if "0<delta<0.5" in by:
        assert 0.0 < by["0<delta<0.5"].max_delta < 0.5
    if "0.5<=delta<1" in by:
        assert 0.5 <= by["0.5<=delta<1"].max_delta < 1.0


def test_qi_ladder_monotone_and_consistent(spark, sf_dir_oracle):
    """Coarser generalization can only merge cells: up the ladder
    (hour -> 4hour -> day) the cell count is non-increasing, min cell
    size is non-decreasing, and k>=K coverage (cell AND event share) is
    non-decreasing; every rung accounts for the same event universe;
    and the hour rung's k>=K cell count matches the registered
    k-anonymity audit's bucket cube (same QI, same K boundary)."""
    from traffic_data_pipeline_spark.plans.queries import QUERIES
    from traffic_data_pipeline_spark.plans.staged_ops_r10 import QI_LADDER

    rows = {r.qi_granularity: r
            for r in STAGED_R10_QUERIES["events_qi_generalization_ladder"](
                spark, sf_dir_oracle).collect()}
    assert set(rows) == {g for g, _ in QI_LADDER}
    ladder = [rows[g] for g, _ in QI_LADDER]  # fine -> coarse
    assert len({r.n_events for r in ladder}) == 1
    for fine, coarse in zip(ladder, ladder[1:]):
        assert coarse.n_cells <= fine.n_cells
        assert coarse.min_k >= fine.min_k
        assert coarse.k5_cell_share >= fine.k5_cell_share
        assert coarse.k5_event_share >= fine.k5_event_share
    # hour rung == the registered k-anonymity audit's k>=5 universe
    # (its buckets split at k=5: 'k=1' + '2<=k<5' below, the rest above)
    kanon = QUERIES["events_user_kanonymity"](
        spark, sf_dir_oracle).collect()
    below = sum(r.n_cells for r in kanon
                if r.anonymity_bucket in ("k=1", "2<=k<5"))
    total = sum(r.n_cells for r in kanon)
    assert rows["hour"].n_cells == total
    assert rows["hour"].n_cells_k_ge_5 == total - below


def test_joint_cell_folds_to_both_registered_marginals(
        spark, sf_dir_oracle):
    """The joint (lang x source) audit reconciles EXACTLY with both
    registered single-axis audits: folding its counts over source
    reproduces dedup_impact_by_lang's integer columns row-for-row, and
    folding over lang reproduces dedup_impact_by_source's — the
    Simpson's-paradox audit is an exact refinement, not a re-estimate."""
    from traffic_data_pipeline_spark.plans.queries import QUERIES

    joint = STAGED_R10_QUERIES["dedup_impact_by_lang_source"](
        spark, sf_dir_oracle).collect()
    assert joint

    def fold(rows, key):
        out = {}
        for r in rows:
            k = getattr(r, key)
            a = out.setdefault(k, [0, 0, 0, 0])
            a[0] += r.n_docs
            a[1] += r.n_removed
            a[2] += r.n_tokens
            a[3] += r.tokens_removed
        return out

    by_lang = {r.lang: (r.n_docs, r.n_removed, r.n_tokens,
                        r.tokens_removed)
               for r in QUERIES["dedup_impact_by_lang"](
                   spark, sf_dir_oracle).collect()}
    assert {k: tuple(v) for k, v in fold(joint, "lang").items()} == by_lang
    by_src = {r.source: (r.n_docs, r.n_removed, r.n_tokens,
                         r.tokens_removed)
              for r in QUERIES["dedup_impact_by_source"](
                  spark, sf_dir_oracle).collect()}
    assert {k: tuple(v) for k, v in fold(joint, "source").items()} == by_src


def test_streaming_deltapresence_crash_replay_equals_batch(
        spark, sf_dir_oracle, tmp_path):
    """Stop/resume AND append-then-crash replay for the δ-presence
    monitor: the published cube must equal the staged batch audit on
    the full history, and a replay of the recorded last batch under its
    recorded batchId must change nothing."""
    from tests.streaming_replay import capturing, replay_last
    from traffic_data_pipeline_spark.plans.queries import run_available_now
    from traffic_data_pipeline_spark.plans.staged_ops_r10 import (
        _delta_handle,
        _delta_seed,
    )
    from traffic_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir_oracle, "events").select(
        "event_id", "ts", "event_type", "user_id", "value")
    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _delta_seed(spark, state_dir, out_dir)
    handle = _delta_handle(spark, state_dir, out_dir)
    recording_handle, batch_caps = capturing(handle, tmp_path)

    def run_once():
        stream = (spark.readStream
                  .schema("ts timestamp, event_type string, "
                          "user_id long, value double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        run_available_now(
            spark, "streaming_delta_test",
            start=lambda: (stream.writeStream.foreachBatch(recording_handle)
                           .option("checkpointLocation", ckpt)
                           .trigger(availableNow=True).start()))

    ev.filter(F.col("event_id") % 3 == 0) \
        .select("ts", "event_type", "user_id", "value") \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    mid = {r.delta_bucket: r.n_cells
           for r in spark.read.parquet(out_dir).collect()}
    for r in (1, 2):
        ev.filter(F.col("event_id") % 3 == r) \
            .select("ts", "event_type", "user_id", "value") \
            .coalesce(1).write.mode("append").parquet(src)
    run_once()

    want = {(r.delta_bucket, r.n_cells, r.n_public_users,
             r.n_private_users, r.max_delta, r.cell_share)
            for r in STAGED_R10_QUERIES["events_user_deltapresence"](
                spark, sf_dir_oracle).collect()}

    def cube():
        return {(r.delta_bucket, r.n_cells, r.n_public_users,
                 r.n_private_users, r.max_delta, r.cell_share)
                for r in spark.read.parquet(out_dir).collect()}

    assert cube() == want
    # the mid-stream snapshot was a genuinely partial-history cube
    assert mid != {b: n for (b, n, _, _, _, _) in want}

    # crash replay of the RECORDED last batch under its RECORDED batch_id
    replay_last(spark, handle, batch_caps)
    assert cube() == want
    raw = spark.read.parquet(state_dir).count()
    deduped = spark.read.parquet(state_dir).distinct().count()
    assert raw > deduped  # the dedup is doing work, not vacuously passing


def test_streaming_rfm_crash_replay_equals_batch(
        spark, sf_dir_oracle, tmp_path):
    """Stop/resume AND append-then-crash replay for the RFM monitor: the
    published segment cube must equal the registered batch op on the
    full order history, and a replay of the recorded last batch under
    its recorded batchId must change nothing."""
    from tests.streaming_replay import capturing, replay_last
    from traffic_data_pipeline_spark.plans.queries import (
        QUERIES,
        run_available_now,
    )
    from traffic_data_pipeline_spark.plans.staged_ops_r10 import (
        _rfm_handle,
        _rfm_seed,
    )
    from traffic_data_pipeline_spark.sources.tables import load_table

    od = load_table(spark, sf_dir_oracle, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _rfm_seed(spark, state_dir, out_dir)
    handle = _rfm_handle(spark, state_dir, out_dir)
    recording_handle, batch_caps = capturing(handle, tmp_path)

    def run_once():
        stream = (spark.readStream
                  .schema("o_custkey long, o_orderdate timestamp, "
                          "o_totalprice double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        run_available_now(
            spark, "streaming_rfm_test",
            start=lambda: (stream.writeStream.foreachBatch(recording_handle)
                           .option("checkpointLocation", ckpt)
                           .trigger(availableNow=True).start()))

    od.filter(F.col("o_orderkey") % 3 == 0) \
        .select("o_custkey", "o_orderdate", "o_totalprice") \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    mid = {(r.r_score, r.f_score, r.m_score): r.n_customers
           for r in spark.read.parquet(out_dir).collect()}
    for r in (1, 2):
        od.filter(F.col("o_orderkey") % 3 == r) \
            .select("o_custkey", "o_orderdate", "o_totalprice") \
            .coalesce(1).write.mode("append").parquet(src)
    run_once()

    want = {(r.r_score, r.f_score, r.m_score, r.n_customers,
             r.monetary_cents)
            for r in QUERIES["orders_rfm_segmentation"](
                spark, sf_dir_oracle).collect()}

    def cube():
        return {(r.r_score, r.f_score, r.m_score, r.n_customers,
                 r.monetary_cents)
                for r in spark.read.parquet(out_dir).collect()}

    assert cube() == want
    # the mid-stream snapshot was a genuinely partial-history cube
    assert mid != {(a, b, c): n for (a, b, c, n, _) in want}

    # crash replay of the RECORDED last batch under its RECORDED batch_id
    replay_last(spark, handle, batch_caps)
    assert cube() == want
    raw = spark.read.parquet(state_dir).count()
    deduped = spark.read.parquet(state_dir).distinct().count()
    assert raw > deduped  # the dedup is doing work, not vacuously passing
