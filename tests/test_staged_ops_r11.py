"""Oracle gate + semantic checks for the round-11 staging area
(plans/staged_ops_r11.py) — the same query-vs-oracle compare every
registered query passes, run BEFORE these names enter the driver
registry, plus a freeze guard pinning that they stay out of it this
round (the round-10 promotion backlog drains first)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.oracle import assert_matches_oracle
from traffic_data_pipeline_spark.plans.staged_ops_r11 import (
    STAGED_R11_ORACLES,
    STAGED_R11_QUERIES,
)


@pytest.mark.parametrize("name", sorted(STAGED_R11_ORACLES))
def test_staged_r11_matches_oracle(spark, sf_dir_oracle, name):
    assert_matches_oracle(
        STAGED_R11_QUERIES[name](spark, sf_dir_oracle),
        STAGED_R11_ORACLES[name], sf_dir_oracle)


# Exchange budgets (the test_plan_shapes contract, applied at staging
# time): (max hash exchanges, min broadcast exchanges) in the live plan
# at the smoke fixture. Fold into tests/test_plan_shapes.py at promotion.
STAGED_R11_CAPS = {
    "compare_node_scorecard": (11, 1),    # the predict_compare plan
                                          # (lvl2 roll-up chain +
                                          # broadcast profile/config
                                          # joins; 10 measured at the
                                          # smoke fixture) + ONE (node)
                                          # fold
    "compare_weekday_profile": (11, 1),   # same comparison plan + the
                                          # 7x24-key fold (10 measured)
    "compare_topn_misses": (9, 1),        # same plan + TakeOrdered
                                          # top-k (no global sort
                                          # exchange materializes;
                                          # 8 measured)
    "streaming_compare_monitor": (0, 0),  # live plan reads the
                                          # published scorecard parquet;
                                          # per-batch joins + folds run
                                          # inside foreachBatch
    "dedup_impact_by_source_cc": (4, 0),  # CC labels come off the
                                          # checkpointed fixpoint orbit;
                                          # live: the doc_id-keyed label
                                          # join + ONE (source) fold
                                          # (the dedup_impact_by_lang_cc
                                          # budget)
    "events_file_compaction_plan": (2, 0),  # ONE (day) fold, then the
                                          # single-partition calendar
                                          # window + |bins| fold
                                          # (1 measured — AQE coalesces
                                          # the window/fold pipeline)
}


@pytest.mark.parametrize("name", sorted(STAGED_R11_CAPS))
def test_staged_r11_exchange_budget(spark, sf_dir, name):
    from tests import test_plan_shapes as shapes

    max_exch, min_bcast = STAGED_R11_CAPS[name]
    exch, bcast = shapes._count_live(STAGED_R11_QUERIES[name](spark, sf_dir))
    assert exch <= max_exch, (
        f"{name}: {exch} hash exchanges (cap {max_exch})")
    assert bcast >= min_bcast, (
        f"{name}: {bcast} broadcast exchanges (expected >= {min_bcast})")


def test_staged_r11_names_not_registered():
    """Round-10 registration freeze: round-11 staged ops must not leak
    into the driver registry until the round-10 promotion backlog
    drains and round 11 promotes them."""
    import __spark_entry__ as e

    live = set(e.queries())
    assert set(STAGED_R11_QUERIES).isdisjoint(live)
    assert set(STAGED_R11_ORACLES) == set(STAGED_R11_QUERIES)
    assert set(STAGED_R11_CAPS) == set(STAGED_R11_QUERIES)


def test_scorecard_reconciles_with_predict_compare(spark, sf_dir_oracle):
    """The scorecard is an exact fold of the registered predict_compare
    rows: n_hours sums to the comparison row count, the integer volume
    and error sums match a driver-side refold, and per-node bias equals
    actual - predicted volume over scored rows."""
    from traffic_data_pipeline_spark.plans.queries import QUERIES

    cmp_rows = QUERIES["predict_compare"](spark, sf_dir_oracle).collect()
    cards = {r.node_name: r
             for r in STAGED_R11_QUERIES["compare_node_scorecard"](
                 spark, sf_dir_oracle).collect()}
    assert cards
    assert sum(c.n_hours for c in cards.values()) == len(cmp_rows)

    by_node: dict[str, list] = {}
    for r in cmp_rows:
        a = by_node.setdefault(r.node_name, [0, 0, 0, 0, 0])
        a[0] += 1
        if r.VOLUME_DIFF is not None:
            a[1] += 1
            a[2] += r.VOLUME_DIFF
            a[3] += abs(r.VOLUME_DIFF)
            a[4] = max(a[4], abs(r.VOLUME_DIFF))
    assert set(by_node) == set(cards)
    for node, (n_hours, n_scored, bias, abs_err, worst) in by_node.items():
        c = cards[node]
        assert (c.n_hours, c.n_scored, c.bias, c.abs_err) == (
            n_hours, n_scored, bias, abs_err)
        assert c.worst_abs_diff == worst
        assert c.n_missing_pred == n_hours - n_scored
        # bias is definitionally actual - predicted over SCORED rows
        # (rows where VOLUME_DIFF is non-null). Not checkable against
        # the actual_volume/predicted_volume columns directly: those
        # are independent per-column SUMs, and a row can carry a
        # prediction while its volume_sum is NULL (all-null impute
        # group) — diff NULL, but the prediction still in the SUM.
        scored = [(r.volume_sum, r.VOLUMN_PREDICTION) for r in cmp_rows
                  if r.node_name == node and r.VOLUME_DIFF is not None]
        assert c.bias == (sum(v for v, _ in scored)
                          - sum(p for _, p in scored))


def test_weekday_profile_reconciles_with_scorecard(spark, sf_dir_oracle):
    """The (dow, hod) profile and the per-node scorecard fold the SAME
    comparison frame: their n_scored, bias, and abs_err totals agree
    exactly, and every dow/hod key is in range."""
    prof = STAGED_R11_QUERIES["compare_weekday_profile"](
        spark, sf_dir_oracle).collect()
    cards = STAGED_R11_QUERIES["compare_node_scorecard"](
        spark, sf_dir_oracle).collect()
    assert prof
    assert all(0 <= r.dow <= 6 and 0 <= r.hod <= 23 for r in prof)
    for col in ("n_scored", "bias", "abs_err"):
        assert (sum(getattr(r, col) for r in prof)
                == sum(getattr(r, col) for r in cards)), col


def test_topn_misses_is_the_deterministic_worst_set(spark, sf_dir_oracle):
    """The top-N misses are exactly the N worst scored comparison rows
    under the total (|diff| desc, node, hour) order — recomputed
    driver-side from the registered predict_compare output."""
    from traffic_data_pipeline_spark.plans.queries import QUERIES
    from traffic_data_pipeline_spark.plans.staged_ops_r11 import (
        TOPN_MISSES,
    )

    top = STAGED_R11_QUERIES["compare_topn_misses"](
        spark, sf_dir_oracle).collect()
    cmp_rows = [r for r in QUERIES["predict_compare"](
        spark, sf_dir_oracle).collect() if r.VOLUME_DIFF is not None]
    want = sorted(cmp_rows, key=lambda r: (-abs(r.VOLUME_DIFF),
                                           r.node_name,
                                           r.start_datetime))[:TOPN_MISSES]
    assert [(r.node_name, r.start_datetime, r.VOLUME_DIFF) for r in top] \
        == [(r.node_name, r.start_datetime, r.VOLUME_DIFF) for r in want]


def test_compaction_plan_partitions_the_event_log(spark, sf_dir_oracle):
    """Bins partition the day calendar into contiguous, time-ordered,
    non-overlapping runs; row counts sum to the event total; and every
    bin start is exactly where the running prefix crossed a target
    boundary (the greedy rule, re-derived driver-side)."""
    from traffic_data_pipeline_spark.plans.staged_ops_r11 import (
        COMPACT_BIN_ROWS,
    )
    from traffic_data_pipeline_spark.sources.tables import load_table

    plan = sorted(STAGED_R11_QUERIES["events_file_compaction_plan"](
        spark, sf_dir_oracle).collect(), key=lambda r: r.bin_id)
    assert plan
    ev = load_table(spark, sf_dir_oracle, "events")
    total = ev.count()
    assert sum(r.n_rows for r in plan) == total
    # contiguous non-overlapping day ranges in bin order
    for a, b in zip(plan, plan[1:]):
        assert a.day_max < b.day_min
    # greedy rule: re-derive bins from the per-day counts
    per_day = sorted(
        ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts")))
                   .alias("day"))
        .agg(F.count(F.lit(1)).alias("n")).collect(),
        key=lambda r: r.day)
    prior, want = 0, {}
    for r in per_day:
        b = prior // COMPACT_BIN_ROWS
        w = want.setdefault(b, [0, None, None])
        w[0] += r.n
        w[1] = w[1] or str(r.day)
        w[2] = str(r.day)
        prior += r.n
    assert {r.bin_id: [r.n_rows, r.day_min, r.day_max] for r in plan} \
        == want


def test_source_cc_dominates_one_round_rule(spark, sf_dir_oracle):
    """The CC survivor rule removes at least as much as the one-round
    min-id rule per source (chains collapse into one survivor), over
    the identical doc universe — the dominance pin the lang-axis twin
    carries, applied to the source marginal."""
    from traffic_data_pipeline_spark.plans.queries import QUERIES

    cc = {r.source: r for r in STAGED_R11_QUERIES[
        "dedup_impact_by_source_cc"](spark, sf_dir_oracle).collect()}
    one = {r.source: r for r in QUERIES["dedup_impact_by_source"](
        spark, sf_dir_oracle).collect()}
    assert set(cc) == set(one) and cc
    for src, r in cc.items():
        assert r.n_docs == one[src].n_docs
        assert r.n_tokens == one[src].n_tokens
        assert r.n_removed >= one[src].n_removed
        assert r.tokens_removed >= one[src].tokens_removed


def test_streaming_compare_crash_replay_equals_batch(
        spark, sf_dir_oracle, tmp_path):
    """Stop/resume AND append-then-crash replay for the compare
    monitor: the published scorecard must equal the staged batch
    scorecard on the full window, and a replay of the recorded last
    batch under its recorded batchId must change nothing."""
    from tests.streaming_replay import capturing, replay_last
    from traffic_data_pipeline_spark.operators.rollup import (
        two_level_rollup,
    )
    from traffic_data_pipeline_spark.plans.queries import (
        PREDICT_SPLIT,
        _node_fact,
        run_available_now,
    )
    from traffic_data_pipeline_spark.plans.staged_ops_r11 import (
        _cmp_handle,
        _cmp_pred_table,
        _cmp_seed,
    )

    actual = (two_level_rollup(_node_fact(spark, sf_dir_oracle), "hour")
              .filter(F.col("ts")
                      >= F.lit(PREDICT_SPLIT).cast("timestamp"))
              .select("node_name", "ts", "volume_sum"))
    residue = (F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("long")
    src = str(tmp_path / "src")
    pred_dir = str(tmp_path / "pred")
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _cmp_pred_table(spark, sf_dir_oracle, pred_dir)
    _cmp_seed(spark, state_dir, out_dir)
    handle = _cmp_handle(spark, pred_dir, state_dir, out_dir)
    recording_handle, batch_caps = capturing(handle, tmp_path)

    def run_once():
        stream = (spark.readStream
                  .schema("node_name string, ts timestamp, "
                          "volume_sum bigint")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        run_available_now(
            spark, "streaming_compare_test",
            start=lambda: (stream.writeStream
                           .foreachBatch(recording_handle)
                           .option("checkpointLocation", ckpt)
                           .trigger(availableNow=True).start()))

    actual.filter(residue % 3 == 0).coalesce(1) \
        .write.mode("append").parquet(src)
    run_once()
    mid = {r.node_name: r.n_hours
           for r in spark.read.parquet(out_dir).collect()}
    for r in (1, 2):
        actual.filter(residue % 3 == r).coalesce(1) \
            .write.mode("append").parquet(src)
    run_once()

    def card():
        return {(r.node_name, r.n_hours, r.n_scored, r.n_missing_pred,
                 r.actual_volume, r.predicted_volume, r.bias, r.abs_err,
                 r.worst_abs_diff, r.mae, r.within10_share)
                for r in spark.read.parquet(out_dir).collect()}

    want = {(r.node_name, r.n_hours, r.n_scored, r.n_missing_pred,
             r.actual_volume, r.predicted_volume, r.bias, r.abs_err,
             r.worst_abs_diff, r.mae, r.within10_share)
            for r in STAGED_R11_QUERIES["compare_node_scorecard"](
                spark, sf_dir_oracle).collect()}
    assert card() == want
    # the mid-stream snapshot was a genuinely partial-history scorecard
    assert mid != {t[0]: t[1] for t in want}

    # crash replay of the RECORDED last batch under its RECORDED batch_id
    replay_last(spark, handle, batch_caps)
    assert card() == want
    raw = spark.read.parquet(state_dir).count()
    deduped = spark.read.parquet(state_dir).distinct().count()
    assert raw > deduped  # the dedup is doing work, not vacuously passing