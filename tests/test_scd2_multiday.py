"""Multi-day SCD-2 replay semantics (the reference compares each delta
against the ENTIRE historical table, /root/reference/R/_pull_data.R:149-151,
183-184): closed/deactivated rows are matched — never re-inserted or
re-removed — and changelog rows carry the row's previous change stamp."""

from __future__ import annotations

import datetime as dt

from traffic_data_pipeline_spark.operators.scd2 import initial_state, scd2_apply

ATTRS = ["DETECTOR_LANE", "DETECTOR_ABANDONED"]
SCHEMA = "DETECTOR_NAME string, DETECTOR_LANE int, DETECTOR_ABANDONED string"
DAY2 = dt.date(2024, 2, 2)
DAY3 = dt.date(2024, 2, 3)


def _snap(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_multiday_replay(spark):
    # day 1 bootstrap: d1/d2 active, d3 abandoned
    st = initial_state(_snap(spark, [("d1", 1, "f"), ("d2", 1, "f"),
                                     ("d3", 1, "t")]))
    # day 2: d1 flips f->t (close-out), d2 disappears, d3 flips t->f
    # (upstream mistake -> backdate), d4 appears
    st, log2 = scd2_apply(
        st, _snap(spark, [("d1", 1, "t"), ("d3", 1, "f"), ("d4", 9, "f")]),
        DAY2, ATTRS)
    # day 3: d1 still present (unchanged, though closed), d2 still absent,
    # d4 lane changes
    st, log3 = scd2_apply(
        st, _snap(spark, [("d1", 1, "t"), ("d3", 1, "f"), ("d4", 5, "f")]),
        DAY3, ATTRS)

    rows = {r.DETECTOR_NAME: r for r in st.collect()}
    # ONE row per detector ever seen — nothing duplicated by the replay
    assert sorted(rows) == ["d1", "d2", "d3", "d4"]

    # d1: f->t close-out sticks; still-present-but-closed is untouched
    assert rows["d1"].DEACTIVATE and rows["d1"].END_DATE == DAY2
    assert rows["d1"].LAST_CHANGE_DATE == DAY2
    # d2: removed once on day 2; absence on day 3 changes nothing
    assert rows["d2"].DEACTIVATE and rows["d2"].END_DATE == DAY2
    # d3: t->f mistake backdated and deactivated
    assert rows["d3"].DEACTIVATE
    assert rows["d3"].END_DATE == dt.date(2019, 7, 31)
    # d4: new on day 2, patched on day 3
    assert rows["d4"].DETECTOR_LANE == 5
    assert rows["d4"].LAST_CHANGE_DATE == DAY3
    assert not rows["d4"].DEACTIVATE and rows["d4"].START_DATE == DAY2

    l3 = log3.collect()
    # no spurious NEW_DETECTOR / REMOVE_DETECTOR on day 3
    assert not [r for r in l3 if r.Change in ("NEW_DETECTOR", "REMOVE_DETECTOR")]
    # d4's lane cell carries its previous stamp (= its day-2 insert stamp)
    (lane_row,) = [r for r in l3 if r.Change == "DETECTOR_LANE"]
    assert lane_row.DETECTOR_NAME == "d4"
    assert (lane_row.Old_Value, lane_row.New_Value) == ("9", "5")
    assert lane_row.Last_Update_Date == DAY2

    l2 = {(r.Change, r.DETECTOR_NAME) for r in log2.collect()}
    assert ("NEW_DETECTOR", "d4") in l2
    assert ("REMOVE_DETECTOR", "d2") in l2
    assert ("DETECTOR_ABANDONED", "d1") in l2 and ("DETECTOR_ABANDONED", "d3") in l2
    # NEW/REMOVE rows carry the detector name as the reference does
    new_row = [r for r in log2.collect() if r.Change == "NEW_DETECTOR"][0]
    assert new_row.New_Value == "d4" and new_row.Old_Value is None
    rm_row = [r for r in log2.collect() if r.Change == "REMOVE_DETECTOR"][0]
    assert rm_row.Old_Value == "d2" and rm_row.New_Value is None
