"""Unit tests for the in-engine metro_config XML flattener (SURVEY.md §2:
S1-S3, F1-F6, J1-J3, P5) and its round-trip into the SCD-2 tracker.

No DuckDB oracle exists for these (xpath() is Spark-only), so this file is
the correctness gate for the config-XML path.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from traffic_data_pipeline_spark.operators.scd2 import initial_state, scd2_apply
from traffic_data_pipeline_spark.sources.config_xml import (
    flatten_config_xml,
    make_config_xml,
    snapshot_frame,
)

URL1 = "http://data.dot.state.mn.us/iris_xml/metro_config_20230101.xml.gz"
URL2 = "http://data.dot.state.mn.us/iris_xml/metro_config_20230102.xml.gz"

DAY1 = [
    dict(corridor="I-94", dir="EB", node="n94e01", n_type="Station",
         lon=-93.3, lat=44.97, lanes=3, s_limit=60, station="S100",
         name="D100", label="94/Lyndale", category="", lane=1, field=480.0,
         abandoned="f"),
    dict(corridor="I-94", dir="EB", node="n94e01", n_type="Station",
         lon=-93.3, lat=44.97, lanes=3, s_limit=60, station="S100",
         name="D101", label="94/Lyndale", category="A", lane=2, field=500.0,
         abandoned="f"),
    dict(corridor="I-35W", dir="NB", node="n35n07", n_type="Entrance",
         lon=-93.28, lat=44.9, lanes=2, s_limit=55, station="",
         name="D200", label="35W/46th", category="Q", lane=1, field=520.0,
         abandoned="t"),
]


def _flatten(spark, docs):
    return flatten_config_xml(snapshot_frame(spark, docs))


def test_flatten_one_snapshot(spark):
    out = _flatten(spark, [(URL1, make_config_xml(DAY1))])
    rows = {r.DETECTOR_NAME: r for r in out.collect()}
    assert set(rows) == {"D100", "D101", "D200"}

    d100 = rows["D100"]
    assert d100.DETECTOR_LANE == 1
    assert d100.DETECTOR_FIELD == 480.0
    assert d100.NODE_NAME == "n94e01"
    assert d100.NODE_N_TYPE == "Station"
    assert d100.NODE_LON == -93.3
    assert d100.NODE_LANES == 3
    assert d100.NODE_S_LIMIT == 60
    assert d100.NODE_STATION_ID == "S100"
    assert d100.CORRIDOR_ROUTE == "I-94"
    assert d100.CORRIDOR_DIR == "EB"
    assert d100.SNAPSHOT_DATE == dt.date(2023, 1, 1)

    # P5: empty attribute strings normalize to NULL
    assert d100.DETECTOR_CATEGORY is None
    assert rows["D101"].DETECTOR_CATEGORY == "A"
    assert rows["D200"].NODE_STATION_ID is None
    # parent attrs come from the right ancestor, not positionally
    assert rows["D200"].CORRIDOR_ROUTE == "I-35W"
    assert rows["D200"].NODE_N_TYPE == "Entrance"
    assert rows["D200"].DETECTOR_ABANDONED == "t"


def test_flatten_multiple_snapshots_parallel_rows(spark):
    """One input row per daily document; attribute alignment must hold
    per-document (the J3 positional-bind replacement)."""
    out = _flatten(
        spark,
        [(URL1, make_config_xml(DAY1)), (URL2, make_config_xml(DAY1[:2]))],
    )
    counts = {r.SNAPSHOT_DATE: r["cnt"] for r in
              out.groupBy("SNAPSHOT_DATE")
                 .agg(F.count("*").alias("cnt")).collect()}
    assert counts == {dt.date(2023, 1, 1): 3, dt.date(2023, 1, 2): 2}


def test_roundtrip_into_scd2(spark):
    """Flattened day-1 snapshot bootstraps the dimension; a mutated day-2
    snapshot produces the reference's transition rows
    (/root/reference/R/_pull_data.R:149-320)."""
    attrs = ["DETECTOR_LABEL", "DETECTOR_LANE", "DETECTOR_FIELD",
             "DETECTOR_ABANDONED"]
    day2 = [dict(d) for d in DAY1 if d["name"] != "D101"]   # D101 removed
    day2[0]["field"] = 510.0                                 # D100 attr change
    day2[1]["abandoned"] = "f"                               # D200 t->f flip
    day2.append(dict(DAY1[0], name="D300", lane=3))          # new detector

    snap1 = _flatten(spark, [(URL1, make_config_xml(DAY1))]).select(
        "DETECTOR_NAME", *attrs)
    snap2 = _flatten(spark, [(URL2, make_config_xml(day2))]).select(
        "DETECTOR_NAME", *attrs)

    state, log = scd2_apply(initial_state(snap1), snap2,
                            dt.date(2023, 1, 2), attrs)
    st = {r.DETECTOR_NAME: r for r in state.collect()}
    assert set(st) == {"D100", "D101", "D200", "D300"}
    assert st["D100"].DETECTOR_FIELD == 510.0
    assert st["D101"].DEACTIVATE and st["D101"].END_DATE == dt.date(2023, 1, 2)
    assert st["D200"].END_DATE == dt.date(2019, 7, 31)       # backdate rule
    assert st["D300"].START_DATE == dt.date(2023, 1, 2)

    events = {(r.Change, r.DETECTOR_NAME) for r in log.collect()}
    assert ("NEW_DETECTOR", "D300") in events
    assert ("REMOVE_DETECTOR", "D101") in events
    assert ("DETECTOR_FIELD", "D100") in events
    assert ("DETECTOR_ABANDONED", "D200") in events


def test_corridor_config_frame_matches_driver_build(spark):
    """The distributed per-corridor document builder yields exactly the
    rows of the driver-side make_config_xml build over the same config."""
    from traffic_data_pipeline_spark.sources.config_xml import (
        corridor_config_frame,
    )

    cfg = spark.createDataFrame(
        [("101", 350.0, "node_1", "corr_1"),
         ("102", 400.0, "node_1", "corr_1"),
         ("203", 450.0, "node_3", "corr_3"),
         ("204", 500.0, "node_4", "corr_3")],
        "sensor string, field_length double, node_name string, "
        "corridor_route string")
    docs = corridor_config_frame(cfg)
    assert docs.count() == 2  # one document per corridor
    got = flatten_config_xml(docs)

    detectors = [
        dict(corridor=r.corridor_route, dir="EB", node=r.node_name,
             lon=0.0, lat=0.0, station=r.node_name, name=r.sensor,
             label=r.sensor, category="", lane=1,
             field=float(r.field_length), abandoned="f")
        for r in cfg.collect()
    ]
    url = "http://example.org/iris_xml/metro_config_20230101.xml.gz"
    want = _flatten(spark, [(url, make_config_xml(detectors))])

    cols = ["DETECTOR_NAME", "DETECTOR_LANE", "DETECTOR_FIELD", "NODE_NAME",
            "CORRIDOR_ROUTE", "SNAPSHOT_DATE"]
    assert sorted(map(tuple, got.select(*cols).collect())) == \
        sorted(map(tuple, want.select(*cols).collect()))
