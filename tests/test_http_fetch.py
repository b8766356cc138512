"""S1/S5 transport layer: gzip XML fetch, retry-on-empty, executor-side
fan-out — driven through fake transports and file:// URLs (no network in
the build sandbox; the live default is one urllib call behind the same
signature)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from traffic_data_pipeline_spark.sources.http_fetch import (
    all_na_sensor_day,
    distributed_pull,
    fetch_gzipped_xml,
    gzip_bytes,
    read_local_gz_xml,
    retry_on_empty,
)

XML = "<tms_config><corridor route='I-1'/></tms_config>"


def test_fetch_decodes_gzip_via_fake_transport():
    assert fetch_gzipped_xml("http://x/cfg.xml.gz",
                             transport=lambda url: gzip_bytes(XML)) == XML


def test_fetch_passes_plain_payload_through():
    assert fetch_gzipped_xml("http://x/cfg.xml",
                             transport=lambda url: XML.encode()) == XML


def test_fetch_file_url_round_trip():
    with tempfile.NamedTemporaryFile(suffix=".xml.gz", delete=False) as f:
        f.write(gzip_bytes(XML))
    try:
        assert read_local_gz_xml(f.name) == XML
    finally:
        os.unlink(f.name)


def _day(volume):
    return pd.DataFrame({"volume": volume, "occupancy": [1.0] * len(volume)})


def test_retry_on_empty_retries_then_succeeds():
    calls = []

    def pull():
        calls.append(1)
        return _day([None, None]) if len(calls) < 3 else _day([1.0, 2.0])

    out = retry_on_empty(pull, all_na_sensor_day, max_tries=5, sleep_s=0)
    assert len(calls) == 3
    assert out["volume"].notna().all()


def test_retry_on_empty_gives_up_after_max_tries_like_reference():
    calls = []

    def pull():
        calls.append(1)
        return _day([None, None])

    out = retry_on_empty(pull, all_na_sensor_day, max_tries=5, sleep_s=0)
    # reference: `try <- 1; while (empty & try < 5)` = 5 attempts total,
    # then the empty frame flows on (R/_pull_data.R:420-433)
    assert len(calls) == 5
    assert out["volume"].isna().all()


def _fake_fetch(sensor: str, day: str) -> pd.DataFrame:
    """Deterministic executor-side stand-in for tc.sensors::pull_sensor:
    two 30-sec rows per sensor-day, values derived from the key."""
    base = float(sum(ord(c) for c in sensor + day) % 97)
    return pd.DataFrame({
        "sensor": [sensor, sensor],
        "date": [day, day],
        "volume": [base, base + 1.0],
        "occupancy": [base / 2.0, base / 3.0],
    })


@pytest.mark.usefixtures("spark")
def test_distributed_pull_fans_out(spark):
    worklist = spark.createDataFrame(
        [("det_a", "2023-01-01"), ("det_b", "2023-01-01"),
         ("det_a", "2023-01-02")], "sensor string, date string")
    out = distributed_pull(
        worklist.repartition(3), _fake_fetch,
        "sensor string, date string, volume double, occupancy double",
        sleep_s=0,
    ).collect()
    assert len(out) == 6
    got = {(r.sensor, r.date, r.volume) for r in out}
    for s, d in [("det_a", "2023-01-01"), ("det_b", "2023-01-01"),
                 ("det_a", "2023-01-02")]:
        exp = _fake_fetch(s, d)
        assert (s, d, exp["volume"][0]) in got


def test_fetched_xml_feeds_the_flattener(spark):
    """S1 end-to-end: transport -> text -> from_xml flatten (the parse is
    sources/config_xml's job; this pins the handoff)."""
    from traffic_data_pipeline_spark.sources.config_xml import flatten_config_xml

    doc = ("<tms_config time_stamp='Jan 1 2023'>"
           "<corridor route='I-1' dir='N'>"
           "<r_node n_type='Station' name='rnd_1' label='L1' lanes='2'>"
           "<detector name='d1' label='A' category='' lane='1' field='22.0'/>"
           "</r_node></corridor></tms_config>")
    url = "http://x/metro_config_20230101.xml.gz"
    text = fetch_gzipped_xml(url, transport=lambda u: gzip_bytes(doc))
    snap = spark.createDataFrame([(url, text)], "url string, xml string")
    rows = flatten_config_xml(snap).collect()
    assert len(rows) == 1
    assert rows[0].DETECTOR_NAME == "d1"
