"""Driver-contract insurance: __spark_entry__ exposes consistent
queries/oracles, and bench.py emits its one-line JSON against a small SF.
A break here means the driver records nothing for the whole round."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import __spark_entry__ as entry_mod


def test_entry_module_contract():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert len(qs) >= 30
    assert set(os_) <= set(qs)          # every oracle has a query
    assert "sensor_15min_agg" in qs     # the flagship exists
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_bench_emits_json_line():
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_CPUS="8")
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)), timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert len(payload["queries"]) == len(entry_mod.queries())
    assert all(v >= 0 for v in payload["queries"].values())


def test_events_ts_normalized_across_fixture_generations(spark):
    """The fixture generator has shipped events.ts as TIMESTAMP(NANOS)
    and TIMESTAMP(MICROS, NTZ) across refreshes; load_table must present
    a plain session-zone TimestampType either way or every event query
    breaks on the next regeneration."""
    from pyspark.sql.types import TimestampType

    from traffic_data_pipeline_spark.sources.tables import load_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        df = load_table(spark, sf, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), sf
        assert df.select("ts").first()[0] is not None
