"""CLI surface: list / run / nightly drive the same registry and runners."""

from __future__ import annotations

import json

from traffic_data_pipeline_spark.__main__ import main


def test_list(capsys):
    assert main(["list"]) == 0
    names = capsys.readouterr().out.split()
    assert "sensor_15min_agg" in names and len(names) >= 60


def test_run_emits_json_rows(spark, sf_dir, capsys):
    assert main(["run", "pricing_summary", "--sf-dir", sf_dir,
                 "--limit", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert 1 <= len(out) <= 3
    row = json.loads(out[0])
    assert "l_returnflag" in row and "sum_qty" in row


def test_run_unknown_query_fails(capsys):
    assert main(["run", "nope"]) == 2


def test_nightly_writes_fact(spark, sf_dir, capsys):
    assert main(["nightly", "--sf-dir", sf_dir]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_written"] > 0
    assert spark.read.parquet(res["fact_path"]).count() == res["rows_written"]


def test_sql_adhoc(spark, sf_dir, capsys):
    assert main(["sql",
                 "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
                 "GROUP BY 1 ORDER BY 1",
                 "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(line) for line in out]
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R"}
    assert all(r["n"] > 0 for r in rows)
