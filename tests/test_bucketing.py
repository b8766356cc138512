"""Bucketed-sink test: co-located joins on the bucket key must plan with
no shuffle on either side (SURVEY.md §7 scale path)."""

from __future__ import annotations

import re

from traffic_data_pipeline_spark.operators.ingest import (
    build_rtmc_15min,
    write_rtmc_15min_bucketed,
)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    fact = build_rtmc_15min(spark, sf_dir)
    write_rtmc_15min_bucketed(fact, "rtmc_b1", str(tmp_path / "b1"), buckets=8)
    write_rtmc_15min_bucketed(fact, "rtmc_b2", str(tmp_path / "b2"), buckets=8)
    try:
        a = spark.table("rtmc_b1").select("DETECTOR_NAME", "START_DATETIME",
                                          "VOLUME_SUM")
        b = spark.table("rtmc_b2").select("DETECTOR_NAME", "START_DATETIME",
                                          "SPEED")
        joined = a.join(b, ["DETECTOR_NAME", "START_DATETIME"])
        assert joined.count() > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides pre-bucketed on the join key: no hash exchange anywhere
        assert not re.search(r"Exchange hashpartitioning", plan), plan[:2000]
    finally:
        spark.sql("DROP TABLE IF EXISTS rtmc_b1")
        spark.sql("DROP TABLE IF EXISTS rtmc_b2")
