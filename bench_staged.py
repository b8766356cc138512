#!/usr/bin/env python3
"""Timing probe for the round-5 staging area: run every STAGED query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with bench.py's
warmup + noop-sink + cache-release discipline and write
BENCH_STAGED_r04.json.

Purpose: quantify what promotion will add to the registered bench
(s/query trend the driver tracks) and pick which staged names join
__spark_entry__._COSTLY_TAIL at promotion time — the same cost-aware
rotation the round-3 backlog drain used.
"""

from __future__ import annotations

import json
import os
import re
import time

from traffic_data_pipeline_spark.plans.staged_ops import STAGED_QUERIES
from traffic_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("tdp-bench-staged")
    spark.sparkContext.setLogLevel("ERROR")

    from traffic_data_pipeline_spark.sources.tables import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    # streaming landing zone used by streaming_cms_topk (ingest-side setup)
    from traffic_data_pipeline_spark.plans.analysis_ops import (
        _session_events_dir,
    )
    _session_events_dir(spark, sf_dir)

    from traffic_data_pipeline_spark.functions.execution import release

    timings: dict[str, float] = {}
    for name, fn in sorted(STAGED_QUERIES.items()):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        release()

    out = {
        "metric": "staged_suite_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf,
    }
    print(json.dumps(out))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_STAGED_r04.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
