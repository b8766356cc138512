"""Command-line face of the engine: ``python -m traffic_data_pipeline_spark``.

Subcommands:

- ``list``                       — registered query names (one per line)
- ``run NAME [--sf-dir D] [--limit N] [--explain]``
                                 — run one registered query, print rows as
                                   JSON lines (and optionally the physical
                                   plan to stderr)
- ``nightly [--sf-dir D] [--out DIR]``
                                 — the incremental ingest runner
                                   (pipeline.run_nightly_ingest) against a
                                   local fact directory
- ``sql "SELECT ..." [--sf-dir D] [--limit N] [--explain]``
                                 — ad-hoc Spark SQL over the fixture
                                   tables (registered as temp views), rows
                                   as JSON lines

The reference drives everything from hand-edited R scripts; this is the
equivalent surface as a CLI so the repo is usable without writing code.
``spark-submit`` wraps the same module unchanged on a cluster.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from traffic_data_pipeline_spark.session import get_spark

    s = get_spark("tdp-cli")
    s.sparkContext.setLogLevel("ERROR")
    return s


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="traffic_data_pipeline_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run one registered query")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true",
                      help="print the physical plan to stderr")

    nightly = sub.add_parser("nightly", help="incremental ingest run")
    nightly.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    nightly.add_argument("--out", default=None,
                         help="fact directory (default: scratch)")

    sqlp = sub.add_parser("sql", help="ad-hoc SQL over the fixture tables")
    sqlp.add_argument("query")
    sqlp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sqlp.add_argument("--limit", type=int, default=20)
    sqlp.add_argument("--explain", action="store_true",
                      help="print the physical plan to stderr")

    args = ap.parse_args(argv)

    from traffic_data_pipeline_spark.plans.queries import QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            print(name)
        return 0

    if args.cmd == "run":
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2
        df = QUERIES[args.name](_spark(), args.sf_dir)
        if args.explain:
            print(df._jdf.queryExecution().executedPlan().toString(),
                  file=sys.stderr)
        rows = df.limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        print(f"# {args.name}: showed {len(rows)} row(s) (limit {args.limit})",
              file=sys.stderr)
        return 0

    if args.cmd == "sql":
        from traffic_data_pipeline_spark.sources.tables import TABLES, load_table

        spark = _spark()
        for t in TABLES:
            load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
        df = spark.sql(args.query)
        if args.explain:
            print(df._jdf.queryExecution().executedPlan().toString(),
                  file=sys.stderr)
        rows = df.limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        print(f"# sql: showed {len(rows)} row(s) (limit {args.limit})",
              file=sys.stderr)
        return 0

    if args.cmd == "nightly":
        from traffic_data_pipeline_spark.functions.tmpdirs import scratch_dir
        from traffic_data_pipeline_spark.pipeline import run_nightly_ingest

        out = args.out or scratch_dir("tdp_fact_")
        written = run_nightly_ingest(_spark(), args.sf_dir, out)
        print(json.dumps({"fact_path": out,
                          "rows_written": written.count()}))
        return 0

    return 2  # unreachable


if __name__ == "__main__":
    sys.exit(main())
