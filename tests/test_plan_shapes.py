"""Physical-plan regression guard: headline queries must not grow
shuffles.

Every `Exchange hashpartitioning` is a full repartition of its input —
the unit of cost that dominates at 100 TB. The caps below are the
audited counts from PLANS.md; a refactor that adds an exchange beyond
its cap is a scale regression even if correctness stays green, so it
fails here first. Counts are taken from the pre-execution physical plan
(AQE's runtime coalescing only merges partitions within an exchange; it
never adds one).
"""

from __future__ import annotations

import re

import pytest

from traffic_data_pipeline_spark.plans.queries import QUERIES

# query -> (max hash exchanges, min broadcast exchanges)
CAPS = {
    "sensor_15min_agg": (2, 1),    # agg + window; config broadcast
    "nation_revenue": (1, 3),      # fact moves once; 3-hop dim chain broadcast
    "top_supplier": (2, 1),        # revenue agg + scalar-max broadcast
    "events_sessionize": (1, 0),   # one user shuffle into session_window
    "events_zscore_anomaly": (2, 1),  # stats agg + final rollup; stats broadcast
    "doc_shard_assign": (2, 0),    # spread repartition absent; agg (+AQE read)
    "doc_pack_sequences": (2, 0),  # pack-shard window + nothing else
    "doc_oov_rate": (3, 1),        # spread + token agg + doc agg; vocab broadcast
    "calendar_spine": (1, 0),      # spine generation + one window/agg at most
    "doc_bm25_search": (0, 1),     # tf/stats narrow; one-row stats broadcast
    "shipping_priority": (1, 1),   # orderkey agg only; segment dim broadcast
    "late_shipments": (2, 0),      # orderkey join + priority agg (AQE may bc)
    "lineitem_quantiles": (1, 0),  # one shared-state percentile agg
    "events_rolling_24h": (1, 0),  # one user_id window carries both aggs
    "doc_sample_quota": (1, 0),    # one source window
    "forecast_revenue": (1, 0),    # scan-filter-agg to one row
    "corpus_report": (1, 0),       # one pass, stack unpivot
    "doc_quality_tiers": (2, 1),   # threshold agg broadcast + tier agg
    "doc_batch_by_length": (1, 0), # one bucket exchange, two windows
    "large_volume_customers": (3, 1),  # qty agg + joins; big side broadcast
}


def _live_plan(df) -> str:
    """Plan text with cached-lineage subtrees removed: an
    InMemoryRelation prints the plan that BUILT the cache under it, but
    those exchanges never re-execute — only nodes above the cached scan
    are live cost (PLANS.md notes the same for the fact cache)."""
    lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
    out, cut = [], None

    def depth(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-"))

    for line in lines:
        d = depth(line)
        if cut is not None:
            if d > cut:
                continue
            cut = None
        if "InMemoryRelation" in line:
            cut = d
            continue
        out.append(line)
    return "\n".join(out)


@pytest.mark.parametrize("name", sorted(CAPS))
def test_exchange_budget(spark, sf_dir, name):
    max_exch, min_bcast = CAPS[name]
    p = _live_plan(QUERIES[name](spark, sf_dir))
    exch = len(re.findall(r"Exchange hashpartitioning", p))
    bcast = len(re.findall(r"BroadcastExchange", p))
    assert exch <= max_exch, (
        f"{name}: {exch} hash exchanges (cap {max_exch}) — a shuffle was "
        f"added; re-audit against PLANS.md before raising the cap")
    assert bcast >= min_bcast, (
        f"{name}: {bcast} broadcast exchanges (expected >= {min_bcast}) — "
        f"a dimension stopped broadcasting")
