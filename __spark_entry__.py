"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Query definitions live in
``traffic_data_pipeline_spark/plans/queries.py``; this module is a thin
adapter.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from traffic_data_pipeline_spark.plans.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 30-sec -> 15-min detector aggregation at sf0.001."""
    return QUERIES["sensor_15min_agg"](spark, "/root/testdata/sf0.001")


def _previously_checked() -> set[str]:
    """Names that already have a driver-side CORRECTNESS row from a past
    round. The driver's per-round pass covers a bounded prefix of the
    registration order, so ``queries()`` rotates never-checked names to
    the front — every query keeps its identical local oracle gate
    (tests/test_queries_oracle.py) regardless of position.

    A row that errored or value-mismatched does NOT count as checked, so
    a failed query re-fronts every round until a clean row lands
    (hash-green, or recorded rows-only for the deliberate no-oracle set).
    """
    seen: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                seen.add(name)          # unknown shape: assume recorded
            elif row.get("hash_match") is True or row.get("err") == "no_oracle":
                seen.add(name)
    return seen


# Queries registered in the CURRENT round: also unchecked, but they queue
# BEHIND queries that have already waited a round for a driver row — the
# backlog drains oldest-first instead of newest registrations jumping it.
_DEFER_NEW = {
    "dedup_minhash_lsh_capped",
    "dedup_lsh_band_overflow",
    "corridor_p85_speed_approx",
    "lineitem_quantiles_approx",
    "doc_lm_score",
    "events_type_hour_cube",
    "dedup_substring_spans",
    "dedup_semantic",
    "events_pagerank",
    "doc_tfidf_knn",
    "doc_ngram_containment",
    "doc_cdc_chunks",
    "doc_priority_sample",
    "doc_collocations",
    "events_heavy_hitters",
    "doc_decontaminate_bloom",
    "doc_lexical_diversity",
    "corpus_kl_drift",
    "sensor_interpolate",
    "events_mad_anomaly",
    "events_concurrency",
    "dedup_cluster_density",
    "brand_small_qty_revenue",
    "idle_rich_customers",
    "source_overlap_matrix",
    "streaming_sessionize",
    "basket_part_pairs",
    "source_keywords_chi2",
    "label_centroid_similarity",
    "sensor_cusum_shift",
    "events_label_prop",
    "events_ab_ttest",
    "orders_seasonality",
    "csv_ingest_quarantine",
    "events_rolling_wau_hll",
    "part_min_cost_supplier",
    "nation_brand_value_share",
    "waiting_orders_suppliers",
    "excess_supply_suppliers",
    "dq_constraint_report",
    "sensor_volume_trend",
    "doc_phrase_search",
    "session_surge_overlap",
    "streaming_static_enrich",
    "media_phash_dedup",
    "dedup_minhash_calibration",
    "corridor_weighted_median",
    "price_equidepth_hist",
    "corpus_prep_pipeline",
    "embedding_ann_recall",
    "order_priority_check",
    "customer_order_histogram",
    "promo_revenue_share",
    "discounted_special_revenue",
    "nation_pair_trade",
    "nation_market_share",
    "nation_year_part_profit",
    "returned_item_customers",
    "part_supplier_diversity",
    "price_equidepth_hist_approx",
    "order_fulfillment_rate",
    "lang_token_fertility",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    seen = _previously_checked()
    ordered = dict()
    for name, fn in QUERIES.items():
        if name not in seen and name not in _DEFER_NEW:
            ordered[name] = fn
    for name, fn in QUERIES.items():
        if name not in seen and name in _DEFER_NEW:
            ordered[name] = fn
    for name, fn in QUERIES.items():
        if name in seen:
            ordered[name] = fn
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
