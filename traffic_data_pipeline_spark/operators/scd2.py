"""SCD Type-2 config tracking + changelog as a pure-Spark snapshot diff
(SURVEY.md §2: J4/J5/J6, U5, K2-K4; reference Track_Config_Change at
/root/reference/R/_pull_data.R:140-322).

The reference mutates SQL Server rows in place — a row-at-a-time,
column-at-a-time loop issuing one UPDATE + one changelog INSERT per changed
cell (:240-248). Parquet has no point-UPDATE, and a driver-side loop would
not scale; instead each nightly run is a set-based recompute:

  new_state = union(untouched rows,
                    closed-out rows (removed / abandoned-flip),
                    attribute-patched rows,
                    brand-new rows)
  changelog = anti-joins (new/removed) + unpivot-and-filter of old-vs-new
              attribute pairs (one row per changed cell, no loops)

written by partition overwrite — same observable semantics, O(dim) work,
fully parallel.

Transition rules (/root/reference/R/_pull_data.R:149-320):
- detector in new snapshot only            -> insert open row, log NEW_DETECTOR
- active detector missing from snapshot    -> END_DATE=day, DEACTIVATE=true,
                                              log REMOVE_DETECTOR  (J5 + K4)
- attribute cell differs                   -> patch in place, log one row per
                                              cell (J6 + U5)
- DETECTOR_ABANDONED 'f'->'t'              -> close row: END_DATE=day  (:250-266)
- DETECTOR_ABANDONED 't'->'f'              -> upstream mistake: backdate
                                              END_DATE=2019-07-31     (:267-284)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from traffic_data_pipeline_spark.schemas import (
    ABANDONED_BACKDATE,
    SENTINEL_END,
    SENTINEL_START,
)

KEY = "DETECTOR_NAME"
ABANDONED = "DETECTOR_ABANDONED"


def initial_state(snapshot: DataFrame) -> DataFrame:
    """Backfill bootstrap: every detector gets one open row with sentinel
    validity (/root/reference/R/1) Get-Historical-Configuration-Data-RunOnce.R:23-25)."""
    return snapshot.withColumns({
        "START_DATE": F.lit(SENTINEL_START).cast("date"),
        "END_DATE": F.lit(SENTINEL_END).cast("date"),
        "DEACTIVATE": F.lit(False),
    })


def _changed_cells(old: DataFrame, new: DataFrame, attrs: list[str],
                   update_date) -> DataFrame:
    """U5 as unpivot: one changelog row per (detector, attribute) whose value
    changed. stack() replaces the reference's per-cell R loop
    (/root/reference/R/_pull_data.R:233-248)."""
    o = old.select(KEY, *[F.col(a).cast("string").alias(f"o_{a}") for a in attrs])
    n = new.select(KEY, *[F.col(a).cast("string").alias(f"n_{a}") for a in attrs])
    pairs = ", ".join(f"'{a}', o_{a}, n_{a}" for a in attrs)
    unpivoted = (
        o.join(n, KEY)
        .select(
            F.col(KEY),
            F.expr(f"stack({len(attrs)}, {pairs}) AS (Change, Old_Value, New_Value)"),
        )
        .filter(~F.col("Old_Value").eqNullSafe(F.col("New_Value")))
    )
    return unpivoted.select(
        F.lit(update_date).cast("date").alias("Update_Date"),
        "Change", KEY, "Old_Value", "New_Value",
        F.lit(None).cast("date").alias("Last_Update_Date"),
    )


def scd2_apply(state: DataFrame, snapshot: DataFrame, update_date,
               attrs: list[str]) -> tuple[DataFrame, DataFrame]:
    """One nightly config delta: returns (new_state, changelog).

    ``state``     — current SCD-2 dimension (attr cols + START_DATE/END_DATE/
                    DEACTIVATE).
    ``snapshot``  — today's flattened config (attr cols), one row per detector.
    ``attrs``     — attribute columns to diff/patch; must include
                    DETECTOR_ABANDONED for the close-out rules.
    """
    upd = F.lit(update_date).cast("date")
    plain_attrs = [a for a in attrs if a != ABANDONED]

    is_open = (F.col("END_DATE") == F.lit(SENTINEL_END).cast("date")) & ~F.col("DEACTIVATE")
    active = state.filter(is_open)
    untouched = state.filter(~is_open)

    # J4: brand-new detectors
    new_rows = (
        snapshot.join(active.select(KEY), KEY, "left_anti")
        .withColumns({
            "START_DATE": upd,
            "END_DATE": F.lit(SENTINEL_END).cast("date"),
            "DEACTIVATE": F.lit(False),
        })
    )
    log_new = new_rows.select(
        upd.alias("Update_Date"), F.lit("NEW_DETECTOR").alias("Change"),
        F.col(KEY), F.lit(None).cast("string").alias("Old_Value"),
        F.lit(None).cast("string").alias("New_Value"),
        F.lit(None).cast("date").alias("Last_Update_Date"),
    )

    # J5: active detectors that disappeared
    removed = (
        active.join(snapshot.select(KEY), KEY, "left_anti")
        .withColumns({"END_DATE": upd, "DEACTIVATE": F.lit(True)})
    )
    log_removed = removed.select(
        upd.alias("Update_Date"), F.lit("REMOVE_DETECTOR").alias("Change"),
        F.col(KEY), F.lit(None).cast("string").alias("Old_Value"),
        F.lit(None).cast("string").alias("New_Value"),
        F.lit(None).cast("date").alias("Last_Update_Date"),
    )

    # J6: survivors — patch attributes in place; abandoned flips adjust END_DATE
    o = active.alias("o")
    n = snapshot.alias("n")
    common = o.join(n, F.col(f"o.{KEY}") == F.col(f"n.{KEY}"), "inner")
    old_ab, new_ab = F.col(f"o.{ABANDONED}"), F.col(f"n.{ABANDONED}")
    end_date = (
        F.when((old_ab == "f") & (new_ab == "t"), upd)
        .when((old_ab == "t") & (new_ab == "f"), F.lit(ABANDONED_BACKDATE).cast("date"))
        .otherwise(F.col("o.END_DATE"))
    )
    patched = common.select(
        F.col(f"o.{KEY}").alias(KEY),
        *[F.col(f"n.{a}").alias(a) for a in plain_attrs],
        F.col(f"n.{ABANDONED}").alias(ABANDONED),
        F.col("o.START_DATE").alias("START_DATE"),
        end_date.alias("END_DATE"),
        F.col("o.DEACTIVATE").alias("DEACTIVATE"),
    )

    log_cells = _changed_cells(active, snapshot, attrs, update_date)

    cols = [KEY, *plain_attrs, ABANDONED, "START_DATE", "END_DATE", "DEACTIVATE"]
    new_state = (
        untouched.select(*cols)
        .unionByName(removed.select(*cols))
        .unionByName(patched.select(*cols))
        .unionByName(new_rows.select(*cols))
    )
    changelog = log_new.unionByName(log_removed).unionByName(log_cells)
    return new_state, changelog
