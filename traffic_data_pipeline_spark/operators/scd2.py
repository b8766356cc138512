"""SCD Type-2 config tracking + changelog as a pure-Spark snapshot diff
(SURVEY.md §2: J4/J5/J6, U5, K2-K4; reference Track_Config_Change at
/root/reference/R/_pull_data.R:140-322).

The reference mutates SQL Server rows in place — a row-at-a-time,
column-at-a-time loop issuing one UPDATE + one changelog INSERT per changed
cell (:240-248). Parquet has no point-UPDATE, and a driver-side loop would
not scale; instead each nightly run is a set-based recompute:

  new_state = union(rows absent from the snapshot (closed out or already
                    deactivated), patched surviving rows, brand-new rows)
  changelog = anti-joins (new/removed) + unpivot-and-filter of old-vs-new
              attribute pairs (one row per changed cell, no loops)

written by partition overwrite — same observable semantics, O(dim) work,
fully parallel.

State model (matches the reference exactly): RTMC_CONFIG_HISTORICAL holds
ONE row per detector ever seen — the reference only ever appends new
detectors and UPDATEs rows in place, so validity is expressed by mutating
END_DATE/DEACTIVATE on that single row, not by inserting new versions.
Consequently every comparison is against the ENTIRE state, not just open
rows (/root/reference/R/_pull_data.R:149-151, 183-184, 222-225):

- detector in snapshot, not in state          -> insert open row,
                                                 log NEW_DETECTOR  (J4)
- state row missing from snapshot, not yet
  DEACTIVATE                                  -> END_DATE=day,
                                                 DEACTIVATE=true,
                                                 log REMOVE_DETECTOR
                                                 (J5 + K4; :183-196)
- state row missing from snapshot, already
  DEACTIVATE                                  -> untouched (:184 filters
                                                 DEACTIVATE != TRUE — this
                                                 is what keeps a re-seen
                                                 closed detector from
                                                 being duplicated)
- attribute cell differs (incl. on closed
  rows — the reference patches every matched
  row)                                        -> patch in place,
                                                 LAST_CHANGE_DATE=day,
                                                 log one row per cell with
                                                 Last_Update_Date = the
                                                 row's PREVIOUS
                                                 LAST_CHANGE_DATE
                                                 (J6 + U5; :233-320)
- DETECTOR_ABANDONED 'f'->'t'                 -> END_DATE=day,
                                                 DEACTIVATE=true (:250-266)
- DETECTOR_ABANDONED 't'->'f'                 -> upstream mistake: backdate
                                                 END_DATE=2019-07-31,
                                                 DEACTIVATE=true (:267-284)
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
LCD = "LAST_CHANGE_DATE"


def initial_state(snapshot: DataFrame) -> DataFrame:
    """Backfill bootstrap: every detector gets one open row with sentinel
    validity and no change stamp yet (/root/reference/R/1)
    Get-Historical-Configuration-Data-RunOnce.R:23-25)."""
    return snapshot.withColumns({
        LCD: F.lit(None).cast("date"),
        "START_DATE": F.lit(SENTINEL_START).cast("date"),
        "END_DATE": F.lit(SENTINEL_END).cast("date"),
        "DEACTIVATE": F.lit(False),
    })


def _log_row(update_date, change, key_col, old_val, new_val, last_update):
    return [
        F.lit(update_date).cast("date").alias("Update_Date"),
        change.alias("Change"),
        key_col.alias(KEY),
        old_val.cast("string").alias("Old_Value"),
        new_val.cast("string").alias("New_Value"),
        last_update.cast("date").alias("Last_Update_Date"),
    ]


def scd2_apply(state: DataFrame, snapshot: DataFrame, update_date,
               attrs: list[str]) -> tuple[DataFrame, DataFrame]:
    """One nightly config delta: returns (new_state, changelog).

    ``state``     — current SCD-2 dimension: one row per detector (attr cols
                    + LAST_CHANGE_DATE + START_DATE/END_DATE/DEACTIVATE).
    ``snapshot``  — today's flattened config (attr cols), one row per detector.
    ``attrs``     — attribute columns to diff/patch; must include
                    DETECTOR_ABANDONED for the close-out rules.
    """
    upd = F.lit(update_date).cast("date")
    plain_attrs = [a for a in attrs if a != ABANDONED]
    if LCD not in state.columns:  # pre-stamp state parquet
        state = state.withColumn(LCD, F.lit(None).cast("date"))

    # J4: detectors never seen in ANY state row (open or closed) — the
    # reference's %in% is against the whole historical table (:149-151)
    new_rows = (
        snapshot.join(state.select(KEY), KEY, "left_anti")
        .withColumns({
            # the appended row carries the snapshot's own stamp (= the
            # update day in the nightly flow, R/3):24)
            LCD: upd,
            "START_DATE": upd,
            "END_DATE": F.lit(SENTINEL_END).cast("date"),
            "DEACTIVATE": F.lit(False),
        })
    )
    log_new = new_rows.select(*_log_row(
        update_date, F.lit("NEW_DETECTOR"), F.col(KEY),
        F.lit(None), F.col(KEY), F.lit(None),
    ))

    # J5: state rows whose detector disappeared; only not-yet-deactivated
    # rows close out (:184), the rest stay untouched — so a detector that
    # later re-appears is matched (not re-inserted) and never duplicated
    absent = state.join(snapshot.select(KEY), KEY, "left_anti")
    removed = (
        absent.filter(~F.col("DEACTIVATE"))
        .withColumns({"END_DATE": upd, "DEACTIVATE": F.lit(True)})
    )
    absent_kept = absent.filter(F.col("DEACTIVATE"))
    log_removed = removed.select(*_log_row(
        update_date, F.lit("REMOVE_DETECTOR"), F.col(KEY),
        F.col(KEY), F.lit(None), F.col(LCD),
    ))

    # J6: every matched state row (the reference UPDATEs by key with no
    # open-row filter) — patch attributes; abandoned flips adjust validity
    o = state.alias("o")
    n = snapshot.alias("n")
    common = o.join(n, F.col(f"o.{KEY}") == F.col(f"n.{KEY}"), "inner")
    old_ab, new_ab = F.col(f"o.{ABANDONED}"), F.col(f"n.{ABANDONED}")
    any_diff = None
    for a in attrs:
        d = ~F.col(f"o.{a}").eqNullSafe(F.col(f"n.{a}"))
        any_diff = d if any_diff is None else (any_diff | d)
    end_date = (
        F.when((old_ab == "f") & (new_ab == "t"), upd)
        .when((old_ab == "t") & (new_ab == "f"),
              F.lit(ABANDONED_BACKDATE).cast("date"))
        .otherwise(F.col("o.END_DATE"))
    )
    deactivate = (
        F.when(~old_ab.eqNullSafe(new_ab), F.lit(True))
        .otherwise(F.col("o.DEACTIVATE"))
    )
    patched = common.select(
        F.col(f"o.{KEY}").alias(KEY),
        *[F.col(f"n.{a}").alias(a) for a in plain_attrs],
        F.col(f"n.{ABANDONED}").alias(ABANDONED),
        F.when(any_diff, upd).otherwise(F.col(f"o.{LCD}")).alias(LCD),
        F.col("o.START_DATE").alias("START_DATE"),
        end_date.alias("END_DATE"),
        deactivate.alias("DEACTIVATE"),
    )

    # U5 as unpivot: one changelog row per changed (detector, attribute)
    # cell; stack() replaces the reference's per-cell R loop (:233-248).
    # Last_Update_Date is the row's stamp BEFORE this update, as the
    # reference reads it from the pre-update table snapshot (:310).
    pairs = ", ".join(
        f"'{a}', CAST(o_{a} AS STRING), CAST(n_{a} AS STRING)" for a in attrs
    )
    log_cells = (
        common.select(
            F.col(f"o.{KEY}").alias(KEY),
            F.col(f"o.{LCD}").alias("_prev_lcd"),
            *[F.col(f"o.{a}").alias(f"o_{a}") for a in attrs],
            *[F.col(f"n.{a}").alias(f"n_{a}") for a in attrs],
        )
        .select(
            F.col(KEY), F.col("_prev_lcd"),
            F.expr(f"stack({len(attrs)}, {pairs}) "
                   "AS (Change, Old_Value, New_Value)"),
        )
        .filter(~F.col("Old_Value").eqNullSafe(F.col("New_Value")))
        .select(*_log_row(
            update_date, F.col("Change"), F.col(KEY),
            F.col("Old_Value"), F.col("New_Value"), F.col("_prev_lcd"),
        ))
    )

    cols = [KEY, *plain_attrs, ABANDONED, LCD,
            "START_DATE", "END_DATE", "DEACTIVATE"]
    new_state = (
        absent_kept.select(*cols)
        .unionByName(removed.select(*cols))
        .unionByName(patched.select(*cols))
        .unionByName(new_rows.select(*cols))
    )
    changelog = log_new.unionByName(log_removed).unionByName(log_cells)
    return new_state, changelog
