"""Slowly-changing-dimension type-2 history build: collapse an append-only
changelog (one row per observation of an entity's attribute) into
validity intervals — the CDC → temporal-table operator behind Iceberg/
Delta MERGE-based dimension maintenance, here as one deterministic
dual-dialect SQL pass.

Semantics: rows of ``rel`` are ordered per ``key`` by ``(ts, tiebreak)``;
consecutive runs of the same ``attr`` value collapse into one interval
``[valid_from, valid_to)`` where ``valid_to`` is the next change's
``valid_from`` (NULL on the open current interval). Re-appearing values
open a NEW interval (true SCD2, not a distinct-list).

Scale shape: one shuffle on ``key`` serves the whole pass — the change
filter preserves both partitioning and sort order, so Catalyst plans a
single Exchange with the lag window, the filter, and the lead/row_number
window in one stage per partition. No driver materialization, no Python.

Cross-engine exactness: everything is integer/string/window logic; the
one type hazard is the final DATE columns (Spark toPandas → date objects,
DuckDB fetchdf → datetime64), so ``valid_from``/``valid_to`` are CAST to
STRING in both dialects (see .claude/skills/verify gotchas).

Reference parity note: the reference has no temporal/versioned-table code
(absent: no matching code under /root/reference/) — ENGINE operator for
the pipeline's dimension-maintenance tier.
"""

from __future__ import annotations

__all__ = ["scd2_sql"]


def scd2_sql(
    rel: str,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    dialect: str,  # noqa: ARG001 — identical in both dialects, kept for symmetry
) -> str:
    """SCD2 intervals for ``attr`` of ``key`` observed at ``ts`` in ``rel``.

    Output columns: ``key, attr, valid_from (STRING date), valid_to
    (STRING date, NULL while current), version (1-based per key),
    is_current (0/1)``.
    """
    return f"""
    WITH src AS (SELECT {key} AS k, {attr} AS attr,
                        CAST({ts} AS DATE) AS ts, {tiebreak} AS tb
                 FROM {rel}),
         lagged AS (SELECT k, attr, ts, tb,
                           lag(attr) OVER (PARTITION BY k ORDER BY ts, tb)
                             AS prev
                    FROM src),
         changes AS (SELECT k, attr, ts, tb FROM lagged
                     WHERE prev IS NULL OR attr <> prev),
         iv AS (SELECT k, attr, ts, tb,
                       lead(ts) OVER (PARTITION BY k ORDER BY ts, tb) AS vt,
                       CAST(row_number() OVER (PARTITION BY k
                                               ORDER BY ts, tb) AS BIGINT)
                         AS version
                FROM changes)
    SELECT k AS {key}, attr AS {attr},
           CAST(ts AS STRING) AS valid_from,
           CAST(vt AS STRING) AS valid_to,
           version,
           CASE WHEN vt IS NULL THEN 1 ELSE 0 END AS is_current
    FROM iv
    """
