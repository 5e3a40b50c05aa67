"""As-of (point-in-time) join — a temporal operator Spark's DataFrame
API lacks as a primitive, expressed as a composition of built-in ops.

The reference has no joins at all (SURVEY.md §2.3: reference
src/Hailstorm/Topology/HardcodedTopology.hs:29-42 only hash-routes
tuples); this operator is part of the additive temporal surface a
time-series/feature-store workload needs.

Technique — the "union trick", not a join node: tag both inputs with a
side marker, union them, and run one window per key ordered by
(timestamp, side) taking the last non-null right-side ROW at or
before each left row. Plan shape: ONE hash shuffle on the key plus a
per-partition sort — strictly cheaper than the range-join rewrite
(shuffle both sides + interval matching), with no
BroadcastNestedLoopJoin risk at any scale. Skewed keys behave exactly
like any window over that key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("__ts", "__side", "__tie", "__rrow")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for every left row, attach ``right_cols`` from
    the right row with the greatest ``right_ts`` <= ``left_ts``
    (direction="backward", inclusive) or the smallest ``right_ts`` >=
    ``left_ts`` ("forward"), matching on key ``on``. Unmatched left
    rows keep nulls (LEFT semantics).

    The matched right row is carried as ONE struct through the window
    (``last(ignorenulls)`` over the struct, which is non-null exactly
    on right rows): all ``right_cols`` always come from the SAME right
    row, and a genuinely-NULL value inside that row survives — the
    semantics pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` have, which
    per-column filling would violate.

    ``right_cols`` must not collide with left column names (rename
    before calling). If several right rows can share (on, right_ts),
    pass ``tiebreak`` (a right column): the row with the greatest
    tiebreak value wins deterministically — otherwise pre-deduplicate.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    reserved = set(_RESERVED) & (set(left.columns) | set(right_cols))
    if reserved:
        raise ValueError(
            f"column names reserved by asof_join: {sorted(reserved)} — rename first"
        )

    l2 = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
    )
    rstruct = F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__rrow")
    r_proj = [on, F.col(right_ts).alias("__ts"), rstruct]
    if tiebreak is not None:
        r_proj.append(F.col(tiebreak).alias("__tie"))
    r2 = right.select(*r_proj).withColumn("__side", F.lit(0))
    if tiebreak is not None:
        l2 = l2.withColumn("__tie", F.lit(None).cast(r2.schema["__tie"].dataType))
    u = l2.unionByName(r2, allowMissingColumns=True)

    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    order = [ts_order, F.asc("__side")]
    if tiebreak is not None:
        # within the right rows at one (key, ts): greatest tiebreak is
        # closest to the left row, so last() picks it deterministically
        order.append(F.asc_nulls_last("__tie"))
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__rrow", ignorenulls=True).over(w)
    keep = [c for c in left.columns]
    return (
        u.select(
            *keep,
            F.col("__side"),
            *[matched[c].alias(c) for c in right_cols],
        )
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
