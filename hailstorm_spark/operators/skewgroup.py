"""Skew-aware cogrouping: the two-path fat-key split for per-key
pandas merges.

The attribution-feature shape (N purchases cogrouped with M clicks per
user, per-row time predicate, vectorized searchsorted inside the
group) has one scale hazard: group size follows the KEY's activity, so
a power user with years of clicks becomes one Arrow batch that must
fit a single Python worker. The production fix is NOT to slice every
key — slicing everyone multiplies the group count by the slice span
and drowns the job in per-group overhead (measured locally: the
sliced-everyone form timed out where this form holds the original
cost) — but to split ONLY the keys that are actually heavy:

1. one aggregation counts click rows per key; keys above
   ``heavy_threshold`` form the (tiny, by the definition of skew)
   heavy set, broadcast as a plan literal via an in-list column;
2. light keys take the plain per-key cogroup — unchanged plan, no
   replication;
3. heavy keys cogroup on (key, time-slice) subkeys with
   ``slice = ts div SLICE_US``: a purchase's look-back window
   [t-W, t) spans at most its own slice and the previous one because
   SLICE_US >= WINDOW_US, so each heavy click ships to its slice and
   the next (<= 2x replication of the HEAVY side only) and every
   purchase lives in exactly ONE group — nothing double-counts.
   Truncating div keeps correctness for negative timestamps: the
   slice interval around zero widens to (-S, S), but slices remain
   contiguous ascending intervals of width >= S >= W, which is all
   the two-slice adjacency argument needs;
4. the union of both paths is the result; the split is invisible in
   the output for ANY threshold, which is what lets the DuckDB
   inequality-join oracle and the skew tests pin it.

Driver-side data is one bounded collect of heavy keys (capped — if a
dataset somehow has millions of "heavy" keys the threshold is wrong,
and the cap fails loudly instead of flooding the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: heavy-side time-slice width; must stay >= every window the callers
#: pass (asserted per call)
SLICE_US = 3_600_000_000

#: a key is "heavy" when its click count exceeds this; the default is
#: sized so a single group stays a comfortable Arrow batch
DEFAULT_HEAVY_THRESHOLD = 100_000

#: loud-failure cap on the heavy-key collect
_MAX_HEAVY_KEYS = 10_000


def _merge_factory(window_us: int):
    import numpy as np
    import pandas as pd

    def merge(p_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> pd.DataFrame:
        if p_pdf.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "ts_us": pd.Series(dtype="int64"),
                    "n_recent_clicks": pd.Series(dtype="int64"),
                }
            )
        cts = np.sort(c_pdf["ts_us"].to_numpy())
        t = p_pdf["ts_us"].to_numpy()
        lo = np.searchsorted(cts, t - window_us, side="left")
        hi = np.searchsorted(cts, t, side="left")
        out = p_pdf[["event_id", "user_id", "ts_us"]].copy()
        out["n_recent_clicks"] = (hi - lo).astype("int64")
        return out

    return merge


_OUT_SCHEMA = "event_id long, user_id long, ts_us long, n_recent_clicks long"


def clicks_before_purchase_cogroup(
    purchases: DataFrame,
    clicks: DataFrame,
    window_us: int,
    heavy_threshold: int = DEFAULT_HEAVY_THRESHOLD,
) -> DataFrame:
    """(event_id, user_id, ts_us, n_recent_clicks): per purchase, the
    count of the same user's clicks in [ts_us - window_us, ts_us) —
    light keys via plain per-user cogroup, heavy keys via time-slice
    subkeys. See the module docstring for the exactness argument.
    """
    if window_us > SLICE_US:
        raise ValueError(
            f"window_us={window_us} exceeds SLICE_US={SLICE_US}; widen the slice"
        )
    merge = _merge_factory(window_us)

    # NULL-key clicks can never match any purchase under the callers'
    # LEFT-JOIN-on-user_id oracle semantics (NULL equi-joins nothing),
    # but a plain cogroup would pair the NULL-click group with the
    # NULL-purchase group and count them — drop them up front so BOTH
    # paths (and the empty-heavy fallback) agree with SQL. NULL-key
    # purchases stay, and count 0 (ADVICE r8).
    clicks = clicks.filter(F.col("user_id").isNotNull())

    counts = clicks.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    heavy_rows = (
        counts.filter(F.col("n") > heavy_threshold)
        .select("user_id")
        .limit(_MAX_HEAVY_KEYS + 1)
        .collect()
    )
    if len(heavy_rows) > _MAX_HEAVY_KEYS:
        raise ValueError(
            f"more than {_MAX_HEAVY_KEYS} keys exceed heavy_threshold="
            f"{heavy_threshold}; the threshold does not describe skew on "
            "this data — raise it"
        )
    heavy = [int(r["user_id"]) for r in heavy_rows]

    if not heavy:
        # no fat keys: exactly the original single-path plan
        return (
            purchases.groupBy("user_id")
            .cogroup(clicks.groupBy("user_id"))
            .applyInPandas(merge, schema=_OUT_SCHEMA)
        )

    # NULL keys route down the light path EXPLICITLY: `~isin(heavy)`
    # evaluates to NULL for a NULL user_id, so both `filter(is_heavy)`
    # and `filter(~is_heavy)` would drop such rows — the split would
    # silently lose NULL-key purchases that the empty-heavy fallback
    # (and the callers' LEFT-JOIN oracles) keep (ADVICE r8). The heavy
    # set is non-null by construction (collected from real click keys),
    # so `is_heavy` alone stays NULL-safe on the heavy side.
    is_heavy = F.col("user_id").isin(heavy)
    is_light = F.col("user_id").isNull() | ~is_heavy
    light = (
        purchases.filter(is_light)
        .groupBy("user_id")
        .cogroup(clicks.filter(is_light).groupBy("user_id"))
        .applyInPandas(merge, schema=_OUT_SCHEMA)
    )
    p_h = purchases.filter(is_heavy).withColumn(
        "slice", F.expr(f"ts_us div {SLICE_US}")
    )
    c_h0 = clicks.filter(is_heavy)
    c_h = c_h0.withColumn("slice", F.expr(f"ts_us div {SLICE_US}")).unionByName(
        c_h0.withColumn("slice", F.expr(f"ts_us div {SLICE_US} + 1"))
    )
    heavy_out = (
        p_h.groupBy("user_id", "slice")
        .cogroup(c_h.groupBy("user_id", "slice"))
        .applyInPandas(merge, schema=_OUT_SCHEMA)
    )
    return light.unionByName(heavy_out)
