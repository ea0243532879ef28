"""Temporal joins — as-of join (the time-axis sibling of the
nearest-neighbour resample join, SURVEY.md J7).

``asof_join(left, right, key, ts)``: for every left row, attach the
LATEST right row with right.ts <= left.ts within the same key — the
canonical enrichment join for event streams (market data, user state).

Spark-first implementation (no per-row Python, one shuffle):
tag-and-union both sides, then one window pass per key ordered by
(ts, tag) carrying the right payload forward with
last(..., ignorenulls=True); left rows then hold their as-of match.
Right rows at exactly left.ts match (<= semantics — ties resolved by
ordering the right tag first), mirroring DuckDB's ASOF JOIN, which is
the oracle in the driver gate.

Scale: one hash exchange on `key` + one within-partition sort — the
same cost as a single window function; no range explosion, no skewed
cross product. Hot keys can be salted upstream only if the window
itself is the bottleneck (rare: state is O(1) per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Output: all left columns + each right payload
    column as `{col}{suffix}` (+ `{ts}{suffix}` = matched right ts).
    Left rows with no earlier right row keep NULLs (left-outer)."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, ts)]

    # Carry ONE struct of (ts + all right payload columns) with a single
    # last(ignorenulls): carrying each payload column independently would
    # take a genuinely-NULL payload value from an OLDER right row (and
    # different columns from different rows) — the struct guarantees all
    # carried fields come from the same matched right row, including its
    # NULLs, matching DuckDB ASOF JOIN row semantics.
    rt = dict(right.dtypes)
    r_struct = F.struct(
        F.col(ts).alias("__rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    null_struct = F.lit(None).cast(
        "struct<__rts:{},{}>".format(
            rt[ts], ",".join(f"`{c}`:{rt[c]}" for c in right_cols)
        )
        if right_cols
        else f"struct<__rts:{rt[ts]}>"
    )
    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
        null_struct.alias("__r"),
    )
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in (key, ts)],
        r_struct.alias("__r"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    return (
        u.filter(F.col("__side") == 1)
        .select(
            *[c for c in u.columns if c not in ("__side", "__r")],
            *[F.col(f"__r.`{c}`").alias(f"{c}{suffix}") for c in right_cols],
            F.col("__r.__rts").alias(f"{ts}{suffix}"),
        )
    )


def sessionize(
    df: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization, batch form: per user, a new session
    starts when the gap from the previous event exceeds ``gap_s``
    seconds — lag + a cumulative sum of session-start flags in ONE
    window partitioning (one shuffle), then per-session aggregates.
    Output: (user, session_id, n_events, session_start, session_end).

    This is the batch counterpart of streaming.stream_sessionize: for
    any event set whose lateness stays within the stream's watermark,
    the CLOSED sessions the stream emits are exactly this function's
    non-final sessions (pinned three-way against the DuckDB oracle in
    tests/test_plans_sources_streaming.py)."""
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sess = df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
