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

    l_tag = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in right_cols],
        F.lit(None).cast(dict(right.dtypes)[ts]).alias(f"{ts}{suffix}"),
    )
    r_tag = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in (key, ts)],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias(f"{ts}{suffix}"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{ts}{suffix}"]
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop("__side")
