"""RAT (raster-attribute-table) analogues — category-table operators.

RIOS processes RATs as chunked columnar tables with a user function per
chunk (reference: rios/ratapplier.py:66-205, chunk size 100k rows at
:370; column IO rios/rat.py:55-269; color tables rios/rat.py:443-529,
rios/colortable.py:43-80). Relationally a RAT is just a DataFrame keyed
by category id, so:

- ``rat_apply``   — mapInPandas over the table; Arrow batching IS the
  row-chunking (bounded by arrow.maxRecordsPerBatch, the analogue of
  blockLen), trivially parallel where RIOS is single-threaded by design
  (rios/ratapplier.py:37-42)
- ``add_color_table`` — rainbow/gray/random color ramps as plain
  columns (RIOS writes them into the RAT the same way)
- column stats: stats.weighted_stats covers ColumnStats
  (rios/fileinfo.py:381-503)
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rat_apply(
    df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame], out_schema: str
) -> DataFrame:
    """Chunk-wise user function over a category table — the
    ``ratapplier.apply`` analogue. fn sees a bounded pandas chunk and
    returns any number of rows (covers RCM_EQUALS_INPUT and, via
    unions, RCM_INCREMENT — rios/ratapplier.py:57-63)."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(kern, out_schema)


def add_color_table(df: DataFrame, value_col: str, ramp: str = "rainbow") -> DataFrame:
    """Attach red/green/blue/alpha columns keyed by category value —
    the genRainbowColors/genGreyScaleColors analogue (rios/rat.py:443-529).
    Colors are pure expressions of the value (deterministic)."""
    v = F.col(value_col).cast("double")
    mx = df.agg(F.max(v)).collect()[0][0] or 1.0
    t = v / F.lit(float(mx))
    if ramp == "rainbow":
        red = (F.lit(255.0) * (F.lit(1.0) - t)).cast("int")
        green = (F.lit(255.0) * (F.lit(1.0) - (t - F.lit(0.5)) * (t - F.lit(0.5)) * 4)).cast("int")
        blue = (F.lit(255.0) * t).cast("int")
    elif ramp == "gray":
        red = green = blue = (F.lit(255.0) * t).cast("int")
    elif ramp == "random":
        red = F.pmod(F.xxhash64(v, F.lit(1)), F.lit(256)).cast("int")
        green = F.pmod(F.xxhash64(v, F.lit(2)), F.lit(256)).cast("int")
        blue = F.pmod(F.xxhash64(v, F.lit(3)), F.lit(256)).cast("int")
    else:
        raise ValueError(f"unknown ramp {ramp!r}")
    clamp = lambda c: F.greatest(F.lit(0), F.least(c, F.lit(255)))  # noqa: E731
    return df.select(
        "*",
        clamp(red).alias("red"),
        clamp(green).alias("green"),
        clamp(blue).alias("blue"),
        F.lit(255).alias("alpha"),
    )


def normalize_colors_01(df: DataFrame) -> DataFrame:
    """0-255 → 0-1 color normalization (rios/rat.py:86-89)."""
    return df.select(
        *[
            (F.col(c) / F.lit(255.0)).alias(c) if c in ("red", "green", "blue", "alpha") else F.col(c)
            for c in df.columns
        ]
    )
