"""Single-pass statistics layer — calcstats re-expressed in Spark.

Reference semantics (NOT ported):
- SinglePassAccumulator partial+final basic stats: sum/ssq/count/min/max
  per block, mean = sum/count, stddev = sqrt(ssq/count - mean^2) with a
  negative-variance clamp (rios/calcstats.py:656-692). Catalyst's
  partial/final hash aggregation IS this operator; we keep the exact
  final arithmetic (population stddev from sum/ssq) for parity.
- HistogramParams binning rules (rios/calcstats.py:289-361):
  thematic/byte → direct bins width 1 from 0 (negative values error);
  large ints → direct if range <= 256 else 256 linear bins;
  floats → 256 linear bins (1 bin when min == max).
- Median/mode from the histogram (rios/calcstats.py:954-970), including
  the int(round()) on integer types.
- Pyramid levels via strided subsampling arr[o::L, o::L], o = L//2,
  NEAREST only in single-pass (rios/calcstats.py:845-872) → here: the
  centre child of each parent cell, an exact deterministic filter +
  parent rollup (no nondeterministic first()).
- All-null contract: no stats rows are produced when every value is
  null (rios/riostests/teststats.py:495-555).
- Single-pass fusion: stats computed in the same pass as the write via
  df.observe() (the Spark analogue of SinglePassManager,
  rios/calcstats.py:400-616).

Null model: real SQL NULLs; NaN is treated as null explicitly
(rios/calcstats.py:662-663).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from rios_spark.grid import parent_col

MAX_LINEAR_BINS = 256


def _valid(df: DataFrame, col: str) -> DataFrame:
    c = F.col(col)
    cond = c.isNotNull()
    if dict(df.dtypes)[col] in ("float", "double"):
        cond = cond & ~F.isnan(c)
    return df.filter(cond)


def basic_stats(df: DataFrame, col: str, group: list[str] | None = None) -> DataFrame:
    """min/max/mean/stddev/count with RIOS final arithmetic.

    One shuffle (partial+final hash agg). Returns zero rows for an
    all-null input when grouped is empty — the all-null contract.
    """
    v = F.col(col).cast("double")
    aggs = [
        F.count(v).alias("count"),
        F.min(v).alias("minval"),
        F.max(v).alias("maxval"),
        F.sum(v).alias("sum"),
        F.sum(v * v).alias("ssq"),
    ]
    d = _valid(df, col)
    g = d.groupBy(*group) if group else d.groupBy()
    out = g.agg(*aggs).filter(F.col("count") > 0)
    mean = F.col("sum") / F.col("count")
    variance = F.col("ssq") / F.col("count") - mean * mean
    stddev = F.when(variance >= 0, F.sqrt(variance)).otherwise(F.lit(0.0))
    return out.select(
        *(group or []),
        "count",
        "minval",
        "maxval",
        mean.alias("mean"),
        stddev.alias("stddev"),
    )


@dataclass
class HistogramParams:
    """RIOS HistogramParams (rios/calcstats.py:289-361) computed from
    the column's observed min/max + declared kind."""

    min: float
    max: float
    step: float
    calcMin: float
    calcMax: float
    nbins: int
    binFunction: str  # 'direct' | 'linear'

    @classmethod
    def infer(cls, minval: float, maxval: float, kind: str, thematic: bool = False):
        """kind: 'byte' | 'int' | 'float' (the GDAL dtype classes)."""
        if thematic or kind == "byte":
            if minval < 0:
                raise ValueError(
                    "Histogram code does not cope with negative values in thematic raster"
                )
            mn = 0
            mx = int(np.ceil(maxval))
            return cls(mn, mx, 1.0, mn - 0.5, mx + 0.5, mx - mn + 1, "direct")
        if kind == "int":
            histrange = int(np.ceil(maxval) - np.floor(minval)) + 1
            mn, mx = int(minval), int(maxval)
            if histrange <= MAX_LINEAR_BINS:
                return cls(mn, mx, 1.0, mn - 0.5, mx + 0.5, histrange, "direct")
            step = float(mx - mn) / MAX_LINEAR_BINS
            return cls(mn, mx, step, mn, mx, MAX_LINEAR_BINS, "linear")
        if kind == "float":
            mn, mx = float(minval), float(maxval)
            calc_max, nbins = mx, MAX_LINEAR_BINS
            if mn == calc_max:
                calc_max, nbins = calc_max + 0.5, 1
            step = float(calc_max - mn) / nbins
            return cls(mn, mx, step, mn, calc_max, nbins, "linear")
        raise ValueError(f"unknown kind {kind!r}")


def histogram(
    df: DataFrame, col: str, kind: str, thematic: bool = False
) -> tuple[HistogramParams, np.ndarray]:
    """Histogram with RIOS binning rules. Two Spark jobs: a min/max agg
    to infer the params (cheap, column-pruned scan), then the binned
    count agg. Returns (params, dense counts ndarray of len nbins).

    Direct bins: groupBy(value).count() — exact.
    Linear bins: bin = clamp(floor((v - calcMin)/step), 0, nbins-1) —
    matches GDAL GetHistogram(include_out_of_range=1) edge handling.
    """
    d = _valid(df, col)
    mm = d.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
    if mm["mn"] is None:
        # all-null: no histogram (teststats.py:495-555 contract)
        return None, np.zeros(0, np.int64)
    params = HistogramParams.infer(float(mm["mn"]), float(mm["mx"]), kind, thematic)

    if params.binFunction == "direct":
        base = int(params.min)
        rows = (
            d.groupBy(F.col(col).cast("long").alias("v"))
            .count()
            .collect()
        )
        counts = np.zeros(params.nbins, np.int64)
        for r in rows:
            idx = int(r["v"]) - base
            if 0 <= idx < params.nbins:
                counts[idx] += r["count"]
    else:
        v = F.col(col).cast("double")
        b = F.floor((v - F.lit(params.calcMin)) / F.lit(params.step))
        b = F.greatest(F.lit(0).cast("long"), F.least(b, F.lit(params.nbins - 1).cast("long")))
        rows = d.groupBy(b.alias("bin")).count().collect()
        counts = np.zeros(params.nbins, np.int64)
        for r in rows:
            counts[int(r["bin"])] += r["count"]
    return params, counts


def median_mode_from_hist(
    params: HistogramParams, hist: np.ndarray, is_float: bool
) -> tuple[float, float]:
    """Exact RIOS arithmetic (rios/calcstats.py:954-970): median = first
    bin where cumsum >= total/2; mode = argmax bin; int types go through
    int(round(.)) (Python banker's rounding, as in the reference)."""
    middlenum = hist.astype(np.int64).sum() / 2
    medianbin = int((hist.astype(np.int64).cumsum() >= middlenum).nonzero()[0][0])
    medianval = medianbin * params.step + params.min
    modebin = int(np.argmax(hist))
    modeval = modebin * params.step + params.min
    if not is_float:
        return int(round(medianval)), int(round(modeval))
    return float(medianval), float(modeval)


def median_across_cols(cols: list, nodata=None):
    """Per-row median across N aligned input columns — the per-pixel
    median over a stack of co-registered inputs (SURVEY.md A15; the
    medianConcTest analogue, rios/riostests/medianConcTest.py:141-197).

    Nodata semantics match numbaMedian exactly: values equal to `nodata`
    (or NULL) are excluded; all-excluded rows yield NULL (the relational
    nodata); even counts average the two middle values (numpy.median).

    Pure JVM expressions (array_sort over the non-null stack) — no
    Python, no shuffle: this is a per-row map over the J1 aligned join.
    """
    arr = F.array(*[F.col(c).cast("double") if isinstance(c, str) else c.cast("double") for c in cols])
    if nodata is not None:
        keep = lambda v: v.isNotNull() & (v != F.lit(float(nodata)))  # noqa: E731
    else:
        keep = lambda v: v.isNotNull()  # noqa: E731
    s = F.array_sort(F.filter(arr, keep))
    n = F.size(s)
    mid = (n / 2).cast("int")
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        F.when(
            n % 2 == 1, F.element_at(s, mid + 1)
        ).otherwise((F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2.0)
    )


def pyramid_nearest(df: DataFrame, res: int, k: int, value_cols: list[str]) -> DataFrame:
    """NEAREST rollup k levels up (level L = 2^k): keep only the centre
    child of each parent (local offset o = L//2 in both axes — the
    relational form of arr[o::L, o::L], rios/calcstats.py:845-872),
    re-keyed to the parent cell. Deterministic; a pure filter + map, no
    groupBy at all — zero shuffle."""
    L = 1 << k
    o = L // 2
    from rios_spark.grid import Y_MUL, RES_MUL  # local import avoids cycle

    rem = F.col("cell") - F.lit(res * RES_MUL).cast("long")
    y = F.shiftright(rem, 29)
    x = rem.bitwiseAND(F.lit(Y_MUL - 1).cast("long"))
    centre = ((y % L) == o) & ((x % L) == o)
    return (
        df.filter(centre)
        .select(parent_col("cell", res, res - k).alias("cell"), *value_cols)
    )


def pyramid_average(df: DataFrame, res: int, k: int, value_cols: list[str]) -> DataFrame:
    """AVERAGE rollup (the GDAL fallback aggregation type): one
    partial+final agg by parent cell."""
    return (
        df.groupBy(parent_col("cell", res, res - k).alias("cell"))
        .agg(*[F.avg(c).alias(c) for c in value_cols])
    )


def approx_stats(df: DataFrame, col: str, fraction: float = 0.1, seed: int = 42) -> DataFrame:
    """Approximate statistics via sampling — the setApproxStats analogue
    (rios/applier.py:823-843, which uses raster overviews the same way:
    trade exactness for a much smaller scan). Adds approximate distinct
    count and median (approx_count_distinct / percentile_approx)."""
    s = df.sample(fraction=fraction, seed=seed)
    v = F.col(col).cast("double")
    return s.agg(
        F.count(v).alias("sample_count"),
        F.min(v).alias("minval"),
        F.max(v).alias("maxval"),
        F.avg(v).alias("mean"),
        F.stddev_pop(v).alias("stddev"),
        F.approx_count_distinct(col).alias("approx_distinct"),
        F.percentile_approx(v, 0.5).alias("approx_median"),
    )


def weighted_stats(df: DataFrame, col: str, weight: str, group: list[str] | None = None) -> DataFrame:
    """Histogram-weighted column stats (rios/fileinfo.py:381-503
    ColumnStats): count/mean/stddev/min/max/sum where `weight` is the
    pixel-count column. Null rows excluded, as the reference does."""
    v = F.col(col).cast("double")
    w = F.col(weight).cast("double")
    d = df.filter(v.isNotNull() & w.isNotNull())
    g = d.groupBy(*group) if group else d.groupBy()
    out = g.agg(
        F.sum(w).alias("count"),
        F.sum(v * w).alias("wsum"),
        F.sum(v * v * w).alias("wssq"),
        F.min(F.when(w > 0, v)).alias("minval"),
        F.max(F.when(w > 0, v)).alias("maxval"),
    ).filter(F.col("count") > 0)
    mean = F.col("wsum") / F.col("count")
    variance = F.col("wssq") / F.col("count") - mean * mean
    stddev = F.when(variance >= 0, F.sqrt(variance)).otherwise(F.lit(0.0))
    return out.select(
        *(group or []), "count", "minval", "maxval",
        mean.alias("mean"), stddev.alias("stddev"),
    )


# --- persisted stats (S8): the ImageLayerStats/ImageFileStats analogue -------

STATS_STORE_SCHEMA = (
    "table string, column string, snapshot string, count long, "
    "minval double, maxval double, mean double, stddev double, "
    "sum double, ssq double"
)
_STATS_KEYS = ("count", "minval", "maxval", "mean", "stddev", "sum", "ssq")


def persist_stats(
    spark, store_path: str, table: str, column: str, snapshot: str, stats: dict
) -> None:
    """Append one stats row keyed by (table, column, snapshot) to the
    stats store — the persisted side of S8: RIOS writes stats INTO the
    artifact's metadata so later readers get them for free
    (rios/fileinfo.py:200-293 ImageLayerStats reads them back). Here the
    store is a parquet table partitioned by table name (at deployment
    scale: an Iceberg table, so appends are snapshot commits)."""
    row = [
        (
            table, column, snapshot,
            int(stats.get("count") or 0),
            *(None if stats.get(k) is None else float(stats[k])
              for k in _STATS_KEYS[1:]),
        )
    ]
    spark.createDataFrame(row, STATS_STORE_SCHEMA).write.mode("append").partitionBy(
        "table"
    ).parquet(store_path)


def read_stats(
    spark, store_path: str, table: str | None = None, column: str | None = None,
    latest: bool = False,
) -> DataFrame:
    """Read previously persisted stats back (S8 read side — the
    ImageLayerStats analogue): no rescan of the data, just the store.
    latest=True keeps only the newest snapshot per (table, column)
    (snapshots are caller-provided sortable strings)."""
    out = spark.read.schema(STATS_STORE_SCHEMA).parquet(store_path)
    if table is not None:
        out = out.filter(F.col("table") == table)  # partition-pruned scan
    if column is not None:
        out = out.filter(F.col("column") == column)
    if latest:
        from pyspark.sql.window import Window

        w = Window.partitionBy("table", "column").orderBy(F.col("snapshot").desc())
        out = out.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") == 1
        ).drop("__rn")
    return out


def write_with_stats(
    df: DataFrame, path: str, col: str, partition_by: list[str] | None = None,
    stats_store: str | None = None, table: str | None = None,
    snapshot: str = "0",
) -> dict:
    """Single-pass fusion: write the data AND compute its basic stats in
    the SAME Spark action via df.observe() — the true analogue of
    RIOS's SinglePassManager computing stats during the write pass
    (rios/calcstats.py:400-616, rios/imagewriter.py:54-66).

    Returns the observed stats dict. On a real deployment the write
    target is an Iceberg table (snapshot commit == RIOS closeOutfiles);
    here: partitioned parquet.
    """
    v = F.col(col).cast("double")
    obs = Observation("single_pass_stats")
    observed = df.observe(
        obs,
        F.count(v).alias("count"),
        F.min(v).alias("minval"),
        F.max(v).alias("maxval"),
        F.sum(v).alias("sum"),
        F.sum(v * v).alias("ssq"),
    )
    w = observed.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    got = dict(obs.get)
    n = got["count"] or 0
    if n > 0:
        mean = got["sum"] / n
        variance = got["ssq"] / n - mean**2
        got["mean"] = mean
        got["stddev"] = float(np.sqrt(variance)) if variance >= 0 else 0.0
    if stats_store is not None:
        persist_stats(
            df.sparkSession, stats_store, table or path, col, snapshot, got
        )
    return got
