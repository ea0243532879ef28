"""teststats-parity port (rios/riostests/teststats.py:37-133):
stats/histogram/median/mode across dtype kinds x scale factors, exact
vs numpy, all-null contract, thematic rules, pyramids, weighted stats,
single-pass observe fusion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rios_spark import datagen, stats
from rios_spark.grid import RES_MUL, Y_MUL

N, TILE, RES = 200, 25, 10


def _ramp_values(scale=1.0, null_val=None, offset=0.0):
    pdf = datagen.gen_ramp(N, N, TILE, RES)
    vals = pdf["value"].to_numpy().astype(np.float64) * scale + offset
    if null_val is not None:
        vals = np.where(pdf["value"].to_numpy() == null_val, np.nan, vals)
    pdf = pdf.assign(value=vals)
    return pdf, vals[~np.isnan(vals)]


# (kind, scale, offset, null) — representative slice of teststats' matrix
CASES = [
    ("byte", 1.0, 0.0, 52),
    ("int", 300.0, 0.0, 52),
    ("int", 300.0, -6000.0, None),  # negative offset case (teststats.py:114-117)
    ("float", 0.01, 0.0, 52),
    ("float", 100.0, 0.0, None),
]


@pytest.mark.parametrize("kind,scale,offset,null_val", CASES)
def test_basic_stats_exact(spark, kind, scale, offset, null_val):
    pdf, valid = _ramp_values(scale, null_val, offset)
    df = spark.createDataFrame(pdf)
    got = stats.basic_stats(df, "value").collect()[0]
    assert got["count"] == len(valid)
    assert got["minval"] == pytest.approx(valid.min(), abs=1e-6)
    assert got["maxval"] == pytest.approx(valid.max(), abs=1e-6)
    assert got["mean"] == pytest.approx(valid.mean(), rel=1e-9)
    assert got["stddev"] == pytest.approx(valid.std(), rel=1e-6)


@pytest.mark.parametrize("kind,scale,offset,null_val", CASES)
def test_histogram_matches_numpy(spark, kind, scale, offset, null_val):
    pdf, valid = _ramp_values(scale, null_val, offset)
    if kind != "float":
        pdf["value"] = pdf["value"].round()
        valid = valid.round()
    df = spark.createDataFrame(pdf)
    params, counts = stats.histogram(df, "value", kind)
    assert counts.sum() == len(valid)
    # the reference compares against numpy.histogram (teststats.py:437-492)
    want, _ = np.histogram(valid, bins=params.nbins, range=(params.calcMin, params.calcMax))
    assert (counts == want).all(), (counts - want)
    # binning-rule parity
    if kind == "byte":
        assert params.binFunction == "direct" and params.step == 1.0 and params.min == 0
    if kind == "int":
        assert params.binFunction == "linear" and params.nbins == 256  # range > 256
    if kind == "float":
        assert params.binFunction == "linear" and params.nbins == 256


@pytest.mark.parametrize("kind,scale,offset,null_val", CASES)
def test_median_mode_tolerance(spark, kind, scale, offset, null_val):
    """median/mode from histogram within 0.3*scale (teststats.py:256-262)."""
    pdf, valid = _ramp_values(scale, null_val, offset)
    if kind != "float":
        pdf["value"] = pdf["value"].round()
        valid = valid.round()
    df = spark.createDataFrame(pdf)
    params, counts = stats.histogram(df, "value", kind)
    med, mode = stats.median_mode_from_hist(params, counts, is_float=(kind == "float"))
    assert abs(med - np.median(valid)) <= 0.3 * scale + params.step
    # mode: recompute by exact counting
    uniq, cnt = np.unique(valid, return_counts=True)
    true_mode = uniq[np.argmax(cnt)]
    assert abs(mode - true_mode) <= 0.3 * scale + params.step


def test_all_null_writes_no_stats(spark):
    """teststats.py:495-555: all-null output produces NO stats rows."""
    pdf = datagen.gen_ramp(50, 50, TILE, RES).assign(value=np.nan)
    df = spark.createDataFrame(pdf)
    assert stats.basic_stats(df, "value").count() == 0
    params, counts = stats.histogram(df, "value", "float")
    assert params is None and len(counts) == 0


def test_thematic_negative_raises(spark):
    pdf = datagen.gen_ramp(50, 50, TILE, RES)
    pdf["value"] = pdf["value"] - 10
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="negative values in thematic"):
        stats.histogram(df, "value", "int", thematic=True)


def test_small_int_range_is_direct(spark):
    pdf = datagen.gen_ramp(100, 100, TILE, RES)  # values 0..100, range 101 <= 256
    df = spark.createDataFrame(pdf)
    params, counts = stats.histogram(df, "value", "int")
    assert params.binFunction == "direct" and params.nbins == 101
    want = np.bincount(pdf["value"].to_numpy(), minlength=101)
    assert (counts == want).all()


def test_per_tile_stats_group(spark):
    pdf, _ = _ramp_values()
    df = spark.createDataFrame(pdf)
    got = stats.basic_stats(df, "value", group=["cell"]).toPandas().set_index("cell")
    want = pdf.groupby("cell")["value"].agg(["count", "min", "max", "mean"])
    for cell, row in want.iterrows():
        g = got.loc[cell]
        assert g["count"] == row["count"]
        assert g["mean"] == pytest.approx(row["mean"], rel=1e-9)


def test_pyramid_nearest_is_strided_subsample(spark):
    """A8 parity: NEAREST rollup == centre-child selection, exact."""
    pdf = datagen.gen_ramp(N, N, TILE, RES)
    df = spark.createDataFrame(pdf)
    k = 2  # level L=4
    out = stats.pyramid_nearest(df, RES, k, ["value", "row", "col"]).toPandas()
    # expected: tiles with (x%4==2, y%4==2) re-keyed to parent
    rem = pdf["cell"] - RES * RES_MUL
    y = rem // Y_MUL
    x = rem % Y_MUL
    keep = pdf[(y % 4 == 2) & (x % 4 == 2)]
    assert len(out) == len(keep)
    parent = (RES - k) * RES_MUL + (y[keep.index] // 4) * Y_MUL + (x[keep.index] // 4)
    assert set(out["cell"]) == set(parent)
    # zero shuffle: the plan must contain no Exchange
    plan = stats.pyramid_nearest(df, RES, k, ["value"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pyramid_average(spark):
    pdf = datagen.gen_ramp(100, 100, TILE, RES)
    df = spark.createDataFrame(pdf)
    out = stats.pyramid_average(df, RES, 1, ["value"]).toPandas()
    rem = pdf["cell"] - RES * RES_MUL
    parent = (RES - 1) * RES_MUL + ((rem // Y_MUL) // 2) * Y_MUL + ((rem % Y_MUL) // 2)
    want = pdf.assign(parent=parent).groupby("parent")["value"].mean()
    got = out.set_index("cell")["value"]
    for p, v in want.items():
        assert got[p] == pytest.approx(v, rel=1e-9)


def test_weighted_stats(spark):
    """A11: histogram-weighted stats == numpy repeat oracle."""
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"v": rng.normal(10, 3, 200), "w": rng.integers(0, 50, 200)})
    df = spark.createDataFrame(pdf)
    got = stats.weighted_stats(df, "v", "w").collect()[0]
    expanded = np.repeat(pdf["v"].to_numpy(), pdf["w"].to_numpy())
    assert got["count"] == len(expanded)
    assert got["mean"] == pytest.approx(expanded.mean(), rel=1e-9)
    assert got["stddev"] == pytest.approx(expanded.std(), rel=1e-6)
    assert got["minval"] == pytest.approx(expanded.min())
    assert got["maxval"] == pytest.approx(expanded.max())


def test_write_with_stats_single_pass(spark, tmp_path):
    """A10: observe() computes stats in the same action as the write."""
    pdf, valid = _ramp_values(null_val=52)
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "out.parquet")
    got = stats.write_with_stats(df, path, "value")
    assert got["count"] == len(valid)
    assert got["mean"] == pytest.approx(valid.mean(), rel=1e-9)
    back = spark.read.parquet(path)
    assert back.count() == len(pdf)


def test_median_across_cols_matches_numba_median_semantics(spark):
    """A15 parity with numbaMedian (rios/riostests/medianConcTest.py:
    171-197): nodata excluded, all-nodata rows -> nodata (NULL), single
    survivor -> itself, even counts -> average of the two middles."""
    import pandas as pd
    from rios_spark.stats import median_across_cols

    rng = np.random.default_rng(5)
    n = 500
    stack = rng.integers(0, 50, size=(n, 5)).astype(float)  # 0 == nodata
    pdf = pd.DataFrame(stack, columns=[f"v{i}" for i in range(5)])
    pdf["key"] = np.arange(n)
    df = spark.createDataFrame(pdf)
    got = (
        df.select("key", median_across_cols([f"v{i}" for i in range(5)], nodata=0).alias("med"))
        .toPandas()
        .sort_values("key")["med"]
        .to_numpy()
    )
    want = np.empty(n)
    for i in range(n):
        vals = stack[i][stack[i] != 0]
        want[i] = np.median(vals) if len(vals) else np.nan
    np.testing.assert_allclose(got, want, rtol=0, atol=0, equal_nan=True)


def test_persisted_stats_roundtrip(spark, tmp_path):
    """S8 persisted side (ImageLayerStats analogue,
    rios/fileinfo.py:200-293): stats written during the single-pass
    write are re-readable from the store WITHOUT rescanning the data."""
    import pandas as pd
    from rios_spark.stats import read_stats, write_with_stats

    pdf = pd.DataFrame({"k": np.arange(100) % 7, "v": np.arange(100, dtype=float)})
    df = spark.createDataFrame(pdf)
    store = str(tmp_path / "stats_store")
    got = write_with_stats(
        df, str(tmp_path / "out.parquet"), "v",
        stats_store=store, table="t1", snapshot="0001",
    )
    # a later snapshot of the same (table, column)
    write_with_stats(
        df.filter("v < 50"), str(tmp_path / "out2.parquet"), "v",
        stats_store=store, table="t1", snapshot="0002",
    )
    back = read_stats(spark, store, table="t1", column="v").toPandas()
    assert len(back) == 2
    r1 = back[back["snapshot"] == "0001"].iloc[0]
    assert r1["count"] == 100 and r1["minval"] == 0.0 and r1["maxval"] == 99.0
    assert r1["mean"] == got["mean"] and r1["stddev"] == got["stddev"]
    latest = read_stats(spark, store, table="t1", column="v", latest=True).toPandas()
    assert len(latest) == 1 and latest.iloc[0]["snapshot"] == "0002"
    assert latest.iloc[0]["count"] == 50


def test_signed_int8_roundtrip_and_stats(spark, tmp_path):
    """testsigned8bit parity (rios/riostests/testsigned8bit.py): the
    full TINYINT range (-128..127) round-trips through a tiled write
    byte-exact and its statistics are exact — negative values neither
    wrap nor upcast silently."""
    import pandas as pd

    from pyspark.sql import functions as F

    from rios_spark import sources
    from rios_spark.grid import cell_col

    vals = np.arange(-128, 128, dtype=np.int8)
    pdf = pd.DataFrame(
        {
            "pix": np.arange(256),
            "v": vals,
            "lat": np.linspace(-80, 80, 256),
            "lon": np.linspace(-170, 170, 256),
        }
    )
    df = (
        spark.createDataFrame(pdf)
        .withColumn("v", F.col("v").cast("tinyint"))
        .withColumn("cell", cell_col("lat", "lon", 4))
    )
    path = str(tmp_path / "int8_tiled")
    sources.write_tiled(df, path, 4)
    back = sources.read_tiled(spark, path, 4)
    assert dict(back.dtypes)["v"] == "tinyint"  # dtype preserved end-to-end
    got = back.select("pix", "v").toPandas().sort_values("pix")
    assert (got["v"].to_numpy(np.int8) == vals).all()
    s = stats.basic_stats(back, "v").collect()[0]
    assert s["minval"] == -128.0 and s["maxval"] == 127.0
    assert s["mean"] == pytest.approx(vals.astype(np.float64).mean())
    assert s["count"] == 256


def test_apply_return_observe_sideoutputs(spark, tmp_path):
    """testapplyreturn parity (rios/riostests/testapplyreturn.py:58-85):
    RIOS kernels accumulate sums in otherargs that the caller reduces
    across workers into an average; the Spark re-expression is
    observe() side-metrics on the SAME action as the output write — one
    pass, any number of workers, same answer as a direct aggregate."""
    import pandas as pd

    rng = np.random.default_rng(21)
    pdf = pd.DataFrame({"k": np.arange(5000), "value": rng.integers(0, 100, 5000).astype(float)})
    df = spark.createDataFrame(pdf).repartition(16)  # many "workers"
    got = stats.write_with_stats(df, str(tmp_path / "ar_out"), "value")
    avg = got["sum"] / got["count"]
    assert got["count"] == 5000
    assert avg == pytest.approx(pdf["value"].mean(), rel=1e-12)
