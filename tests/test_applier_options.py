"""riostests feature ports: input null override (testsetinputnull),
layer selection (testlayerselection), before-close hook
(testbeforeclose), plus hypothesis property tests for the grid and
the ray-cast kernel (exceeding the reference, which has no
property-based testing — SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rios_spark import applier, datagen, sources, spatial
from rios_spark import grid

RES, TILE = 10, 25


def test_set_input_null(spark):
    """testsetinputnull: the sentinel override turns matching values
    into real NULLs before the kernel sees them."""
    pdf = datagen.gen_ramp(100, 100, TILE, RES)
    df = spark.createDataFrame(pdf)
    sentinel = 52

    def kern(info, tile):
        return pd.DataFrame(
            {
                "cell": [info.cell],
                "nulls": [int(tile["value"].isna().sum())],
                "has_sentinel": [int((tile["value"] == sentinel).sum())],
            }
        )

    out = applier.apply(
        kern, {"img": df}, "cell long, nulls long, has_sentinel long",
        align_keys=["row", "col"],
        input_nulls={"img": {"value": sentinel}},
    ).toPandas()
    want_nulls = int((pdf["value"] == sentinel).sum())
    assert out["nulls"].sum() == want_nulls
    assert out["has_sentinel"].sum() == 0


def test_layer_selection(spark):
    """testlayerselection: only selected columns are visible to the
    kernel, and the scan is pruned to them."""
    pdf = datagen.gen_ramp(100, 100, TILE, RES)
    pdf["extra1"] = 1.0
    pdf["extra2"] = "x"
    df = spark.createDataFrame(pdf)

    seen: dict = {}

    def kern(info, tile):
        return pd.DataFrame({"cell": [info.cell], "ncols": [len(tile.columns)],
                             "cols": [",".join(sorted(tile.columns))]})

    out = applier.apply(
        kern, {"img": df}, "cell long, ncols long, cols string",
        align_keys=["row", "col"],
        select_layers={"img": ["value"]},
    ).toPandas()
    cols = set(out["cols"].iloc[0].split(","))
    assert "value" in cols and "extra1" not in cols and "extra2" not in cols


def test_before_close_hook(spark, tmp_path):
    """testbeforeclose: the hook runs on the final frame pre-commit."""
    pdf = datagen.gen_ramp(50, 50, TILE, RES)
    df = spark.createDataFrame(pdf)
    calls = []

    def hook(frame):
        calls.append(True)
        return frame.withColumn("stamped", F.lit("prewrite"))

    path = str(tmp_path / "bc")
    sources.write_tiled(df, path, RES, before_close=hook)
    assert calls == [True]
    back = spark.read.parquet(path)
    assert back.filter(F.col("stamped") == "prewrite").count() == len(pdf)


# --- property-based (hypothesis) ------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-90, max_value=90, allow_nan=False),
    lon=st.floats(min_value=-180, max_value=180, allow_nan=False),
    res=st.integers(min_value=0, max_value=28),
)
def test_prop_cell_roundtrip(lat, lon, res):
    c = grid.np_cell(np.array([lat]), np.array([lon]), res)[0]
    r, y, x = grid.np_decode(np.array([c]))
    n = 1 << res
    assert r[0] == res and 0 <= x[0] < n and 0 <= y[0] < n
    # centre re-encodes to the same cell
    clat, clon = grid.np_cell_center(np.array([c]))
    assert grid.np_cell(clat, clon, res)[0] == c


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    lon=st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    res=st.integers(min_value=1, max_value=27),
)
def test_prop_parent_nesting(lat, lon, res):
    fine = grid.np_cell(np.array([lat]), np.array([lon]), res + 1)
    coarse = grid.np_cell(np.array([lat]), np.array([lon]), res)
    assert grid.np_parent(fine, res)[0] == coarse[0]


@settings(max_examples=100, deadline=None)
@given(
    px=st.floats(min_value=-50, max_value=50, allow_nan=False),
    py=st.floats(min_value=-50, max_value=50, allow_nan=False),
    x0=st.floats(min_value=-40, max_value=0),
    y0=st.floats(min_value=-40, max_value=0),
    w=st.floats(min_value=0.5, max_value=40),
    h=st.floats(min_value=0.5, max_value=40),
)
def test_prop_raycast_rectangle(px, py, x0, y0, w, h):
    xs = np.array([x0, x0 + w, x0 + w, x0])
    ys = np.array([y0, y0, y0 + h, y0 + h])
    got = spatial.ray_cast(np.array([px]), np.array([py]), xs, ys)[0]
    want = (px >= x0) and (px < x0 + w) and (py >= y0) and (py < y0 + h)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    k=st.integers(min_value=0, max_value=3),
    res=st.integers(min_value=3, max_value=12),
    data=st.data(),
)
def test_prop_kring_symmetry(k, res, data):
    n = 1 << res
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    c = res * grid.RES_MUL + y * grid.Y_MUL + x
    ring = grid.np_kring(c, k)
    assert c in ring
    assert len(ring) <= (2 * k + 1) ** 2
    for other in ring:
        assert c in grid.np_kring(int(other), k)
