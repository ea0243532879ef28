"""Tile-index parity: numpy == Spark Column == SQL text (Spark & DuckDB).

The engine's correctness rests on all engines assigning identical cells
(BASELINE.json: "tile assignments ... must match the reference engine
exactly"). These tests pin that invariant.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from rios_spark import grid


def _rand_latlon(n, seed=0):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-90, 90, n)
    lon = rng.uniform(-180, 180, n)
    # include exact edges / poles / antimeridian
    lat[:6] = [90.0, -90.0, 0.0, 89.999999, -89.999999, 45.0]
    lon[:6] = [180.0, -180.0, 0.0, 179.999999, -179.999999, 45.0]
    return lat, lon


@pytest.mark.parametrize("res", [0, 1, 6, 12, 20, 28])
def test_np_roundtrip(res):
    lat, lon = _rand_latlon(500, seed=res)
    cells = grid.np_cell(lat, lon, res)
    r, y, x = grid.np_decode(cells)
    assert (r == res).all()
    n = 1 << res
    assert (x >= 0).all() and (x < n).all()
    assert (y >= 0).all() and (y < n).all()
    # centre of every cell re-encodes to the same cell
    clat, clon = grid.np_cell_center(cells)
    assert (grid.np_cell(clat, clon, res) == cells).all()


def test_parent_is_quadtree():
    lat, lon = _rand_latlon(1000, seed=7)
    fine = grid.np_cell(lat, lon, 12)
    coarse = grid.np_cell(lat, lon, 9)
    assert (grid.np_parent(fine, 9) == coarse).all()


def test_kring_counts_and_symmetry():
    c = grid.np_cell(np.array([10.0]), np.array([20.0]), 8)[0]
    ring1 = grid.np_kring(c, 1)
    assert len(ring1) == 9 and c in ring1
    # symmetry: a is in kring(b) iff b is in kring(a)
    for other in ring1:
        assert c in grid.np_kring(int(other), 1)
    # pole clamp: a cell in the top row has a 6-cell ring
    top = 8 * grid.RES_MUL + 0 * grid.Y_MUL + 5
    assert len(grid.np_kring(top, 1)) == 6
    # antimeridian wrap: x=0 ring includes x=n-1
    west = 8 * grid.RES_MUL + 10 * grid.Y_MUL + 0
    ring = grid.np_kring(west, 1)
    xs = ring % grid.Y_MUL
    assert (1 << 8) - 1 in xs


@pytest.mark.parametrize("res", [4, 7, 12])
def test_spark_column_matches_numpy(spark, res):
    lat, lon = _rand_latlon(2000, seed=res + 100)
    pdf = pd.DataFrame({"lat": lat, "lon": lon})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(grid.cell_col("lat", "lon", res).alias("cell"))
        .toPandas()["cell"]
        .to_numpy()
    )
    want = grid.np_cell(lat, lon, res)
    assert (got == want).all()


@pytest.mark.parametrize("res", [4, 7, 12])
def test_sql_text_matches_numpy_on_duckdb_and_spark(spark, res):
    lat, lon = _rand_latlon(2000, seed=res + 200)
    pdf = pd.DataFrame({"lat": lat, "lon": lon})
    expr = grid.cell_sql("lat", "lon", res)
    con = duckdb.connect()
    con.register("t", pdf)
    duck = con.execute(f"select {expr} as cell from t").df()["cell"].to_numpy()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("t_grid_sql")
    sp = spark.sql(f"select {expr} as cell from t_grid_sql").toPandas()["cell"].to_numpy()
    want = grid.np_cell(lat, lon, res)
    assert (duck == want).all()
    assert (sp == want).all()


def test_spark_parent_and_kring_cols(spark):
    lat, lon = _rand_latlon(500, seed=5)
    pdf = pd.DataFrame({"lat": lat, "lon": lon})
    sdf = spark.createDataFrame(pdf).select(grid.cell_col("lat", "lon", 10).alias("cell"))
    out = sdf.select(
        "cell",
        grid.parent_col("cell", 10, 7).alias("parent"),
        grid.kring_cells_col("cell", 10, 1).alias("ring"),
    ).toPandas()
    cells = out["cell"].to_numpy()
    assert (out["parent"].to_numpy() == grid.np_parent(cells, 7)).all()
    for i in range(len(out)):
        want = set(grid.np_kring(int(cells[i]), 1).tolist())
        assert set(out["ring"][i]) == want


def test_geocode_parity(spark):
    keys = pd.DataFrame({"k": np.arange(1, 5000, dtype=np.int64)})
    lat_sql, lon_sql = grid.geocode_sql("k")
    con = duckdb.connect()
    con.register("t", keys)
    duck = con.execute(f"select {lat_sql} as lat, {lon_sql} as lon from t").df()
    sdf = spark.createDataFrame(keys)
    lat_c, lon_c = grid.geocode_cols("k")
    sp = sdf.select(lat_c.alias("lat"), lon_c.alias("lon")).toPandas()
    assert np.array_equal(duck["lat"].to_numpy(), sp["lat"].to_numpy())
    assert np.array_equal(duck["lon"].to_numpy(), sp["lon"].to_numpy())
    assert duck["lat"].between(-85, 85).all()
    assert duck["lon"].between(-180, 180).all()


def test_polyfill_bbox():
    cells = grid.np_polyfill_bbox(-10, -10, 10, 10, 6)
    # every cell centre must be inside (or on) the padded bbox
    clat, clon = grid.np_cell_center(cells)
    pad = 360.0 / (1 << 6)
    assert (clon >= -10 - pad).all() and (clon <= 10 + pad).all()
    assert (clat >= -10 - pad).all() and (clat <= 10 + pad).all()
    # and the bbox corners' cells are all in the cover
    for la, lo in [(-10, -10), (-10, 10), (10, -10), (10, 10), (0, 0)]:
        c = grid.np_cell(np.array([float(la)]), np.array([float(lo)]), 6)[0]
        assert c in cells


def test_mercator_roundtrip(spark):
    """testreproj parity analogue: WGS84 -> EPSG:3857 -> WGS84
    roundtrip is exact to fp noise; known anchor values match."""
    import pandas as pd

    from rios_spark.grid import inverse_mercator_cols, mercator_cols

    rng = np.random.default_rng(31)
    pdf = pd.DataFrame({"lat": rng.uniform(-85, 85, 2000), "lon": rng.uniform(-180, 180, 2000)})
    df = spark.createDataFrame(pdf)
    x, y = mercator_cols("lat", "lon")
    proj = df.select("lat", "lon", x.alias("x"), y.alias("y"))
    la, lo = inverse_mercator_cols("x", "y")
    back = proj.select("lat", "lon", la.alias("lat2"), lo.alias("lon2")).toPandas()
    assert np.allclose(back["lat"], back["lat2"], atol=1e-9)
    assert np.allclose(back["lon"], back["lon2"], atol=1e-9)
    # anchor: (0,0) -> (0,0); lon=180 -> x = pi*R
    anchor = spark.createDataFrame(pd.DataFrame({"lat": [0.0], "lon": [180.0]}))
    ax, ay = mercator_cols("lat", "lon")
    got = anchor.select(ax.alias("x"), ay.alias("y")).collect()[0]
    assert got["x"] == pytest.approx(np.pi * 6378137.0)
    assert got["y"] == pytest.approx(0.0, abs=1e-6)
