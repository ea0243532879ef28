"""Spatial join oracles.

- testvector parity (rios/riostests/testvector.py:99-152): zonal mean
  inside polygons == numpy mask mean exactly; disjoint polygon → no row.
- PIP edge semantics: half-open rectangles == SQL range predicates
  (the DuckDB-oracle contract).
- kNN: tiled distributed kNN == brute force exactly, including ties
  and the completeness-guard fallback.
- NN-resample analogue (rios/riostests/testresample.py:86-117): k=1
  euclidean NN of a shifted grid == array shift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rios_spark import datagen, spatial
from rios_spark.grid import cell_col, np_cell


def _pages_df(spark, n=8000, res=5):
    pages = datagen.gen_pages(n)
    return (
        spark.createDataFrame(pages[["page_id", "lat", "lon", "lang"]])
        .withColumn("cell", cell_col("lat", "lon", res))
    ), pages


def test_ray_cast_rectangle_half_open():
    xs = np.array([0.0, 10.0, 10.0, 0.0])
    ys = np.array([0.0, 0.0, 5.0, 5.0])
    px = np.array([5.0, 0.0, 10.0, 5.0, 5.0, -1.0, 11.0, 5.0, 5.0])
    py = np.array([2.0, 2.0, 2.0, 0.0, 5.0, 2.0, 2.0, -1.0, 6.0])
    got = spatial.ray_cast(px, py, xs, ys)
    # [xmin, xmax) x [ymin, ymax): left/bottom edges IN, right/top OUT
    want = np.array([True, True, False, True, False, False, False, False, False])
    assert (got == want).all()


def test_ray_cast_matches_sql_ranges_on_random_points():
    rng = np.random.default_rng(9)
    px = rng.uniform(-20, 20, 5000)
    py = rng.uniform(-20, 20, 5000)
    xs = np.array([-5.0, 8.0, 8.0, -5.0])
    ys = np.array([-3.0, -3.0, 7.0, 7.0])
    got = spatial.ray_cast(px, py, xs, ys)
    want = (px >= -5.0) & (px < 8.0) & (py >= -3.0) & (py < 7.0)
    assert (got == want).all()


def test_pip_join_and_zonal_match_numpy(spark):
    res = 5
    df, pages = _pages_df(spark, 8000, res)
    polys = datagen.gen_polygons()

    out = spatial.zonal_stats(df, polys, res, "page_id").toPandas().set_index("polygon_id")

    lon = pages["lon"].to_numpy()
    lat = pages["lat"].to_numpy()
    pid_vals = pages["page_id"].to_numpy(np.float64)
    seen = 0
    for _, p in polys.iterrows():
        xs = np.asarray(p["xs"], np.float64)
        ys = np.asarray(p["ys"], np.float64)
        mask = spatial.ray_cast(lon, lat, xs, ys)
        pid = int(p["polygon_id"])
        if mask.sum() == 0:
            assert pid not in out.index  # disjoint → no row
            continue
        seen += 1
        row = out.loc[pid]
        assert row["count"] == mask.sum()
        assert row["mean"] == pytest.approx(pid_vals[mask].mean(), rel=1e-12)
        assert row["minval"] == pid_vals[mask].min()
        assert row["maxval"] == pid_vals[mask].max()
    assert seen >= 3  # big_band + pentagon + at least one square hit
    # disjoint polygon must be absent
    dis = int(polys[polys["kind"] == "disjoint"]["polygon_id"].iloc[0])
    assert dis not in out.index


def test_pip_join_row_level(spark):
    """A point inside two overlapping polygons yields two rows."""
    res = 4
    pts = pd.DataFrame({"page_id": [0, 1], "lat": [1.0, 50.0], "lon": [1.0, 50.0]})
    df = spark.createDataFrame(pts).withColumn("cell", cell_col("lat", "lon", res))
    polys = pd.DataFrame(
        {
            "polygon_id": [0, 1],
            "xs": [[-5.0, 5.0, 5.0, -5.0], [-3.0, 3.0, 3.0, -3.0]],
            "ys": [[-5.0, -5.0, 5.0, 5.0], [-3.0, -3.0, 3.0, 3.0]],
        }
    )
    out = spatial.pip_join(df, polys, res).toPandas()
    assert len(out) == 2
    assert set(out["polygon_id"]) == {0, 1}
    assert (out["page_id"] == 0).all()


def _brute_oracle(qdf, ddf, k):
    d = spatial.haversine_km(
        qdf["lat"].to_numpy()[:, None],
        qdf["lon"].to_numpy()[:, None],
        ddf["lat"].to_numpy()[None, :],
        ddf["lon"].to_numpy()[None, :],
    )
    ids = ddf["id"].to_numpy()
    out = {}
    for i in range(len(qdf)):
        order = np.lexsort((ids, d[i]))[:k]
        out[int(qdf["qid"].iloc[i])] = [(int(ids[j]), d[i][j]) for j in order]
    return out


def test_knn_bruteforce_exact(spark):
    rng = np.random.default_rng(11)
    qdf = pd.DataFrame(
        {"qid": np.arange(50), "lat": rng.uniform(-40, 40, 50), "lon": rng.uniform(-90, 90, 50)}
    )
    ddf = pd.DataFrame(
        {"id": np.arange(300), "lat": rng.uniform(-45, 45, 300), "lon": rng.uniform(-95, 95, 300)}
    )
    got = (
        spatial.knn_bruteforce(spark.createDataFrame(qdf), ddf, 3, d_id="id")
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    want = _brute_oracle(qdf, ddf, 3)
    for qid, grp in got.groupby("qid"):
        pairs = list(zip(grp["neighbor_id"], grp["dist_km"]))
        for (gi, gd), (wi, wd) in zip(pairs, want[qid]):
            assert gi == wi
            assert gd == pytest.approx(wd, rel=1e-12)


def test_knn_tiled_equals_bruteforce(spark):
    """The distributed kNN (candidates + guard + residue) is EXACT."""
    res = 4
    rng = np.random.default_rng(13)
    # clustered data so some queries have dense rings and others sparse
    # (forcing both the fast path and the brute-force residue)
    centers = rng.uniform(-60, 60, (5, 2))
    dpts = np.concatenate(
        [c + rng.normal(0, 3, (60, 2)) for c in centers]
        + [rng.uniform(-70, 70, (30, 2))]
    )
    ddf = pd.DataFrame({"id": np.arange(len(dpts)), "lat": dpts[:, 0], "lon": dpts[:, 1]})
    qpts = rng.uniform(-65, 65, (40, 2))
    qdf = pd.DataFrame({"qid": np.arange(40), "lat": qpts[:, 0], "lon": qpts[:, 1]})

    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))

    got = (
        spatial.knn_tiled(queries, data, 3, res, ring=1, d_id="id")
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    want = _brute_oracle(qdf, ddf, 3)
    assert len(got) == 40 * 3
    for qid, grp in got.groupby("qid"):
        pairs = list(zip(grp["neighbor_id"], grp["dist_km"]))
        for (gi, gd), (wi, wd) in zip(pairs, want[int(qid)]):
            assert gi == wi, f"qid={qid}: {pairs} vs {want[int(qid)]}"
            assert gd == pytest.approx(wd, rel=1e-9)


def test_knn_tiled_internal_retile_exact(spark):
    """Dense data at a coarse caller res triggers the density-adaptive
    internal re-tile (ring='auto'); results must stay exact and the
    caller's cell column must pass through untouched (r7: candidate
    volume at a fixed res grows linearly with density — the sf10
    cliff)."""
    res = 3  # 64 cells; 3000 points -> ~47/cell: retile must fire
    rng = np.random.default_rng(29)
    dpts = rng.uniform(-60, 60, (3000, 2))
    ddf = pd.DataFrame(
        {"id": np.arange(len(dpts)), "lat": dpts[:, 0], "lon": dpts[:, 1]}
    )
    qpts = rng.uniform(-65, 65, (50, 2))
    qdf = pd.DataFrame({"qid": np.arange(50), "lat": qpts[:, 0], "lon": qpts[:, 1]})

    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))

    counters = {}
    got = (
        spatial.knn_tiled(queries, data, 3, res, d_id="id", q_id="qid",
                          counters=counters)
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    # the re-tile fired: 9 * 3000 / 4^r >= 12 holds up to r = 5
    assert counters["res_internal"] == 5
    assert len(got) == 50 * 3
    # caller's res-3 cell values pass through unchanged
    cell3 = (
        spark.createDataFrame(qdf)
        .withColumn("cell", cell_col("lat", "lon", res))
        .toPandas()
        .set_index("qid")["cell"]
    )
    for qid, grp in got.groupby("qid"):
        assert (grp["cell"] == cell3[int(qid)]).all()
    want = _brute_oracle(qdf, ddf, 3)
    for qid, grp in got.groupby("qid"):
        pairs = list(zip(grp["neighbor_id"], grp["dist_km"]))
        for (gi, gd), (wi, wd) in zip(pairs, want[int(qid)]):
            assert gi == wi, f"qid={qid}: {pairs} vs {want[int(qid)]}"
            assert gd == pytest.approx(wd, rel=1e-9)


def test_nn_resample_equals_array_shift(spark):
    """testresample parity: NN (k=1, euclidean on grid coords) of a
    half-pixel-shifted grid == array shift, exact."""
    n = 60
    rows, cols = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vals = ((rows + cols) * 100.0 / (2 * n - 2)).astype(np.uint8).astype(np.int64)
    # data: pixel centres at integer coords
    ddf = pd.DataFrame(
        {"id": np.arange(n * n), "lat": rows.ravel().astype(float), "lon": cols.ravel().astype(float)}
    )
    # queries: grid shifted by (+0.3, -0.4) px → NN is the same pixel
    # offset by (0, 0) rounded — i.e. value at (row, col) again
    qdf = pd.DataFrame(
        {
            "qid": np.arange(n * n),
            "lat": rows.ravel() + 0.3,
            "lon": cols.ravel() - 0.4,
        }
    )
    got = (
        spatial.knn_bruteforce(
            spark.createDataFrame(qdf), ddf, 1, metric="euclidean", d_id="id"
        )
        .toPandas()
        .sort_values("qid")
    )
    # nearest integer coords = (round(lat), round(lon)) = (row, col)
    assert (got["neighbor_id"].to_numpy() == np.arange(n * n)).all()
    # a full-pixel shift picks the shifted pixel (the array-shift oracle)
    qdf2 = qdf.assign(lat=qdf["lat"] + 1.0)  # total +1.3 → rounds to row+1
    got2 = (
        spatial.knn_bruteforce(
            spark.createDataFrame(qdf2), ddf, 1, metric="euclidean", d_id="id"
        )
        .toPandas()
        .sort_values("qid")
    )
    want2 = np.where(rows.ravel() + 1 < n, (rows.ravel() + 1) * n + cols.ravel(), got2["neighbor_id"])
    assert (got2["neighbor_id"].to_numpy() == want2).all()


def test_resample_bilinear(spark):
    """Bilinear/IDW resample: exact-hit returns the point's value;
    otherwise the IDW of the 4 nearest — checked vs a numpy oracle."""
    rng = np.random.default_rng(17)
    ddf = pd.DataFrame(
        {"id": np.arange(100), "lat": rng.uniform(-10, 10, 100),
         "lon": rng.uniform(-10, 10, 100), "v": rng.normal(0, 5, 100)}
    )
    qdf = pd.DataFrame(
        {"qid": np.arange(30), "lat": rng.uniform(-9, 9, 30), "lon": rng.uniform(-9, 9, 30)}
    )
    # make query 0 an exact hit on data point 7
    qdf.loc[0, ["lat", "lon"]] = ddf.loc[7, ["lat", "lon"]].to_numpy()
    out = (
        spatial.resample_bilinear(spark.createDataFrame(qdf), ddf, "v", d_id="id")
        .toPandas().set_index("qid").sort_index()
    )
    assert len(out) == 30
    assert out.loc[0, "resampled"] == pytest.approx(ddf.loc[7, "v"], rel=1e-9)
    # numpy oracle for a few queries
    for qid in (1, 5, 12):
        q = qdf[qdf.qid == qid].iloc[0]
        d = spatial.haversine_km(q.lat, q.lon, ddf["lat"].to_numpy(), ddf["lon"].to_numpy())
        order = np.lexsort((ddf["id"].to_numpy(), d))[:4]
        w = 1.0 / d[order]
        want = (w * ddf["v"].to_numpy()[order]).sum() / w.sum()
        assert out.loc[qid, "resampled"] == pytest.approx(want, rel=1e-9)


def test_resample_pair_budget_dispatch_exact(spark, monkeypatch, tmp_path):
    """r7: past KNN_BRUTE_PAIR_BUDGET pairs resample_join's neighbour
    search reroutes to the tiled+guard path (the broadcast kernel is
    O(Q x N)); the resampled values must match the brute path. The
    query side must be parquet-backed for the free metadata count that
    arms the gate."""
    rng = np.random.default_rng(41)
    ddf = pd.DataFrame(
        {"id": np.arange(400), "lat": rng.uniform(-30, 30, 400),
         "lon": rng.uniform(-30, 30, 400), "v": rng.normal(0, 5, 400)}
    )
    qdf = pd.DataFrame(
        {"qid": np.arange(60), "lat": rng.uniform(-29, 29, 60),
         "lon": rng.uniform(-29, 29, 60)}
    )
    qpath = str(tmp_path / "queries.parquet")
    spark.createDataFrame(qdf).write.parquet(qpath)
    queries = spark.read.parquet(qpath)

    brute = (
        spatial.resample_join(queries, ddf, "v", method="bilinear", d_id="id")
        .toPandas().set_index("qid").sort_index()
    )
    monkeypatch.setattr(spatial, "KNN_BRUTE_PAIR_BUDGET", 100)  # 60*400 >> 100
    tiled = (
        spatial.resample_join(queries, ddf, "v", method="bilinear", d_id="id")
        .toPandas().set_index("qid").sort_index()
    )
    assert len(tiled) == 60
    for qid in qdf["qid"]:
        assert tiled.loc[qid, "resampled"] == pytest.approx(
            brute.loc[qid, "resampled"], rel=1e-9
        )


def test_asof_join_matches_pandas(spark):
    """As-of join == pandas merge_asof (inclusive <= semantics)."""
    from rios_spark.temporal import asof_join

    rng = np.random.default_rng(23)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 200), "ts": rng.integers(0, 1000, 200),
        "lv": np.arange(200),
    }).drop_duplicates(["k", "ts"])
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 60), "ts": rng.integers(0, 1000, 60),
        "rv": np.arange(60) * 10,
    }).drop_duplicates(["k", "ts"])
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right), "k", "ts")
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k",
        direction="backward", allow_exact_matches=True,
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    assert len(got) == len(want)
    g = got["rv_asof"].fillna(-1).to_numpy()
    w = want["rv"].fillna(-1).to_numpy()
    assert (g == w).all()


def test_knn_join_auto_dispatch(spark):
    """knn_join: small data -> broadcast brute; results identical to
    the explicitly tiled path."""
    rng = np.random.default_rng(41)
    qdf = pd.DataFrame({"qid": np.arange(20), "lat": rng.uniform(-40, 40, 20), "lon": rng.uniform(-40, 40, 20)})
    ddf = pd.DataFrame({"id": np.arange(80), "lat": rng.uniform(-45, 45, 80), "lon": rng.uniform(-45, 45, 80)})
    q = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", 4))
    d = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", 4))
    auto = spatial.knn_join(q, d, 3, 4, d_id="id").toPandas().sort_values(["qid", "rank"])
    tiled = spatial.knn_tiled(q, d, 3, 4, d_id="id", q_id="qid").toPandas().sort_values(["qid", "rank"])
    assert auto["neighbor_id"].tolist() == tiled["neighbor_id"].tolist()


def test_block_topk_chunking_invariant(monkeypatch):
    """The GEMM memory cap (KNN_GEMM_BUDGET) must not change results:
    a tiny budget forces many query-row chunks; compare against the
    unchunked full-sort answer."""
    rng = np.random.default_rng(21)
    nq, nd, k = 37, 211, 5
    qla, qlo = rng.uniform(-60, 60, nq), rng.uniform(-170, 170, nq)
    dla, dlo = rng.uniform(-60, 60, nd), rng.uniform(-170, 170, nd)
    did = rng.permutation(nd).astype(np.int64)
    monkeypatch.setattr(spatial, "KNN_GEMM_BUDGET", 100)  # ~0.5 rows/chunk worth
    ids, dist = spatial._block_topk(qla, qlo, dla, dlo, did, k)
    full = spatial.haversine_km(qla[:, None], qlo[:, None], dla[None, :], dlo[None, :])
    for i in range(nq):
        order = np.lexsort((did, full[i]))[:k]
        assert ids[i].tolist() == did[order].tolist()
        np.testing.assert_allclose(dist[i], full[i][order], rtol=1e-12)


def test_knn_tiled_residual_scan_no_driver_collect(spark):
    """Force the full residue path: data so sparse that no ring (or
    escalated ring) can prove completeness for most queries — the
    distributed residual scan must still return the EXACT answer.
    Replaces the round-1 data.toPandas() full collect (VERDICT #5)."""
    res = 6
    rng = np.random.default_rng(31)
    # 6 data points on a planet: every k=3 guard fails at ring 1
    ddf = pd.DataFrame(
        {"id": np.arange(6), "lat": rng.uniform(-70, 70, 6), "lon": rng.uniform(-170, 170, 6)}
    )
    qdf = pd.DataFrame(
        {"qid": np.arange(25), "lat": rng.uniform(-70, 70, 25), "lon": rng.uniform(-170, 170, 25)}
    )
    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))
    got = (
        spatial.knn_tiled(queries, data, 3, res, ring=1, d_id="id", q_id="qid")
        .toPandas()
        .sort_values(["qid", "rank"])
    )
    want = _brute_oracle(qdf, ddf, 3)
    assert len(got) == 25 * 3
    for qid, grp in got.groupby("qid"):
        pairs = list(zip(grp["neighbor_id"], grp["dist_km"]))
        for (gi, gd), (wi, wd) in zip(pairs, want[int(qid)]):
            assert gi == wi
            assert gd == pytest.approx(wd, rel=1e-9)


def test_zonal_salt_uses_partition_id(spark):
    """Skew contract: the zonal stage-1 salt must split a HOT CELL, so
    it cannot be a function of the cell value (round-1 bug: xxhash64 of
    the cell gave every row of a hot tile the same salt). The physical
    plan must salt on SPARK_PARTITION_ID, and results stay exact."""
    rng = np.random.default_rng(41)
    n = 4000
    # every point in one hot cell (one dense web host tile)
    pdf = pd.DataFrame(
        {
            "page_id": np.arange(n),
            "lat": 10.0 + rng.uniform(0, 0.01, n),
            "lon": 20.0 + rng.uniform(0, 0.01, n),
            "v": rng.integers(0, 100, n).astype(float),
        }
    )
    pts = (
        spark.createDataFrame(pdf)
        .repartition(8)
        .withColumn("cell", cell_col("lat", "lon", 5))
    )
    polys = pd.DataFrame(
        [{"polygon_id": 0, "xs": [0.0, 40.0, 40.0, 0.0], "ys": [0.0, 0.0, 40.0, 40.0]}]
    )
    out = spatial.zonal_stats(pts, polys, 5, "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan
    row = out.toPandas().iloc[0]
    assert row["count"] == n
    assert row["sum"] == pytest.approx(pdf["v"].sum())
    assert row["mean"] == pytest.approx(pdf["v"].mean())


def test_asof_join_null_payload_from_matched_row(spark):
    """A genuinely-NULL payload column in the matched right row must come
    through as NULL — not be back-filled from an OLDER right row (the
    round-1 per-column last(ignorenulls) bug). All carried columns must
    come from the SAME matched right row."""
    from rios_spark.temporal import asof_join

    left = pd.DataFrame({"k": [1, 1, 1], "ts": [5, 15, 25], "lv": [0, 1, 2]})
    right = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "ts": [0, 10, 20],
            "a": [100.0, None, 300.0],
            "b": [None, 200.0, None],
        }
    )
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right), "k", "ts")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert got["ts_asof"].tolist() == [0, 10, 20]
    # row ts=15 matched right ts=10: a must be NULL (not 100.0 from ts=0)
    assert pd.isna(got.loc[1, "a_asof"]) and got.loc[1, "b_asof"] == 200.0
    # row ts=25 matched right ts=20: b must be NULL (not 200.0 from ts=10)
    assert got.loc[2, "a_asof"] == 300.0 and pd.isna(got.loc[2, "b_asof"])
    assert got.loc[0, "a_asof"] == 100.0 and pd.isna(got.loc[0, "b_asof"])


def test_resample_cubic_k16_matches_numpy_kernel(spark):
    """Cubic (k=16 tricube) resample parity with a straight numpy
    implementation of the same kernel; exact-match queries return the
    point value for EVERY mode (all kernels peak at distance 0) —
    the testresample half-shift contract generalized."""
    rng = np.random.default_rng(17)
    nd = 400
    ddf = pd.DataFrame(
        {
            "id": np.arange(nd),
            "lat": rng.uniform(-30, 30, nd),
            "lon": rng.uniform(-60, 60, nd),
            "val": rng.uniform(0, 100, nd),
        }
    )
    qdf = pd.DataFrame(
        {"qid": np.arange(25), "lat": rng.uniform(-25, 25, 25), "lon": rng.uniform(-55, 55, 25)}
    )
    got = (
        spatial.resample_join(spark.createDataFrame(qdf), ddf, "val", "cubic", d_id="id")
        .toPandas()
        .sort_values("qid")["resampled"]
        .to_numpy()
    )
    # numpy oracle: same tricube kernel over the same k=16 neighbours
    d = spatial.haversine_km(
        qdf["lat"].to_numpy()[:, None], qdf["lon"].to_numpy()[:, None],
        ddf["lat"].to_numpy()[None, :], ddf["lon"].to_numpy()[None, :],
    )
    want = np.empty(len(qdf))
    for i in range(len(qdf)):
        order = np.lexsort((ddf["id"].to_numpy(), d[i]))[:16]
        dd = d[i][order]
        D = dd.max() * (1.0 + 1e-9)
        w = (1.0 - (dd / D) ** 3) ** 3
        want[i] = (w * ddf["val"].to_numpy()[order]).sum() / w.sum()
    np.testing.assert_allclose(got, want, rtol=1e-9)

    # exact-match short-circuit for every mode
    q_exact = spark.createDataFrame(
        ddf.head(5)[["id", "lat", "lon"]].rename(columns={"id": "qid"})
    )
    for mode in spatial.RESAMPLE_K:
        r = (
            spatial.resample_join(q_exact, ddf, "val", mode, d_id="id")
            .toPandas()
            .sort_values("qid")["resampled"]
            .to_numpy()
        )
        np.testing.assert_allclose(r, ddf["val"].to_numpy()[:5], rtol=1e-9, err_msg=mode)


def test_knn_tiled_phase_counters(spark):
    """Observability: the counters dict reports how many queries each
    phase resolved — and the adaptive escalation actually proves
    queries that pass 0 could not (nfound >= k but kth >= guard)."""
    res = 5
    rng = np.random.default_rng(55)
    # DENSE data with a deliberately-too-small first ring: ring-1 finds
    # candidates but often cannot certify them, and the data is dense
    # enough that the r6 ring-utility bound ((2*lb+1)^2 < n_data) says
    # escalating beats scanning — so the escalation loop does real
    # work. (A sparse fixture now correctly routes the residue straight
    # to the scan, which test_knn_tiled_sparse_goes_to_scan pins.)
    ddf = pd.DataFrame(
        {"id": np.arange(400), "lat": rng.uniform(-60, 60, 400), "lon": rng.uniform(-170, 170, 400)}
    )
    qdf = pd.DataFrame(
        {"qid": np.arange(60), "lat": rng.uniform(-60, 60, 60), "lon": rng.uniform(-170, 170, 60)}
    )
    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))
    counters = {}
    got = (
        spatial.knn_tiled(
            queries, data, 3, res, ring=1, d_id="id", q_id="qid", counters=counters
        )
        .toPandas().sort_values(["qid", "rank"])
    )
    assert len(got) == 60 * 3
    want = _brute_oracle(qdf, ddf, 3)
    for qid, grp in got.groupby("qid"):
        for (gi, gd), (wi, wd) in zip(
            zip(grp["neighbor_id"], grp["dist_km"]), want[int(qid)]
        ):
            assert gi == wi and gd == pytest.approx(wd, rel=1e-9)
    assert counters["unproven_pass0"] > 0
    # the escalation loop ran and resolved some (or all) of the pass-0
    # residue; whatever is left went to the (chunked) residual scan
    assert "unproven_escalation_0" in counters
    assert counters["unproven_escalation_0"] <= counters["unproven_pass0"]
    assert counters["residual_scan"] <= counters["unproven_pass0"]


def test_knn_tiled_polar_queries_exact(spark):
    """Poles stress the escalation math: min-cos -> 0 blows up the
    lon-radius estimate (clamped to the wrap-safe max) and the guard is
    maximally conservative — results must still be EXACT."""
    res = 5
    rng = np.random.default_rng(77)
    ddf = pd.DataFrame(
        {"id": np.arange(40), "lat": rng.uniform(-89.9, 89.9, 40), "lon": rng.uniform(-180, 180, 40)}
    )
    qlat = np.concatenate([rng.uniform(83, 89.9, 10), rng.uniform(-89.9, -83, 10)])
    qdf = pd.DataFrame(
        {"qid": np.arange(20), "lat": qlat, "lon": rng.uniform(-180, 180, 20)}
    )
    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))
    got = (
        spatial.knn_tiled(queries, data, 3, res, d_id="id", q_id="qid")
        .toPandas().sort_values(["qid", "rank"])
    )
    want = _brute_oracle(qdf, ddf, 3)
    assert len(got) == 20 * 3
    for qid, grp in got.groupby("qid"):
        for (gi, gd), (wi, wd) in zip(
            zip(grp["neighbor_id"], grp["dist_km"]), want[int(qid)]
        ):
            assert gi == wi and gd == pytest.approx(wd, rel=1e-9)


def test_knn_residual_scan_chunked_exact(spark, monkeypatch):
    """Driver-memory bound of the residual scan is a CODE INVARIANT
    (r2 VERDICT #4): with the chunk cap forced tiny, an adversarial
    all-polar query set (nothing provable at ring 0, sparse data)
    resolves through MULTIPLE residual chunks and stays exact."""
    res = 5
    rng = np.random.default_rng(99)
    # sparse data far from the queries: nothing certifiable quickly
    ddf = pd.DataFrame(
        {"id": np.arange(12), "lat": rng.uniform(-30, 30, 12), "lon": rng.uniform(-170, 170, 12)}
    )
    qdf = pd.DataFrame(
        {"qid": np.arange(25), "lat": rng.uniform(85, 89.9, 25), "lon": rng.uniform(-180, 180, 25)}
    )
    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))
    monkeypatch.setattr(spatial, "KNN_RESIDUAL_CHUNK", 7)  # forces >= 4 chunks
    counters = {}
    got = (
        spatial.knn_tiled(
            queries, data, 3, res, d_id="id", q_id="qid",
            max_escalations=0, counters=counters,
        )
        .toPandas().sort_values(["qid", "rank"])
    )
    assert counters["residual_scan"] == 25  # the whole query set
    assert len(got) == 25 * 3
    want = _brute_oracle(qdf, ddf, 3)
    for qid, grp in got.groupby("qid"):
        for (gi, gd), (wi, wd) in zip(
            zip(grp["neighbor_id"], grp["dist_km"]), want[int(qid)]
        ):
            assert gi == wi and gd == pytest.approx(wd, rel=1e-9)


def test_knn_tiled_k_exceeds_data(spark):
    """k >= n_data short-circuits to the brute path (ADVICE r2): the
    guard can never certify, so tiled machinery is pure waste — and
    the result is every data row per query, correctly ranked."""
    res = 5
    rng = np.random.default_rng(13)
    ddf = pd.DataFrame(
        {"id": np.arange(4), "lat": rng.uniform(-60, 60, 4), "lon": rng.uniform(-170, 170, 4)}
    )
    qdf = pd.DataFrame(
        {"qid": np.arange(6), "lat": rng.uniform(-60, 60, 6), "lon": rng.uniform(-170, 170, 6)}
    )
    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))
    got = (
        spatial.knn_tiled(queries, data, 10, res, d_id="id", q_id="qid")
        .toPandas().sort_values(["qid", "rank"])
    )
    assert len(got) == 6 * 4  # kk clamps to n_data
    want = _brute_oracle(qdf, ddf, 4)
    for qid, grp in got.groupby("qid"):
        for (gi, gd), (wi, wd) in zip(
            zip(grp["neighbor_id"], grp["dist_km"]), want[int(qid)]
        ):
            assert gi == wi and gd == pytest.approx(wd, rel=1e-9)


def test_knn_tiled_antimeridian_exact(spark):
    """x-wrap correctness: queries hugging lon = +-180 whose true
    nearest neighbours sit ACROSS the antimeridian — the k-ring wraps
    in x and the guard's contiguous-box bound stays valid, so results
    must equal brute force exactly."""
    res = 6
    rng = np.random.default_rng(123)
    lat_d = rng.uniform(-60, 60, 50)
    # data clustered just EAST of the antimeridian (lon in [-180, -175])
    ddf = pd.DataFrame(
        {"id": np.arange(50), "lat": lat_d, "lon": rng.uniform(-180, -175, 50)}
    )
    # queries just WEST of it (lon in [175, 180)) — nearest are across
    qdf = pd.DataFrame(
        {"qid": np.arange(25), "lat": rng.uniform(-60, 60, 25), "lon": rng.uniform(175, 180, 25)}
    )
    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))
    got = (
        spatial.knn_tiled(queries, data, 3, res, d_id="id", q_id="qid")
        .toPandas().sort_values(["qid", "rank"])
    )
    want = _brute_oracle(qdf, ddf, 3)
    assert len(got) == 25 * 3
    for qid, grp in got.groupby("qid"):
        for (gi, gd), (wi, wd) in zip(
            zip(grp["neighbor_id"], grp["dist_km"]), want[int(qid)]
        ):
            assert gi == wi and gd == pytest.approx(wd, rel=1e-9)


def test_track_caches_preserves_cross_key_shared_plan(spark):
    """ADVICE r4: Spark's CacheManager keys cache entries by
    canonicalized PLAN, so a plan-identical frame registered under a
    DIFFERENT operator key shares the entry. Rolling one key's
    generation must not evict an entry another key's live frame still
    backs — only plans no longer referenced anywhere in the registry
    may be released."""
    from rios_spark.session import release_caches, track_caches

    df_a = spark.range(100).selectExpr("id", "id * 2 AS v").persist()
    df_a.count()
    track_caches(spark, "op_a", [df_a])
    # same canonical plan, registered under a second key
    df_b = spark.range(100).selectExpr("id", "id * 2 AS v").persist()
    df_b.count()
    track_caches(spark, "op_b", [df_b])
    assert df_b.storageLevel.useMemory

    # roll op_a to a NEW plan: the old op_a frame's plan is still live
    # under op_b and must survive the rollover
    df_a2 = spark.range(50).selectExpr("id", "id * 3 AS v").persist()
    df_a2.count()
    track_caches(spark, "op_a", [df_a2])
    assert df_b.storageLevel.useMemory, "shared-plan cache evicted by other key"

    # once op_b also rolls to a new plan, the shared plan has no live
    # holder left and IS released
    df_b2 = spark.range(60).selectExpr("id", "id * 5 AS v").persist()
    df_b2.count()
    track_caches(spark, "op_b", [df_b2])
    assert not df_b.storageLevel.useMemory
    release_caches(spark)
    assert not df_a2.storageLevel.useMemory and not df_b2.storageLevel.useMemory


def test_knn_tiled_registers_caches_incrementally(spark):
    """ADVICE r4: knn_tiled's persisted control frames enter the
    session cache registry AS they are persisted, so an exception
    between a persist and the return cannot strand unfreeable executor
    cache. After a normal call every registered frame is persisted and
    release_caches frees them all."""
    from rios_spark import session as rs_session
    from rios_spark.session import release_caches

    rng = np.random.default_rng(7)
    res = 4
    qpdf = pd.DataFrame(
        {"qid": range(40), "lat": rng.uniform(-60, 60, 40), "lon": rng.uniform(-170, 170, 40)}
    )
    dpdf = pd.DataFrame(
        {"id": range(200), "lat": rng.uniform(-60, 60, 200), "lon": rng.uniform(-170, 170, 200)}
    )
    q = spark.createDataFrame(qpdf).withColumn("cell", cell_col("lat", "lon", res))
    d = spark.createDataFrame(dpdf).withColumn("cell", cell_col("lat", "lon", res))
    spatial.knn_tiled(q, d, 3, res, d_id="id", q_id="qid").count()
    reg = getattr(spark, rs_session._CACHE_REGISTRY_ATTR, {})
    frames = reg.get("knn_tiled", [])
    assert len(frames) >= 2
    assert all(f.storageLevel.useMemory for f in frames)
    release_caches(spark, "knn_tiled")
    assert all(not f.storageLevel.useMemory for f in frames)


def test_knn_tiled_sparse_goes_to_scan(spark):
    """r6 ring-utility bound: on SPARSE data the k-th distances are so
    large that any certifying ring's (2r+1)^2 explosion costs at least
    a full data scan — the residue must skip the escalation loop
    entirely (measured 4.5x wall at sf0.01 when it didn't) and resolve
    exactly in the residual scan."""
    res = 5
    rng = np.random.default_rng(56)
    ddf = pd.DataFrame(
        {"id": np.arange(60), "lat": rng.uniform(-80, 80, 60), "lon": rng.uniform(-180, 180, 60)}
    )
    qdf = pd.DataFrame(
        {"qid": np.arange(50), "lat": rng.uniform(-80, 80, 50), "lon": rng.uniform(-180, 180, 50)}
    )
    queries = spark.createDataFrame(qdf).withColumn("cell", cell_col("lat", "lon", res))
    data = spark.createDataFrame(ddf).withColumn("cell", cell_col("lat", "lon", res))
    counters = {}
    got = (
        spatial.knn_tiled(queries, data, 3, res, d_id="id", q_id="qid", counters=counters)
        .toPandas().sort_values(["qid", "rank"])
    )
    # no escalation round ran — the whole residue was scan-routed
    assert "unproven_escalation_0" not in counters
    assert counters["residual_scan"] == counters["unproven_pass0"] > 0
    want = _brute_oracle(qdf, ddf, 3)
    for qid, grp in got.groupby("qid"):
        for (gi, gd), (wi, wd) in zip(
            zip(grp["neighbor_id"], grp["dist_km"]), want[int(qid)]
        ):
            assert gi == wi and gd == pytest.approx(wd, rel=1e-9)


def test_block_topk_gemm_path_bit_identical(monkeypatch):
    """The GEMM candidate path (dot-product selection + exact haversine
    on candidates + certified exclusion bound) must return BIT-identical
    (ids, dists) to the full per-pair scan — with and without quantize,
    on uniform data AND on a tie-dense lattice that forces quantized
    collisions at the k-th boundary (exercising the fallback rerun)."""
    monkeypatch.setattr(spatial, "_GEMM_MIN_PAIRS", 0)
    rng = np.random.default_rng(77)
    k = 5
    cases = []
    # uniform: GEMM guard certifies nearly every row
    nq, nd = 400, 2000
    cases.append((
        rng.uniform(-80, 80, nq), rng.uniform(-179, 179, nq),
        rng.uniform(-80, 80, nd), rng.uniform(-179, 179, nd),
        rng.permutation(nd).astype(np.int64),
    ))
    # tie-dense: many points share exact coordinates, so quantized
    # distances collide across the k-th boundary and rows must fall
    # back to the exact scan to get the id tie-break right
    lat_g = np.round(rng.uniform(-5, 5, 50), 1)
    lon_g = np.round(rng.uniform(-5, 5, 50), 1)
    pick = rng.integers(0, 50, 3000)
    cases.append((
        np.round(rng.uniform(-5, 5, 300), 1), np.round(rng.uniform(-5, 5, 300), 1),
        lat_g[pick], lon_g[pick],
        rng.permutation(3000).astype(np.int64),
    ))
    for qla, qlo, dla, dlo, did in cases:
        for quant in (None, 1e5):
            kk = min(k, len(did))
            ids_g, d_g = spatial._block_topk(qla, qlo, dla, dlo, did, k, quantize=quant)
            # oracle: full (distance, id) lexicographic sort — the rule
            # the SQL oracles pin (row_number over (dist, id))
            full = spatial.haversine_km(qla[:, None], qlo[:, None], dla[None, :], dlo[None, :])
            if quant is not None:
                full = spatial._quantize_np(full, quant)
            order = np.lexsort((np.broadcast_to(did, full.shape), full), axis=1)[:, :kk]
            rows = np.arange(len(qla))[:, None]
            assert ids_g.tolist() == did[order].tolist()
            # distances bit-for-bit (same haversine_km formula)
            assert d_g.tolist() == full[rows, order].tolist()
