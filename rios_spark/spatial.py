"""Spatial joins — point-in-polygon, zonal aggregates, kNN.

Reference semantics being re-expressed (NOT ported):
- Vector input burn (rios/imagereader.py:198-276, rios/applier.py:663-728):
  RIOS rasterizes polygons and pixel-joins the mask. We skip the
  rasterization detour entirely: a coarse tile-cover prefilter
  (broadcast) + an exact vectorized point-in-polygon kernel — the PIP
  join (SURVEY.md J6, the engine's flagship join).
- Zonal statistics (rios/riostests/testvector.py:99-152): PIP join →
  groupBy(polygon_id) agg, with SALTED two-stage aggregation for hot
  tiles (the north-rule skew requirement).
- Disjoint polygon → empty join → no stats row (testvector.py:76-83).
- Nearest-neighbour resample join (rios/applier.py:655-661,
  rios/riostests/testresample.py:86-117) generalized to kNN (J7/J8):
  k-ring candidate generation + exact ranking + top-k, certified by an
  exact spherical completeness guard; unproven queries escalate once
  with a per-query adaptive ring, and any remainder resolves in a
  distributed residual scan with the (small) query set broadcast — the
  data side is never collected.

Geometry is pure vectorized numpy (no GEOS in this container):
- even-odd ray casting; edge semantics are half-open and deterministic
  (for an axis-aligned rectangle: lon in [xmin, xmax), lat in
  [ymin, ymax)) so the DuckDB oracle can reproduce them with plain
  range predicates;
- haversine on the WGS84 mean sphere.

Scale design: polygons are the SMALL side (thousands) and are broadcast
once, like RIOS memoizes one rasterization per vector file per process
(rios/structures.py:1074-1096). Points never leave the executors; the
prefilter is a broadcast hash join on the cell key; the exact test is
Arrow-batched numpy. The only shuffle in zonal stats is the partial
aggregation's, and salting splits hot polygons across reducers.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from rios_spark.grid import np_cell, np_polyfill_bbox

EARTH_RADIUS_KM = 6371.0088


# ---------------------------------------------------------------------------
# vectorized geometry kernels
# ---------------------------------------------------------------------------


def ray_cast(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Even-odd point-in-polygon for one ring over many points.

    Half-open edge semantics: for an axis-aligned rectangle a point is
    inside iff lon in [xmin, xmax) and lat in [ymin, ymax) — left/bottom
    edges in, right/top edges out. Deterministic, and reproducible in
    the SQL oracle as plain range predicates.
    Vectorized over points; loops only over the ring's vertices.
    """
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    inside = np.zeros(px.shape, bool)
    n = len(xs)
    j = n - 1
    for i in range(n):
        xi, yi = xs[i], ys[i]
        xj, yj = xs[j], ys[j]
        crosses = (yi > py) != (yj > py)
        if np.any(crosses):
            xint = (xj - xi) * (py - yi) / (yj - yi) + xi
            inside ^= crosses & (px < xint)
        j = i
    return inside


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    la1, lo1, la2, lo2 = (np.radians(np.asarray(a, np.float64)) for a in (lat1, lon1, lat2, lon2))
    dlat = la2 - la1
    dlon = lo2 - lo1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(h))


# ---------------------------------------------------------------------------
# polygon cover (the polyfill prefilter)
# ---------------------------------------------------------------------------


def polygon_cover(polygons: pd.DataFrame, res: int) -> pd.DataFrame:
    """(polygon_id, cell) cover at `res` — bbox polyfill per polygon.

    The coarse prefilter of the PIP join: a broadcast-joinable map from
    tile to candidate polygons (SURVEY.md J6). polygons needs columns
    polygon_id, xs (lon ring), ys (lat ring).
    """
    rows = []
    for _, p in polygons.iterrows():
        xs = np.asarray(p["xs"], np.float64)
        ys = np.asarray(p["ys"], np.float64)
        cells = np_polyfill_bbox(xs.min(), ys.min(), xs.max(), ys.max(), res)
        rows.append(pd.DataFrame({"polygon_id": int(p["polygon_id"]), "cell": cells}))
    if not rows:
        return pd.DataFrame({"polygon_id": pd.Series(dtype=np.int64), "cell": pd.Series(dtype=np.int64)})
    return pd.concat(rows, ignore_index=True)


def _ray_cast_expr(xs: np.ndarray, ys: np.ndarray, px, py):
    """The even-odd ray cast compiled to a Spark Column expression —
    the SAME arithmetic as ray_cast() (same ops, same half-open
    semantics), but evaluated JVM-side inside whole-stage codegen.
    Horizontal edges contribute nothing: `crosses` is false, and SQL
    AND(false, NaN-compare) is false, matching numpy's masking."""
    n = len(xs)
    crossings = F.lit(0)
    for i in range(n):
        j = (i - 1) % n
        xi, yi, xj, yj = float(xs[i]), float(ys[i]), float(xs[j]), float(ys[j])
        if yj == yi:
            continue  # horizontal edge never crosses (numpy mask parity)
        crosses = (F.lit(yi) > py) != (F.lit(yj) > py)
        xint = F.lit(xj - xi) * (py - F.lit(yi)) / F.lit(yj - yi) + F.lit(xi)
        crossings = crossings + (crosses & (px < xint)).cast("int")
    return crossings % 2 == 1


def _is_axis_rect(xs: np.ndarray, ys: np.ndarray) -> bool:
    return (
        len(xs) == 4
        and len(set(xs.tolist())) == 2
        and len(set(ys.tolist())) == 2
    )


def _poly_pred_expr(xs: np.ndarray, ys: np.ndarray, px, py):
    """Per-polygon containment predicate, kept SHALLOW so the filter
    stays inside WholeStageCodegen (a deep nested CASE chain knocks the
    whole stage into interpreted evaluation — measured 20x slower).
    Axis-aligned rectangles compile to 4 comparisons, which is exactly
    what ray_cast computes for them ([xmin,xmax) x [ymin,ymax))."""
    if _is_axis_rect(xs, ys):
        x0, x1 = float(xs.min()), float(xs.max())
        y0, y1 = float(ys.min()), float(ys.max())
        return (px >= x0) & (px < x1) & (py >= y0) & (py < y1)
    return _ray_cast_expr(xs, ys, px, py)


# polygon sets up to this many total vertices run as pure JVM
# expressions; larger sets use the Arrow-batched numpy kernel
PIP_EXPR_MAX_VERTICES = 2048


def pip_join(
    points: DataFrame,
    polygons: pd.DataFrame,
    res: int,
    lat: str = "lat",
    lon: str = "lon",
    cell: str = "cell",
    method: str = "auto",
) -> DataFrame:
    """Inner join: each point row x each polygon containing it.

    Plan shape: points ⋈(broadcast, on cell) cover → exact ray-cast.
    One broadcast, zero shuffles of the big side. A point in m polygons
    yields m rows; points in no polygon are dropped (anti-join
    semantics preserved for the disjoint case, J9).

    method='expr' (default for small polygon sets): the ray cast is
    compiled into a CASE-dispatched Spark SQL expression — the whole
    join is JVM-side, codegen'd, zero Python. method='arrow': the
    vectorized numpy kernel (for polygon sets too large to compile
    into an expression). Both produce identical results (tested).
    """
    spark = points.sparkSession
    cover = polygon_cover(polygons, res)
    cover_df = F.broadcast(spark.createDataFrame(cover, schema="polygon_id long, cell long"))
    cand = points.join(cover_df, on=cell, how="inner")

    total_vertices = int(sum(len(p["xs"]) for _, p in polygons.iterrows()))
    if method == "auto":
        method = "expr" if total_vertices <= PIP_EXPR_MAX_VERTICES else "arrow"

    if method == "expr":
        # ONE pass of the big side, keyed by polygon id (round-1 folded
        # per-group scans into this). The predicate is generic across
        # polygons, so it stays one SMALL method regardless of polygon
        # count — no HotSpot huge-method cliff (the round-1 design
        # compiled per-polygon predicates and had to re-scan the points
        # once per JIT-sized group):
        #   - axis rects (the common case): a codegen'd range check on
        #     bbox columns delivered by the broadcast geometry join
        #   - general rings: the even-odd ray cast as a higher-order
        #     aggregate over the polygon's edge array (JVM-side; each
        #     lambda is a handful of ops, horizontal edges pre-dropped
        #     — exactly ray_cast()'s arithmetic and edge semantics)
        px, py = F.col(lon), F.col(lat)
        geo_rows = []
        for _, p in polygons.iterrows():
            xs = np.asarray(p["xs"], np.float64)
            ys = np.asarray(p["ys"], np.float64)
            if _is_axis_rect(xs, ys):
                geo_rows.append(
                    (int(p["polygon_id"]), True,
                     float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max()),
                     [])
                )
            else:
                n = len(xs)
                edges = [
                    (float(xs[i]), float(ys[i]), float(xs[i - 1]), float(ys[i - 1]))
                    for i in range(n)
                    if ys[i - 1] != ys[i]  # horizontal edges never cross
                ]
                geo_rows.append(
                    (int(p["polygon_id"]), False, 0.0, 0.0, 0.0, 0.0, edges)
                )
        geo_df = F.broadcast(
            spark.createDataFrame(
                geo_rows,
                "polygon_id long, __is_rect boolean, __x0 double, __y0 double,"
                " __x1 double, __y1 double,"
                " __edges array<struct<xi:double,yi:double,xj:double,yj:double>>",
            )
        )
        cand2 = cand.join(geo_df, "polygon_id")

        def cross(acc, ed):
            crosses = (ed["yi"] > py) != (ed["yj"] > py)
            xint = (ed["xj"] - ed["xi"]) * (py - ed["yi"]) / (ed["yj"] - ed["yi"]) + ed["xi"]
            return acc + F.when(crosses & (px < xint), F.lit(1)).otherwise(F.lit(0))

        inside = F.when(
            F.col("__is_rect"),
            (px >= F.col("__x0")) & (px < F.col("__x1"))
            & (py >= F.col("__y0")) & (py < F.col("__y1")),
        ).otherwise(F.aggregate(F.col("__edges"), F.lit(0), cross) % 2 == 1)
        helper = ["__is_rect", "__x0", "__y0", "__x1", "__y1", "__edges"]
        return cand2.filter(inside).drop(*helper)

    rings = {
        int(p["polygon_id"]): (
            np.asarray(p["xs"], np.float64),
            np.asarray(p["ys"], np.float64),
        )
        for _, p in polygons.iterrows()
    }
    bc = spark.sparkContext.broadcast(rings)
    out_schema = cand.schema

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rings_v = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), bool)
            px = pdf[lon].to_numpy(np.float64)
            py = pdf[lat].to_numpy(np.float64)
            pids = pdf["polygon_id"].to_numpy()
            for pid in np.unique(pids):
                m = pids == pid
                xs, ys = rings_v[int(pid)]
                keep[m] = ray_cast(px[m], py[m], xs, ys)
            yield pdf[keep]

    return cand.mapInPandas(exact, schema=out_schema)


# ---------------------------------------------------------------------------
# zonal aggregation (salted two-stage)
# ---------------------------------------------------------------------------


def zonal_stats(
    points: DataFrame,
    polygons: pd.DataFrame,
    res: int,
    value_col: str,
    lat: str = "lat",
    lon: str = "lon",
    cell: str = "cell",
    salt: int = 16,
) -> DataFrame:
    """Per-polygon count/sum/mean/min/max of `value_col` over contained
    points — the zonal-statistics composite (SURVEY.md A14).

    Skew handling: stage 1 aggregates by (polygon_id, salt) — a hot
    polygon (continent-sized, or over a dense-host tile) is split
    across `salt` reducers — stage 2 combines the partials. The salt is
    `spark_partition_id() % salt` — NOT a function of the row, and it
    varies with input partitioning; the OUTPUT is invariant to it
    because every stage-1 statistic is algebraic (count/sum/min/max
    recombine exactly in stage 2). A row-hash salt would send an
    entire hot cell to one reducer — no split at all. Polygons with
    zero contained points produce no row (testvector disjoint
    contract).
    """
    joined = pip_join(points, polygons, res, lat=lat, lon=lon, cell=cell)
    v = F.col(value_col).cast("double")
    # Salt on the INPUT PARTITION, not a hash of the cell: the north-rule
    # skew model is a hot tile, and hashing the cell sends every row of
    # that one hot cell to the same (polygon, salt) reducer — no split at
    # all. spark_partition_id() spreads a hot cell across however many
    # input partitions it spans; output is unchanged (all ops algebraic).
    s = F.pmod(F.spark_partition_id(), F.lit(salt))
    partial = joined.groupBy("polygon_id", s.alias("__salt")).agg(
        F.count(v).alias("c"),
        F.sum(v).alias("s"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )
    return (
        partial.groupBy("polygon_id")
        .agg(
            F.sum("c").alias("count"),
            F.sum("s").alias("sum"),
            F.min("mn").alias("minval"),
            F.max("mx").alias("maxval"),
        )
        .withColumn("mean", F.col("sum") / F.col("count"))
    )


# ---------------------------------------------------------------------------
# kNN join
# ---------------------------------------------------------------------------


# Max elements in any one distance matrix (queries x data). 8M float64
# = 64 MB per temporary; haversine allocates ~6 temporaries of that
# shape, so peak per task stays well under 1 GB even with 32 concurrent
# tasks. Without this cap a 65k-row Arrow batch against a 2M-point data
# side would materialize a ~1 TB matrix in one task (round-1 VERDICT #4).
KNN_GEMM_BUDGET = 8_000_000

# Cap for the auto-sized first ring: with_margin duplicates the data
# side (2r+1)^2-fold, so completeness must never be bought with a huge
# pass-0 ring on sparse data (r=16 is already a 1089x explode); the
# adaptive escalation + residual scan resolve the sparse tail exactly
# (round-2 ADVICE).
KNN_AUTO_RING_MAX = 16

# Cap for the density-adaptive INTERNAL re-tile (ring="auto"): the
# candidate join's volume is ~ n_queries * (2r+1)^2 * density(res), so
# at a fixed caller res it grows LINEARLY with data density — at 100
# points/cell a ring-1 pass already joins ~900 candidates per query
# (the sf10 cliff: 1.5M queries x ~880 candidates = 1.3e9 rows into
# one window sort). Re-tiling internally to the finest res whose 3x3
# box still expects >= `need` candidates keeps candidates/query ~need
# at ANY density; the guard/escalation machinery is resolution-
# agnostic, so exactness is untouched. res 14 = 2.7e8 cells keeps the
# cell ids well inside the 29-bit x/y encoding while covering data
# sides up to ~1e9 rows before density per cell climbs again.
KNN_RETILE_RES_MAX = 14


def _quantize_np(dist: np.ndarray, quantize: float) -> np.ndarray:
    """Epsilon-floor a distance array onto the 1/quantize grid — the
    same arithmetic as _quantize_col / the SQL oracles, so every engine
    lands on the identical grid point even when the raw values differ
    by ulps (the fcb9933 lesson: a true value ON a grid line floors to
    either side without the epsilon)."""
    return np.floor(dist * quantize + 1e-3) / quantize


def _quantize_col(dist, quantize: float):
    """Column twin of _quantize_np: floor(d*q + 1e-3)/q. The 1e-3 is in
    SCALED units (1e-8 km at q=1e5) — far above cross-engine ulp noise,
    far below one grid step."""
    return F.floor(dist * F.lit(quantize) + F.lit(1e-3)) / F.lit(quantize)


# GEMM candidate path (guide §1.2 "the distributed algorithm" applied
# per task): selecting top-k by great-circle distance is equivalent to
# selecting by unit-sphere chord (dot product), because haversine
# distance = 2R*asin(sqrt((1-dot)/2)) is strictly decreasing in dot.
# A BLAS dgemm over 3-D unit vectors replaces per-pair transcendental
# haversine evaluation (~20x fewer flops and vectorized), then the
# EXACT haversine_km formula runs only on the k+pad selected
# candidates so emitted distances are bit-identical to the full scan.
# Exactness is certified per row: every excluded point's dot is <= the
# pad-th candidate's, so its distance is >= that bound; if the bound
# (minus a generous fp margin) does not strictly clear the row's k-th
# distance, the row falls back to the full per-pair haversine scan.
_GEMM_CAND_PAD = 16
# fp margin (km) between dot-derived and direct haversine distances:
# the 3-D dot of unit vectors carries ~1e-14 absolute error, which maps
# to < 1e-3 km of distance error for any pair farther apart than ~1 m;
# closer-than-that boundary cases simply fail the strict guard and
# rerun exactly.
_GEMM_EPS_KM = 1e-3
# below this pair count the xyz conversion + candidate gather overhead
# exceeds the transcendental savings
_GEMM_MIN_PAIRS = 1 << 18


def _unit_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray) -> np.ndarray:
    la, lo = np.radians(lat_deg), np.radians(lon_deg)
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)], axis=1)


def _topk_rows_scan(qla, qlo, dla, dlo, did, kk, use_haversine, quantize):
    """Full per-pair scan for one chunk of query rows: compute every
    distance, argpartition to kk, lexsort (dist, id). Rows where a
    distance-tie group spans the kk boundary (argpartition splits ties
    arbitrarily, which could pick the wrong IDS) are re-ranked with a
    full (dist, id) lexsort, so the result is always the strict
    lexicographic top-k the SQL oracles pin."""
    a, o = qla[:, None], qlo[:, None]
    nd = len(did)
    if use_haversine:
        dist = haversine_km(a, o, dla[None, :], dlo[None, :])
    else:
        dist = np.sqrt((a - dla[None, :]) ** 2 + (o - dlo[None, :]) ** 2)
    if quantize is not None:
        dist = _quantize_np(dist, quantize)
    idx = np.argpartition(dist, kk - 1, axis=1)[:, :kk] if kk < nd else (
        np.broadcast_to(np.arange(nd), (len(qla), nd)).copy()
    )
    rows = np.arange(len(qla))[:, None]
    dsel = dist[rows, idx]
    ord2 = np.lexsort((did[idx], dsel), axis=1)
    out_ids = did[idx[rows, ord2]]
    out_dist = dsel[rows, ord2]
    if kk < nd:
        # boundary-tie repair: more than kk points at <= the kk-th
        # distance means the partition cut through a tie group
        tied = np.flatnonzero(
            (dist <= out_dist[:, kk - 1, None]).sum(axis=1) > kk
        )
        if tied.size:
            full_ord = np.lexsort(
                (np.broadcast_to(did, (tied.size, nd)), dist[tied]), axis=1
            )[:, :kk]
            out_ids[tied] = did[full_ord]
            out_dist[tied] = dist[tied[:, None], full_ord]
    return out_ids, out_dist


def _block_topk(
    qla: np.ndarray,
    qlo: np.ndarray,
    dla: np.ndarray,
    dlo: np.ndarray,
    did: np.ndarray,
    k: int,
    use_haversine: bool = True,
    quantize: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k of each query against the full data arrays, chunking
    the query rows so rows x n_data never exceeds KNN_GEMM_BUDGET.
    Returns (ids, dists) of shape (n_queries, kk), kk = min(k, n_data),
    sorted per row with deterministic (distance, data id) tie-break.
    With `quantize`, distances are epsilon-floored onto the 1/quantize
    grid BEFORE selection/ranking, so near-ties within fp noise of each
    other collapse to the same grid point and the (distance, id) order
    is reproducible across engines.

    For the haversine metric at scale the per-pair transcendental scan
    is replaced by the GEMM candidate path (see _GEMM_CAND_PAD above):
    identical results — emitted distances come from the same
    haversine_km formula, and any row whose exactness the dot-product
    bound cannot certify reruns through the full scan."""
    nq, nd = len(qla), len(did)
    kk = min(k, nd)
    out_ids = np.empty((nq, kk), np.int64)
    out_dist = np.empty((nq, kk), np.float64)
    step = max(1, KNN_GEMM_BUDGET // max(nd, 1))
    m = min(nd, kk + _GEMM_CAND_PAD)
    use_gemm = (
        use_haversine and m < nd and nq * nd >= _GEMM_MIN_PAIRS
    )
    if use_gemm:
        dxyz = _unit_xyz(dla, dlo)
        qxyz = _unit_xyz(qla, qlo)
    for s in range(0, nq, step):
        e = min(s + step, nq)
        if not use_gemm:
            out_ids[s:e], out_dist[s:e] = _topk_rows_scan(
                qla[s:e], qlo[s:e], dla, dlo, did, kk, use_haversine, quantize
            )
            continue
        dots = qxyz[s:e] @ dxyz.T
        nr = e - s
        # Per-row candidate threshold ESTIMATED from a strided column
        # subsample: an exact per-row m-th-largest (np.partition over
        # the full chunk) measured ~10 ms/Melem — the dominant cost —
        # while partitioning a ~256-column subsample is ~free. Any
        # threshold keeps the result exact: the guard below certifies
        # each row against the ACTUAL threshold used, rows left with
        # < kk candidates rerun through the full scan, and aiming at
        # overall rank ~4m keeps expected candidates small while
        # making the exclusion bound LOOSER (t lower -> d(t) larger),
        # so the guard passes more easily than with the exact m-th.
        stride = max(1, nd // 256)
        sub = dots[:, ::stride]
        t_rank = min(sub.shape[1] - 1, max(1, (4 * m) // stride))
        t = np.partition(sub, sub.shape[1] - 1 - t_rank, axis=1)[
            :, sub.shape[1] - 1 - t_rank
        ]
        r, c = np.nonzero(dots >= t[:, None])  # row-major: r ascending
        # rows the estimated threshold left short of kk candidates
        # rerun through the full scan (rare — subsample variance only)
        counts = np.bincount(r, minlength=nr)
        ok = counts >= kk
        if not ok.all():
            sel = ok[r]
            r, c = r[sel], c[sel]
        dsel = haversine_km(qla[s + r], qlo[s + r], dla[c], dlo[c])
        # exclusion bound: every non-candidate has dot STRICTLY below t
        d_bound = (
            2.0 * EARTH_RADIUS_KM
            * np.arcsin(np.sqrt((1.0 - np.clip(t, -1.0, 1.0)) / 2.0))
            - _GEMM_EPS_KM
        )
        if quantize is not None:
            dsel = _quantize_np(dsel, quantize)
            d_bound = _quantize_np(np.maximum(d_bound, 0.0), quantize)
        # segmented (dist, id) top-k over the ragged candidate lists
        order = np.lexsort((did[c], dsel, r))
        r_s = r[order]
        if ok.all():
            seg_start = np.searchsorted(r_s, np.arange(nr))
            take = (np.arange(len(r_s)) - seg_start[r_s]) < kk
            out_ids[s:e] = did[c[order][take]].reshape(nr, kk)
            out_dist[s:e] = dsel[order][take].reshape(nr, kk)
        else:
            rmap = np.cumsum(ok) - 1  # chunk row -> compact ok index
            r_comp = rmap[r_s]
            seg_start = np.searchsorted(r_comp, np.arange(int(ok.sum())))
            take = (np.arange(len(r_comp)) - seg_start[r_comp]) < kk
            rows_ok = np.flatnonzero(ok)
            out_ids[s + rows_ok] = did[c[order][take]].reshape(len(rows_ok), kk)
            out_dist[s + rows_ok] = dsel[order][take].reshape(len(rows_ok), kk)
        # rows whose k-th distance the bound does not STRICTLY clear
        # (possible cross-boundary tie), plus short rows, rerun exactly
        bad = np.flatnonzero(~ok | ~(d_bound > out_dist[s:e, kk - 1]))
        if bad.size:
            out_ids[s + bad], out_dist[s + bad] = _topk_rows_scan(
                qla[s + bad], qlo[s + bad], dla, dlo, did, kk,
                use_haversine, quantize,
            )
    return out_ids, out_dist


def knn_bruteforce(
    queries: DataFrame,
    data: pd.DataFrame,
    k: int,
    q_lat: str = "lat",
    q_lon: str = "lon",
    d_lat: str = "lat",
    d_lon: str = "lon",
    d_id: str = "id",
    metric: str = "haversine",
    quantize: float | None = None,
) -> DataFrame:
    """Exact kNN with the data side broadcast (the small-dim case —
    analogous to RIOS broadcasting one rasterization per process).
    Ties broken on (distance, data id) — deterministic. The per-task
    distance matrix is chunked to KNN_GEMM_BUDGET elements, so memory
    stays bounded regardless of Arrow batch size x data size.

    Output: all query columns + neighbor_id, dist_km, rank.
    """
    spark = queries.sparkSession
    dlat = data[d_lat].to_numpy(np.float64)
    dlon = data[d_lon].to_numpy(np.float64)
    dids = data[d_id].to_numpy(np.int64)
    order = np.argsort(dids, kind="stable")
    bc = spark.sparkContext.broadcast((dlat[order], dlon[order], dids[order]))

    fields = queries.schema.fields + [
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("dist_km", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ]
    out_schema = T.StructType(fields)
    use_haversine = metric == "haversine"

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dla, dlo, did = bc.value
        kk = min(k, len(did))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qla = pdf[q_lat].to_numpy(np.float64)
            qlo = pdf[q_lon].to_numpy(np.float64)
            ids, dsel = _block_topk(
                qla, qlo, dla, dlo, did, k, use_haversine, quantize=quantize
            )
            rep = pdf.loc[pdf.index.repeat(kk)].reset_index(drop=True)
            rep["neighbor_id"] = ids.ravel()
            rep["dist_km"] = dsel.ravel()
            rep["rank"] = np.tile(np.arange(1, kk + 1, dtype=np.int32), len(pdf))
            yield rep

    return queries.mapInPandas(kern, schema=out_schema)


def _ring_guard_km(res: int, ring, q_lat: str, q_lon: str, cell: str = "cell"):
    """Guaranteed-coverage radius (km) of the `ring`-ring tile box
    around each query's cell: the minimum great-circle distance from
    the query point to any point OUTSIDE the box. Any data point closer
    than this is guaranteed to be in the candidate set.

    Exact spherical edge distances (not a km-per-degree approximation):
    - a parallel at delta-phi away is R*delta-phi; a box edge past a
      pole bounds nothing (no cells beyond the pole) -> +inf term;
    - the minimum distance to a half-meridian delta-lam away is the
      cross-track bound R*asin(cos(phi)*sin(delta-lam)) for
      delta-lam <= 90 deg, and the over-the-pole distance
      R*(90 - |phi|) beyond (the meridian's nearest point is then past
      the pole). Pole-correct by construction: near a pole the lon
      terms shrink to the true over-the-pole distance instead of a
      bogus min-cos scale (a ring box past the pole once yielded
      |cos(>90 deg)| CLIMBING again and falsely certified queries
      whose true nearest sat across the pole — caught by the polar
      stress test)."""
    n = float(1 << res)
    cell_h_deg = 180.0 / n
    rem = F.col(cell) - F.lit(res * (1 << 58)).cast("long")
    y = F.shiftright(rem, 29)
    x = rem.bitwiseAND(F.lit((1 << 29) - 1).cast("long"))
    box_lat_n = F.lit(90.0) - (y - ring) * F.lit(cell_h_deg)
    box_lat_s = F.lit(90.0) - (y + 1 + ring) * F.lit(cell_h_deg)
    box_lon_w = (x - ring) * F.lit(360.0 / n) - F.lit(180.0)
    box_lon_e = (x + 1 + ring) * F.lit(360.0 / n) - F.lit(180.0)

    big = F.lit(1e12)
    rad_km = F.lit(EARTH_RADIUS_KM * np.pi / 180.0)  # km per degree of arc
    phi = F.col(q_lat)
    cos_phi = F.cos(F.radians(phi))
    over_pole = (F.lit(90.0) - F.abs(phi)) * rad_km

    d_n = F.when(box_lat_n >= 90.0, big).otherwise((box_lat_n - phi) * rad_km)
    d_s = F.when(box_lat_s <= -90.0, big).otherwise((phi - box_lat_s) * rad_km)

    def lon_term(dlam_deg):
        cross = F.lit(EARTH_RADIUS_KM) * F.asin(cos_phi * F.sin(F.radians(dlam_deg)))
        return F.when(dlam_deg >= 90.0, over_pole).otherwise(cross)

    return F.greatest(
        F.least(
            d_n, d_s,
            lon_term(F.col(q_lon) - box_lon_w),
            lon_term(box_lon_e - F.col(q_lon)),
        ),
        F.lit(0.0),
    )


def _rank_and_prove(
    cand: DataFrame, part_cols: list[str], k: int, res: int, ring,
    q_lat: str, q_lon: str, quantize: float | None = None,
    cell: str = "cell",
) -> DataFrame:
    """Window top-k + the completeness guard, all inside ONE window
    partitioning (one shuffle): a query's top-k is proven exact iff it
    found k candidates and its k-th distance is within the ring's
    guaranteed coverage radius. Adds rank, __nfound, __kth, __proved.
    No per-query agg DataFrame, no broadcast of the proven set (which
    is almost ALL queries — broadcasting it was a round-1 scale bug).
    `ring` may be an int or a per-row Column (adaptive escalation).
    With `quantize`, ranking, dist_km, __kth AND the guard compare all
    run in the epsilon-floored metric: near-ties collapse to the same
    grid point so the (distance, id) order is engine-reproducible, and
    the proof stays sound because quantization is monotone — any point
    outside the ring has raw dist >= guard, hence quantized dist >=
    quantized(guard), so __kth_q < quantized(guard) still certifies
    that NO outside point (even an equal-raw-distance tie) can enter
    the quantized-metric top-k. The escalation-radius inversion keeps
    using __kth; its at-least-one-cell slack (km-scale) dwarfs the one
    grid step (1/quantize) the quantized kth can sit below raw, and the
    re-checked guard keeps every round exact regardless."""
    dist = _haversine_col(F.col(q_lat), F.col(q_lon), F.col("__dlat"), F.col("__dlon"))
    if quantize:
        dist = _quantize_col(dist, quantize)
    cand = cand.withColumn("dist_km", dist)
    keys = [F.col(c) for c in part_cols]
    w = Window.partitionBy(*keys).orderBy(
        F.col("dist_km").asc_nulls_last(), F.col("neighbor_id")
    )
    wp = Window.partitionBy(*keys)
    ranked = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    guard = _ring_guard_km(res, ring, q_lat, q_lon, cell=cell)
    if quantize:
        guard = _quantize_col(guard, quantize)
    return (
        ranked.withColumn("__nfound", F.count("dist_km").over(wp))
        .withColumn("__kth", F.max("dist_km").over(wp))
        .withColumn(
            "__proved", (F.col("__nfound") >= k) & (F.col("__kth") < guard)
        )
    )


# Max residue queries broadcast per residual-scan pass. The residue is
# normally the guard's leftovers (tiny), but adversarial inputs (every
# query polar/sparse with < k provable candidates, or k > data rows)
# can make it the WHOLE query side — the driver-memory bound must be a
# code invariant, not a distribution assumption (round-2 VERDICT #4).
# Each chunk costs one full data scan, so the fallback degrades
# gracefully: N_residue/chunk scans, constant driver memory.
KNN_RESIDUAL_CHUNK = 1_000_000


def _knn_residual_scan(
    bad_q: DataFrame,
    data: DataFrame,
    k: int,
    part_cols: list[str],
    q_lat: str,
    q_lon: str,
    d_lat: str,
    d_lon: str,
    d_id: str,
    chunk: int | None = None,
    quantize: float | None = None,
    n_residue_hint: int | None = None,
) -> DataFrame:
    """Exact distributed brute force for a SMALL query set against an
    arbitrarily large data side: the residue queries are collected and
    broadcast in chunks of at most `chunk` rows (driver memory bounded
    by a constant), the data is scanned ONCE PER CHUNK with a
    per-partition running top-k, and the tiny per-partition partials
    (n_queries x k x n_partitions rows) merge in a final window.
    Replaces the round-1 `data.toPandas()` full collect of the
    by-construction-too-big-to-broadcast side (VERDICT #5); the chunk
    cap enforces the round-2 VERDICT #4 bound."""
    chunk = chunk or KNN_RESIDUAL_CHUNK
    key_cols = list(dict.fromkeys([*part_cols, q_lat, q_lon]))
    parts: list[DataFrame] = []
    # fast path (r6): when the caller can BOUND the residue below the
    # chunk cap (knn_tiled knows n_residual arithmetically from the
    # phase counters), one plain collect() fetches it in a single job —
    # toLocalIterator pays sequential per-partition round-trips that
    # were a visible share of the sf0.01 wall, where the whole phase is
    # fixed job latency, and limit(chunk+1) was measured WORSE
    # (CollectLimit scans partitions in escalating sequential stages).
    # The driver-memory bound is the hint, same constant class as the
    # iterator path's chunk + one partition.
    if n_residue_hint is not None and n_residue_hint <= chunk:
        rows = bad_q.select(*key_cols).collect()
        if not rows:
            return bad_q.limit(0).withColumns(
                {
                    "neighbor_id": F.lit(None).cast("long"),
                    "dist_km": F.lit(None).cast("double"),
                    "rank": F.lit(None).cast("int"),
                }
            )
        return _residual_scan_chunk(
            bad_q, data, k, part_cols, key_cols, rows,
            q_lat, q_lon, d_lat, d_lon, d_id, quantize=quantize,
        )
    buf: list = []
    # toLocalIterator streams one partition at a time to the driver —
    # the driver never holds more than (chunk + one partition) rows
    for row in bad_q.select(*key_cols).toLocalIterator(prefetchPartitions=True):
        buf.append(row)
        if len(buf) >= chunk:
            parts.append(
                _residual_scan_chunk(
                    bad_q, data, k, part_cols, key_cols, buf,
                    q_lat, q_lon, d_lat, d_lon, d_id, quantize=quantize,
                )
            )
            buf = []
    if buf:
        parts.append(
            _residual_scan_chunk(
                bad_q, data, k, part_cols, key_cols, buf,
                q_lat, q_lon, d_lat, d_lon, d_id, quantize=quantize,
            )
        )
    if not parts:
        return bad_q.limit(0).withColumns(
            {
                "neighbor_id": F.lit(None).cast("long"),
                "dist_km": F.lit(None).cast("double"),
                "rank": F.lit(None).cast("int"),
            }
        )
    return _union_all(parts)


def _residual_scan_chunk(
    bad_q: DataFrame,
    data: DataFrame,
    k: int,
    part_cols: list[str],
    key_cols: list[str],
    rows: list,
    q_lat: str,
    q_lon: str,
    d_lat: str,
    d_lon: str,
    d_id: str,
    quantize: float | None = None,
) -> DataFrame:
    spark = bad_q.sparkSession
    qpdf = pd.DataFrame([r.asDict() for r in rows], columns=key_cols)
    nq = len(qpdf)
    qla = qpdf[q_lat].to_numpy(np.float64)
    qlo = qpdf[q_lon].to_numpy(np.float64)
    bc = spark.sparkContext.broadcast((qla, qlo))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qla_v, qlo_v = bc.value
        nq_v = len(qla_v)
        best_d = np.full((nq_v, k), np.inf, np.float64)
        best_i = np.full((nq_v, k), np.iinfo(np.int64).max, np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, dists = _block_topk(
                qla_v, qlo_v,
                pdf[d_lat].to_numpy(np.float64),
                pdf[d_lon].to_numpy(np.float64),
                pdf[d_id].to_numpy(np.int64),
                k,
                quantize=quantize,
            )
            cat_d = np.concatenate([best_d, dists], axis=1)
            cat_i = np.concatenate([best_i, ids], axis=1)
            order = np.lexsort((cat_i, cat_d), axis=1)[:, :k]
            rows = np.arange(nq_v)[:, None]
            best_d = cat_d[rows, order]
            best_i = cat_i[rows, order]
        got = np.isfinite(best_d)
        qi = np.broadcast_to(np.arange(nq_v)[:, None], best_d.shape)[got]
        yield pd.DataFrame(
            {"__qi": qi, "neighbor_id": best_i[got], "dist_km": best_d[got]}
        )

    partials = data.select(d_id, d_lat, d_lon).mapInPandas(
        kern, "__qi long, neighbor_id long, dist_km double"
    )
    w = Window.partitionBy("__qi").orderBy(F.col("dist_km"), F.col("neighbor_id"))
    top = partials.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

    key_schema = T.StructType(
        [bad_q.schema[c] for c in part_cols] + [T.StructField("__qi", T.LongType())]
    )
    key_df = spark.createDataFrame(
        qpdf[part_cols].assign(__qi=np.arange(nq, dtype=np.int64)), schema=key_schema
    )
    return (
        bad_q.join(F.broadcast(key_df), part_cols)
        .join(F.broadcast(top), "__qi")
        .drop("__qi")
    )


def knn_tiled(
    queries: DataFrame,
    data: DataFrame,
    k: int,
    res: int,
    ring: int | str = "auto",
    q_lat: str = "lat",
    q_lon: str = "lon",
    d_lat: str = "lat",
    d_lon: str = "lon",
    d_id: str = "id",
    q_id: str | None = None,
    max_escalations: int = 2,
    counters: dict | None = None,
    quantize: float | None = None,
) -> DataFrame:
    """Exact distributed kNN for a LARGE data side (SURVEY.md J8).

    Phase 1 — candidates: data rows are exploded to their `ring`-ring
    owner cells (margin join machinery) and equi-joined to query cells:
    each query sees every data point within `ring` tiles. Rank by
    haversine, keep top-k (window row_number, ties on (dist, id)).

    Phase 2 — completeness guard (makes it EXACT, not approximate): a
    query's top-k is provably correct iff it found k candidates AND its
    k-th distance is within the guaranteed coverage radius of the ring.
    The guard is evaluated as window aggregates inside the SAME shuffle
    as the ranking — no extra agg job, no broadcast of the proven set.

    Phase 3 — adaptive escalation: an unproven query with >= k found
    candidates knows its k-th distance, hence EXACTLY how wide a ring
    certifies it — one variable-radius pass (per-row k-ring explode on
    the QUERY side: the residue is the small side, so the (2r+1)^2
    duplication lands on it, not on the data) proves nearly all of the
    residue at once. Escalation is a true LOOP of up to max_escalations
    rounds with a doubling radius floor; in exact arithmetic the radius
    inversion certifies every escalatable query in ONE round, so later
    rounds are a floating-point-edge safety net, and a query whose
    radius hits the wrap-safe cap goes to the scan instead of looping.
    Anything still unproven (including < k found) finishes in
    distributed data scans with the residue queries broadcast in
    bounded chunks (_knn_residual_scan, <= KNN_RESIDUAL_CHUNK rows on
    the driver per pass). The data side is NEVER collected.

    ring="auto" sizes the first ring from the data density so the
    first pass can actually PROVE most top-k sets: a ring-1 pass
    against sparse data (e.g. 1 point per cell, k=3) proves nothing
    and its join+window cost is pure waste before escalation. The
    guard keeps any ring choice exact — this is performance only.
    In the same mode the operator also re-tiles INTERNALLY to a finer
    resolution when the data is dense at the caller's res (see
    KNN_RETILE_RES_MAX): candidate volume is ~(2r+1)^2 * density per
    query, so without the re-tile it grows linearly with density (at
    ~100 points/cell a ring-1 pass is already ~900 candidates/query).
    The internal cells live in a derived column; the caller's `cell`
    values pass through to the output untouched, and explicit-ring
    callers keep the caller resolution exactly as before.

    Both query and data DataFrames must already carry a `cell` column
    at `res`.
    """
    import math

    from rios_spark.grid import cell_col, kring_cells_var_col
    from rios_spark.margin import OWNER, with_margin

    from rios_spark.ann import _metadata_row_count, ensure_parallelism, fast_count

    n_data = fast_count(data)
    res_i = res  # internal working resolution (>= res; see below)
    if ring == "auto":
        if k >= n_data:
            # every query's answer is ALL data rows: no ring can prove
            # anything and the data side is <= k rows — small by
            # definition, so the broadcast brute path is the only
            # sensible plan (ADVICE r2)
            pdf = data.select(
                F.col(d_id).alias("id"),
                F.col(d_lat).alias("lat"),
                F.col(d_lon).alias("lon"),
            ).toPandas()
            return knn_bruteforce(
                queries, pdf, k, q_lat=q_lat, q_lon=q_lon,
                d_lat="lat", d_lon="lon", d_id="id", quantize=quantize,
            ).withColumn("rank", F.col("rank").cast("int"))
        # target enough expected candidates that the k-th distance sits
        # well inside the guaranteed coverage radius — but cap at a
        # small constant: with_margin duplicates the DATA side
        # (2r+1)^2-fold, so a sparse dataset must NOT buy completeness
        # with a huge first ring (need*n^2 exploded rows); escalation
        # and the residual scan handle the tail instead (ADVICE r2)
        need = max(9.0, 4.0 * k)
        # density-adaptive internal re-tile (see KNN_RETILE_RES_MAX):
        # never coarser than the caller's res (bench-scale plans are
        # unchanged), finer only while a 1-ring box still expects
        # `need` candidates, so the join volume stays ~need per query
        # instead of scaling with density
        while (
            res_i < KNN_RETILE_RES_MAX
            and 9.0 * n_data / float(4 ** (res_i + 1)) >= need
        ):
            res_i += 1
        density = n_data / float((1 << res_i) ** 2)
        width = math.sqrt(need / max(density, 1e-12))
        ring = max(1, min(int((width - 1) / 2) + 1, KNN_AUTO_RING_MAX))

    qcols = queries.columns
    # partition the ranking window by a single unique query id when the
    # caller has one — much cheaper than hashing/sorting every query
    # column, and required anyway if query columns aren't unique
    part_cols = [q_id] if q_id else qcols
    out_cols = [*qcols, "neighbor_id", "dist_km", "rank"]
    # internal re-tile: operate on a derived cell column at res_i so the
    # caller's `cell` values pass through to the output untouched
    if res_i != res:
        cell_i = "__cell_i"
        queries_i = queries.withColumn(cell_i, cell_col(q_lat, q_lon, res_i))
        data = data.withColumn(cell_i, cell_col(d_lat, d_lon, res_i))
    else:
        cell_i = "cell"
        queries_i = queries
    # a single-file query table scans as 1-2 partitions, which makes the
    # candidate join AND the ranking window's partial top-k run on 1-2
    # cores (the profiled 14 s cold phase at sf1.0 was one task sorting
    # the whole ~13M-row candidate set); round-robin fan-out first makes
    # candidate production and the per-partition group-limit full-width.
    # No-op whenever the scan is already wide (production shape).
    queries_i = ensure_parallelism(
        queries_i, rows_hint=_metadata_row_count(queries)
    )
    d_exp = with_margin(data, res_i, ring, cell=cell_i).select(
        F.col(OWNER).alias(cell_i),
        F.col(d_id).alias("neighbor_id"),
        F.col(d_lat).alias("__dlat"),
        F.col(d_lon).alias("__dlon"),
    )
    cand = queries_i.join(d_exp, cell_i, "left")
    # persist the top-k frame (queries x k rows — tiny next to the
    # candidate join producing it): the completeness check below and the
    # final output would otherwise EACH re-execute the join+window
    # (actions do not share shuffle stages across jobs)
    # every persisted intermediate is registered with the session cache
    # registry THE MOMENT it is persisted (ADVICE r4: registration only
    # on the return paths left frames persisted-but-untracked if an
    # action raised mid-operator — unfreeable even by release_caches).
    # Registration never releases; _finish hands the COMPLETE new
    # generation to track_caches, which releases only the previous
    # generation's plan-distinct frames (ADVICE r3 — and releasing
    # per-registration instead was itself a measured ~25% regression,
    # see session.register_caches).
    from rios_spark.session import register_caches, track_caches

    cached: list[DataFrame] = []

    def _track(df: DataFrame) -> DataFrame:
        cached.append(df)
        register_caches(queries.sparkSession, "knn_tiled", [df])
        return df

    ranked = _track(
        _rank_and_prove(
            cand, part_cols, k, res_i, ring, q_lat, q_lon, quantize=quantize,
            cell=cell_i,
        ).persist()
    )
    outs = [ranked.filter(F.col("__proved")).select(*out_cols)]
    # per-query escalation plan: an unproven query with >= k candidates
    # KNOWS its k-th distance, hence exactly how wide a ring certifies
    # it; queries with < k candidates seen have no bound and go straight
    # to the residual scan
    bad_keys = _track(
        ranked.filter(~F.col("__proved"))
        .groupBy(*part_cols)
        .agg(
            F.max("__nfound").alias("__nf"),
            F.max("__kth").alias("__kd"),
            F.max(F.lit(int(ring))).alias("__r"),
        )
        .persist()
    )

    def _finish(df: DataFrame) -> DataFrame:
        # the generation is complete: release everything registered
        # under this key that the new generation's plans don't share
        track_caches(queries.sparkSession, "knn_tiled", cached)
        return df

    n = 1 << res_i
    max_radius = max(1, (n - 1) // 2)  # wider would wrap-duplicate in x
    # residue with no usable distance bound (< k candidates seen) or
    # already probed at the radius cap goes straight to the final scan.
    # RING-UTILITY bound (r6 — the sf0.01 inverse-scaling fix): when
    # data is sparse relative to the k-th distance, the ring radius a
    # query NEEDS makes the (2r+1)^2 k-ring explosion cost at least a
    # full data scan — two escalation rounds then a scan anyway was
    # measured 4.5x SLOWER at sf0.01 than sf0.1 (9.3 vs 1.9 s; 133 of
    # 157 unproven queries re-probed twice for nothing). The
    # latitude-derived radius (kth_deg / cell_lat_deg) is a LOWER bound
    # on the real per-query radius (the longitude term only widens it),
    # so `(2*lb+1)^2 >= n_data` proves the scan is cheaper before
    # paying for the ring — and it is computable from bad_keys columns
    # alone, keeping the escalate-or-scan split a pure filter.
    _lb_radius = F.greatest(
        F.ceil(
            (F.col("__kd") / F.lit(EARTH_RADIUS_KM * np.pi / 180.0))
            / F.lit(180.0 / n)
        )
        + 1,
        F.col("__r") * 2,
    )
    esc_pred = (
        (F.col("__nf") >= k)
        & F.col("__kd").isNotNull()
        & (F.col("__r") < max_radius)
        & ((2 * _lb_radius + 1) * (2 * _lb_radius + 1) < F.lit(int(n_data)))
    )

    # one agg = one job per phase for BOTH control decisions (is the
    # residue empty? is any of it escalatable?) — the phase counters
    # (the RIOS Timers/metrics analogue) come from the same row free
    def _residue_stats(bk: DataFrame) -> tuple[int, int]:
        row = bk.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(esc_pred.cast("int")), F.lit(0)).alias("ne"),
        ).first()
        return int(row["n"]), int(row["ne"])

    n_bad, n_esc = _residue_stats(bad_keys)
    if counters is not None:
        counters["ring0"] = ring
        counters["res_internal"] = res_i
        counters["unproven_pass0"] = n_bad
    if n_bad == 0:
        return _finish(_union_all(outs))

    n_residual = 0
    residual_parts: list[DataFrame] = []
    d_plain = data.select(
        F.col(cell_i).alias("__probe"),
        F.col(d_id).alias("neighbor_id"),
        F.col(d_lat).alias("__dlat"),
        F.col(d_lon).alias("__dlon"),
    )
    # adaptive escalation LOOP (round-2 ADVICE: the parameter now means
    # what it says). Each round proves the escalatable residue or grows
    # the radius floor 2x, so progress is guaranteed until max_radius;
    # the guard re-check keeps every round exact.
    for i in range(max_escalations):
        # residue with no usable bound can't escalate — stage it for the
        # final scan and keep looping on the escalatable part only
        residual_parts.append(bad_keys.filter(~esc_pred).select(*part_cols))
        n_residual += n_bad - n_esc
        if n_esc == 0:
            bad_keys = None
            break
        esc = queries_i.join(F.broadcast(bad_keys.filter(esc_pred)), part_cols, "inner")
        # kth distance -> ring radius in cells, inverting the guard's
        # exact spherical edge distances in closed form. Because the
        # query point sits INSIDE its own cell, a ring of R cells
        # guarantees an edge margin of at least R*cell_deg in each
        # direction, so:
        #   lat: R_lat = ceil(kth_deg / cell_lat_deg)
        #   lon: need asin(cos(phi)*sin(dlam)) * R_E >= kth
        #        -> sin(dlam) >= sin(kth/R_E)/cos(phi); if that exceeds
        #        1, no dlam < 90 deg works — take dlam = 90 deg, whose
        #        guard term is the over-the-pole distance (proven or
        #        not, the guard re-checks; unproven goes to the scan)
        cell_lat_deg = 180.0 / n
        cell_lon_deg = 360.0 / n
        kth_deg = F.col("__kd") / F.lit(EARTH_RADIUS_KM * np.pi / 180.0)
        r_lat = F.ceil(kth_deg / F.lit(cell_lat_deg))
        sin_arg = F.sin(F.col("__kd") / F.lit(EARTH_RADIUS_KM)) / F.cos(
            F.radians(F.col(q_lat))
        )
        dlam_deg = F.when(sin_arg >= 1.0, F.lit(90.0)).otherwise(
            F.degrees(F.asin(sin_arg))
        )
        r_lon = F.ceil(dlam_deg / F.lit(cell_lon_deg))
        # the doubling floor (__r * 2) makes re-escalation of a query
        # whose computed radius was too optimistic strictly wider each
        # round — no same-radius stall
        radius = F.least(
            F.greatest(r_lat + 1, r_lon + 1, F.col("__r") * 2),
            F.lit(max_radius),
        ).cast("int")
        probe = esc.withColumn("__radius", radius).withColumn(
            "__probe",
            F.explode(kring_cells_var_col(F.col(cell_i), res_i, F.col("__radius"))),
        )
        cand_r = probe.join(d_plain, "__probe", "left").drop("__probe")
        ranked_r = _track(
            _rank_and_prove(
                cand_r, part_cols, k, res_i, F.col("__radius"), q_lat, q_lon,
                quantize=quantize, cell=cell_i,
            ).persist()
        )
        outs.append(ranked_r.filter(F.col("__proved")).select(*out_cols))
        bad_keys = _track(
            ranked_r.filter(~F.col("__proved"))
            .groupBy(*part_cols)
            .agg(
                F.max("__nfound").alias("__nf"),
                F.max("__kth").alias("__kd"),
                F.max("__radius").alias("__r"),
            )
            .persist()
        )
        if i == max_escalations - 1:
            # LAST round (r6 fusion): everything still unproven goes to
            # the scan regardless, so this round's control-stats job is
            # pure fixed cost — skip it. The residue is bounded by
            # n_esc (only escalated keys can remain unproven), which
            # keeps the scan's driver collect bounded; the collect
            # itself discovers the exact (possibly zero) count in the
            # same job that fetches the rows.
            if counters is not None:
                counters[f"unproven_escalation_{i}"] = n_esc  # upper bound
            n_bad = None
            break
        n_bad, n_esc = _residue_stats(bad_keys)
        if counters is not None:
            counters[f"unproven_escalation_{i}"] = n_bad
        if n_bad == 0:
            bad_keys = None
            break
    if bad_keys is not None:
        residual_parts.append(bad_keys.select(*part_cols))
        n_residual += n_bad if n_bad is not None else n_esc
    # a key either escalates or is staged for the scan exactly once, so
    # the arithmetic total IS the residual count (an upper bound after
    # a fused final round — the scan's empty-collect fast-out makes an
    # over-count cost one tiny job, never a wrong result)
    if counters is not None:
        counters["residual_scan"] = n_residual
    if n_residual == 0:
        return _finish(_union_all(outs))
    residual_keys = _union_all(residual_parts).distinct()
    bad_q = queries.join(F.broadcast(residual_keys), part_cols, "left_semi")
    fixed = _knn_residual_scan(
        bad_q, data, k, part_cols, q_lat, q_lon, d_lat, d_lon, d_id,
        quantize=quantize, n_residue_hint=n_residual,
    ).select(*qcols, "neighbor_id", "dist_km", F.col("rank").cast("int").alias("rank"))
    outs.append(fixed)
    return _finish(_union_all(outs))


def _union_all(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


# Pair budget for the auto-dispatch: above this many query x data
# distance evaluations the brute path's all-pairs compute exceeds the
# tiled path's join+guard cost even when the data side broadcasts
# comfortably. With the GEMM candidate kernel the brute path measured
# ~2.5-3 s at 1.5e9 pairs (sf1.0) vs ~16 s for a cold tiled pass, so
# the crossover sits well above bench scale; the gate exists for true
# scale (e.g. 15M x 1M = 1.5e13 pairs), where all-pairs is
# catastrophic no matter how fast the per-pair kernel is.
KNN_BRUTE_PAIR_BUDGET = 4_000_000_000


def knn_join(
    queries: DataFrame,
    data: DataFrame,
    k: int,
    res: int,
    broadcast_threshold: int = 2_000_000,
    **kwargs,
) -> DataFrame:
    """Auto-dispatching kNN: the exact brute-force broadcast path runs
    when the data side fits the broadcast budget AND the total pair
    count stays under KNN_BRUTE_PAIR_BUDGET (guide §1.2: the all-pairs
    compute is O(Q x N) while the tiled path is ~O(Q + N) — at bench
    sf the brute path wins ~3x, but 10x the rows means 100x the pairs
    and the tiled join+guard overhead amortizes); otherwise the
    distributed tiled path runs. Both are exact.

    Memory budget of the broadcast path: the threshold bounds only the
    broadcast payload (2M rows x 3 float64 = ~48 MB per executor); the
    distance matrices are independently capped by KNN_GEMM_BUDGET, so
    task memory stays bounded regardless of Arrow batch size x data
    size (the round-1 hazard was a 65k x 2M = ~1 TB matrix)."""
    from rios_spark.ann import _metadata_row_count, ensure_parallelism, fast_count

    d_id = kwargs.get("d_id", "id")
    d_lat = kwargs.get("d_lat", "lat")
    d_lon = kwargs.get("d_lon", "lon")
    n = fast_count(data)
    # pair-count gate on a FREE upper bound (parquet-footer count of a
    # count-preserving query plan; None = unknown, keep the broadcast
    # path rather than pay a counting job)
    q_rows = _metadata_row_count(queries)
    pairs_ok = q_rows is None or q_rows * n <= KNN_BRUTE_PAIR_BUDGET
    # k >= n means every query's answer is ALL data rows: the tiled
    # path's guard can never certify anything (ADVICE r2) — the
    # broadcast brute path is the only sensible plan, and n <= k is
    # small by definition
    if (n <= broadcast_threshold and pairs_ok) or k >= n:
        pdf = data.select(
            F.col(d_id).alias("id"), F.col(d_lat).alias("lat"), F.col(d_lon).alias("lon")
        ).toPandas()
        # a small-SF query table often scans as ONE partition — spread
        # the Arrow kernel across the cluster (no-op at scale); a free
        # footer count on a count-preserving query plan sizes the
        # fan-out so tiny frames don't pay a full-width shuffle
        return knn_bruteforce(
            ensure_parallelism(queries, rows_hint=q_rows),
            pdf, k,
            q_lat=kwargs.get("q_lat", "lat"), q_lon=kwargs.get("q_lon", "lon"),
            d_lat="lat", d_lon="lon", d_id="id",
            quantize=kwargs.get("quantize"),
        )
    # the tiled path needs a `cell` column on both sides; derive any
    # missing one from the coordinates at the dispatch resolution
    from rios_spark.grid import cell_col

    if "cell" not in queries.columns:
        queries = queries.withColumn(
            "cell", cell_col(kwargs.get("q_lat", "lat"), kwargs.get("q_lon", "lon"), res)
        )
    if "cell" not in data.columns:
        data = data.withColumn("cell", cell_col(d_lat, d_lon, res))
    return knn_tiled(queries, data, k, res, **kwargs)


# resample neighbourhood sizes, mirroring the GDAL kernel supports the
# reference exposes (rios/applier.py:655-661): near 1x1, bilinear 2x2,
# cubic/cubicspline 4x4, lanczos 6x6
RESAMPLE_K = {"near": 1, "bilinear": 4, "cubic": 16, "cubicspline": 16, "lanczos": 36}


def resample_join(
    queries: DataFrame,
    data: pd.DataFrame,
    value_col: str,
    method: str = "bilinear",
    q_lat: str = "lat",
    q_lon: str = "lon",
    d_id: str = "id",
    power: float = 1.0,
) -> DataFrame:
    """Resample join — the setResampleMethod modes
    (rios/applier.py:655-661: near, bilinear, cubic, cubicspline,
    lanczos) re-expressed for scattered points: the grid-convolution
    kernel becomes a distance-kernel-weighted average over the k nearest
    data points (k = the kernel's support size: 1/4/16/16/36).

      near         k=1  (the testresample contract: exact array shift)
      bilinear     k=4  inverse-distance weights (1/d^power)
      cubic        k=16 tricube kernel (1-(d/D)^3)^3  — the classic
                   local-regression kernel; D = the query's 16th-NN
                   distance, so the kernel support adapts to density
      cubicspline  k=16 biweight kernel (1-(d/D)^2)^2 (smoother falloff)
      lanczos      k=36 3-lobe windowed sinc on t = 3*d/D

    An exact-distance-0 match always returns that point's value
    (all kernels peak at 0). Output: all query columns + `resampled`.
    One broadcast of the data side, one window, one groupBy per call.
    Past KNN_BRUTE_PAIR_BUDGET total query x data pairs the neighbour
    search dispatches to the tiled+guard path instead of the broadcast
    kernel (r7; exact either way — see knn_join's gate rationale).
    """
    if method not in RESAMPLE_K:
        raise ValueError(f"unknown resample method {method!r}")
    from rios_spark.ann import _metadata_row_count, ensure_parallelism

    k = RESAMPLE_K[method]
    q_rows = _metadata_row_count(queries)
    if q_rows is not None and q_rows * len(data) > KNN_BRUTE_PAIR_BUDGET:
        # blowup-scale dispatch (r7): the broadcast kernel evaluates
        # Q x N pairs no matter how fast the per-pair GEMM is (measured
        # 79 s at 1.5e11 pairs), while the tiled+guard path is ~O(Q+N)
        # and exact. Both bench/correctness scales stay under the
        # budget (sf1.0 = 1.5e9 pairs), so the measured plan is
        # untouched; only true-scale inputs reroute. The base res is
        # coarse — knn_tiled's density-adaptive internal re-tile picks
        # the working resolution from the data density.
        from rios_spark.grid import cell_col

        base_res = 3
        had_cell = "cell" in queries.columns
        qk = (
            queries.withColumnRenamed("cell", "__cell_user")
            if had_cell
            else queries
        )
        qk = qk.withColumn("cell", cell_col(q_lat, q_lon, base_res))
        dk = queries.sparkSession.createDataFrame(
            data[[d_id, "lat", "lon"]]
        ).withColumn("cell", cell_col("lat", "lon", base_res))
        kn = knn_tiled(
            qk, dk, k, base_res, d_id=d_id, q_lat=q_lat, q_lon=q_lon,
        ).drop("cell")
        if had_cell:
            kn = kn.withColumnRenamed("__cell_user", "cell")
    else:
        # a single-file query table scans as ONE partition and would
        # run the Arrow kernel on one core (the r3 knn_join lesson —
        # this call site was missed); no-op at scale
        kn = knn_bruteforce(
            ensure_parallelism(queries, rows_hint=q_rows),
            data, k, q_lat=q_lat, q_lon=q_lon, d_id=d_id,
        )
    vals = queries.sparkSession.createDataFrame(
        data[[d_id, value_col]].rename(columns={d_id: "neighbor_id", value_col: "__v"})
    )
    j = kn.join(F.broadcast(vals), "neighbor_id")
    qcols = [c for c in queries.columns]
    d = F.col("dist_km")
    if method == "near":
        w = F.lit(1.0)
    elif method == "bilinear":
        w = F.lit(1.0) / F.pow(d, F.lit(power))
    else:
        # adaptive support: D = the query's k-th neighbour distance,
        # padded so the farthest neighbour keeps a nonzero weight
        wspec = Window.partitionBy(*qcols)
        D = F.max(d).over(wspec) * F.lit(1.0 + 1e-9)
        t = d / D
        if method == "cubic":
            w = F.pow(F.lit(1.0) - F.pow(t, F.lit(3.0)), F.lit(3.0))
        elif method == "cubicspline":
            w = F.pow(F.lit(1.0) - F.pow(t, F.lit(2.0)), F.lit(2.0))
        else:  # lanczos, 3 lobes
            x = t * F.lit(3.0)
            pix = F.lit(float(np.pi)) * x
            sinc = F.when(x == 0, F.lit(1.0)).otherwise(F.sin(pix) / pix)
            sinc3 = F.when(x == 0, F.lit(1.0)).otherwise(
                F.sin(pix / 3.0) / (pix / 3.0)
            )
            w = sinc * sinc3
        j = j.withColumn("__w", w)
        w = F.col("__w")
    w = F.when(d == 0, F.lit(1e18)).otherwise(w)
    return (
        j.groupBy(*qcols)
        .agg((F.sum(w * F.col("__v")) / F.sum(w)).alias("resampled"))
    )


def resample_bilinear(
    queries: DataFrame,
    data: pd.DataFrame,
    value_col: str,
    q_lat: str = "lat",
    q_lon: str = "lon",
    d_id: str = "id",
    power: float = 1.0,
) -> DataFrame:
    """Back-compat wrapper: resample_join(method='bilinear')."""
    return resample_join(
        queries, data, value_col, "bilinear",
        q_lat=q_lat, q_lon=q_lon, d_id=d_id, power=power,
    )


def _haversine_col(lat1, lon1, lat2, lon2):
    """Haversine as built-in Spark expressions (JVM-side, codegen)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(rl1) * F.cos(rl2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))
