"""Generate PLANS.md: a physical-plan audit of the flagship queries.

For each audited query: number of shuffles (Exchange), whether any
Python eval node appears (ArrowEval/BatchEval — expected ONLY for the
intentionally Arrow-batched kernels), broadcast join count, and the
pruned read schemas — the evidence for the scale claims (pushdown,
column pruning, JVM-side expressions) the docs make.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from rios_spark.session import get_spark  # noqa: E402

AUDIT = [
    ("tile_counts_docs", "tile assign + count: map-side partial agg, one shuffle"),
    ("margin_ring_counts", "k-ring explode BEFORE the shuffle (projection pruned to `cell`)"),
    ("zonal_rect_docs", "broadcast cover + geometry join, codegen'd rect checks, salted two-stage agg"),
    ("zonal_pentagon_docs", "pure half-plane SQL expression, zero Python"),
    ("knn_tiled_cust_supp", "multi-phase union (pass-0 + escalation + residual); the expensive ranked top-k is PERSISTED and re-read via InMemoryTableScan, so the phase branches share one computation of the candidate join"),
    ("resample_bilinear_cust", "broadcast kNN kernel + broadcast value join + one groupBy for the weighted quotient"),
    ("median_across_sources", "three partial aggs + full-outer align + per-row array median"),
    ("adaptive_split_docs", "fully distributed split decision: hot-cell semi-join, per-resolution window sums over the COUNT frame (never the data), broadcast re-key join"),
    ("doc_lang_scores", "explode + broadcast stopword join + codegen'd conditional counts"),
    ("utm_project_customers", "Kruger series as pure projection: ZERO shuffles"),
    ("sessionize_events", "lag + cumulative sum + session agg in ONE exchange"),
    ("vocab_topk_docs", "explode -> partial/final agg -> deterministic top-k"),
    ("exact_dedup_docs", "one hash agg on md5 key"),
    ("stratified_sample_docs", "deterministic md5-bucket quota filter: pure codegen projection+filter, ZERO shuffles"),
    ("doc_fingerprints", "batch-concatenated numpy kernel (ONE ArrowEval node, char-bounded sub-batches): ZERO shuffles; the JVM zip_with doubling-ladder spelling remains available as impl='expr'"),
    ("doc_fingerprints_winnow", "same Arrow kernel with sliding-window minima (ONE ArrowEval node): ZERO shuffles; value-identical to the impl='expr' LET-bound sparse-table ladder"),
    ("fingerprint_near_dup_docs", "ONE scan: groupBy fp collects sorted doc lists (df guard = size filter), id1<id2 pairs generated inside the array, then pair agg — never all-pairs, no self-join recompute"),
    ("tpch_q3", "join-order-sensitive relational shape: segment filter pushed to the customer scan, filtered customer BROADCAST into orders, date predicates pushed to both fact scans; no SortMergeJoin at bench scale"),
    ("tpch_q5", "6-table correlated-dim join: region->nation chain broadcast, nation-pruned customer/supplier dims broadcast into the facts, c_nationkey=s_nationkey applied post-join; the only shuffle at scale is lineitem<->orders + the final per-nation agg"),
    ("tpch_q10", "agg-before-dims shape: returnflag + date filters pushed to both fact scans, per-customer agg on the joined facts, THEN broadcast dim joins on the reduced result; 3 BHJ, 0 SMJ"),
    ("embedding_topk_indexed", "persisted-IVF serving path: probed list ids pushed into the assigned-table read as a list_id PARTITION FILTER (the scan touches only probed lists' files), cogrouped GEMM scoring, global top-k window"),
]


def count_distinct_nodes(plan: str, kind: str) -> int:
    """Count PHYSICAL nodes of `kind`, not textual occurrences: the
    plan string reprints shared subtrees (persisted frames referenced
    by several union branches, cached plans under every
    InMemoryTableScan), so a naive substring count multiplies each
    real exchange by its reader count. Nodes carry a unique
    [plan_id=N] — distinct ids = nodes that actually execute."""
    ids = set(re.findall(rf"\b{kind}\b[^\n]*?\[plan_id=(\d+)\]", plan))
    if ids:
        return len(ids)
    # nodes inside WholeStageCodegen print without plan ids — fall
    # back to line count for those
    return len([ln for ln in plan.splitlines() if re.search(rf"\b{kind}\b", ln)])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from rios_spark.queries import QUERIES

    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    rows = []
    details = []
    for name, note in AUDIT:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = count_distinct_nodes(plan, "Exchange")
        n_bc = count_distinct_nodes(plan, "BroadcastExchange")
        py = bool(re.search(
        r"(ArrowEval|BatchEval|MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas)",
        plan,
    ))
        schemas = sorted(set(re.findall(r"ReadSchema: struct<([^>]*)>", plan)))
        rows.append((name, n_ex, n_bc, "yes" if py else "no", note))
        details.append((name, schemas))

    md = ["# PLANS — physical-plan audit of flagship queries",
          "",
          f"Generated by tools/dump_plans.py over {sf_dir}. 'Py' marks Arrow-",
          "batched Python nodes — expected ONLY where the operator is",
          "deliberately a vectorized kernel (kNN brute/residual phases,",
          "applier kernels); every relational operator stays JVM-side.",
          "",
          "| query | exchanges | broadcast nodes | Py | plan shape |",
          "|---|---|---|---|---|"]
    for name, n_ex, n_bc, py, note in rows:
        md.append(f"| {name} | {n_ex} | {n_bc} | {py} | {note} |")
    md += ["", "## Pruned read schemas (column pruning reaches the scan)", ""]
    for name, schemas in details:
        md.append(f"- **{name}**:")
        for s in schemas:
            md.append(f"  - `struct<{s}>`")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(md) + "\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
