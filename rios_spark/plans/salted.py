"""Salted two-stage aggregation — the generic hot-key agg combinator.

Catalyst already does partial (map-side) aggregation, which handles
most skew for algebraic aggregates; salting additionally splits a hot
REDUCER key across `salt` reducers, bounding any single task's input.
Required by the north rule for hot-tile aggregations (SURVEY.md A14).

Supported aggregates decompose algebraically:
  count, sum, min, max, mean (= sum/count), sum_sq (enables stddev).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "sum_sq": lambda c: F.sum(c * c),
}
_FINAL = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "sum_sq": F.sum,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) partial →
    groupBy(keys) final.

    aggs: list of (value_col, op, out_name); op in {count, sum, min,
    max, mean, sum_sq}. `mean` is decomposed into sum+count and
    finalized as a division — numerically identical to a single-stage
    avg on float64.

    salt_on: expression to salt by (default: a deterministic xxhash64
    of all non-key columns is wrong — we use spark_partition_id(),
    which is cheap and uniform; determinism of the FINAL result is
    unaffected because every op is commutative+associative).
    """
    s = salt_on if salt_on is not None else F.pmod(F.spark_partition_id(), F.lit(salt))
    partial_exprs = []
    final_exprs = []
    post = []
    for col, op, out in aggs:
        c = F.col(col).cast("double")
        if op == "mean":
            partial_exprs += [F.sum(c).alias(f"__s_{out}"), F.count(c).alias(f"__c_{out}")]
            final_exprs += [F.sum(f"__s_{out}").alias(f"__s_{out}"), F.sum(f"__c_{out}").alias(f"__c_{out}")]
            post.append((F.col(f"__s_{out}") / F.col(f"__c_{out}")).alias(out))
        else:
            partial_exprs.append(_PARTIAL[op](c).alias(f"__p_{out}"))
            final_exprs.append(_FINAL[op](f"__p_{out}").alias(out))
    partial = df.groupBy(*keys, s.alias("__salt")).agg(*partial_exprs)
    final = partial.groupBy(*keys).agg(*final_exprs)
    if post:
        keep = [c for c in final.columns if not c.startswith("__")]
        final = final.select(*keep, *post)
    return final
