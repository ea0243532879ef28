"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in rios_spark/ (see SURVEY.md §2 for the operator
inventory these queries cover). EVERY queries() entry (52 as of r6)
has a matching oracle_sql() DuckDB statement computing the same result
with identical arithmetic — including simhash_docs (md5-bit voting in
SQL), media_image_features (deterministic fixture re-derived as a
constant table), stratified_sample_docs (shared md5-bucket quota
thresholds) and winnow_near_dup_docs (winnowed-fingerprint pair
generation), tpch_q3/q5/q10 (join-order-sensitive relational
shapes — q5 the 6-table correlated-dim form, q10 agg-before-dims) and
embedding_topk_indexed (the persisted-IVF serving path searched at
nprobe == n_centroids, exact by construction). Self-check:
python tools/check_oracles.py
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: geocode the documents
    table, tile-assign at res 6 (pure JVM expressions), k-ring margin
    join, per-tile own + 1-ring counts — the RIOS applier model's
    minimum end-to-end slice (SURVEY.md §7.2 + J4)."""
    from rios_spark.queries import q_margin_ring_counts

    return q_margin_ring_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rios_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rios_spark.queries import ORACLES

    return dict(ORACLES)
