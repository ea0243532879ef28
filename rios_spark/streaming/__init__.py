"""Structured Streaming ingest — the streaming face of the tile engine.

RIOS's producer/consumer block buffers and single-writer drain loop
(rios/structures.py:547-722, rios/applier.py:1143-1171) are replaced
wholesale by Spark micro-batches: backpressure = maxFilesPerTrigger /
maxOffsetsPerTrigger, the ordered writer = the sink's transactional
commit, block-completion events = watermarked windows.

``stream_tile_counts`` is the canonical streaming query: a pages
stream → tile-assign (same JVM-side cell expression as batch — the
batch/stream parity guarantee) → watermarked tumbling-window counts
per cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rios_spark.grid import cell_col


def stream_tile_counts(
    pages_stream: DataFrame,
    res: int,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming per-(window, cell) page counts with late-data handling.

    The aggregation state is keyed by (window, cell) — bounded by the
    watermark; counts are algebraic so state merge is exact. The cell
    expression is the identical codegen'd expression used in batch, so
    a backfill (batch) and the live stream agree row-for-row.
    """
    tiled = pages_stream.withColumn("cell", cell_col("lat", "lon", res))
    return (
        tiled.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "cell")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "cell",
            "n_pages",
        )
    )
