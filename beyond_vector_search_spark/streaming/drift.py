"""Structured Streaming: routing-distribution drift over the runs log.

The reference names "routing distribution drift" as the metric to watch
(README.md:107) but computes nothing for it.  Here it is a streaming
aggregation over the telemetry ``runs`` stream:

    readStream(runs) -> withWatermark -> tumbling window x strategy
        -> count + mean score -> sink

The same transformation applied to a BATCH DataFrame yields the exact
batch-equivalent (one definition, two execution modes — the Structured
Streaming model), which is how the tests pin the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def routing_drift(
    runs: DataFrame,
    *,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, window_end, strategy, n_runs, mean_score).

    Works on both batch and streaming inputs.  On a stream the watermark
    bounds state: late runs beyond ``watermark`` are dropped, finalized
    windows are evicted — the standard late-data contract.
    """
    ts = F.to_timestamp(F.col("ts_unix"))
    df = runs.withColumn("ts", ts)
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "strategy")
        .agg(
            F.count("*").alias("n_runs"),
            F.avg("score").alias("mean_score"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "strategy",
            "n_runs",
            "mean_score",
        )
    )


def stream_drift_from_parquet(
    spark: SparkSession,
    runs_path: str,
    *,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming version reading the append-only runs log as a file
    stream — each new parquet file appended by the telemetry sink
    becomes a micro-batch."""
    from beyond_vector_search_spark.sources.telemetry import RUNS_SCHEMA

    stream = spark.readStream.schema(RUNS_SCHEMA).parquet(runs_path)
    return routing_drift(stream, window=window, watermark=watermark)
