"""Streaming deduplication: cross-micro-batch duplicate suppression at
ingest time.

A crawler feed re-delivers documents (re-crawls, retries, mirrored
URLs); indexing them twice inflates df/idf and doubles storage.  This
operator drops exact-content duplicates ACROSS micro-batches with
bounded state:

    readStream(docs) ── content_hash = md5(text)
                     ── withWatermark(event-time)
                     ── dropDuplicatesWithinWatermark(content_hash)
                     ──> unique docs stream (feed to ingest.start_index_ingest)

``dropDuplicatesWithinWatermark`` keys the state store on the 32-byte
content hash, never the text, and evicts entries once the watermark
passes them — state is bounded by (arrival-rate x watermark), not by
corpus size.  Plain ``dropDuplicates`` would keep every hash forever:
at 100 TB that state IS the corpus, so the watermark form is the only
scale-viable one (duplicates farther apart than the watermark are the
batch dedup pass's job — operators/dedup.exact_dedup_map over the
accumulated store).

The reference engine has no streaming surface at all (SURVEY §2.8);
this composes its corpus model with Structured Streaming's stateful
dedup, the same layering as streaming/ingest.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dedup_doc_stream(
    doc_stream: DataFrame,
    *,
    text: Column | str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact-content streaming dedup with watermark-bounded state.

    ``doc_stream`` must carry an event-time column ``ts_col``
    (TimestampType).  Adds ``content_hash`` (md5 of the index text —
    same key as operators/dedup.exact_dedup_map, so batch and streaming
    dedup agree byte-for-byte) and keeps the FIRST arrival of each
    hash within the watermark horizon.
    """
    text = F.col(text) if isinstance(text, str) else text
    return (
        doc_stream.withColumn("content_hash", F.md5(text.cast("string")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
