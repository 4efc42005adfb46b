"""Streaming corpus ingest -> incremental index maintenance.

The reference rebuilds its entire index on every invocation
(run.py:18-23).  This module is the opposite end of that spectrum: a
Structured Streaming query that tails a document source and keeps the
persisted index CURRENT, scanning only each micro-batch's new text.

    readStream(documents) ──foreachBatch──> build_delta(batch)
                                             └─ append postings/gram_tf/doc_ids
    (on demand)  IndexDelta.load(path) ──> index_from_delta() ──> queries

Why foreachBatch and not a plain streaming sink: the delta relations
(operators/corpus_index.py IndexDelta) are three tables written
atomically per batch, and batch-id-based idempotence gives exactly-once
appends on retry — the standard Structured Streaming multi-table-sink
pattern.  All global statistics (df, idf, avg_dl) are re-derived lazily
by ``index_from_delta`` at read time, so the stream never recomputes
them and never touches old documents.

At 100 TB: each micro-batch's delta append is proportional to NEW text
only; the read-side re-derivation aggregates already-aggregated (id,
term, tf) rows.  Compaction of the accumulated append files is ordinary
parquet-directory maintenance.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame

from beyond_vector_search_spark.config import DEFAULT, EngineConfig
from beyond_vector_search_spark.operators.corpus_index import IndexDelta, build_delta


def _batch_marker(path: str, batch_id: int) -> str:
    return os.path.join(path, "_batches", f"{batch_id}.json")


def append_delta_batch(
    docs_batch: DataFrame,
    batch_id: int,
    path: str,
    *,
    id_col: str = "doc_id",
    text: Column | str = "text",
    cfg: EngineConfig = DEFAULT,
) -> bool:
    """Scan ONE micro-batch of documents and write its tf delta into the
    delta store at ``path``.  Returns False on skip.

    Idempotence comes from the LAYOUT, not the marker: each relation is
    written with ``overwrite`` into its own ``batch_id=N`` partition
    directory, so a retried batch (foreachBatch is at-least-once)
    rewrites the same directories instead of appending duplicate rows —
    a crash between the three relation writes cannot double tf counts.
    The marker file is a fast-skip optimization AND the replay guard
    after ``IndexDelta.compact`` (which folds batch directories into
    flat files, after which an overwrite would re-add the batch); it
    lives under ``path`` itself, i.e. on the same storage as the data.
    """
    marker = _batch_marker(path, batch_id)
    if os.path.exists(marker):
        return False
    delta = build_delta(docs_batch, id_col=id_col, text=text, cfg=cfg)
    for f in IndexDelta._FIELDS:
        getattr(delta, f).write.mode("overwrite").parquet(
            os.path.join(path, f, f"batch_id={batch_id}")
        )
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as fh:
        json.dump({"batch_id": batch_id, "n_docs": docs_batch.count()}, fh)
    return True


def start_index_ingest(
    doc_stream: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text: Column | str = "text",
    cfg: EngineConfig = DEFAULT,
    trigger: dict | None = None,
    checkpoint: str | None = None,
):
    """Start the streaming ingest query over a streaming documents
    DataFrame.  ``trigger`` kwargs pass through to ``.trigger()`` (e.g.
    ``{"availableNow": True}`` for drain-and-stop backfills)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_delta_batch(batch_df, batch_id, path, id_col=id_col, text=text, cfg=cfg)

    w = doc_stream.writeStream.foreachBatch(sink).outputMode("append")
    if trigger:
        w = w.trigger(**trigger)
    w = w.option("checkpointLocation", checkpoint or os.path.join(path, "_checkpoint"))
    return w.start()


def append_vector_batch(
    vec_batch: DataFrame,
    batch_id: int,
    store_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> bool:
    """Encode ONE micro-batch of embeddings against the IVFPQIndex
    store at ``store_path`` (frozen quantizer + codebooks — the FAISS
    ``add`` contract) and write its codes into the store's own
    ``codes/batch_id=N`` directory.  Returns False on skip.

    Same idempotence story as :func:`append_delta_batch`: the LAYOUT is
    the guarantee — a retried epoch overwrites its own batch directory
    instead of duplicating rows — and the marker file is the fast-skip
    plus the replay guard after ``IVFPQIndex.compact`` folds batch
    directories into batch 0.  Epoch ids are offset by +1 so streaming
    batch 0 never collides with the initial build's ``batch_id=0``.

    What this does NOT do, on purpose: retrain.  Codebooks and the
    coarse quantizer are frozen at build time; a drifting corpus is a
    deliberate offline ``IVFPQIndex.build`` (the streaming/percolate
    drift monitor is the trigger for that decision, not this sink).
    """
    from beyond_vector_search_spark.operators.similarity import IVFPQIndex

    marker = _batch_marker(store_path, batch_id)
    if os.path.exists(marker):
        return False
    IVFPQIndex.append(
        vec_batch.sparkSession,
        store_path,
        vec_batch,
        id_col=id_col,
        vec_col=vec_col,
        batch_id=batch_id + 1,
    )
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as fh:
        json.dump({"batch_id": batch_id, "n_vecs": vec_batch.count()}, fh)
    return True


def start_vector_ingest(
    vec_stream: DataFrame,
    store_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger: dict | None = None,
    checkpoint: str | None = None,
):
    """Start a streaming ANN-index maintenance query: tail a streaming
    embeddings DataFrame and keep the persisted :class:`IVFPQIndex` at
    ``store_path`` current, encoding only each micro-batch's new
    vectors (readStream → foreachBatch → ``IVFPQIndex.append``).
    Serving jobs observe new vectors on their next ``load`` — the
    vector-store "streaming upsert" shape, minus retraining (see
    :func:`append_vector_batch`)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_vector_batch(
            batch_df, batch_id, store_path, id_col=id_col, vec_col=vec_col
        )

    w = vec_stream.writeStream.foreachBatch(sink).outputMode("append")
    if trigger:
        w = w.trigger(**trigger)
    w = w.option(
        "checkpointLocation", checkpoint or os.path.join(store_path, "_checkpoint")
    )
    return w.start()
