"""Streaming embedding near-duplicate detection across micro-batches.

The embedding analogue of streaming/neardup.py: the batch operator
(operators/similarity.embedding_neardup_pairs) centroid-blocks an
ACCUMULATED corpus; at ingest time you also want to know, AS VECTORS
ARRIVE, which of them near-duplicate something recently seen —
re-embedded re-crawls, mirrored documents whose text changed just
enough to defeat exact and MinHash dedup but not the embedding.

Shape — the batch blocking, with state instead of a self-join:

    readStream(vectors) ── top-``probe`` centroid assignment
                           (numpy mapInPandas; centroids ride into the
                           closure — the broadcast; no window, so the
                           stage stays streaming-legal)
                        ── withWatermark(event time)
                        ── groupBy(centroid_id) applyInPandasWithState
                             state: (ids, vectors) seen in this bucket
                        ──> (id_a, id_b, centroid_id, cos, ts) pairs

Unlike the MinHash stream (candidates only), the bucket state holds the
VECTORS, so arrivals verify the exact cosine in-state and the output
pairs are final (threshold already applied).  A pair probing two shared
buckets surfaces once per bucket — compose the same downstream
``dropDuplicatesWithinWatermark(["id_a", "id_b"])`` second query as
minhash_pairs_stream (same Spark 4.1 chaining caveat).

State is bounded the same two ways (event-time TTL eviction +
hot-bucket saturation with drop-the-bucket semantics), but holds
``dim`` doubles per vector — size ``max_bucket_size`` accordingly
(memory per bucket = max_bucket_size x dim x 8 bytes).

Centroids are a driver-side parameter (list or collected DataFrame) —
the production pattern is to train/refresh them from the batch corpus
(similarity.train_ivf_centroids or the head-sample rule) and restart
the query; a streaming job cannot re-derive them from unbounded input.
Recall is the batch operator's: exact duplicates always co-bucket
(cosine is scale-invariant), merely-near pairs are heuristic in tight
centroid races — raise ``probe``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

PAIRS_SCHEMA = "id_a BIGINT, id_b BIGINT, centroid_id BIGINT, cos DOUBLE, ts TIMESTAMP"
_STATE_SCHEMA = "ids ARRAY<BIGINT>, vecs ARRAY<ARRAY<DOUBLE>>, saturated BOOLEAN"


def _centroid_matrix(centroids) -> tuple:
    """Normalize the centroids argument (DataFrame with (centroid_id,
    embedding) or [(centroid_id, vector)] rows) to (ids array, unit-ish
    matrix) driver-side."""
    import numpy as np

    if isinstance(centroids, DataFrame):
        rows = [
            (r["centroid_id"], list(r["embedding"]))
            for r in centroids.select("centroid_id", "embedding").collect()
        ]
    else:
        rows = [(cid, list(v)) for cid, v in centroids]
    rows.sort(key=lambda t: t[0])
    ids = np.array([t[0] for t in rows], dtype=np.int64)
    M = np.array([t[1] for t in rows], dtype=np.float64)
    return ids, M


def centroid_buckets_stream(
    vec_stream: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str = "ts",
    probe: int = 2,
) -> DataFrame:
    """(vec_id, ts, centroid_id, embedding) — stateless top-``probe``
    bucket assignment via the SHARED batch kernel
    (similarity._centroid_topk_assign_kernel: one BLAS matmul per Arrow
    batch, half-away-from-zero rounded-cosine ordering with centroid-id
    tie-break — the same code path as assign_centroids, so the stream
    can never drift from the batch operator's bucket rule), with the
    event time carried through and the vector riding along for the
    in-bucket exact verify.  No window, no shuffle — streaming-legal."""
    from pyspark.sql import functions as F

    from beyond_vector_search_spark.operators.similarity import (
        _centroid_topk_assign_kernel,
    )

    cids, M = _centroid_matrix(centroids)
    spark = vec_stream.sparkSession
    cents_df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(cids, M)],
        "centroid_id BIGINT, cv ARRAY<DOUBLE>",
    )
    src = vec_stream.selectExpr(
        f"CAST({id_col} AS BIGINT) AS vec_id",
        f"{ts_col} AS ts",
        f"CAST({vec_col} AS ARRAY<DOUBLE>) AS embedding",
    )
    assigned = _centroid_topk_assign_kernel(
        src,
        cents_df,
        id_col="vec_id",
        vec_col="embedding",
        probe=probe,
        out_id="vec_id",
        with_vec=True,
        carry=("ts",),
    )
    return assigned.select(
        "vec_id", "ts", "centroid_id", F.col("_v").alias("embedding")
    )


def _empty_pairs():
    import pandas as pd

    return pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "centroid_id": pd.Series(dtype="int64"),
            "cos": pd.Series(dtype="float64"),
            "ts": pd.Series(dtype="datetime64[ns]"),
        }
    )


def _make_bucket_update(threshold: float, max_bucket_size: int, ttl_ms: int):
    import numpy as np
    import pandas as pd

    from beyond_vector_search_spark.operators.similarity import round_half_away

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        centroid_id = int(key[0])
        if state.hasTimedOut:
            state.remove()
            yield _empty_pairs()
            return
        if state.exists:
            ids = list(state.get[0])
            vecs = [list(v) for v in state.get[1]]
            saturated = bool(state.get[2])
        else:
            ids, vecs, saturated = [], [], False
        pairs: list[tuple] = []
        last_ms = 0
        for pdf in pdfs:
            has_ts = len(pdf) and "ts" in pdf
            if has_ts:
                last_ms = max(last_ms, max(int(t.value // 1_000_000) for t in pdf["ts"]))
                pdf = pdf.sort_values("ts", kind="stable")  # pair ts = later doc
            tss = pdf["ts"].tolist() if has_ts else [None] * len(pdf)
            in_state = set(ids)
            for vid, t, vec in zip(
                pdf["vec_id"].astype("int64").tolist(), tss, pdf["embedding"].tolist()
            ):
                if saturated:
                    continue
                if vid in in_state:
                    # a re-delivered vector (re-crawl, replay) is
                    # already paired with every bucket member — never
                    # re-append: duplicates would re-emit every pair,
                    # multiply state by dim doubles per copy, and
                    # inflate the bucket toward saturation
                    continue
                v = np.asarray(vec, dtype=np.float64)
                vn = float(np.sqrt((v * v).sum()))
                for sid, sv in zip(ids, vecs):
                    if sid == vid:
                        continue
                    s = np.asarray(sv, dtype=np.float64)
                    sn = float(np.sqrt((s * s).sum()))
                    denom = vn * sn
                    cos = 0.0 if denom == 0.0 else float(v @ s) / denom
                    # half-away-from-zero — the batch verify's rule
                    # (similarity.round_half_away), NOT Python's
                    # half-even round()
                    cos = float(round_half_away(cos))
                    if cos >= threshold:
                        pairs.append((min(sid, vid), max(sid, vid), centroid_id, cos, t))
                in_state.add(vid)
                ids.append(vid)
                vecs.append(v.tolist())
                if len(ids) > max_bucket_size:
                    # batch-guard semantics: the over-cap bucket stops
                    # storing AND emitting (prior-batch emissions are
                    # irrevocable — same caveat as minhash_pairs_stream)
                    saturated, ids, vecs, pairs = True, [], [], []
        state.update((ids, vecs, saturated))
        state.setTimeoutTimestamp(max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1))
        if pairs:
            yield pd.DataFrame(
                pairs, columns=["id_a", "id_b", "centroid_id", "cos", "ts"]
            )
        else:
            yield _empty_pairs()

    return update


def embedding_neardup_stream(
    vec_stream: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str = "ts",
    threshold: float = 0.999,
    probe: int = 2,
    watermark: str = "10 minutes",
    max_bucket_size: int = 10_000,
    state_ttl_ms: int = 60 * 60 * 1000,
) -> DataFrame:
    """(id_a, id_b, centroid_id, cos, ts) — VERIFIED near-dup pairs as
    vectors arrive (exact cosine computed against the bucket's state;
    ``threshold`` already applied).  One row per shared probed bucket —
    dedup downstream with the two-query
    ``dropDuplicatesWithinWatermark(["id_a", "id_b"])`` composition
    (see minhash_pairs_stream's docstring for why two queries).

    Agreement with the batch operator: over the same vectors and the
    same explicit centroids, the deduped pair set equals
    ``embedding_neardup_pairs(..., n_centroids=len(centroids))`` while
    all vectors are inside the watermark horizon (pinned by test)."""
    assigned = centroid_buckets_stream(
        vec_stream,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        ts_col=ts_col,
        probe=probe,
    ).withWatermark("ts", watermark)
    return assigned.groupBy("centroid_id").applyInPandasWithState(
        _make_bucket_update(threshold, max_bucket_size, state_ttl_ms),
        outputStructType=PAIRS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
