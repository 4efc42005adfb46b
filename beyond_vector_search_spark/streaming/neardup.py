"""Streaming near-duplicate detection: MinHash LSH across micro-batches.

The batch pass (operators/dedup.minhash_signatures +
lsh_candidate_pairs) finds near-dup pairs inside an accumulated corpus;
at ingest time you also want to know, AS DOCUMENTS ARRIVE, which of
them near-duplicate something recently seen — mirrored articles,
re-crawls with boilerplate drift, template spam.  Exact-content
streaming dedup (streaming/dedup.py) misses all of those (any byte
difference defeats md5).

Shape — identical math to the batch pass, state instead of a self-join:

    readStream(docs) ── minhash signature (pure exprs, per-row)
                     ── explode (band_id, band_key)    [same md5 band keys]
                     ── withWatermark(event-time)
                     ── groupBy(band_key) applyInPandasWithState
                          state: doc_ids seen in this bucket (bounded)
                     ──> (doc_a, doc_b, band_id) candidate stream

A new doc pairs with every doc currently in its bucket's state; two
docs agreeing on ALL rows of any band meet in that band's bucket —
exactly the batch operator's candidate condition, so a pair appears
here iff the batch pass over the same documents finds it (while both
docs are inside the watermark horizon; older near-dups are the batch
pass's job, same division of labor as streaming/dedup.py).

State is bounded twice, the only way stateful streaming survives
100 TB/day ingest:

- **event-time timeout**: a bucket with no arrivals past the watermark
  horizon is evicted wholesale (GroupStateTimeout.EventTimeTimeout).
- **hot-bucket cap**: a degenerate band key (near-empty docs sharing a
  trivial signature) would otherwise accumulate m docs and emit m^2
  pairs; at ``max_bucket_size`` the bucket stops storing AND stops
  emitting (same drop-the-bucket semantics as the batch operator's
  ``max_bucket_size`` guard — selective bands still pair the doc).

Candidates are verified downstream exactly like batch LSH output:
join signatures back on doc_id and estimate Jaccard, or run
operators/dedup.jaccard_pairs on the flagged subset.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from beyond_vector_search_spark.functions.hashing import minhash_signature
from beyond_vector_search_spark.functions.text import tokenize
from beyond_vector_search_spark.operators.dedup import word_shingles_from_tokens

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

PAIRS_SCHEMA = "doc_a BIGINT, doc_b BIGINT, band_id INT, band_key STRING, ts TIMESTAMP"
# ts_ms parallels doc_ids (arrival event time per stored doc) — the
# buffered mode stamps its at-eviction pairs from it; immediate mode
# maintains it too so both modes share one state layout.
#
# CHECKPOINT COMPATIBILITY: adding ts_ms changed the state-store row
# layout, so a stream restarted from a checkpoint written BEFORE this
# field existed fails Spark's state schema compatibility check.
# Existing immediate-mode deployments must restart with a FRESH
# checkpoint directory (state here is a bounded dedup memory, not
# source progress — the cost is transiently re-emitting pairs for
# in-flight docs, bounded by the state TTL).
_STATE_SCHEMA = "doc_ids ARRAY<BIGINT>, ts_ms ARRAY<BIGINT>, saturated BOOLEAN"


def banded_signatures_stream(
    doc_stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text: Column | str = "text",
    ts_col: str = "ts",
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(doc_id, ts, band_id, band_key) — the stateless front half:
    signature + banding as pure expressions (no shuffle, streaming-safe).
    Band keys are md5 of the band slice — byte-identical to
    operators/dedup.lsh_candidate_pairs, pinned by test."""
    if num_hashes % bands != 0:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    rows_per_band = num_hashes // bands
    text = F.col(text) if isinstance(text, str) else text
    sigs = doc_stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
        word_shingles_from_tokens(tokenize(text), shingle_n).alias("shingles"),
    ).select(
        "doc_id", "ts", minhash_signature(F.col("shingles"), num_hashes).alias("sig")
    )
    return sigs.select(
        "doc_id",
        "ts",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band_id"),
                    F.md5(
                        F.concat_ws(
                            "|", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                        )
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "ts", "band.band_id", "band.band_key")


def _empty_pairs():
    import pandas as pd

    return pd.DataFrame(
        {
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64"),
            "band_id": pd.Series(dtype="int32"),
            "band_key": pd.Series(dtype="object"),
            "ts": pd.Series(dtype="datetime64[ns]"),
        }
    )


def _make_bucket_update(max_bucket_size: int, ttl_ms: int, buffered: bool = False):
    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        band_id, band_key = int(key[0]), str(key[1])
        if state.hasTimedOut:
            # bucket eviction: in buffered mode this is THE emission
            # point — the bucket provably stayed under cap for the
            # whole watermark horizon, so its pairs are final (an
            # over-cap bucket's saturated flag suppresses them all)
            seen, tss, saturated = (
                (list(state.get[0]), list(state.get[1]), bool(state.get[2]))
                if state.exists
                else ([], [], False)
            )
            state.remove()
            if buffered and not saturated and len(seen) >= 2:
                by_id: dict[int, int] = {}
                for d, t in zip(seen, tss):
                    by_id[d] = max(by_id.get(d, t), t)
                ids = sorted(by_id)
                pairs = [
                    (
                        ids[i],
                        ids[j],
                        band_id,
                        band_key,
                        pd.Timestamp(max(by_id[ids[i]], by_id[ids[j]]), unit="ms"),
                    )
                    for i in range(len(ids))
                    for j in range(i + 1, len(ids))
                ]
                yield pd.DataFrame(
                    pairs, columns=["doc_a", "doc_b", "band_id", "band_key", "ts"]
                )
            else:
                yield _empty_pairs()
            return
        seen, tss, saturated = ([], [], False) if not state.exists else (
            list(state.get[0]), list(state.get[1]), bool(state.get[2])
        )
        pairs: list[tuple] = []
        last_ms = 0
        for pdf in pdfs:
            has_ts = len(pdf) and "ts" in pdf
            if has_ts:
                last_ms = max(last_ms, max(int(t.value // 1_000_000) for t in pdf["ts"]))
                # rows within a micro-batch are NOT time-ordered;
                # iterate in event-time order so a pair's stamp is
                # genuinely the LATER doc's ts (docs already in state
                # are from earlier batches/rows, so current ts >= both)
                pdf = pdf.sort_values("ts", kind="stable")
            tss_in = pdf["ts"].tolist() if has_ts else [None] * len(pdf)
            pos = {d: i for i, d in enumerate(seen)}
            for d, t in zip(pdf["doc_id"].astype("int64").tolist(), tss_in):
                if saturated:
                    continue
                t_ms = 0 if t is None else int(t.value // 1_000_000)
                if d in pos:
                    # a re-delivered document (re-crawl, replay) is
                    # already paired with every bucket member — refresh
                    # its arrival time for TTL purposes, but never
                    # re-append: duplicates would re-emit every pair
                    # and inflate the bucket toward saturation
                    i = pos[d]
                    tss[i] = max(tss[i], t_ms)
                    continue
                if not buffered:
                    for s in seen:
                        if s != d:
                            # pair event time = the LATER doc's arrival
                            # (the moment the pair became knowable) —
                            # carried on the output row so downstream
                            # watermark-bounded dedup
                            # (dropDuplicatesWithinWatermark) composes
                            pairs.append((min(s, d), max(s, d), band_id, band_key, t))
                pos[d] = len(seen)
                seen.append(d)
                tss.append(t_ms)
                if len(seen) > max_bucket_size:
                    # batch-guard semantics: an over-cap bucket emits
                    # NOTHING (its pairs are all suspect); state keeps
                    # only the flag, not the m doc ids
                    saturated, seen, tss, pairs = True, [], [], []
        state.update((seen, tss, saturated))
        # evict the whole bucket once the watermark passes last arrival
        # + TTL (clamped above the current watermark, which Spark
        # requires of event-time timeouts)
        state.setTimeoutTimestamp(
            max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        if pairs:
            yield pd.DataFrame(
                pairs, columns=["doc_a", "doc_b", "band_id", "band_key", "ts"]
            )
        else:
            yield _empty_pairs()

    return update


def minhash_pairs_stream(
    doc_stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text: Column | str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    num_hashes: int = 16,
    shingle_n: int = 3,
    bands: int = 4,
    max_bucket_size: int = 1_000,
    state_ttl_ms: int = 60 * 60 * 1000,
    emit: str = "immediate",
) -> DataFrame:
    """(doc_a, doc_b, band_id, band_key, ts) near-dup candidate stream.

    One output row per (pair, band) meeting, stamped with the LATER
    doc's event time; a pair agreeing on several bands appears once per
    band.  For exactly-once pair emission compose a DOWNSTREAM query
    over the landed candidate stream::

        # query 1: this operator -> file/Kafka sink
        # query 2: readStream(sink)
        pairs.withWatermark("ts", horizon)
             .dropDuplicatesWithinWatermark(["doc_a", "doc_b"])

    (pinned by test_streaming_minhash_pairs_exactly_once).  The ``ts``
    stamp exists precisely so the watermark-bounded dedup composes.
    Two queries, not one: chaining ``dropDuplicatesWithinWatermark``
    directly onto this operator crashes in Spark 4.1 — the streaming
    dedup operator casts its input to UnsafeRow, but rows arriving from
    applyInPandasWithState's Arrow output are columnar
    (ClassCastException: ColumnarBatchRow -> UnsafeRow), and the
    global-watermark correctness check flags the chain anyway.  The
    sink boundary is also the production shape: candidates land once,
    and dedup/verify/clustering consumers each replay them.  ``state_ttl_ms``
    bounds how long an idle bucket's doc ids stay pairable (event time
    since the bucket's last arrival).

    **Saturation caveat vs the batch guard** (``emit="immediate"``,
    the default): ``max_bucket_size`` drops a bucket's pairs only from
    the saturating arrival ONWARD.  Pairs the bucket emitted in
    EARLIER micro-batches are already downstream — append-mode output
    cannot be retracted — whereas the batch operator's guard drops the
    whole over-cap bucket's pairs at once.  Streamed and batch results
    over the same documents therefore agree exactly iff no bucket
    crosses the cap mid-stream; size the cap for the watermark
    horizon's worst-case bucket, or treat early pairs from a bucket
    that later saturates as suspect downstream.

    ``emit="buffered"`` closes that gap by trading latency for it:
    nothing is emitted while a bucket is live; its pairs materialize
    ONCE, at bucket eviction (watermark horizon past the last
    arrival), and only if the bucket never crossed the cap — an
    over-cap bucket emits ZERO pairs, exactly the batch guard.  State
    stays O(bucket size) (ids + arrival times, never the m^2/2
    pairs); each pair is stamped with the later member's arrival
    time, same as immediate mode.  Alerting-style consumers want
    immediate; batch-parity curation wants buffered.

    **Buffered output is late by construction**: pairs emit only after
    the watermark passes ``ts + TTL``, so their event timestamps are
    already BEHIND the watermark at emission.  The
    ``dropDuplicatesWithinWatermark`` composition documented above is
    for immediate mode only — applied downstream of buffered output it
    would silently drop EVERY pair as late data, as would any other
    watermark-bounded/stateful event-time operator.  Deduplicate
    buffered pairs in processing time or batch-side instead (buffered
    mode emits each pair at most once per band anyway).
    """
    if emit not in ("immediate", "buffered"):
        raise ValueError(f"emit must be 'immediate' or 'buffered', got {emit!r}")
    banded = banded_signatures_stream(
        doc_stream,
        id_col=id_col,
        text=text,
        ts_col=ts_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        bands=bands,
    ).withWatermark("ts", watermark)
    return banded.groupBy("band_id", "band_key").applyInPandasWithState(
        _make_bucket_update(max_bucket_size, state_ttl_ms, buffered=emit == "buffered"),
        outputStructType=PAIRS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
