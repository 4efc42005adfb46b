"""Corpus snapshot versioning: diff two corpus versions, feed the
incremental index-update path.

A recurring large-pipeline primitive the reference has no surface for
(its run.py:18-23 rebuilds everything per run): crawls and curation
pipelines land as SNAPSHOTS — "crawl N+1" is mostly "crawl N" plus a
few percent added/changed/removed documents — and every downstream
incremental consumer (index delta update, near-dup re-check,
re-tokenization) wants exactly that few percent, not the snapshot.

:func:`corpus_diff` computes the change set relationally:

    old ─project(id, md5(content))─┐
                                   ├─ full outer join on id ─ change
    new ─project(id, md5(content))─┘

Scale shape: two narrow hash projections (the text never moves — only
32-char digests reach the join) and ONE join shuffle per side on the
id; on id-bucketed corpus tables the join co-locates and the whole
diff is exchange-free.  100 TB x 2 snapshots diff as a digest-sized
sort-merge join, which is the same plan Delta/Iceberg-style snapshot
reconciliation jobs run.

:func:`apply_corpus_diff` closes the loop with the engine's own
incremental-ingest unit (corpus_index.IndexDelta): stale rows anti-join
out, and ONLY the added/changed documents' text is re-scanned —
appending a 1% crawl delta costs 1% of a rebuild (IndexDelta.union's
contract; global stats re-derive exactly in index_from_delta).

Content hashing uses the engine-wide ``md5_hex`` convention
(functions/hashing.py — identical in DuckDB ``md5``), so the diff is
fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beyond_vector_search_spark.config import DEFAULT, EngineConfig
from beyond_vector_search_spark.functions.hashing import md5_hex

_SEP = "\x1f"  # unit separator: cannot appear in the digest inputs' joins


def _hashed(df: DataFrame, id_col: str, content_cols: tuple[str, ...]) -> DataFrame:
    """(id, h) — md5 digest of the content columns.  Single-column
    content digests the column directly (NULL content → NULL digest —
    the diff's hash compare is null-safe).  Multi-column content
    concatenates with a 0x1f unit separator via concat_ws (NULL
    columns are SKIPPED — same rule in Spark and DuckDB, so the digest
    is cross-engine stable; all-NULL digests the empty string)."""
    if len(content_cols) == 1:
        h = md5_hex(F.col(content_cols[0]))
    else:
        h = F.md5(F.concat_ws(_SEP, *[F.col(c).cast("string") for c in content_cols]))
    return df.select(F.col(id_col).alias("id"), h.alias("h"))


def content_digests(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Public form of the digest projection: ``(id, h)`` rows in the
    engine-wide md5 convention — what an incremental store persists
    per batch so later diffs never re-read historical text."""
    return _hashed(df, id_col, content_cols)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
    include_unchanged: bool = False,
) -> DataFrame:
    """(doc_id, change, old_hash, new_hash) — the change set between two
    corpus snapshots: ``added`` (id only in new), ``removed`` (id only
    in old), ``changed`` (both, digests differ).  ``include_unchanged``
    keeps the (usually dominant) identical rows too — off by default so
    the result is change-set-sized, not corpus-sized.

    Membership comes from the join sides' presence, NOT from hash
    nullity — a document whose content columns are all NULL still
    diffs correctly: an id missing from a side is the only way to be
    added/removed, and the changed test is null-safe on both engines
    (eqNullSafe here, IS DISTINCT FROM in the oracle).  Note the
    digests themselves are NOT guaranteed non-null — the single-column
    path digests NULL content to a NULL hash (only the multi-column
    concat_ws path skips NULLs); NULL↔NULL compares as unchanged
    solely because of the null-safe compare, so don't swap it for a
    plain ``!=``.

    ``old``/``new`` must be id-unique (snapshots); duplicate ids make
    the full outer join fan out and the diff ambiguous — dedup first
    (operators/dedup.exact_dedup_map) if the input is a raw crawl.
    """
    return corpus_diff_hashed(
        _hashed(old, id_col, content_cols),
        _hashed(new, id_col, content_cols),
        id_col=id_col,
        include_unchanged=include_unchanged,
    )


def corpus_diff_hashed(
    old_hashes: DataFrame,
    new_hashes: DataFrame,
    *,
    id_col: str = "doc_id",
    include_unchanged: bool = False,
) -> DataFrame:
    """:func:`corpus_diff` over PRE-HASHED sides: two ``(id, h)``
    relations (column names ``id``/``h``, the :func:`_hashed` shape).
    This is the form incremental stores use — a persisted digest
    relation stands in for the old snapshot, so diffing a micro-batch
    against 100 TB of history reads digests, never historical text
    (streaming/ingest.upsert_delta_batch)."""
    o = old_hashes.withColumnRenamed("h", "old_hash")
    n = new_hashes.withColumnRenamed("h", "new_hash")
    j = o.withColumnRenamed("id", "o_id").join(
        n.withColumnRenamed("id", "n_id"),
        F.col("o_id") == F.col("n_id"),
        "full_outer",
    )
    change = (
        F.when(F.col("o_id").isNull(), F.lit("added"))
        .when(F.col("n_id").isNull(), F.lit("removed"))
        .when(~F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        F.coalesce(F.col("o_id"), F.col("n_id")).alias(id_col),
        change.alias("change"),
        "old_hash",
        "new_hash",
    )
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out


def apply_corpus_diff(
    delta,
    diff: DataFrame,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text="text",
    cfg: EngineConfig = DEFAULT,
):
    """Update an :class:`~beyond_vector_search_spark.operators.
    corpus_index.IndexDelta` with a :func:`corpus_diff` change set:
    removed+changed ids anti-join out of every delta relation
    (broadcast — the change set is small by construction), then ONLY
    the added/changed documents' text is scanned into a fresh delta and
    unioned in.  Returns the updated IndexDelta; global statistics
    (df/idf/avg_dl) re-derive exactly on the next
    :func:`~beyond_vector_search_spark.operators.corpus_index.
    index_from_delta`.

    This is the snapshot-ingest form of IndexDelta.replace: a 1% crawl
    delta costs one scan of 1% of the text plus digest-sized joins —
    never a rebuild.  Parity with the full rebuild is pinned by
    tests/test_versioning.py.
    """
    from beyond_vector_search_spark.operators.corpus_index import build_delta

    stale = diff.where(F.col("change").isin("removed", "changed")).select(id_col)
    fresh_ids = diff.where(F.col("change").isin("added", "changed")).select(id_col)
    # no broadcast HINT on the semi join: an incremental delta is small
    # and auto-broadcasts, but a first-ever snapshot diffs EVERYTHING
    # as 'added' — fresh_ids is then corpus-sized and a forced
    # broadcast would OOM the very bootstrap run; AQE picks correctly
    # from observed sizes in both regimes
    fresh_docs = new_docs.join(fresh_ids, id_col, "semi")
    fresh = build_delta(fresh_docs, id_col=id_col, text=text, cfg=cfg, cache=False)
    return delta.remove(stale).union(fresh)
