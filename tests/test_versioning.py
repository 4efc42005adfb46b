"""Corpus snapshot diff + incremental delta update (operators/versioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from beyond_vector_search_spark.operators.versioning import (
    apply_corpus_diff,
    corpus_diff,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_diff_hand_computed(spark):
    old = _corpus(
        spark,
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, None), (5, "eps")],
    )
    new = _corpus(
        spark,
        [(1, "alpha"), (2, "BETA v2"), (4, None), (5, None), (6, "new doc")],
    )
    got = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert set(got) == {2, 3, 5, 6}
    assert got[2]["change"] == "changed"
    assert got[3]["change"] == "removed" and got[3]["new_hash"] is None
    # NULL -> non-NULL content and NULL -> NULL must classify null-safely
    assert got[5]["change"] == "changed" and got[5]["old_hash"] is not None
    assert got[6]["change"] == "added" and got[6]["old_hash"] is None
    # doc 1 (identical) and doc 4 (NULL == NULL) are unchanged
    full = {
        r["doc_id"]: r["change"]
        for r in corpus_diff(old, new, include_unchanged=True).collect()
    }
    assert full[1] == "unchanged" and full[4] == "unchanged"
    assert len(full) == 6


def test_corpus_diff_multi_column_content(spark):
    old = spark.createDataFrame(
        [(1, "t", "a"), (2, "t", None)], "doc_id long, title string, text string"
    )
    new = spark.createDataFrame(
        # doc 1: text moved into title — 0x1f separator keeps ("ta", "")
        # distinct from ("t", "a"); doc 2: NULL column skipped by
        # concat_ws, so ("t", NULL) == ("t",) is the documented rule
        [(1, "ta", ""), (2, "t", None)], "doc_id long, title string, text string"
    )
    got = {
        r["doc_id"]: r["change"]
        for r in corpus_diff(
            old, new, content_cols=("title", "text"), include_unchanged=True
        ).collect()
    }
    assert got[1] == "changed"
    assert got[2] == "unchanged"


def test_corpus_diff_plan_has_no_cartesian(spark):
    import contextlib
    import io

    old = _corpus(spark, [(i, f"d{i}") for i in range(50)])
    new = _corpus(spark, [(i, f"d{i}x" if i % 5 == 0 else f"d{i}") for i in range(40)])
    out = corpus_diff(old, new)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # the text never reaches the join: only ids and digests do
    assert plan.count("md5") >= 2


def test_apply_corpus_diff_matches_full_rebuild(spark):
    """Incremental snapshot update == full rebuild of the new snapshot:
    postings and derived term stats must be row-identical after
    apply_corpus_diff (the IndexDelta.remove/union contract driven by
    the diff's change classes)."""
    from beyond_vector_search_spark.operators.corpus_index import (
        build_delta,
        index_from_delta,
    )

    old_rows = [(i, f"common w{i % 3} old{i}") for i in range(1, 21)]
    new_rows = (
        [(i, f"common w{i % 3} old{i}") for i in range(1, 15)]       # kept
        + [(i, f"common w{i % 3} EDITED{i}") for i in range(15, 21)]  # changed
        + [(i, f"common w{i % 3} fresh{i}") for i in range(30, 36)]   # added
    )
    old = _corpus(spark, old_rows)
    new = _corpus(spark, new_rows)

    diff = corpus_diff(old, new)
    classes = {r["change"] for r in diff.collect()}
    assert classes == {"changed", "added"} or classes == {"changed", "added", "removed"}

    inc = apply_corpus_diff(build_delta(old, text="text"), diff, new, text="text")
    full = build_delta(new, text="text")

    def rows(df, cols):
        return sorted(map(tuple, df.select(*cols).collect()))

    assert rows(inc.postings, ["term", "doc_id", "tf", "dl"]) == rows(
        full.postings, ["term", "doc_id", "tf", "dl"]
    )
    assert rows(inc.doc_ids, ["doc_id"]) == rows(full.doc_ids, ["doc_id"])
    # derived global stats agree too (idf re-derives from the union)
    ts_inc = rows(index_from_delta(inc).term_stats, ["term", "df"])
    ts_full = rows(index_from_delta(full).term_stats, ["term", "df"])
    assert ts_inc == ts_full


def test_apply_corpus_diff_with_removals(spark):
    from beyond_vector_search_spark.operators.corpus_index import build_delta

    old = _corpus(spark, [(1, "a b"), (2, "b c"), (3, "c d")])
    new = _corpus(spark, [(1, "a b"), (3, "c D edited")])
    diff = corpus_diff(old, new)
    inc = apply_corpus_diff(build_delta(old, text="text"), diff, new, text="text")
    full = build_delta(new, text="text")
    assert sorted(map(tuple, inc.postings.collect())) == sorted(
        map(tuple, full.postings.collect())
    )


def test_cli_diff_reports_and_updates_delta(spark, tmp_path):
    """bvs diff: change-set counts from two snapshot parquets, and
    --update-delta applies it to a persisted IndexDelta store in place
    (reload == full rebuild of the new snapshot)."""
    import argparse

    from beyond_vector_search_spark.cli import cmd_diff
    from beyond_vector_search_spark.operators.corpus_index import (
        IndexDelta,
        build_delta,
    )

    old = _corpus(spark, [(1, "a b"), (2, "b c"), (3, "c d")])
    new = _corpus(spark, [(1, "a b"), (3, "c D edited"), (9, "fresh doc")])
    p_old, p_new = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(p_old)
    new.write.parquet(p_new)
    store = str(tmp_path / "delta")
    build_delta(old, text="text").save(store)

    args = argparse.Namespace(
        old=p_old, new=p_new, id_col="doc_id", text_col="text",
        out=str(tmp_path / "chg"), update_delta=store,
    )
    out = cmd_diff(args)
    assert (out["added"], out["removed"], out["changed"]) == (1, 1, 1)

    updated = IndexDelta.load(spark, store)
    full = build_delta(new, text="text")
    assert sorted(map(tuple, updated.postings.collect())) == sorted(
        map(tuple, full.postings.collect())
    )


def test_streaming_upsert_replaces_changed_docs(spark, tmp_path):
    """r12 (VERDICT r11 ask #6): the foreachBatch UPSERT path — a
    re-delivered CHANGED document must REPLACE its index rows (not
    duplicate them), an identical re-delivery must write nothing, and
    the LWW-loaded store must match both the batch apply_corpus_diff
    path and a from-scratch rebuild of the final corpus."""
    from beyond_vector_search_spark.operators.corpus_index import (
        build_delta,
        index_from_delta,
    )
    from beyond_vector_search_spark.streaming.ingest import (
        load_upsert_delta,
        start_upsert_ingest,
    )

    schema = "doc_id BIGINT, text STRING"
    b0 = [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "zeta eta")]
    # epoch 1: doc 2 re-delivered UNCHANGED, doc 3 CHANGED, doc 4 added
    b1 = [(2, "delta epsilon"), (3, "zeta eta theta iota"), (4, "kappa")]
    final = [(1, "alpha beta gamma"), (2, "delta epsilon"),
             (3, "zeta eta theta iota"), (4, "kappa")]

    src = tmp_path / "upsert_src"
    src.mkdir()
    spark.createDataFrame(b0, schema).coalesce(1).write.parquet(str(src / "f0"))
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    store = str(tmp_path / "upsert_store")
    q = start_upsert_ingest(stream, store, trigger={"availableNow": True})
    q.awaitTermination(300)

    got = index_from_delta(load_upsert_delta(spark, store))
    want = index_from_delta(build_delta(spark.createDataFrame(final, schema)))
    # replace-not-duplicate: each doc exactly once, doc 3 at NEW content
    assert got.doc_ids.count() == 4
    for field in ("postings", "term_stats", "gram_stats", "doc_stats"):
        inc, full = getattr(got, field), getattr(want, field)
        assert inc.exceptAll(full).count() == 0, field
        assert full.exceptAll(inc).count() == 0, field

    # unchanged re-delivery wrote NOTHING in epoch 1 (doc 2 skipped,
    # docs 3+4 landed) — read epoch 1's own doc_ids partition
    from beyond_vector_search_spark.operators.corpus_index import IndexDelta

    root = IndexDelta._root(spark, store)
    landed = {
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/doc_ids/batch_id=2").collect()
    }
    assert landed == {3, 4}

    # parity with the BATCH reconciliation path (apply_corpus_diff):
    # same change feed applied as one snapshot diff over the b0 delta
    old_docs = spark.createDataFrame(b0, schema)
    new_docs = spark.createDataFrame(final, schema)
    applied = index_from_delta(
        apply_corpus_diff(
            build_delta(old_docs), corpus_diff(old_docs, new_docs), new_docs
        )
    )
    for field in ("postings", "term_stats"):
        a, b = getattr(applied, field), getattr(got, field)
        assert a.exceptAll(b).count() == 0, field
        assert b.exceptAll(a).count() == 0, field


def test_upsert_batch_retry_is_idempotent(spark, tmp_path):
    """A replayed upsert epoch (at-least-once foreachBatch) must
    recompute the same change set and overwrite the same directories —
    never duplicate rows, even when the crash happened AFTER the digest
    partition was written."""
    from beyond_vector_search_spark.operators.corpus_index import (
        index_from_delta,
    )
    from beyond_vector_search_spark.sources import fsutil
    from beyond_vector_search_spark.streaming.ingest import (
        _batch_marker,
        load_upsert_delta,
        upsert_delta_batch,
    )

    schema = "doc_id BIGINT, text STRING"
    store = str(tmp_path / "retry_store")
    assert upsert_delta_batch(
        spark.createDataFrame([(1, "alpha"), (2, "beta")], schema), 0, store
    )
    batch1 = spark.createDataFrame([(2, "beta v2"), (3, "new")], schema)
    assert upsert_delta_batch(batch1, 1, store)
    before = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in load_upsert_delta(spark, store).postings.collect()
    )
    # simulate the crash-retry: marker gone, digest partition present
    fsutil.delete(spark, _batch_marker(store, 1))
    assert upsert_delta_batch(batch1, 1, store)
    after = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in load_upsert_delta(spark, store).postings.collect()
    )
    assert after == before
    # fast-skip on an intact marker
    assert not upsert_delta_batch(batch1, 1, store)


def test_compact_upsert_store_preserves_digests_and_lww(spark, tmp_path):
    """compact_upsert_store folds the LWW state (superseded versions
    drop at the rewrite) and PRESERVES digest history: a post-compact
    unchanged re-delivery still writes nothing, and a changed one
    still replaces."""
    from beyond_vector_search_spark.operators.corpus_index import (
        IndexDelta,
        index_from_delta,
    )
    from beyond_vector_search_spark.streaming.ingest import (
        compact_upsert_store,
        load_upsert_delta,
        upsert_delta_batch,
    )

    schema = "doc_id BIGINT, text STRING"
    store = str(tmp_path / "cmp_store")
    upsert_delta_batch(
        spark.createDataFrame([(1, "alpha"), (2, "beta")], schema), 0, store
    )
    upsert_delta_batch(
        spark.createDataFrame([(2, "beta v2"), (3, "new")], schema), 1, store
    )
    before = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in load_upsert_delta(spark, store).postings.collect()
    )
    compacted = compact_upsert_store(spark, store)
    after = sorted(
        (r["term"], r["doc_id"], r["tf"]) for r in compacted.postings.collect()
    )
    assert after == before
    # superseded rows physically dropped: doc 2 appears once, at v2
    root = IndexDelta._root(spark, store)
    raw = spark.read.parquet(f"{root}/postings")
    assert raw.where("doc_id = 2 AND term = 'beta'").count() == 1

    # post-compact epoch: doc 3 unchanged (digest survived the fold ->
    # skip), doc 1 changed -> replaces
    upsert_delta_batch(
        spark.createDataFrame([(3, "new"), (1, "alpha v2")], schema), 2, store
    )
    landed = {
        r["doc_id"]
        for r in spark.read.parquet(f"{root}/doc_ids/batch_id=3").collect()
    }
    assert landed == {1}
    got = index_from_delta(load_upsert_delta(spark, store))
    terms = {
        (r["term"], r["doc_id"]) for r in got.postings.collect()
    }
    assert ("v2", 1) in terms and ("alpha", 1) in terms
    assert got.doc_ids.count() == 3


def test_cli_ingest_upsert_mode(spark, tmp_path):
    """bvs ingest --mode upsert: drains a parquet directory one file
    per micro-batch into an upsert store; a changed doc in a later
    file replaces its rows."""
    import argparse

    from beyond_vector_search_spark.cli import cmd_ingest
    from beyond_vector_search_spark.operators.corpus_index import (
        build_delta,
        index_from_delta,
    )
    from beyond_vector_search_spark.streaming.ingest import load_upsert_delta

    src = tmp_path / "cli_src"
    src.mkdir()
    _corpus(spark, [(1, "a b"), (2, "b c")]).coalesce(1).write.parquet(
        str(src / "f0")
    )
    _corpus(spark, [(2, "b c EDITED"), (3, "d")]).coalesce(1).write.parquet(
        str(src / "f1")
    )
    store = str(tmp_path / "cli_store")
    out = cmd_ingest(
        argparse.Namespace(
            src=str(src / "*"), store=store, mode="upsert",
            id_col="doc_id", text_col="text",
        )
    )
    assert out["n_docs"] == 3
    got = index_from_delta(load_upsert_delta(spark, store))
    want = index_from_delta(
        build_delta(_corpus(spark, [(1, "a b"), (2, "b c EDITED"), (3, "d")]))
    )
    assert sorted(map(tuple, got.postings.collect())) == sorted(
        map(tuple, want.postings.collect())
    )


def test_upsert_null_text_edges(spark, tmp_path):
    """NULL-content edges through the upsert path: NULL<->NULL
    re-delivery skips (null-safe digest compare), NULL->text and
    text->NULL both classify as changed and land."""
    from beyond_vector_search_spark.operators.corpus_index import (
        IndexDelta,
        index_from_delta,
    )
    from beyond_vector_search_spark.streaming.ingest import (
        load_upsert_delta,
        upsert_delta_batch,
    )

    schema = "doc_id BIGINT, text STRING"
    store = str(tmp_path / "null_store")
    upsert_delta_batch(
        spark.createDataFrame([(1, None), (2, ""), (3, "hello world")], schema),
        0, store,
    )
    upsert_delta_batch(
        spark.createDataFrame([(1, None), (2, "now text"), (3, None)], schema),
        1, store,
    )
    root = IndexDelta._root(spark, store)
    landed = sorted(
        r.doc_id for r in spark.read.parquet(f"{root}/doc_ids/batch_id=2").collect()
    )
    assert landed == [2, 3]
    idx = index_from_delta(load_upsert_delta(spark, store))
    assert sorted(r.doc_id for r in idx.doc_ids.collect()) == [1, 2, 3]
    assert sorted((r.term, r.doc_id) for r in idx.postings.collect()) == [
        ("now", 2), ("text", 2),
    ]


def test_upsert_store_history_report(spark, tmp_path):
    """Per-epoch ingest report from the digest history: added vs
    changed per batch."""
    from beyond_vector_search_spark.streaming.ingest import (
        upsert_delta_batch,
        upsert_store_history,
    )

    schema = "doc_id BIGINT, text STRING"
    store = str(tmp_path / "hist_store")
    upsert_delta_batch(
        spark.createDataFrame([(1, "a"), (2, "b")], schema), 0, store
    )
    upsert_delta_batch(
        spark.createDataFrame([(2, "b v2"), (3, "c")], schema), 1, store
    )
    hist = {
        r["batch_id"]: (r["n_landed"], r["n_added"], r["n_changed"])
        for r in upsert_store_history(spark, store).collect()
    }
    assert hist == {1: (2, 2, 0), 2: (2, 1, 1)}


def test_upsert_history_reports_all_unchanged_epochs(spark, tmp_path):
    """An epoch whose documents all skipped (unchanged re-deliveries)
    writes a zero-row digest partition; the report must still show it,
    as n_landed=0 — the aggregation alone would drop it."""
    from beyond_vector_search_spark.streaming.ingest import (
        upsert_delta_batch,
        upsert_store_history,
    )

    schema = "doc_id BIGINT, text STRING"
    store = str(tmp_path / "hist0_store")
    upsert_delta_batch(
        spark.createDataFrame([(1, "a"), (2, "b")], schema), 0, store
    )
    # identical re-delivery: nothing lands, the epoch still ran
    upsert_delta_batch(
        spark.createDataFrame([(1, "a"), (2, "b")], schema), 1, store
    )
    hist = {
        r["batch_id"]: (r["n_landed"], r["n_added"], r["n_changed"])
        for r in upsert_store_history(spark, store).collect()
    }
    assert hist == {1: (2, 2, 0), 2: (0, 0, 0)}


def test_upsert_auto_compact_bounds_digest_history(spark, tmp_path):
    """auto_compact_epochs folds the digest history back to ONE
    partition once the threshold is reached, without changing the
    LWW view — the bound that keeps per-epoch diff cost flat under a
    long-running stream."""
    import os

    from beyond_vector_search_spark.operators.corpus_index import (
        IndexDelta,
        build_delta,
        index_from_delta,
    )
    from beyond_vector_search_spark.streaming.ingest import (
        load_upsert_delta,
        upsert_delta_batch,
    )

    schema = "doc_id BIGINT, text STRING"
    store = str(tmp_path / "ac_store")

    def n_digest_parts():
        root = IndexDelta._root(spark, store)
        return sum(
            1
            for d in os.listdir(f"{root}/digests")
            if d.startswith("batch_id=")
        )

    # epochs 0..3 at threshold 3: epochs 0-1 accumulate, epoch 2's land
    # crosses the threshold and folds, epoch 3 lands on the fold
    docs = {
        0: [(1, "alpha"), (2, "beta")],
        1: [(2, "beta v2"), (3, "gamma")],
        2: [(4, "delta")],
        3: [(1, "alpha v2"), (5, "epsilon")],
    }
    for e, rows in docs.items():
        upsert_delta_batch(
            spark.createDataFrame(rows, schema), e, store,
            auto_compact_epochs=3,
        )
        if e == 1:
            assert n_digest_parts() == 2  # below threshold: no fold
        if e == 2:
            assert n_digest_parts() == 1  # folded at the threshold
    assert n_digest_parts() == 2  # fold + epoch 3's fresh partition

    final = [(1, "alpha v2"), (2, "beta v2"), (3, "gamma"),
             (4, "delta"), (5, "epsilon")]
    got = index_from_delta(load_upsert_delta(spark, store))
    want = index_from_delta(build_delta(spark.createDataFrame(final, schema)))
    for field in ("postings", "term_stats", "doc_stats"):
        a, b = getattr(got, field), getattr(want, field)
        assert a.exceptAll(b).count() == 0, field
        assert b.exceptAll(a).count() == 0, field

    # a post-fold unchanged re-delivery still skips (digests kept):
    # its zero-row epoch partition crosses the threshold again, folds,
    # and the LWW view is unchanged — doc 4 landed exactly once ever
    assert upsert_delta_batch(
        spark.createDataFrame([(4, "delta")], schema), 4, store,
        auto_compact_epochs=3,
    )
    assert n_digest_parts() == 1  # folded again
    after = index_from_delta(load_upsert_delta(spark, store))
    assert after.doc_ids.count() == 5
    assert after.postings.exceptAll(want.postings).count() == 0
    assert want.postings.exceptAll(after.postings).count() == 0
    # the fold is digest-sized, not a store rewrite: the index
    # relations keep their per-epoch directories (scheduled
    # maintenance folds those), and no delta-v version was cut
    root = IndexDelta._root(spark, store)
    assert root == store
    assert len(
        [d for d in os.listdir(f"{root}/doc_ids") if d.startswith("batch_id=")]
    ) > 1

    # crash safety: a digest partition whose epoch never committed its
    # marker must SURVIVE the fold (the retry's self-exclusion needs it)
    from beyond_vector_search_spark.streaming.ingest import (
        compact_upsert_digests,
    )

    spark.createDataFrame([(99, "zz", 77)], "id BIGINT, h STRING, x INT").select(
        "id", "h"
    ).write.parquet(f"{root}/digests/batch_id=77")
    # two more committed epochs so there is something to fold
    upsert_delta_batch(
        spark.createDataFrame([(6, "zeta")], schema), 5, store
    )
    folded = compact_upsert_digests(spark, store)
    assert folded >= 2
    parts = {
        d for d in os.listdir(f"{root}/digests") if d.startswith("batch_id=")
    }
    assert "batch_id=77" in parts, "uncommitted epoch partition must survive"
    assert parts == {"batch_id=0", "batch_id=77"}
