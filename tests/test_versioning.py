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
