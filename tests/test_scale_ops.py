"""Scale utilities: salted join equivalence, bucketed tables, stateful
streaming sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beyond_vector_search_spark.operators.scale import (
    read_bucketed,
    salted_join,
    save_bucketed_index,
)


def test_salted_join_matches_plain_join(spark):
    # skewed large side: key 'hot' dominates
    large = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(10)],
        "k STRING, v INT",
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2), ("unseen", 3)], "k STRING, w INT")
    plain = {(r.k, r.v, r.w) for r in large.join(small, "k").collect()}
    salted = {(r.k, r.v, r.w) for r in salted_join(large, small, "k", salt=8).collect()}
    assert salted == plain
    assert len(salted) == 510


def test_salted_join_left_outer(spark):
    large = spark.createDataFrame([("a", 1), ("b", 2)], "k STRING, v INT")
    small = spark.createDataFrame([("a", 10)], "k STRING, w INT")
    out = {(r.k, r.v, r.w) for r in salted_join(large, small, "k", salt=4, how="left").collect()}
    assert out == {("a", 1, 10), ("b", 2, None)}


def test_bucketed_index_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key join without an Exchange —
    the co-located index join this engine uses for postings at scale."""
    # default warehouse dir (./spark-warehouse, gitignored) — the
    # warehouse conf is static and can't change on a live session
    postings = spark.createDataFrame(
        [(f"t{i % 50}", i, i % 7 + 1) for i in range(2000)], "term STRING, doc_id BIGINT, tf BIGINT"
    )
    stats = spark.createDataFrame(
        [(f"t{i}", float(i)) for i in range(50)], "term STRING, idf DOUBLE"
    )
    save_bucketed_index(postings, "b_postings", bucket_col="term", buckets=8, sort_col="term")
    save_bucketed_index(stats, "b_stats", bucket_col="term", buckets=8, sort_col="term")
    joined = read_bucketed(spark, "b_postings").join(read_bucketed(spark, "b_stats"), "term")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    import re

    # bucketed-bucketed SMJ: no shuffle Exchange on either join input
    assert not re.search(r"\(\d+\) Exchange", plan), plan
    assert joined.count() == 2000
    spark.sql("DROP TABLE IF EXISTS b_postings")
    spark.sql("DROP TABLE IF EXISTS b_stats")


def test_stateful_sessionize_stream(spark, tmp_path):
    """Drive applyInPandasWithState through a real micro-batch stream."""
    from beyond_vector_search_spark.streaming.stateful import sessionize_stateful

    src = tmp_path / "events_src"
    src.mkdir()
    events = spark.createDataFrame(
        [
            (1, 0),
            (1, 10_000),              # same session (10s gap)
            (1, 35 * 60 * 1000),      # new session (35min gap)
            (2, 5_000),
        ],
        "user_id BIGINT, ts_ms BIGINT",
    )
    events.write.parquet(str(src / "batch1"))
    stream = spark.readStream.schema("user_id BIGINT, ts_ms BIGINT").parquet(
        str(src / "batch1")
    )
    out = sessionize_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r.user_id: r for r in spark.sql("SELECT * FROM sess_state").collect()}
    assert rows[1].n_events == 3 and rows[1].n_sessions == 2
    assert rows[2].n_events == 1 and rows[2].n_sessions == 1
    assert not rows[1].closed
