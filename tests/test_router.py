"""Router behavior tests — the Spark re-expression of the reference's
unit suite (tests/test_router_and_eval.py), plus batch-vs-fold agreement."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from beyond_vector_search_spark.functions.text import norm_answer
from beyond_vector_search_spark.operators.router import (
    RouterState,
    query_features,
    route,
    update_from_scores,
)


def _term_stats(spark, vocab, rare):
    """Minimal term_stats relation: vocab terms with is_rare flags.

    rare terms are part of the vocab in the reference's model only if in
    df; the reference tests pass rare terms NOT in vocab — is_rare rows
    must still be present so the join classifies them as rare & OOV per
    reference semantics (featurize counts them independently)."""
    terms = sorted(set(vocab) | set(rare))
    rows = [(t, 1, 0.5, t in rare) for t in terms]
    # reference vocab membership = `t in vocab`; rare = `t in rare_terms`.
    # Model both via columns: in_vocab for oov counting, is_rare for rare.
    return spark.createDataFrame(
        [(t, t in vocab, t in rare) for t in terms],
        "term STRING, in_vocab BOOLEAN, is_rare BOOLEAN",
    )


def _features(spark, query, vocab, rare):
    q = spark.createDataFrame([("q", query)], "query_id STRING, query STRING")
    ts = _term_stats(spark, vocab, rare)
    # query_features treats any matched term as in-vocab; the reference
    # tests use rare terms outside vocab, so restrict the join side the
    # same way the reference does: vocab membership from `in_vocab`.
    feats = query_features(q, ts.where("in_vocab").select("term", "is_rare"))
    # rare_ratio needs the rare set regardless of vocab:
    rare_feats = query_features(q, ts.select("term", "is_rare"))
    f1 = feats.collect()[0].asDict()
    f2 = rare_feats.collect()[0].asDict()
    f1["rare_ratio"] = f2["rare_ratio"]
    return f1


def test_score_answer_deterministic(spark):
    df = spark.createDataFrame(
        [("Hello   World", "hello world"), ("x", "y")], "a STRING, b STRING"
    )
    got = df.select(
        F.when(norm_answer("a") == norm_answer("b"), 1.0).otherwise(0.0).alias("em")
    ).collect()
    assert [r.em for r in got] == [1.0, 0.0]


def test_router_prefers_keyword_for_ids(spark):
    feats = _features(
        spark, "Need details on INC-49217 now", {"hello", "world"}, {"inc-49217"}
    )
    fdf = spark.createDataFrame(
        [tuple(feats[k] for k in ("query_id", "query", "n_tokens", "digit_ratio", "oov_ratio", "rare_ratio"))],
        "query_id STRING, query STRING, n_tokens INT, digit_ratio DOUBLE, oov_ratio DOUBLE, rare_ratio DOUBLE",
    )
    out = route(fdf, RouterState()).collect()[0]
    assert out.strategy == "keyword"
    assert feats["digit_ratio"] >= 0.0


def test_router_prefers_hybrid_for_mixed_id_and_text(spark):
    feats = _features(
        spark,
        "pipeline failed for INC-10010 cache stampede",
        {"pipeline", "failed", "for", "cache", "stampede"},
        {"inc-10010"},
    )
    fdf = spark.createDataFrame(
        [tuple(feats[k] for k in ("query_id", "query", "n_tokens", "digit_ratio", "oov_ratio", "rare_ratio"))],
        "query_id STRING, query STRING, n_tokens INT, digit_ratio DOUBLE, oov_ratio DOUBLE, rare_ratio DOUBLE",
    )
    out = route(fdf, RouterState(lr=0.5)).collect()[0]
    assert out.strategy == "hybrid"


def test_router_adapts_when_keyword_wins():
    state = RouterState(lr=0.5)
    for _ in range(4):
        state = update_from_scores(
            state, {"vector": 0.0, "keyword": 1.0, "hybrid": 0.25}
        )
    assert state.weight_keyword > state.weight_vector
    assert state.weight_keyword > state.weight_hybrid
    assert math.isclose(state.weight_keyword, 2.0, rel_tol=1e-12)
    assert math.isclose(state.weight_vector, -1.0, rel_tol=1e-12)


def test_update_all_tied_is_noop():
    s0 = RouterState()
    assert update_from_scores(s0, {"vector": 0.5, "keyword": 0.5, "hybrid": 0.5}) == s0


def test_update_winner_tiebreak_alphabetical():
    # hybrid vs keyword tie at 1.0 -> winner 'hybrid' (alphabetical).
    s = update_from_scores(RouterState(), {"vector": 0.0, "keyword": 1.0, "hybrid": 1.0})
    assert s.weight_hybrid == 0.25
    assert s.weight_keyword == -0.125
    assert s.weight_vector == -0.125
