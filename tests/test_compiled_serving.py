"""Compiled serving path (retrieval.compile_query_batch +
compiled_bm25_scores / compiled_vector_scores) parity against the
join-form scorers: same formulas, same OOV drop, same profiles — the
compiled path is a physical-plan change only.

Covers both id regimes: bigint doc_ids (driver testdata) and string
doc_ids (the reference corpus)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from beyond_vector_search_spark.config import EngineConfig
from beyond_vector_search_spark.operators import retrieval as rt
from beyond_vector_search_spark.operators.corpus_index import build_index
from beyond_vector_search_spark.sources.readers import load_table
from tests.conftest import SF_DIR

QUERIES = [
    ("q1", "spark join performance"),
    ("q2", "vector hash index scan"),
    ("q3", "slow query filter value 42"),
]

MATCHED = EngineConfig(include_zero_score_docs=False)
TOL = 1e-9


@pytest.fixture(scope="module")
def docs_index(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return build_index(docs, text="text").cache()


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(QUERIES, "query_id STRING, query STRING")


def _as_dict(df):
    return {(r["query_id"], r["doc_id"]): r["score"] for r in df.collect()}


def _assert_close(got: dict, want: dict):
    assert set(got) == set(want)
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=TOL, abs_tol=1e-12), (k, got[k], v)


def test_compiled_bm25_matches_join_form(spark, docs_index, qdf):
    compiled = rt.compile_query_batch(QUERIES, docs_index, cfg=MATCHED)
    got = _as_dict(rt.compiled_bm25_scores(docs_index, compiled, cfg=MATCHED))
    want = _as_dict(rt.bm25_scores(qdf, docs_index, cfg=MATCHED))
    _assert_close(got, want)


def test_compiled_vector_matches_join_form(spark, docs_index, qdf):
    compiled = rt.compile_query_batch(QUERIES, docs_index, cfg=MATCHED)
    got = _as_dict(rt.compiled_vector_scores(docs_index, compiled, cfg=MATCHED))
    want = _as_dict(rt.vector_scores(qdf, docs_index, cfg=MATCHED))
    _assert_close(got, want)


def test_compiled_accepts_dataframe_and_list(spark, docs_index, qdf):
    a = rt.compile_query_batch(QUERIES, docs_index, cfg=MATCHED)
    b = rt.compile_query_batch(qdf, docs_index, cfg=MATCHED)
    assert a == b


def test_compiled_zero_restore_profile(spark, docs_index, qdf):
    cfg = EngineConfig()  # include_zero_score_docs=True (reference parity)
    compiled = rt.compile_query_batch(QUERIES, docs_index, cfg=cfg)
    got = _as_dict(rt.compiled_bm25_scores(docs_index, compiled, queries=qdf, cfg=cfg))
    want = _as_dict(rt.bm25_scores(qdf, docs_index, cfg=cfg))
    _assert_close(got, want)
    n_docs, _ = docs_index.scalar_values()
    assert len(got) == len(QUERIES) * n_docs  # zero-score universe restored
    with pytest.raises(ValueError, match="zero-restore"):
        rt.compiled_bm25_scores(docs_index, compiled, cfg=cfg)


def test_compiled_all_oov_query_is_empty(spark, docs_index):
    compiled = rt.compile_query_batch(
        [("q1", "zzzzqqqqxxxx wwwwvvvv")], docs_index, cfg=MATCHED
    )
    assert compiled.term_weights == {}
    assert rt.compiled_bm25_scores(docs_index, compiled, cfg=MATCHED).count() == 0


def test_compiled_on_string_doc_ids(spark, ref_index):
    """The reference corpus uses string doc_ids — both arms must work
    and match the join form there too."""
    queries = [("q1", "incident INC-49217"), ("q2", "database index")]
    qdf = spark.createDataFrame(queries, "query_id STRING, query STRING")
    compiled = rt.compile_query_batch(queries, ref_index, cfg=MATCHED)
    _assert_close(
        _as_dict(rt.compiled_bm25_scores(ref_index, compiled, cfg=MATCHED)),
        _as_dict(rt.bm25_scores(qdf, ref_index, cfg=MATCHED)),
    )
    _assert_close(
        _as_dict(rt.compiled_vector_scores(ref_index, compiled, cfg=MATCHED)),
        _as_dict(rt.vector_scores(qdf, ref_index, cfg=MATCHED)),
    )


def test_minmax_window_form_matches_agg_form(spark, docs_index, qdf):
    scored = rt.bm25_scores(qdf, docs_index, cfg=MATCHED)
    via_agg = {
        (r["query_id"], r["doc_id"]): r["norm_score"]
        for r in rt.minmax_normalize(scored).collect()
    }
    via_win = {
        (r["query_id"], r["doc_id"]): r["norm_score"]
        for r in rt.minmax_normalize(scored, via="window").collect()
    }
    assert set(via_agg) == set(via_win)
    for k, v in via_agg.items():
        assert math.isclose(via_win[k], v, rel_tol=TOL, abs_tol=1e-12)
