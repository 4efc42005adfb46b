"""EngineConfig scale knobs: gram df pruning, zero-score flag."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from beyond_vector_search_spark.config import DEFAULT
from beyond_vector_search_spark.operators.corpus_index import build_index
from beyond_vector_search_spark.operators.retrieval import bm25_scores


def test_max_gram_df_ratio_prunes_hot_grams(spark):
    rows = [(i, "the same common prefix " + ("unique%d" % i)) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    full = build_index(docs)
    pruned = build_index(docs, cfg=replace(DEFAULT, max_gram_df_ratio=0.5))
    n_full = full.gram_stats.count()
    n_pruned = pruned.gram_stats.count()
    assert n_pruned < n_full
    # every surviving gram appears in <= 50% of docs
    assert pruned.gram_stats.where("df > 5").count() == 0
    # doc_vec shrinks with it (inner join to pruned gram_stats)
    assert pruned.doc_vec.count() < full.doc_vec.count()


def test_include_zero_score_docs_flag(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")],
        "doc_id BIGINT, text STRING",
    )
    idx = build_index(docs)
    q = spark.createDataFrame([("q", "alpha")], "query_id STRING, query STRING")
    parity = bm25_scores(q, idx, cfg=DEFAULT)
    assert parity.count() == 3                       # all docs, zeros restored
    scale = bm25_scores(q, idx, cfg=replace(DEFAULT, include_zero_score_docs=False))
    assert scale.count() == 1                        # only matching docs
    assert scale.collect()[0].doc_id == 1
