"""Python-kernel surface (functions/udfs.py)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from beyond_vector_search_spark.functions.udfs import gini, sigmoid, top_terms_udtf, zscore_by_group


def test_scalar_pandas_udf(spark):
    df = spark.range(5).select((F.col("id") - 2.0).alias("x"))
    out = {r.x: r.s for r in df.select("x", sigmoid(F.col("x")).alias("s")).collect()}
    for x, s in out.items():
        assert math.isclose(s, 1.0 / (1.0 + math.exp(-x)), rel_tol=1e-12)


def test_gini_udaf(spark):
    df = spark.createDataFrame(
        [("equal", 1.0), ("equal", 1.0), ("equal", 1.0),
         ("skew", 0.0), ("skew", 0.0), ("skew", 10.0)],
        "g STRING, v DOUBLE",
    )
    out = {r.g: r.gini for r in df.groupBy("g").agg(gini(F.col("v")).alias("gini")).collect()}
    assert math.isclose(out["equal"], 0.0, abs_tol=1e-12)
    assert math.isclose(out["skew"], 2 / 3, rel_tol=1e-9)


def test_zscore_grouped_map(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 4, 5.0)],
        "g STRING, doc_id BIGINT, v DOUBLE",
    )
    out = {r.doc_id: r.zscore for r in zscore_by_group(df, group_col="g", value_col="v").collect()}
    assert math.isclose(out[2], 0.0, abs_tol=1e-12)
    assert math.isclose(out[1], -1.0, rel_tol=1e-9)     # (10-20)/10
    assert out[4] == 0.0                                 # singleton group


def test_top_terms_udtf(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "")], "doc_id BIGINT, text STRING"
    )
    rows = top_terms_udtf(df, n=2).collect()
    got = [(r.doc_id, r.term, r.tf, r.rank) for r in sorted(rows, key=lambda r: (r.doc_id, r.rank))]
    assert got == [(1, "b", 3, 1), (1, "a", 2, 2)]       # empty doc emits nothing
