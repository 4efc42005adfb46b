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


def test_hll_sketch_error_bound(spark):
    # approx_count_distinct(rsd=0.02): estimates must land within a
    # conservative 5x-rsd band of the exact counts (the sketch itself is
    # engine-internal, so the catalog's approx_distinct_hll entry is
    # rows-only — this bound is its standing correctness evidence).
    n = 5000
    df = spark.range(n).select(
        (F.col("id") % 997).alias("k997"), (F.col("id") % 3000).alias("k3000")
    )
    row = df.agg(
        F.approx_count_distinct("k997", 0.02).alias("a997"),
        F.approx_count_distinct("k3000", 0.02).alias("a3000"),
    ).collect()[0]
    assert abs(row.a997 - 997) / 997 < 0.10
    assert abs(row.a3000 - 3000) / 3000 < 0.10
