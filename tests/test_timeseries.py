"""As-of and range join semantics (operators/timeseries.py)."""

from __future__ import annotations

from beyond_vector_search_spark.operators.timeseries import asof_join, range_join


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 50), (2, 100)], "k BIGINT, ts_ms BIGINT"
    )
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 150, "b"), (2, 300, "c")], "k BIGINT, ts_ms BIGINT, v STRING"
    )
    out = {(r.k, r.ts_ms): r.v for r in asof_join(left, right, on="ts_ms", by="k").collect()}
    assert out[(1, 100)] == "a"      # exact tie matches (<= semantics)
    assert out[(1, 200)] == "b"      # latest at-or-before
    assert out[(1, 50)] is None      # nothing before -> NULL
    assert out[(2, 100)] is None     # right row is later -> NULL


def test_asof_join_column_clash_suffix(spark):
    left = spark.createDataFrame([(1, 10, 99.0)], "k BIGINT, ts_ms BIGINT, v DOUBLE")
    right = spark.createDataFrame([(1, 5, 1.0)], "k BIGINT, ts_ms BIGINT, v DOUBLE")
    row = asof_join(left, right, on="ts_ms", by="k").collect()[0]
    assert row.v == 99.0 and row.v_right == 1.0


def test_range_join_bounds(spark):
    left = spark.createDataFrame([(1, 0), (1, 1000)], "k BIGINT, t BIGINT")
    right = spark.createDataFrame(
        [(1, 500), (1, 1000), (1, 5000), (1, 100000), (2, 600)], "k BIGINT, t BIGINT"
    )
    out = {
        (r.k, r.t, r.t_right)
        for r in range_join(
            left, right, by="k", left_time="t", right_time="t", lower_ms=0, upper_ms=5000
        ).collect()
    }
    # left t=0: right 500,1000,5000 in [0,5000]; left t=1000: 1000,5000
    assert out == {(1, 0, 500), (1, 0, 1000), (1, 0, 5000), (1, 1000, 1000), (1, 1000, 5000)}
