"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — the SURVEY.md §2 operator inventory,
declared in beyond_vector_search_spark/plans/entry_queries.py as
(Spark plan, DuckDB oracle SQL) pairs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hybrid retrieval top-10
    (BM25 + char-4-gram TF-IDF cosine, min-max blended) for a batch of
    queries over the documents table — the engine's core end-to-end path:
    tokenize/shingle -> index build -> inverted-index joins -> blend ->
    deterministic top-k."""
    from beyond_vector_search_spark.plans.entry_queries import q_hybrid_topk

    return q_hybrid_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from beyond_vector_search_spark.plans.entry_queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from beyond_vector_search_spark.plans.entry_queries import all_oracles

    return all_oracles()
