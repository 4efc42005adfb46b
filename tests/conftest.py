from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lighter for test runs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
SF_DIR_ORACLE = "/root/testdata/sf0.01"
REF_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def spark():
    from beyond_vector_search_spark.session import get_spark

    s = get_spark("bvs-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ref_corpus(spark):
    from beyond_vector_search_spark.sources.readers import load_corpus

    return load_corpus(spark, f"{REF_DATA}/corpus.jsonl").cache()


@pytest.fixture(scope="session")
def ref_labels(spark):
    from beyond_vector_search_spark.sources.readers import load_labels

    return load_labels(spark, f"{REF_DATA}/labels.jsonl").cache()


@pytest.fixture(scope="session")
def ref_index(spark, ref_corpus):
    from pyspark.sql import functions as F

    from beyond_vector_search_spark.operators.corpus_index import build_index

    idx = build_index(ref_corpus, text=F.concat_ws(" ", "title", "text"))
    return idx.cache()
