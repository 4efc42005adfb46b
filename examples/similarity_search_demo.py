#!/usr/bin/env python3
"""Similarity-search walkthrough: the ANN serving ladder over the
driver testdata embeddings table, from exact scan to persisted
product-quantization index.

    python3 examples/similarity_search_demo.py [sf_dir] [index_dir]

Stages (each also queryable standalone via __spark_entry__.queries()):
  1. data-quality gate on the embeddings table (validation rules)
  2. exact brute-force cosine top-k (the recall baseline)
  3. IVF probe (scan ~nprobe/K of the corpus)
  4. PQ: build + persist a PQIndex, reload, ADC + exact rerank
  5. recall@k of each approximate rung vs the exact baseline
  6. embedding near-duplicate pairs (centroid-blocked)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import similarity as sim
from beyond_vector_search_spark.operators.validation import Rule, assert_quality
from beyond_vector_search_spark.session import get_spark
from beyond_vector_search_spark.sources.readers import load_table


def recall(approx_df, exact: dict, k: int) -> float:
    got: dict = {}
    for r in approx_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return sum(
        len(exact[q] & got.get(q, set())) / k for q in exact
    ) / len(exact)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    index_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="bvs_pq_")
    spark = get_spark("bvs-similarity-demo")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. gate the table before doing anything expensive with it
    assert_quality(
        emb,
        [
            Rule("id_present", "vec_id", "not_null"),
            Rule("id_unique", "vec_id", "unique"),
        ],
    )
    k = 5
    queries = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # 2. exact baseline
    exact_df = sim.knn_bruteforce(emb, queries, k=k)
    exact: dict = {}
    for r in exact_df.collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    print(f"exact top-{k} over {emb.count()} vectors: {sum(map(len, exact.values()))} rows")

    # 3. IVF probe
    cents = emb.where("vec_id < 16").select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    ivf = sim.ivf_topk(emb, queries, cents, k=k, nprobe=4)
    print(f"ivf nprobe=4/16 recall@{k}: {recall(ivf, exact, k):.2f}")

    # 4. PQ: build once, persist, reload, serve from codes
    idx = sim.PQIndex.build(emb, m=8, dim=64, n_codes=16)
    idx.save(index_dir)
    served = sim.PQIndex.load(spark, index_dir)
    adc = served.search(queries, k=k)
    rr = served.search(queries, k=k, rerank=100, embeddings=emb)
    print(f"pq adc recall@{k}:        {recall(adc, exact, k):.2f}")
    print(f"pq adc+rerank recall@{k}: {recall(rr, exact, k):.2f}  (index at {index_dir})")

    # 5. near-duplicate pairs in the same embedding space
    pairs = sim.embedding_neardup_pairs(emb, threshold=0.99)
    print(f"near-dup pairs (cos >= 0.99): {pairs.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
