#!/usr/bin/env python3
"""RAG serving-pipeline walkthrough: the retrieval-stack operators
chained the way a retrieval-augmented-generation service runs them —
chunk the corpus, index the CHUNKS, retrieve with both arms, fuse with
RRF, expand with pseudo-relevance feedback, diversify with MMR, then
pack the context window.

    python3 examples/rag_pipeline_demo.py [sf_dir]

Every stage is a public operator; this file is composition only.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from beyond_vector_search_spark.config import EngineConfig
from beyond_vector_search_spark.operators import fusion as fu
from beyond_vector_search_spark.operators import pretrain as pt
from beyond_vector_search_spark.operators.answer import generate_answers
from beyond_vector_search_spark.operators.corpus_index import build_index
from beyond_vector_search_spark.operators.retrieval import (
    bm25_scores,
    stable_topk,
    vector_scores,
)
from beyond_vector_search_spark.session import get_spark
from beyond_vector_search_spark.sources.readers import load_table

CFG = EngineConfig(include_zero_score_docs=False)  # the serving profile


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("bvs-rag-demo")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # 1. chunk: overlapping token windows — the retrieval unit of a RAG
    #    store is the chunk, not the document
    chunks = pt.chunk_documents(docs, size=64, overlap=16).select(
        # chunk key folded into one id so the index sees plain docs
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    print(f"chunks: {chunks.count()} from {docs.count()} documents")

    # 2. index the chunks (one build, serve many queries)
    idx = build_index(chunks).cache()

    queries = spark.createDataFrame(
        [("q1", "spark join performance"), ("q2", "vector hash index scan")],
        "query_id string, query string",
    )

    # 3. both retrieval arms over the chunk index
    key = bm25_scores(queries, idx, cfg=CFG).cache()
    vec = vector_scores(queries, idx, cfg=CFG)

    # 4. rank fusion (RRF — no score normalization needed)
    fused = fu.rrf_scores({"keyword": key, "vector": vec})

    # 5. pseudo-relevance feedback on the keyword arm (optional second
    #    pass; shown here against the fused candidates' recall)
    prf = fu.prf_bm25_scores(queries, idx, key, cfg=CFG)
    print("prf candidates:", prf.count(), "vs base:", key.count())

    # 6. MMR-diversify the fused top-12 down to 5 per query
    cand = stable_topk(fused, 12).select("query_id", "doc_id", "score")
    diverse = fu.mmr_rerank(cand, idx, k=5, lam=0.7)

    # 7. answer + greedy 900-char context pack over the selected chunks
    top_k = diverse.select("query_id", "doc_id", F.col("mmr_rank").alias("rank"))
    ans = generate_answers(top_k, chunks, queries, title_col=None)
    for row in ans.orderBy("query_id").collect():
        print(f"--- {row['query_id']}: {len(row['top_doc_ids'])} chunks, "
              f"context {len(row['context'])} chars")
        print(row["context"][:300])


if __name__ == "__main__":
    main()
