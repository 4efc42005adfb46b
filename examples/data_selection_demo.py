#!/usr/bin/env python3
"""Data-selection walkthrough: the LEARNED curation signals chained the
way a model-targeted data-selection job runs them — score quality with
the bootstrapped NB classifier, weight by DSIR importance, rank
centrality with PageRank over the embedding kNN graph, select the
training subset, then train a BPE tokenizer on the survivors and pack
the tokenized stream into fixed-length sequences.

    python3 examples/data_selection_demo.py [sf_dir] [out_dir]

Stages (each also queryable standalone via __spark_entry__.queries()):
  1. weak label -> Naive Bayes quality log-odds (nb_quality_scores)
  2. DSIR importance weights vs a target sample (dsir_logweights)
  3. PageRank centrality over the embedding kNN graph (graph_pagerank)
  4. QUALITY-AWARE semantic dedup: near-dup clusters keep their
     best-scoring member (cluster_canonicals over dedup_clusters —
     the testdata embeddings carry no near-dups, so at sf0.001 all
     docs survive; the mechanics are what this stage demonstrates)
  5. selection: dedup survivor AND quality AND (important OR central)
  6. BPE tokenizer trained on the SELECTED corpus (bpe_train), merge
     table persisted (save_merges), pieces packed per shard
     (pack_sequences over piece counts)

Every stage is a public operator; this file is composition only.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import bpe
from beyond_vector_search_spark.operators import graph as gr
from beyond_vector_search_spark.operators import pretrain as pt
from beyond_vector_search_spark.session import get_spark
from beyond_vector_search_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="bvs_select_")
    )
    spark = get_spark("bvs-select-demo")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").cache()
    emb = load_table(spark, sf_dir, "embeddings")
    n0 = docs.count()

    # 1. learned quality: rule label -> NB classifier -> log-odds
    quality = pt.nb_quality_scores(docs, cache=True).select(
        "doc_id", "log_odds", "pred_keep"
    )
    n_keep = quality.where("pred_keep").count()
    print(f"quality: NB classifier keeps {n_keep}/{n0}")

    # 2. DSIR importance vs a deterministic target sample (stand-in for
    #    "looks like the eval domain")
    target = docs.where(F.col("doc_id") % 7 == 0)
    dsir = pt.dsir_logweights(docs, target).select("doc_id", "logw")
    med = dsir.agg(F.expr("percentile(logw, 0.5)")).collect()[0][0]
    important = dsir.where(F.col("logw") >= med).select("doc_id")
    print(f"dsir: {important.count()}/{n0} docs at/above median importance")

    # 3. centrality: PageRank over the embedding kNN graph (vec_id and
    #    doc_id share the id space in the testdata)
    pr = gr.pagerank(gr.knn_edges(emb, k=5), n_iter=5)
    top_central = pr.orderBy(F.desc("rank_units"), F.asc("id")).limit(
        int(0.3 * n0)
    ).select(F.col("id").alias("doc_id"))
    print(f"pagerank: top-30% central = {top_central.count()} docs")

    # 4. semantic dedup, QUALITY-AWARE: cluster near-duplicate
    #    embeddings and keep each cluster's best-scoring member (not
    #    the smallest id)
    from beyond_vector_search_spark.operators import dedup as dd
    from beyond_vector_search_spark.operators import similarity as sim

    nd_pairs = sim.embedding_neardup_pairs(emb, threshold=0.999)
    clusters = dd.dedup_clusters(
        emb, nd_pairs, id_col="vec_id", src="id_a", dst="id_b"
    )
    best = dd.cluster_canonicals(
        clusters, quality.select("doc_id", F.col("log_odds").alias("score"))
    )
    survivors = best.where("is_canonical").select("doc_id")
    print(f"semantic dedup (keep-best): {survivors.count()}/{n0} docs survive")

    # 5. selection: dedup survivor AND quality gate AND (important OR
    #    central)
    chosen = (
        quality.where("pred_keep")
        .join(survivors, "doc_id", "semi")
        .join(important.unionByName(top_central).distinct(), "doc_id", "semi")
        .select("doc_id")
    )
    selected = docs.join(chosen, "doc_id")
    n_sel = selected.count()
    print(f"selected: {n_sel}/{n0} docs")

    # 6. tokenizer on the SELECTED corpus + packed piece stream: the
    #    packing counts are the REAL tokenizer's piece counts, not the
    #    whitespace proxy (pack_sequences counts=)
    merges = bpe.bpe_train(bpe.word_freqs(selected), n_merges=16)
    merges_path = os.path.join(out_dir, "merges.parquet")
    bpe.save_merges(spark, merges, merges_path)
    pieces = bpe.piece_stats(selected, merges)
    n_pieces = pieces.agg(F.sum("n_occurrences")).collect()[0][0]
    piece_counts = bpe.bpe_segment(selected, merges).select(
        "doc_id", F.size("pieces").alias("n_tokens")
    )
    seqs = pt.pack_sequences(selected, seq_len=256, counts=piece_counts)
    n_seq = seqs.select("shard", "seq_id").distinct().count()
    print(
        f"tokenizer: 16 merges -> {merges_path}; {n_pieces} pieces packed "
        f"into {n_seq} sequences of <=256"
    )


if __name__ == "__main__":
    main()
