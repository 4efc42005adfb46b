#!/usr/bin/env python3
"""Ingest-lifecycle walkthrough: how a LIVE corpus keeps its dedup
state and its ANN index current as batches arrive — without ever
rebuilding or rescanning what is already ingested.

    python3 examples/ingest_lifecycle_demo.py [sf_dir] [store_dir]

Stages:
  1. initial state: MinHash band-key store (dedup) + IVFPQ vector
     store (ANN serving), both built from the base corpus and PERSISTED
  2. a new document batch arrives: incremental near-dup check against
     the band store (lsh_pairs_against_corpus — the corpus never
     self-joins), survivors' band keys append to the store
  3. the batch's embeddings append to the IVFPQ store
     (frozen quantizer + codebooks, only new bucket files written)
  4. serve: a query finds a vector that ONLY exists in the new batch;
     time travel (up_to_batch=0) shows the pre-ingest index
  5. maintenance: `IVFPQIndex.compact` folds the append directories
     (what `bvs maintain --ivfpq-dir` runs); results unchanged
  6. the GRAPH ANN store walks the same lifecycle: KnnGraphIndex
     build+save, blast-radius append of the batch (LWW node lists),
     beam-search serving that finds a batch-only vector, and
     `compact` (what `bvs maintain --graph-dir` runs)
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import dedup as dd
from beyond_vector_search_spark.operators import similarity as sim
from beyond_vector_search_spark.session import get_spark
from beyond_vector_search_spark.sources import fsutil
from beyond_vector_search_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    store = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="bvs_life_")
    spark = get_spark("bvs-ingest-lifecycle")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    base_docs = docs.where("doc_id % 2 = 0").select("doc_id", "text")
    base_emb = emb.where("vec_id % 2 = 0")

    # -- 1. persist the base state ------------------------------------
    bands_dir = f"{store}/band_keys"
    dd.banded_keys(dd.minhash_signatures(base_docs)).write.mode(
        "overwrite"
    ).parquet(bands_dir)
    centroids = sim.train_ivf_centroids(base_emb, n_centroids=8)
    ivfpq_dir = f"{store}/ivfpq"
    sim.IVFPQIndex.build(base_emb, centroids, m=8, dim=64).save(ivfpq_dir)
    print(f"base state persisted under {store}")

    # -- 2. new batch: incremental near-dup against the stored bands --
    new_docs = docs.where("doc_id % 2 = 1").select("doc_id", "text").limit(500)
    # plant one near-duplicate so the check has something to catch
    dup = base_docs.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    batch = new_docs.unionByName(dup)
    pairs = dd.lsh_pairs_against_corpus(
        dd.minhash_signatures(batch),
        corpus_bands=spark.read.parquet(bands_dir),
    )
    dup_ids = {r.doc_b for r in pairs.collect()} | {r.doc_a for r in pairs.collect()}
    print(f"near-dup pairs vs corpus: {pairs.count()} (flagged ids: {len(dup_ids)})")
    survivors = batch.join(
        pairs.select(F.col("doc_b").alias("doc_id")), "doc_id", "left_anti"
    )
    dd.banded_keys(dd.minhash_signatures(survivors)).write.mode("append").parquet(
        bands_dir
    )
    print(f"band store extended with {survivors.count()} survivor docs")

    # -- 3. append the batch's embeddings to the ANN store -------------
    new_emb = emb.where("vec_id % 2 = 1")
    sim.IVFPQIndex.append(spark, ivfpq_dir, new_emb)
    codes_root = fsutil.resolve_version(spark, ivfpq_dir, "codes")
    print(f"ivfpq batches: {sorted(os.path.basename(p) for p in glob.glob(codes_root + '/batch_id=*'))}")

    # -- 4. serve: new vectors are findable; history is queryable ------
    probe_id = new_emb.select(F.min("vec_id")).first()[0]
    q = emb.where(F.col("vec_id") == probe_id).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = sim.IVFPQIndex.load(spark, ivfpq_dir)
    hist = sim.IVFPQIndex.load(spark, ivfpq_dir, up_to_batch=0)
    top_full = [r.neighbor_id for r in full.search(q, k=3, nprobe=2).collect()]
    top_hist = [r.neighbor_id for r in hist.search(q, k=3, nprobe=2).collect()]
    print(f"query vec {probe_id}: top3 now={top_full}  pre-ingest={top_hist}")

    # -- 5. maintenance: fold the append dirs; serving unchanged -------
    n_files = len(glob.glob(codes_root + "/batch_id=*/centroid_id=*/*.parquet"))
    compacted = sim.IVFPQIndex.compact(spark, ivfpq_dir)
    # compaction commits a NEW version root (fsutil pointer protocol)
    codes_root = fsutil.resolve_version(spark, ivfpq_dir, "codes")
    n_after = len(glob.glob(codes_root + "/batch_id=*/centroid_id=*/*.parquet"))
    top_c = [r.neighbor_id for r in compacted.search(q, k=3, nprobe=2).collect()]
    assert top_c == top_full, "compaction must not change results"
    print(f"compacted: {n_files} -> {n_after} code files; serving unchanged")

    # -- 6. the GRAPH ANN store: same lifecycle over structure ---------
    graph_dir = f"{store}/knn_graph"
    sim.KnnGraphIndex.build(base_emb, k=5, iterations=2).save(graph_dir)
    gidx = sim.KnnGraphIndex.append(spark, graph_dir, emb, new_emb, iterations=2)
    graph_root = fsutil.resolve_version(spark, graph_dir, "graph")
    n_changed = (
        spark.read.parquet(f"{graph_root}/batch_id=1")
        .select("node_id")
        .distinct()
        .count()
    )
    n_nodes = gidx.graph.select("node_id").distinct().count()
    print(
        f"graph store appended: batch 1 rewrote {n_changed}/{n_nodes} "
        "node lists (the blast radius, not the graph)"
    )
    # offset the query id: graph serving excludes self-id matches (a
    # corpus-drawn query would otherwise retrieve itself), so an
    # unknown id proves the batch-only VECTOR is reachable
    gq = q.select((F.col("query_id") + 9_000_000).alias("query_id"), "embedding")
    # beam width sized for the k=5 graph at this corpus size: the r8
    # NN-Descent extend rework changed which (equally valid) k-NN
    # lists survive, and the old ef=24 beam missed the probe from the
    # fixed entry nodes — approximate search, wider beam = recall knob
    top_g = [
        r.neighbor_id for r in gidx.search(gq, emb, k=3, ef=48, rounds=5).collect()
    ]
    assert probe_id in top_g, "a batch-only vector must be findable"
    print(f"graph serve: top3 for vec {probe_id} = {top_g}")
    # take the pre-compact count BEFORE compacting: compaction commits
    # a new version root and garbage-collects the old one, so handles
    # opened before the compact (gidx) must not be re-executed after it
    n_view = gidx.graph.count()
    gc = sim.KnnGraphIndex.compact(spark, graph_dir)
    assert gc.graph.count() == n_view
    print("graph store compacted; current view unchanged")


if __name__ == "__main__":
    main()
