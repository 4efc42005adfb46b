#!/usr/bin/env python3
"""Training-data pipeline walkthrough: the corpus-preparation operators
chained the way a nightly pretraining data job runs them, over the
driver testdata documents table.

    python3 examples/pretrain_pipeline_demo.py [sf_dir] [out_dir]

Stages (each also queryable standalone via __spark_entry__.queries()):
  1. exact + near-duplicate analysis (content hash, MinHash-LSH)
  2. benchmark decontamination (8-token-gram collisions)
  3. quality: Gopher-style repetition flags + language ID
  4. PII scrub
  5. language mixture sampling
  6. sequence packing + deterministic shard write
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import dedup as dd
from beyond_vector_search_spark.operators import pretrain as pt
from beyond_vector_search_spark.operators.scale import mixture_sample
from beyond_vector_search_spark.operators.text_analysis import lang_guess
from beyond_vector_search_spark.session import get_spark
from beyond_vector_search_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="bvs_shards_")
    spark = get_spark("bvs-pretrain-demo")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang").cache()
    n0 = docs.count()

    # 1. dedup: exact content hash + MinHash-LSH near-dup candidates
    keepers = (
        dd.exact_dedup_map(docs)
        .where(F.col("doc_id") == F.col("keeper_id"))
        .select("doc_id")
    )
    sigs = dd.minhash_signatures(docs)
    n_near = dd.lsh_candidate_pairs(sigs).count()
    docs1 = docs.join(keepers, "doc_id")
    print(f"dedup: {n0} -> {docs1.count()} docs ({n_near} LSH near-dup candidate pairs)")

    # 2. decontamination vs a held-out benchmark sample
    bench = docs1.where(F.col("doc_id") % 97 == 0)
    corpus = docs1.where(F.col("doc_id") % 97 != 0)
    contaminated = pt.benchmark_contamination(corpus, bench, n=8).select("doc_id")
    clean = corpus.join(contaminated, "doc_id", "left_anti")
    print(f"decontaminate: {corpus.count()} -> {clean.count()} (bench={bench.count()})")

    # 3. quality: repetition flags + language distribution
    rep = pt.repetition_flags(clean)
    kept = (
        clean.join(rep.select("doc_id", "n_tokens", "flag_repetitive"), "doc_id")
        .where(~F.col("flag_repetitive") & (F.col("n_tokens") >= 5))
    )
    print(f"quality: {clean.count()} -> {kept.count()}")
    lang_guess(kept).groupBy("lang_guess").count().orderBy("lang_guess").show()

    # 4. PII scrub (counts on this corpus are ~0 — the pass still runs)
    pii = pt.pii_scrub(kept)
    pii.agg(
        F.sum("n_emails").alias("emails"),
        F.sum("n_phones").alias("phones"),
        F.sum("n_ips").alias("ips"),
    ).show()

    # 5. mixture: up/down-weight languages to a target blend
    mixed = mixture_sample(
        kept.select("doc_id", "text", "lang"),
        strata_col="lang", key_col="doc_id",
        weights={"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25},
    )
    mixed.groupBy("lang").count().orderBy("lang").show()

    # 6. pack + shard write
    packed = pt.pack_sequences(mixed, seq_len=512, n_shards=8)
    packed.groupBy("shard").agg(
        F.count("*").alias("docs"), (F.max("seq_id") + 1).alias("sequences")
    ).orderBy("shard").show()
    pt.write_shards(mixed, f"{out_dir}/shards", n_shards=8)
    print(f"wrote shards to {out_dir}/shards")


if __name__ == "__main__":
    main()
