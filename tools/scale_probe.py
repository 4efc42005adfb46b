#!/usr/bin/env python3
"""Scaling probe for the LLM-data-pipeline operators: time each family
on the sf0.1 tables concatenated N times (offset ids, no new content —
the same derivation tools/crossover_bench.py uses for retrieval) and
record how close to linear each distributed shape stays.

The point of record: the BLOCKED shapes (LSH-banded MinHash, banded-
hamming SimHash, centroid-blocked embedding near-dup) must scale
near-linearly where their naive counterparts are quadratic — the probe
times blocked AND all-pairs near-dup side by side at the smaller scales
so the gap is measured, not asserted.

Usage:  python3 tools/scale_probe.py [copies ...]     (default: 1 4 10)
Output: one JSON line per scale to stdout (redirect to SCALING.jsonl);
        progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# all-pairs near-dup is O(n^2): only measured while n stays sane
ALLPAIRS_MAX_COPIES = 4


def scaled_union(df, copies: int, id_col: str):
    from pyspark.sql import functions as F

    return reduce(
        lambda a, b: a.unionByName(b),
        [
            df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000))
            for i in range(copies)
        ],
    )


def probe(spark, copies: int) -> dict:
    from pyspark.sql import functions as F

    from beyond_vector_search_spark.operators import dedup as dd
    from beyond_vector_search_spark.operators import pretrain as pt
    from beyond_vector_search_spark.operators import similarity as sim
    from beyond_vector_search_spark.operators import text_analysis as ta
    from beyond_vector_search_spark.sources.readers import load_table

    docs = scaled_union(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text"), copies, "doc_id"
    ).localCheckpoint()
    emb = scaled_union(
        load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ),
        copies,
        "vec_id",
    ).localCheckpoint()
    n_docs, n_vecs = docs.count(), emb.count()

    out: dict = {"copies": copies, "n_docs": n_docs, "n_vecs": n_vecs, "sec": {}}

    # SPARK_GRAFT_PROBE_ONLY=substr[,substr...] re-measures a subset
    # without paying for the full probe (dependent entries must be
    # included together, e.g. nndescent build before graph serve)
    only = [s for s in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",") if s]

    def timed(name: str, fn) -> None:
        if only and not any(s in name for s in only):
            return
        t0 = time.time()
        n = fn()
        out["sec"][name] = round(time.time() - t0, 3)
        print(f"#   x{copies} {name}: {out['sec'][name]}s rows={n}", file=sys.stderr)

    timed("exact_dedup", lambda: dd.exact_dedup_map(docs).count())
    timed(
        "minhash_lsh_pairs",
        lambda: dd.lsh_candidate_pairs(dd.minhash_signatures(docs)).count(),
    )
    # incremental form: a 5% batch checked against the 95% corpus —
    # the per-epoch ingest cost to compare against the monolithic
    # self-join above (the corpus signs once; at scale its banded keys
    # would be a persisted store and not re-derived per epoch)
    timed(
        "lsh_incremental_5pct",
        lambda: dd.lsh_pairs_against_corpus(
            dd.minhash_signatures(docs.where(F.col("doc_id") % 20 == 0)),
            dd.minhash_signatures(docs.where(F.col("doc_id") % 20 != 0)),
        ).count(),
    )
    # with the PERSISTED band-key store (the deployment shape): corpus
    # signing/banding paid once outside the epoch; the timed cost is
    # the new batch's signing + the bucket join against the store
    if not only or any(s in "lsh_incremental_5pct_stored" for s in only):
        _stored_bands = dd.banded_keys(
            dd.minhash_signatures(docs.where(F.col("doc_id") % 20 != 0))
        ).localCheckpoint()
        timed(
            "lsh_incremental_5pct_stored",
            lambda: dd.lsh_pairs_against_corpus(
                dd.minhash_signatures(docs.where(F.col("doc_id") % 20 == 0)),
                corpus_bands=_stored_bands,
            ).count(),
        )
    # 60-bit fingerprints (the production setting): 32 bits collide
    # heavily past ~10k docs and the pair count goes output-quadratic
    timed("simhash_pairs", lambda: dd.simhash_pairs(docs, bits=60, bands=4).count())
    # exact shingle-Jaccard is intersection-join bound (sum of df^2 over
    # shingles): probed only while the duplicated-corpus df^2 stays sane
    if copies <= ALLPAIRS_MAX_COPIES:
        timed(
            "jaccard_pairs",
            lambda: dd.jaccard_pairs(docs, threshold=0.5).count(),
        )
    timed("text_profile", lambda: ta.quality_score(docs).count())
    # snapshot diff (r11/r12 ops, previously measured ad hoc — in the
    # probe so SCALING.jsonl rows regenerate from one tool): old/new
    # derived like the catalog entry (%3 removed / %5 changed / %7
    # missing-from-new), digests only reach the full-outer join
    from beyond_vector_search_spark.operators.versioning import corpus_diff

    def _diff() -> int:
        old = docs.where(F.col("doc_id") % 3 != 0).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [v1]"))
            ).otherwise(F.col("text")).alias("text"),
        )
        return corpus_diff(old, docs.where(F.col("doc_id") % 7 != 0)).count()

    timed("corpus_diff", _diff)
    # markup extraction over synthesized HTML (narrow map, text-linear)
    timed(
        "html_extract",
        lambda: ta.html_extract(
            docs.select(
                "doc_id",
                F.concat(
                    F.lit("<html><body><h1>D</h1><p>"), F.col("text"),
                    F.lit("</p><script>var x=1;</script></body></html>"),
                ).alias("html"),
            )
        ).count(),
    )
    timed("repetition_flags", lambda: pt.repetition_flags(docs).count())
    timed(
        "embed_neardup_blocked",
        lambda: sim.embedding_neardup_pairs(emb, threshold=0.99).count(),
    )
    if copies <= ALLPAIRS_MAX_COPIES:
        timed(
            "embed_neardup_allpairs",
            lambda: sim.embedding_neardup_pairs(emb, threshold=0.99, block=False).count(),
        )

    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed("knn_exact_top5", lambda: sim.knn_bruteforce(emb, queries).count())
    # PQ ADC + exact rerank: the scan reads 8-byte codes, the rerank
    # touches q x 50 candidates — should stay near-flat in corpus size
    timed(
        "pq_topk_rerank",
        lambda: sim.pq_topk(emb, queries, m=8, dim=64, n_codes=16, rerank=50).count(),
    )
    # duplicate spans: inverted positional shingle join (df-capped) +
    # islands window — join-bound like jaccard, probed at the same caps
    if copies <= ALLPAIRS_MAX_COPIES:
        timed(
            "duplicate_spans",
            lambda: dd.duplicate_spans(docs, n=8, max_shingle_df=50).count(),
        )
    import math

    cents = (
        emb.orderBy("vec_id")
        .limit(max(8, math.isqrt(n_vecs)))
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    )
    timed("ivf_probe_top5", lambda: sim.ivf_topk(emb, queries, cents).count())

    # --- persisted IVFPQ store: full rebuild vs incremental append ---
    # the ingest claim to quantify: appending a 5% shard to a saved
    # store costs the SHARD's assignment + encode (frozen quantizer +
    # codebooks), so it should stay ~flat relative to the growing
    # full-build cost
    import tempfile

    ivfpq_store = tempfile.mkdtemp(prefix="ivfpq_probe_") + "/store"
    base_emb = emb.where(F.col("vec_id") % 20 != 0)  # 95%
    shard = emb.where(F.col("vec_id") % 20 == 0)     # 5%

    def _build_save() -> int:
        sim.IVFPQIndex.build(base_emb, cents, m=8, dim=64).save(ivfpq_store)
        return base_emb.count()

    timed("ivfpq_build_save", _build_save)
    # timed: load store metadata + encode the shard + write its batch
    # directory (the ingest epoch's actual work); the verification
    # count is outside the timer
    shard_n = shard.count()
    timed(
        "ivfpq_append_5pct",
        lambda: (
            sim.IVFPQIndex.append(emb.sparkSession, ivfpq_store, shard),
            shard_n,
        )[1],
    )

    # NN-Descent graph build is O(n·k²) pair scorings per round —
    # should scale near-linearly; beam-search serving over the built
    # graph is O(rounds·ef·degree) per query — should stay FLAT in
    # corpus size (the whole point of the graph structure).
    _g: dict = {}

    def _build_graph() -> int:
        # the production cost-control shape: incremental new-edge
        # candidates + rho=0.5 sampled adjacency, working list 25
        # (not the 3k default 45 — candidate volume scales with L^2)
        _g["graph"] = sim.nndescent_knn_graph(
            emb, k=15, iterations=2, list_size=25, sample_rate=0.5
        )
        return _g["graph"].count()

    timed("nndescent_graph_build", _build_graph)
    timed(
        "graph_ann_serve_top5",
        lambda: sim.graph_ann_topk(
            emb, queries, _g["graph"], k=5, ef=15, rounds=3
        ).count(),
    )
    # graph-STORE epoch: appending a 1% vector batch to a persisted
    # KnnGraphIndex must cost the batch's blast radius (seed beam +
    # scoped NN-Descent rounds + changed-lists write), NOT the
    # nndescent_graph_build rebuild above — the graph twin of the
    # IVFPQ append-vs-rebuild comparison.  Store build is untimed
    # (it is the rebuild row); only the epoch is measured.  Batch size
    # matters for the contract: each new node seeds L reversed edges
    # into base lists, so a batch over ~n/L saturates the blast radius
    # and an epoch rightly approaches a rebuild — 1% stays well under.
    if not only or any(s in "graph_store_append_epoch" for s in only):
        import tempfile

        spark_ = emb.sparkSession
        base_v = emb.where(F.col("vec_id") % 100 != 0)
        batch_v = emb.where(F.col("vec_id") % 100 == 0)
        gstore = tempfile.mkdtemp(prefix="bvs_gstore_")
        sim.KnnGraphIndex(
            sim.nndescent_knn_graph(
                base_v, k=15, iterations=2, list_size=25, sample_rate=0.5
            ),
            k=15,
        ).save(gstore)
        timed(
            "graph_store_append_epoch",
            lambda: sim.KnnGraphIndex.append(
                spark_, gstore, base_v, batch_v,
                iterations=2, list_size=25, sample_rate=0.5,
            ).graph.count(),
        )

    # --- fusion family (rrf / prf / mmr) + the narrow pipeline ops ---
    # index built once per scale and warmed OUTSIDE the timers (the
    # build itself is crossover_bench's measurement); the timed part is
    # the per-query-batch serving cost, which must stay ~flat in corpus
    # size for rrf/prf (broadcast-join scoring) and mmr (candidate-
    # bounded work).
    from beyond_vector_search_spark.config import EngineConfig
    from beyond_vector_search_spark.operators import fusion as fu
    from beyond_vector_search_spark.operators import retrieval as rt
    from beyond_vector_search_spark.operators.corpus_index import build_index

    cfg = EngineConfig(include_zero_score_docs=False)
    idx = build_index(docs).cache()
    for d in (idx.postings, idx.term_stats, idx.gram_stats, idx.doc_norm):
        d.count()
    qdf = docs.sparkSession.createDataFrame(
        [
            ("q1", "spark join performance"),
            ("q2", "vector hash index scan"),
            ("q3", "slow query filter value 42"),
        ],
        "query_id string, query string",
    )
    # Shared cached-arm protocol (operators/serving.ServingArms): the
    # arm score relations build ONCE per (index, batch) — its cost is
    # the fusion_arms_build row — and rrf/prf/mmr each serve from the
    # cached rows, the deployment shape.  Previously each operator
    # re-derived its arms from the index (4-7 s each at 50k-100k docs).
    from beyond_vector_search_spark.operators.serving import ServingArms

    arms = ServingArms(idx, qdf, cfg=cfg)
    timed("fusion_arms_build", lambda: arms.materialize())
    timed(
        "rrf_fuse_top10",
        lambda: rt.stable_topk(
            fu.rrf_scores({"k": arms.arm("keyword"), "v": arms.arm("vector")}),
            10,
        ).count(),
    )
    timed(
        "prf_bm25_top10",
        lambda: rt.stable_topk(
            fu.prf_bm25_scores(qdf, idx, arms.arm("keyword"), cfg=cfg),
            10,
        ).count(),
    )
    timed(
        "mmr_top5_of12",
        lambda: fu.mmr_rerank(
            arms.topk("vector", 12).select("query_id", "doc_id", "score"),
            idx,
            k=5,
        ).count(),
    )
    arms.release()
    timed("doc_chunks", lambda: pt.chunk_documents(docs).count())
    timed("gopher_quality", lambda: pt.gopher_quality(docs).count())
    # fuzzy decontamination: benchmark bands broadcast vs corpus bands
    # + Jaccard verify on candidates only — cost should track the
    # corpus sign/band pass (one scan), never corpus x benchmark
    timed(
        "fuzzy_contamination",
        lambda: pt.fuzzy_contamination(
            docs, docs.where(F.col("doc_id") % 97 == 0)
        ).count(),
    )
    # shared-signature form: the corpus's band keys + shingle rows are
    # PRECOMPUTED (what a pipeline's dedup pass / the streaming band
    # store already holds) — the sweep then costs no corpus text scan;
    # the precompute itself is timed separately so the split is visible
    if not only or any(s in "fuzzy_contamination_shared" for s in only):
        t0 = time.time()
        pre_bands = dd.banded_keys(dd.minhash_signatures(docs)).localCheckpoint()
        pre_sh = dd.shingle_rows(docs, n=3).localCheckpoint()
        out["sec"]["fuzzy_shared_precompute"] = round(time.time() - t0, 3)
        timed(
            "fuzzy_contamination_shared",
            lambda: pt.fuzzy_contamination(
                docs,
                docs.where(F.col("doc_id") % 97 == 0),
                corpus_bands=pre_bands,
                corpus_shingles=pre_sh,
            ).count(),
        )
    # A-ES weighted sampling: narrow hash+ln projection + global top-n
    # (TakeOrderedAndProject) — must stay flat-to-linear with NO
    # single-partition window
    from beyond_vector_search_spark.operators.scale import weighted_sample

    timed(
        "weighted_sample_top200",
        lambda: weighted_sample(
            docs.withColumn("wt", F.length("text").cast("double")),
            weight_col="wt",
            n=200,
        ).count(),
    )
    # NB quality classifier: train+score in one plan — two shuffles
    # over the (doc, term, tf) relation; should track bigram_logppl's
    # slope (same explode/agg skeleton, no interpolation join)
    timed("nb_quality_scores", lambda: pt.nb_quality_scores(docs).count())
    # BPE: the corpus-scale part is ONE word-count aggregation (the
    # merge loop is vocabulary-bound and constant in corpus size — on
    # this derived corpus the vocab never grows with copies, so
    # bpe_train16 must stay FLAT); segmentation is kernel-per-distinct-
    # term + a tf join.  Dependent entries: segment needs train's
    # merges (include both under SPARK_GRAFT_PROBE_ONLY).
    from beyond_vector_search_spark.operators import bpe as bp

    _merges: list = []

    def _bpe_train() -> int:
        _merges[:] = bp.bpe_train(bp.word_freqs(docs), n_merges=16)
        return len(_merges)

    timed("bpe_train16", _bpe_train)
    timed("bpe_segment_stats", lambda: bp.piece_stats(docs, _merges).count())
    # PageRank: the iteration cost is edges-linear (one src join + one
    # dst agg per step); the exact-kNN edge construction is the
    # quadratic part, so it rides the all-pairs cap — the 100 TB path
    # feeds the NN-Descent graph instead (same iteration cost)
    from beyond_vector_search_spark.operators import graph as gr

    if copies <= ALLPAIRS_MAX_COPIES:
        timed(
            "pagerank_knn5_it5",
            lambda: gr.pagerank(gr.knn_edges(emb, k=5), n_iter=5).count(),
        )
    # dependent entry: needs nndescent_graph_build's graph — skip (do
    # not record a bogus ~0s row) when the build was filtered out
    if "graph" in _g:
        timed(
            "pagerank_nnd_it5",
            lambda: gr.pagerank(
                _g["graph"].select(
                    F.col("node_id").alias("src"),
                    F.col("neighbor_id").alias("dst"),
                ),
                n_iter=5,
            ).count(),
        )
    timed("bigram_logppl", lambda: pt.bigram_logppl(docs, cache=True).count())
    # persisted-tokens form (IndexDelta pattern): tokenize once at
    # ingest (tokens_build), then LM scoring never rescans the text —
    # the incremental 100 TB shape for repeated perplexity/DSIR passes
    from beyond_vector_search_spark.operators.corpus_index import doc_tokens

    toks = doc_tokens(docs).cache()
    timed("tokens_build", lambda: toks.count())
    timed(
        "bigram_logppl_tokens",
        lambda: pt.bigram_logppl(docs, cache=True, tokens=toks).count(),
    )
    toks.unpersist()
    spark = docs.sparkSession
    spark.catalog.clearCache()  # drop this scale's index caches
    return out


def main() -> int:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 10]

    from beyond_vector_search_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.range(1).count()
    probe(spark, 1)  # warm codegen/kernels
    for c in scales:
        rec = probe(spark, c)
        print(json.dumps(rec))
        base = rec["sec"]
        print(f"# x{c}: {base}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
