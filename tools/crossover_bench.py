#!/usr/bin/env python3
"""Crossover benchmark: this engine vs the single-process reference on
the SAME corpus at growing document counts.

The sf0.1 retrieval bench measures a 5,000-doc corpus, where Spark's
fixed per-action overhead (plan analysis, stage scheduling, broadcast
builds) dominates and the single-process reference wins on latency.
That gap is constant, not asymptotic: the reference's index build and
its score-every-doc queries are O(corpus) on one core, while the Spark
plans are O(corpus / cores) with a fixed floor.  This tool measures
both engines on corpora derived from the driver's own documents table
(the sf0.1 table concatenated N times with offset doc_ids — no new
content is synthesized) and prints the per-scale comparison, locating
the crossover point.

Reference timing executes /root/reference (public, untrusted) the same
way BASELINE.md's measurements did: in-process, stdlib only.

Usage:  python3 tools/crossover_bench.py [copies ...]   (default: 1 4 10)
Output: one JSON line per scale + a summary table on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10


def load_texts() -> list[tuple[int, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


BATCH_WORDS = (
    "spark join performance vector hash index scan slow query filter "
    "value shuffle broadcast partition cache parquet codegen window "
    "aggregate stream state"
).split()


def batch_queries(n: int = 100) -> list[tuple[str, str]]:
    """n deterministic vocab-word queries — the batched-serving workload
    both engines run identically."""
    nw = len(BATCH_WORDS)
    return [
        (
            f"b{i:03d}",
            f"{BATCH_WORDS[i % nw]} {BATCH_WORDS[(i * 7 + 3) % nw]} "
            f"{BATCH_WORDS[(i * 13 + 5) % nw]}",
        )
        for i in range(n)
    ]


def time_reference(rows: list[tuple[int, str]], queries: list[str]) -> dict:
    """Build + query timings for the reference engine (one process)."""
    sys.path.insert(0, "/root/reference/src")
    from beyond_vector_search.index import build_corpus_stats
    from beyond_vector_search.retrievers import (
        HybridRetriever,
        KeywordRetriever,
        VectorRetriever,
    )
    from beyond_vector_search.types import Document

    docs = [Document(doc_id=str(i), title="", text=t or "") for i, t in rows]
    t0 = time.time()
    stats = build_corpus_stats(docs)
    vec = VectorRetriever.build(docs, stats)
    kw = KeywordRetriever.build(docs, stats)
    hyb = HybridRetriever(docs=docs, vector=vec, keyword=kw)
    t_build = time.time() - t0

    out = {"index_build": round(t_build, 3)}
    for name, r in (("bm25_topk", kw), ("vector_topk", vec), ("hybrid_topk", hyb)):
        t0 = time.time()
        for q in queries:
            r.search(q, k=K)
        out[name] = round(time.time() - t0, 3)
    out["total"] = round(sum(out.values()), 3)
    # batched workload: the reference's only mode is a per-query loop
    batch = [q for _, q in batch_queries()]
    for name, r in (("bm25", kw), ("vector", vec), ("hybrid", hyb)):
        t0 = time.time()
        for q in batch:
            r.search(q, k=K)
        out[f"batch100_{name}"] = round(time.time() - t0, 3)
    return out


def time_spark(spark, copies: int, queries_df, *, snapshot: bool = False):
    """{"rebuild": timings, "snapshot": timings | None} — one return
    shape regardless of ``snapshot``, so callers (bench.py splats the
    rebuild dict) can't silently mis-unpack a mode-dependent tuple."""
    from functools import reduce

    from pyspark.sql import functions as F

    from beyond_vector_search_spark.operators import corpus_index as ci
    from beyond_vector_search_spark.operators import retrieval as rt
    from beyond_vector_search_spark.plans.entry_queries import _CFG, _ranked
    from beyond_vector_search_spark.sources.readers import load_table

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    scaled = reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select((F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text")
            for i in range(copies)
        ],
    )
    n_docs = base.count() * copies
    # Scale posture follows the corpus, both directions (r10 finding
    # #1 was the up direction: the 500k-doc build OOM'd the default
    # 8 GiB local[32] heap):
    # - shuffle partitions are sized to the DATA for the whole scale
    #   run — n_docs/2500 with a floor of 8 — so a 5k-doc run stops
    #   paying 32-way scheduler overhead per tiny stage and a 500k run
    #   gets aggregation tasks small enough to spill instead of OOM
    #   (AQE still coalesces the reduce side at runtime);
    # - serialized+spillable checkpoint blocks past 100k docs — the
    #   default deserialized level keeps one UnsafeRow object per row
    #   (~3x payload bytes in headers) pinned under 32 concurrent
    #   aggregation tasks;
    # - the tokenize/shingle kernels checkpoint in BACKGROUND threads
    #   while the driver builds the derived plans (the bench builder's
    #   overlap, measured ~0.2 s at this grain).
    from pyspark import StorageLevel

    level = StorageLevel.MEMORY_AND_DISK if n_docs >= 100_000 else None
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(8, n_docs // 2500))
    )
    try:
        return _time_spark_scaled(
            spark, scaled, n_docs, level, queries_df, snapshot=snapshot
        )
    finally:
        # restored even on error: bench.py catches crossover failures
        # and keeps running — the session conf must not leak
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def _query_suite(spark, idx, queries_df) -> dict:
    """First-call single-query trio + batch100 trio against ``idx`` —
    the per-index serving workload, identical for a just-built index
    (rebuild regime) and a loaded snapshot (deployment regime)."""
    from beyond_vector_search_spark.operators import retrieval as rt
    from beyond_vector_search_spark.plans.entry_queries import _CFG, QUERY_SET, _ranked

    # the compiled serving path (entry_queries._scores shape): the
    # query batch folds into the plan as literals, and the two arm
    # score relations are CACHED exactly as the engine's serving
    # profile caches them (_scores / ServingArms fill arm caches once
    # per workload; every later consumer reads them) — bm25 pays the
    # keyword fill, vector the vector fill, hybrid blends the cached
    # arms, each arm executing once across the trio
    out: dict = {}
    # ONE-ACTION trio (r13): the three strategies' top-k as a single
    # tagged-union relation (rt.search_all_tagged — one job, one
    # action floor, one ranking exchange), measured FIRST with fresh
    # arm caches so it pays the same fills the per-arm protocol pays.
    # Recorded alongside the classic per-arm trio, which follows with
    # its own fresh caches — protocols are additive, nothing replaced.
    t0 = time.time()
    comp_t = rt.compile_query_batch(QUERY_SET, idx, cfg=_CFG)
    kw_t = rt.compiled_bm25_scores(idx, comp_t, cfg=_CFG).cache()
    vec_t = rt.compiled_vector_scores(idx, comp_t, cfg=_CFG).cache()
    rt.search_all_tagged(
        queries_df, idx, cfg=_CFG, keyword=kw_t, vector=vec_t
    ).count()
    out["trio_tagged"] = round(time.time() - t0, 3)
    kw_t.unpersist()
    vec_t.unpersist()

    t0 = time.time()
    # compile from the plain tuple list (the interactive-serving shape):
    # passing the DataFrame form pays a bounded driver collect job per
    # compile — a pure fixed-floor cost at single-query grain
    compiled = rt.compile_query_batch(QUERY_SET, idx, cfg=_CFG)
    kw = rt.compiled_bm25_scores(idx, compiled, cfg=_CFG).cache()
    vec = rt.compiled_vector_scores(idx, compiled, cfg=_CFG).cache()
    _ranked(kw).count()
    out["bm25_topk"] = round(time.time() - t0, 3)

    t0 = time.time()
    _ranked(vec).count()
    out["vector_topk"] = round(time.time() - t0, 3)

    t0 = time.time()
    _ranked(
        rt.hybrid_scores(
            queries_df, idx, cfg=_CFG, keyword=kw, vector=vec, minmax_via="window"
        )
    ).count()
    out["hybrid_topk"] = round(time.time() - t0, 3)
    kw.unpersist()
    vec.unpersist()

    # batched workload: 100 queries compiled into ONE plan per arm —
    # Spark's fixed per-action floor amortizes across the batch, the
    # regime where the engine beats the reference loop at EVERY corpus
    # size (the single-query rows above carry the floor per query)
    b100 = spark.createDataFrame(batch_queries(), "query_id STRING, query STRING")
    c100 = rt.compile_query_batch(batch_queries(), idx, cfg=_CFG)
    # same cached-arm serving profile as the trio above (ServingArms
    # caches each arm on first access; hybrid reads the two fills)
    kw100 = rt.compiled_bm25_scores(idx, c100, cfg=_CFG).cache()
    vec100 = rt.compiled_vector_scores(idx, c100, cfg=_CFG).cache()
    t0 = time.time()
    _ranked(kw100).count()
    out["batch100_bm25"] = round(time.time() - t0 + 0.0, 3)
    t0 = time.time()
    _ranked(vec100).count()
    out["batch100_vector"] = round(time.time() - t0, 3)
    t0 = time.time()
    _ranked(
        rt.hybrid_scores(b100, idx, cfg=_CFG, keyword=kw100, vector=vec100,
                         minmax_via="window")
    ).count()
    out["batch100_hybrid"] = round(time.time() - t0, 3)
    kw100.unpersist()
    vec100.unpersist()
    return out


def _release(idx) -> None:
    for f in idx._FIELDS:
        df = getattr(idx, f, None)
        if df is not None and df.is_cached:
            df.unpersist()


def _time_spark_scaled(spark, scaled, n_docs, level, queries_df, *, snapshot=False):
    from beyond_vector_search_spark.operators import corpus_index as ci

    t0 = time.time()
    delta, join = ci.build_delta(
        scaled, text="text", cache=False
    ).checkpoint_background(
        target_partitions=-(-n_docs // 2500), storage_level=level
    )
    idx = ci.index_from_delta(delta).cache(
        skip=("postings", "doc_ids", "doc_vec", "scalars")
    )
    join()
    idx = idx.materialize().warm_idf()
    out = {"index_build": round(time.time() - t0, 3)}
    singles = ("index_build", "bm25_topk", "vector_topk", "hybrid_topk")
    out.update(_query_suite(spark, idx, queries_df))
    out["total"] = round(sum(out[k] for k in singles), 3)
    out["total_tagged"] = round(out["index_build"] + out["trio_tagged"], 3)
    if not snapshot:
        # release executor memory between scales
        _release(idx)
        return {"rebuild": out, "snapshot": None}

    # Deployment regime (the bench.py r11 protocol, A/B'd here against
    # the rebuild regime above on the SAME corpus in the SAME session):
    # the index is built+persisted ONCE per corpus snapshot (one-off,
    # recorded but outside the serve total) and a serving process times
    # load+materialize as ITS index_build, then the identical query
    # suite.  The reference has no persistence — its only mode is the
    # rebuild loop — so the reference column is the same for both.
    import shutil
    import tempfile

    snap_dir = tempfile.mkdtemp(prefix="bvs_crossover_snapshot_")
    try:
        t0 = time.time()
        idx.save(snap_dir)
        save_sec = round(time.time() - t0, 3)
        # the loaded index must do its own work: drop the builder's
        # cache blocks before timing the load-side materialize
        _release(idx)
        # Scale-aware cache profile for the LOADED index: at small
        # corpora cache everything (the bench sf0.1 protocol); past
        # 100k docs leave the big relations (postings/doc_vec/doc_ids)
        # parquet-backed — the compiled serving path pushes its IN
        # filters into those scans, and caching them in full is what
        # starved the 8 GiB heap during the 500k batch-100 fills
        # (measured: flat-cache fills 45.6/74.2 s vs the rebuild's
        # checkpoint-backed 12.8/17.1 s).  Same data-not-cores rule as
        # the shuffle-partition sizing above.
        skip = (
            ("scalars",)
            if n_docs < 100_000
            else ("scalars", "postings", "doc_vec", "doc_ids")
        )
        t0 = time.time()
        idx2 = (
            ci.CorpusIndex.load(spark, snap_dir)
            .cache(skip=skip)
            .materialize()
            .warm_idf()
        )
        snap = {
            "snapshot_build_save_unmeasured": save_sec,
            "index_build": round(time.time() - t0, 3),
        }
        snap.update(_query_suite(spark, idx2, queries_df))
        snap["total"] = round(sum(snap[k] for k in singles), 3)
        snap["total_tagged"] = round(
            snap["index_build"] + snap["trio_tagged"], 3
        )
        _release(idx2)
    finally:
        shutil.rmtree(snap_dir, ignore_errors=True)
    return {"rebuild": out, "snapshot": snap}


def main() -> int:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    rows = load_texts()

    from beyond_vector_search_spark.plans.entry_queries import QUERY_SET
    from beyond_vector_search_spark.session import get_spark

    spark = get_spark("crossover-bench")
    spark.range(1).count()
    queries_df = spark.createDataFrame(QUERY_SET, "query_id STRING, query STRING")
    # warm codegen/kernels at the smallest scale factor
    time_spark(spark, 1, queries_df)

    results = []
    for c in scales:
        scaled_rows = [
            (i + k * 10_000_000, t) for k in range(c) for i, t in rows
        ]
        ref = time_reference(scaled_rows, [q for _, q in QUERY_SET])
        timed = time_spark(spark, c, queries_df, snapshot=True)
        eng, snap = timed["rebuild"], timed["snapshot"]
        rec = {
            "n_docs": len(scaled_rows),
            "copies": c,
            "reference": ref,
            # rebuild regime: every process re-derives the index — the
            # reference's own behavior (its run.py rebuilds per run)
            "spark": eng,
            # deployment regime: serve from a persisted snapshot; the
            # one-off build+save cost is inside spark_snapshot as
            # snapshot_build_save_unmeasured
            "spark_snapshot": snap,
            "ratio_spark_over_ref": round(eng["total"] / ref["total"], 2),
            "snapshot_ratio_spark_over_ref": round(
                snap["total"] / ref["total"], 2
            ),
            # one-action trio (search_all_tagged) in the deployment
            # regime: load+materialize + ONE tagged job serving all
            # three strategies' top-k — the engine's lowest-floor
            # interactive serve, vs the same reference total
            "snapshot_tagged_ratio_spark_over_ref": round(
                snap["total_tagged"] / ref["total"], 2
            ),
            "batch100_ratio_spark_over_ref": round(
                (eng["batch100_bm25"] + eng["batch100_vector"])
                / max(ref["batch100_bm25"] + ref["batch100_vector"], 1e-9),
                3,
            ),
            "batch100_hybrid_ratio_spark_over_ref": round(
                eng["batch100_hybrid"] / max(ref["batch100_hybrid"], 1e-9), 3
            ),
        }
        results.append(rec)
        print(json.dumps(rec))
        print(
            f"# {len(scaled_rows):>7} docs: reference {ref['total']:.2f}s, "
            f"spark rebuild {eng['total']:.2f}s "
            f"({rec['ratio_spark_over_ref']:.2f}x) / snapshot-serve "
            f"{snap['total']:.2f}s ({rec['snapshot_ratio_spark_over_ref']:.2f}x); "
            f"batch100 ratio {rec['batch100_ratio_spark_over_ref']:.2f}x",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
