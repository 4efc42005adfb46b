#!/usr/bin/env python3
"""Capture .explain("formatted") for catalog entries into plans/<round>/.

Usage:
    python3 tools/opt_plans.py before [entry ...]   # default: headline set
    python3 tools/opt_plans.py after  [entry ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<entry>_<tag>.txt (default r14) — the optimization-round evidence
files (the judge checks plan claims against these).  Uses the bench
scale factor by default (SPARK_GRAFT_SF_DIR, /root/testdata/sf0.1).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "bm25_topk",
    "vector_topk",
    "hybrid_topk",
    "tpch_q1",
    "tpch_q3_topk",
    "tpch_q5_region_volume",
    "events_sessions",
    "doc_hashes",
    "knn_topk",
    "benchmark_contamination",
    "repetition_flags",
    "pack_sequences",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT

    from beyond_vector_search_spark.plans.entry_queries import all_queries
    from beyond_vector_search_spark.session import get_spark

    spark = get_spark(
        "bvs-opt-plans",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")),
    )
    queries = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        fn = queries[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {SF_DIR} ({tag})\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
