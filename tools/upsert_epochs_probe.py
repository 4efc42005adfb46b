#!/usr/bin/env python3
"""Per-epoch cost probe for the streaming upsert store: land N epochs
of a ~1% change feed over a scaled documents corpus and time each
epoch, with and without auto-compaction, to show the digest-history
read staying FLAT when ``auto_compact_epochs`` bounds it (r13 — the
unbounded history scan was the documented cost in upsert_delta_batch's
scale note).

Usage:  python3 tools/upsert_epochs_probe.py [copies [epochs [threshold]]]
        (default: 10 copies of sf0.1 -> 50k docs, 12 epochs, threshold 4)
Output: one JSON line (append to SCALING.jsonl); progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    threshold = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from functools import reduce

    from pyspark.sql import functions as F

    from beyond_vector_search_spark.session import get_spark
    from beyond_vector_search_spark.sources.readers import load_table
    from beyond_vector_search_spark.streaming.ingest import upsert_delta_batch

    spark = get_spark("upsert-epochs-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text"
            )
            for i in range(copies)
        ],
    ).localCheckpoint()
    n_docs = docs.count()

    def run(auto: int | None) -> list[float]:
        store = tempfile.mkdtemp(prefix="bvs_upsert_probe_")
        times = []
        for e in range(n_epochs):
            # epoch e: the full corpus re-delivered, ~1% changed — the
            # steady-state change-feed shape (most docs skip the diff)
            batch = docs.withColumn(
                "text",
                F.when(
                    F.pmod(F.xxhash64("doc_id") + F.lit(e), F.lit(100)) == 0,
                    F.concat(F.col("text"), F.lit(f" rev{e}")),
                ).otherwise(F.col("text")),
            )
            t0 = time.time()
            upsert_delta_batch(
                batch, e, store, auto_compact_epochs=auto
            )
            times.append(round(time.time() - t0, 3))
            print(
                f"#   auto={auto} epoch {e}: {times[-1]:.2f}s", file=sys.stderr
            )
        import shutil

        shutil.rmtree(store, ignore_errors=True)
        return times

    bounded = run(threshold)
    unbounded = run(None)
    h = len(bounded) // 2
    rec = {
        "probe": "upsert_epoch_cost",
        "n_docs": n_docs,
        "epochs": n_epochs,
        "auto_compact_epochs": threshold,
        "epoch_sec_bounded": bounded,
        "epoch_sec_unbounded": unbounded,
        # flatness: later-half mean over earlier-half mean (1.0 = flat)
        "bounded_late_over_early": round(
            (sum(bounded[h:]) / (n_epochs - h)) / (sum(bounded[:h]) / h), 3
        ),
        "unbounded_late_over_early": round(
            (sum(unbounded[h:]) / (n_epochs - h)) / (sum(unbounded[:h]) / h), 3
        ),
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
