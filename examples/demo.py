#!/usr/bin/env python3
"""Demo walkthrough — the Spark equivalent of the reference's
notebooks/demo.py cells: single query, full evaluation, then ad-hoc
SQL over the telemetry tables (reference demo.py:206-226, 246-259,
315, 383).

    python3 examples/demo.py [telemetry_dir]
"""

from __future__ import annotations

import json
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from beyond_vector_search_spark.operators.answer import generate_answers
from beyond_vector_search_spark.operators.corpus_index import build_index
from beyond_vector_search_spark.operators.evaluate import evaluate_all
from beyond_vector_search_spark.operators.retrieval import search_all
from beyond_vector_search_spark.operators.router import STATE_KEY, RouterState, query_features, route
from beyond_vector_search_spark.session import get_spark
from beyond_vector_search_spark.sources.readers import load_corpus, load_labels
from beyond_vector_search_spark.sources.telemetry import TelemetryStore


def main() -> None:
    db = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="bvs_demo_")
    spark = get_spark("bvs-demo")
    docs = load_corpus(spark, "/root/reference/data/corpus.jsonl").cache()
    labels = load_labels(spark, "/root/reference/data/labels.jsonl").cache()
    store = TelemetryStore(spark, db)

    # cell 3: build the index once
    idx = build_index(docs, text=F.concat_ws(" ", "title", "text")).cache()
    print(f"index: {idx.term_stats.count()} terms, {idx.gram_stats.count()} grams")

    # cell 4: one query end-to-end
    query = "INC-49217 details"
    state = RouterState.from_json(store.get_state(STATE_KEY, RouterState().to_json()))
    q = spark.createDataFrame([("q", query)], "query_id STRING, query STRING")
    routed = route(query_features(q, idx.term_stats), state).collect()[0]
    top = search_all(q, idx, k=5)[routed.strategy]
    ans = generate_answers(top, docs, q).collect()[0]
    store.log_run(query=query, strategy=routed.strategy, score=1.0,
                  meta={"top_doc_ids": list(ans.top_doc_ids)})
    print(f"run_once: strategy={routed.strategy} top={ans.top_doc_ids[:3]}")

    # cell 5: evaluate all labels, learn weights
    report, final_state, runs = evaluate_all(labels, docs, idx, state=state)
    store.set_state(STATE_KEY, final_state.to_json())
    store.log_runs(runs.drop("query_id"))
    print(f"evaluate_all: mean={report.mean_score:.5f} state={json.dumps(final_state.to_json())}")

    # cells 6-7: the reference's ad-hoc telemetry SQL, verbatim shape
    store.register_views()
    print("\nrecent runs:")
    spark.sql(
        "SELECT run_id, ts_unix, strategy, score, query FROM runs "
        "ORDER BY run_id DESC LIMIT 10"
    ).show(truncate=60)
    print("router state:")
    spark.sql("SELECT key, value_json FROM router_state").show(truncate=80)


if __name__ == "__main__":
    main()
