"""End-to-end eval-loop parity vs BASELINE.md's measured numbers.

pass 1 (cold state): mean 0.97857…, the single miss being Q-012
(chosen=keyword scored 0.7 while vector scored 1.0); routing
distribution keyword 12, hybrid 2.
pass 2 (state learned from pass 1): mean 1.0; routing keyword 8,
vector 5, hybrid 1; final state vector=+0.5, keyword=-0.25,
hybrid=-0.25, lr=0.25.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from beyond_vector_search_spark.operators.evaluate import evaluate_all
from beyond_vector_search_spark.operators.router import RouterState


@pytest.fixture(scope="module")
def two_passes(ref_labels, ref_corpus, ref_index):
    from pyspark.sql import functions as F  # noqa: F401

    r1, s1, _ = evaluate_all(ref_labels, ref_corpus, ref_index)
    r2, s2, _ = evaluate_all(ref_labels, ref_corpus, ref_index, state=s1)
    return r1, s1, r2, s2


def test_pass1_mean_and_miss(two_passes):
    r1, _, _, _ = two_passes
    assert r1.n == 14
    assert math.isclose(r1.mean_score, 0.9785714285714285, rel_tol=1e-12)
    misses = [q for q in r1.per_query if q["chosen_score"] < 1.0]
    assert [m["query_id"] for m in misses] == ["Q-012"]
    assert misses[0]["chosen"] == "keyword"
    assert math.isclose(misses[0]["chosen_score"], 0.7, rel_tol=1e-12)
    assert math.isclose(misses[0]["vector_score"], 1.0, rel_tol=1e-12)


def test_pass1_routing_distribution(two_passes):
    r1, _, _, _ = two_passes
    dist = Counter(q["chosen"] for q in r1.per_query)
    assert dist == {"keyword": 12, "hybrid": 2}


def test_pass2_mean_and_distribution(two_passes):
    _, _, r2, _ = two_passes
    assert math.isclose(r2.mean_score, 1.0, rel_tol=1e-12)
    dist = Counter(q["chosen"] for q in r2.per_query)
    assert dist == {"keyword": 8, "vector": 5, "hybrid": 1}


def test_pass2_final_state(two_passes):
    _, _, _, s2 = two_passes
    assert math.isclose(s2.weight_vector, 0.5, abs_tol=1e-12)
    assert math.isclose(s2.weight_keyword, -0.25, abs_tol=1e-12)
    assert math.isclose(s2.weight_hybrid, -0.25, abs_tol=1e-12)
    assert s2.lr == 0.25


def test_state_roundtrip():
    s = RouterState(weight_vector=0.5, weight_keyword=-0.25, weight_hybrid=-0.25)
    assert RouterState.from_json(s.to_json()) == s


def test_windowed_fold_matches_driver_fold(ref_labels, ref_corpus, ref_index):
    """fold='windowed' (prefix-sum trajectory as window expressions)
    reproduces the driver fold bit-for-bit across both passes."""
    rd1, sd1, _ = evaluate_all(ref_labels, ref_corpus, ref_index)
    rw1, sw1, _ = evaluate_all(ref_labels, ref_corpus, ref_index, fold="windowed")
    assert [q["chosen"] for q in rw1.per_query] == [q["chosen"] for q in rd1.per_query]
    assert rw1.mean_score == rd1.mean_score
    assert sw1 == sd1
    rd2, sd2, _ = evaluate_all(ref_labels, ref_corpus, ref_index, state=sd1)
    rw2, sw2, _ = evaluate_all(ref_labels, ref_corpus, ref_index, state=sw1, fold="windowed")
    assert [q["chosen"] for q in rw2.per_query] == [q["chosen"] for q in rd2.per_query]
    assert sw2 == sd2


def test_windowed_fold_random_trajectories(spark):
    """The windowed fold equals the sequential fold on randomized score
    tables (including exact ties and all-equal no-op rows)."""
    import random

    from pyspark.sql import functions as F

    from beyond_vector_search_spark.operators.evaluate import fold_weights_windowed
    from beyond_vector_search_spark.operators.router import (
        choose_with_state,
        update_from_scores,
    )

    rng = random.Random(42)
    vals = [0.0, 0.3, 0.7, 1.0]
    rows = []
    for i in range(60):
        s_vec, s_key, s_hyb = (rng.choice(vals) for _ in range(3))
        hk, hv, hh = (round(rng.uniform(0, 1), 3) for _ in range(3))
        rows.append((f"Q-{i:03d}", s_vec, s_key, s_hyb, hk, hv, hh))
    rows.append(("Q-900", 0.5, 0.5, 0.5, 0.1, 0.2, 0.3))  # all-equal no-op

    df = spark.createDataFrame(
        rows,
        "query_id STRING, s_vec DOUBLE, s_key DOUBLE, s_hyb DOUBLE, "
        "heuristic_keyword DOUBLE, heuristic_vector DOUBLE, heuristic_hybrid DOUBLE",
    )
    state = RouterState(weight_vector=0.1, weight_keyword=-0.2, weight_hybrid=0.05)
    got = fold_weights_windowed(df, state).orderBy("query_id").collect()

    st = state
    for r in got:
        d = r.asDict()
        assert d["chosen"] == choose_with_state(d | {
            "heuristic_keyword": d["heuristic_keyword"],
            "heuristic_vector": d["heuristic_vector"],
            "heuristic_hybrid": d["heuristic_hybrid"],
        }, st)
        assert math.isclose(d["w_vector"], st.weight_vector, abs_tol=1e-12)
        assert math.isclose(d["w_keyword"], st.weight_keyword, abs_tol=1e-12)
        assert math.isclose(d["w_hybrid"], st.weight_hybrid, abs_tol=1e-12)
        st = update_from_scores(
            st, {"vector": d["s_vec"], "keyword": d["s_key"], "hybrid": d["s_hyb"]}
        )
    last = got[-1].asDict()
    assert math.isclose(last["w_vector"] + last["d_vector"], st.weight_vector, abs_tol=1e-12)
    assert math.isclose(last["w_keyword"] + last["d_keyword"], st.weight_keyword, abs_tol=1e-12)
    assert math.isclose(last["w_hybrid"] + last["d_hybrid"], st.weight_hybrid, abs_tol=1e-12)


def test_windowed_fold_has_no_unpartitioned_window(spark):
    """The fold's physical plan must not funnel all label rows through a
    single partition: every WindowExec is partitioned by the chunk key
    (chunked two-pass prefix sum), and a non-representable lr still
    matches the driver fold exactly (integer-unit accumulation)."""
    import re

    from beyond_vector_search_spark.operators.evaluate import fold_weights_windowed
    from beyond_vector_search_spark.operators.router import RouterState, delta_units

    rows = [
        (f"Q-{i:03d}", float(i % 4) / 3, float((i + 1) % 3) / 2, float(i % 2), 0.1, 0.2, 0.3)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "query_id STRING, s_vec DOUBLE, s_key DOUBLE, s_hyb DOUBLE, "
        "heuristic_keyword DOUBLE, heuristic_vector DOUBLE, heuristic_hybrid DOUBLE",
    )
    state = RouterState(lr=0.1)  # 0.1 has no exact binary representation
    out = fold_weights_windowed(df, state, n_chunks=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Window \[", plan):
        window_line = plan[m.start():].split("\n")[0]
        assert "partitionBy" not in window_line or "_chunk" in window_line
    # every windowspecdefinition in the plan must carry a partition key
    assert "Window [" not in plan or "_chunk" in plan

    got = out.orderBy("query_id").collect()
    units = {"vector": 0, "keyword": 0, "hybrid": 0}
    half = state.lr / 2.0
    for r in got:
        d = r.asDict()
        # closed form: weights BEFORE row == w0 + units*(lr/2), exactly
        assert d["w_vector"] == units["vector"] * half
        assert d["w_keyword"] == units["keyword"] * half
        assert d["w_hybrid"] == units["hybrid"] * half
        for name, m in delta_units(
            {"vector": d["s_vec"], "keyword": d["s_key"], "hybrid": d["s_hyb"]}
        ).items():
            units[name] += m
        assert d["wafter_vector"] == units["vector"] * half


def test_strategy_eval_answers_path_parity(ref_labels, ref_corpus, ref_index):
    """strategy_eval(answers=...) — the precomputed-answers path the
    eval-loop catalog entry uses to derive all strategies from ONE
    tagged-union generate_answers pass — is row-identical to the
    from-top-k path, including via composite-tagged ids."""
    import pyspark.sql.functions as F

    from beyond_vector_search_spark.operators.answer import generate_answers
    from beyond_vector_search_spark.operators.evaluate import strategy_eval
    from beyond_vector_search_spark.operators.retrieval import search_all, stable_topk

    queries = ref_labels.select("query_id", "query")
    tops = search_all(queries, ref_index, k=5)

    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731

    # direct answers= handoff
    ans = generate_answers(tops["keyword"], ref_corpus, queries, title_col="title")
    direct = strategy_eval(None, None, ref_labels, title_col="title", answers=ans)
    base = strategy_eval(tops["keyword"], ref_corpus, ref_labels, title_col="title")
    assert rows(direct) == rows(base)

    # tagged-union handoff (the q_eval_loop shape): two strategies in
    # one generate_answers pass, split by prefix
    def tag_qid(tag):
        return F.concat(F.lit(tag + "|"), F.col("query_id")).alias("query_id")

    union_topk = tops["keyword"].select(tag_qid("keyword"), "doc_id", "score", "rank").unionByName(
        tops["vector"].select(tag_qid("vector"), "doc_id", "score", "rank")
    )
    queries2 = queries.select(tag_qid("keyword"), "query").unionByName(
        queries.select(tag_qid("vector"), "query")
    )
    ans_all = generate_answers(union_topk, ref_corpus, queries2, title_col="title")
    for s in ("keyword", "vector"):
        pre = s + "|"
        b = ans_all.where(F.col("query_id").startswith(pre)).withColumn(
            "query_id", F.expr(f"substring(query_id, {len(pre) + 1})")
        )
        got = strategy_eval(None, None, ref_labels, title_col="title", answers=b)
        want = strategy_eval(tops[s], ref_corpus, ref_labels, title_col="title")
        assert rows(got) == rows(want), s


def test_strategy_eval_tagged_matches_per_strategy(ref_labels, ref_corpus, ref_index):
    """strategy_eval_tagged (one relation, one labels join, all
    strategies) produces exactly the per-strategy strategy_eval rows —
    the q_eval_loop merged collapse rests on this equivalence."""
    from pyspark.sql import functions as F

    from beyond_vector_search_spark.operators.answer import generate_answers
    from beyond_vector_search_spark.operators.evaluate import (
        strategy_eval,
        strategy_eval_tagged,
    )
    from beyond_vector_search_spark.operators.retrieval import search_all

    queries = ref_labels.select("query_id", "query")
    tops = search_all(queries, ref_index, k=5)

    def tag_qid(tag):
        return F.concat(F.lit(tag + "|"), F.col("query_id")).alias("query_id")

    union_topk = tops["keyword"].select(tag_qid("keyword"), "doc_id", "score", "rank").unionByName(
        tops["vector"].select(tag_qid("vector"), "doc_id", "score", "rank")
    )
    queries2 = queries.select(tag_qid("keyword"), "query").unionByName(
        queries.select(tag_qid("vector"), "query")
    )
    ans_all = generate_answers(union_topk, ref_corpus, queries2, title_col="title")
    tagged = strategy_eval_tagged(ans_all, ref_labels, ("keyword", "vector"))
    for s in ("keyword", "vector"):
        got = sorted(
            map(tuple, tagged.where(F.col("tag") == s).drop("tag").collect())
        )
        want = sorted(
            map(
                tuple,
                strategy_eval(tops[s], ref_corpus, ref_labels, title_col="title").collect(),
            )
        )
        assert got == want, s


def test_eval_loop_first_call_job_count(spark):
    """The catalog eval-loop entry is paid on every driver correctness
    check; its first call must stay micro-stage-lean.  r9: ~44 jobs,
    r10 (tagged-union answers): 23, r11 (tagged evals + AQE-off scope +
    labels from the answers pass): measured 9 — pin ≤ 15 so a future
    edit can't quietly reintroduce the per-strategy fill jobs."""
    from beyond_vector_search_spark.plans.coverage_queries import q_eval_loop
    from beyond_vector_search_spark.plans.entry_queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    # warm the shared index memo the way the driver window does
    REGISTRY["bm25_topk"][0](spark, sf).count()
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    q_eval_loop(spark, sf).count()
    jobs = set(tracker.getJobIdsForGroup(None)) - before
    assert len(jobs) <= 15, f"eval loop first call ran {len(jobs)} jobs"
