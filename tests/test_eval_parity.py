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
