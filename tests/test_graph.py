"""PageRank (fixed-point integer) + kNN edge construction tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from beyond_vector_search_spark.operators.graph import (
    RANK_SCALE,
    _damping_fraction,
    knn_edges,
    pagerank,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_damping_fraction_exact():
    assert _damping_fraction(0.85) == (17, 20)
    assert _damping_fraction(0.5) == (1, 2)


def test_pagerank_cycle_is_stationary(spark):
    # a 3-cycle is already the stationary distribution: every iteration
    # reproduces u = S//3 exactly (integer arithmetic, zero drift)
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    got = {r["id"]: r for r in pagerank(e, n_iter=4).collect()}
    assert all(r["rank_units"] == RANK_SCALE // 3 for r in got.values())
    assert all(r["in_deg"] == 1 for r in got.values())


def test_pagerank_hand_computed_one_step(spark):
    # a->b, a->c, b->c; N=3, u0 = 333333333, base//N = 50000000
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    got = {r["id"]: r for r in pagerank(e, n_iter=1).collect()}
    assert got[1]["rank_units"] == 50_000_000  # no in-links: (1-d)/N
    assert got[2]["rank_units"] == 50_000_000 + (17 * (333333333 // 2)) // 20
    assert (
        got[3]["rank_units"]
        == 50_000_000 + (17 * (333333333 // 2 + 333333333)) // 20
    )
    assert got[1]["in_deg"] == 0 and got[3]["in_deg"] == 2
    # the float view is the rounded unit value
    for r in got.values():
        assert r["rank"] == round(r["rank_units"] / RANK_SCALE, 9)


def test_pagerank_sink_authority_ordering(spark):
    # everything points at node 9: it must out-rank its sources
    e = _edges(spark, [(i, 9) for i in range(1, 5)] + [(9, 1)])
    got = {r["id"]: r["rank_units"] for r in pagerank(e, n_iter=5).collect()}
    assert got[9] > max(v for k, v in got.items() if k != 9)


def test_pagerank_mass_is_bounded(spark):
    # integer truncation only ever LOSES mass: total stays in (0, S]
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)])
    total = (
        pagerank(e, n_iter=6)
        .agg(F.sum("rank_units").alias("t"))
        .collect()[0]["t"]
    )
    assert 0 < total <= RANK_SCALE


def test_knn_edges_shape(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [0.1, 0.9]),
        ],
        "vec_id long, embedding array<double>",
    )
    e = knn_edges(emb, k=2).collect()
    by_src: dict[int, set[int]] = {}
    for r in e:
        assert r["src"] != r["dst"]
        by_src.setdefault(r["src"], set()).add(r["dst"])
    assert all(len(d) == 2 for d in by_src.values())
    assert 2 in by_src[1] and 4 in by_src[3]


def test_personalized_pagerank_hand_computed(spark):
    # 3-cycle, seed = node 1 only: mass starts and teleports at the
    # seed; after one step the seed's successor holds d * S exactly
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {
        r["id"]: r["rank_units"]
        for r in pagerank(e, n_iter=1, seeds=seeds).collect()
    }
    base = (20 - 17) * RANK_SCALE // 20  # (1-d)*S
    assert got[1] == base  # seed: teleport mass only after 1 step
    assert got[2] == (17 * RANK_SCALE) // 20  # d * u0(seed)
    assert got[3] == 0


def test_personalized_pagerank_concentrates_near_seed(spark):
    # star + tail: with the hub as seed, ranks must be seed-centric and
    # nodes unreachable from the seed get zero
    e = _edges(
        spark,
        [(1, 2), (2, 1), (2, 3), (3, 1), (9, 8)],  # 9->8 disconnected from 1
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {
        r["id"]: r["rank_units"]
        for r in pagerank(e, n_iter=6, seeds=seeds).collect()
    }
    assert got[1] > got[2] > got[3] > 0
    assert got[8] == 0 and got[9] == 0
    # seeds absent from the graph are ignored (mass still normalizes
    # over seeds that exist)
    seeds2 = spark.createDataFrame([(1,), (777,)], "id long")
    got2 = {
        r["id"]: r["rank_units"]
        for r in pagerank(e, n_iter=6, seeds=seeds2).collect()
    }
    assert got2 == got


def test_pagerank_deep_iteration_converges(spark):
    """Deep runs (crossing the checkpoint_every lineage cut) converge:
    on a strongly-connected graph the integer fixpoint stabilizes and
    further iterations are no-ops; the cut itself must not perturb the
    trajectory (20 iters with cuts == 20 iters without)."""
    e = _edges(
        spark, [(1, 2), (2, 3), (3, 1), (3, 2), (1, 3), (2, 1)]
    )
    with_cut = {
        r["id"]: r["rank_units"]
        for r in pagerank(e, n_iter=20, checkpoint_every=4).collect()
    }
    no_cut = {
        r["id"]: r["rank_units"]
        for r in pagerank(e, n_iter=20, checkpoint_every=None).collect()
    }
    assert with_cut == no_cut
    more = {
        r["id"]: r["rank_units"]
        for r in pagerank(e, n_iter=21, checkpoint_every=4).collect()
    }
    assert more == with_cut  # fixpoint reached


def test_pagerank_plan_shape_pinned(spark):
    """Exchange-count regression pin (the r9-vs-r10 audit discrepancy,
    reconciled): the STATIC plan for n_iter iterations carries exactly
    2*n_iter shuffle exchanges — n_iter per-iteration aggregations,
    (n_iter - 1) re-shuffles of the checkpointed iteration-invariant
    ``ed`` relation (iteration 1's rank side broadcasts instead), and
    one in-degree aggregation.  At RUNTIME the ed exchanges are
    byte-identical, so AQE's exchange reuse dedups them — the final
    adaptive plan must contain ReusedExchange nodes and execute fewer
    shuffle stages than the static count (this is how r9 measured 8
    where the static audit shows 10).  A future edit that breaks either
    layer — adds a per-iteration shuffle, or de-canonicalizes ed so
    reuse stops firing — fails here."""
    import contextlib
    import io
    import re

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    def shuffle_keys(plan):
        """hashpartitioning key column of every shuffle Exchange."""
        keys = []
        for m in re.finditer(
            r"\(\d+\) Exchange\b.*?hashpartitioning\((\w+)#\d+", plan, re.S
        ):
            keys.append(m.group(1))
        return keys

    e = _edges(
        spark,
        [(i, (i * 3 + 1) % 40) for i in range(40)]
        + [(i, (i * 7 + 2) % 40) for i in range(40)],
    )
    for n_iter in (3, 5):
        pr = pagerank(e, n_iter=n_iter)
        static = plan_of(pr)
        keys = shuffle_keys(static)
        # one aggregation shuffle per iteration — never more
        assert keys.count("id") == n_iter, (static, keys)
        # one in-degree aggregation
        assert keys.count("dst") == 1, keys
        # ed re-shuffles: at most one per SMJ iteration plus possibly
        # iteration 1's rank side (when Catalyst lacks broadcast stats)
        assert keys.count("src") <= n_iter + 1, keys
        assert len(keys) <= 2 * n_iter + 2, keys
        pr.collect()
        final = plan_of(pr)
        assert "isFinalPlan=true" in final
        reused = final.count("ReusedExchange")
        assert reused >= 1, (
            "AQE exchange reuse stopped firing on the iteration-"
            "invariant ed relation — each iteration now pays its own "
            "edge-sized shuffle write"
        )
