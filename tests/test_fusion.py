"""Fusion / expansion / diversification operators (operators/fusion.py)
and the chunking / Gopher / bigram-LM pipeline additions
(operators/pretrain.py).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import fusion as fu
from beyond_vector_search_spark.operators import pretrain as pt
from beyond_vector_search_spark.operators.corpus_index import build_index


@pytest.fixture(scope="module")
def tiny_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark joins shuffle data across the cluster"),
            (2, "broadcast joins avoid the shuffle for small tables"),
            (3, "window functions rank data rows within partitions"),
            (4, "spark joins shuffle data across the cluster"),  # dup of 1
            (5, "completely unrelated cooking recipe with garlic and onions"),
        ],
        "doc_id long, text string",
    )
    return docs, build_index(docs).cache()


# ------------------------------- RRF ---------------------------------------


def test_rrf_scores_exact(spark):
    # two arms with known per-query orderings: scores don't matter,
    # only ranks do
    k = spark.createDataFrame(
        [("q", 1, 9.0), ("q", 2, 5.0), ("q", 3, 1.0)],
        "query_id string, doc_id long, score double",
    )
    v = spark.createDataFrame(
        [("q", 2, 0.9), ("q", 3, 0.8)],
        "query_id string, doc_id long, score double",
    )
    out = {
        r["doc_id"]: r["score"]
        for r in fu.rrf_scores({"k": k, "v": v}, k0=60).collect()
    }
    assert out[1] == pytest.approx(1 / 61)          # rank 1 keyword only
    assert out[2] == pytest.approx(1 / 62 + 1 / 61)  # rank 2 + rank 1
    assert out[3] == pytest.approx(1 / 63 + 1 / 62)
    # doc 2 fuses highest despite being keyword rank 2
    assert max(out, key=out.get) == 2


def test_rrf_empty_arms_raises(spark):
    with pytest.raises(ValueError, match="no arms"):
        fu.rrf_scores({})


def test_rrf_per_arm_truncation(spark):
    k = spark.createDataFrame(
        [("q", i, 10.0 - i) for i in range(1, 6)],
        "query_id string, doc_id long, score double",
    )
    out = fu.rrf_scores({"k": k}, k0=60, per_arm_k=2).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


# ------------------------------- PRF ---------------------------------------


def test_prf_expansion_finds_related_doc(spark, tiny_index):
    docs, idx = tiny_index
    queries = spark.createDataFrame(
        [("q1", "shuffle cluster")], "query_id string, query string"
    )
    from beyond_vector_search_spark.operators.retrieval import bm25_scores
    from beyond_vector_search_spark.config import EngineConfig

    cfg = EngineConfig(include_zero_score_docs=False)
    base = bm25_scores(queries, idx, cfg=cfg)
    base_docs = {r["doc_id"] for r in base.collect()}
    # doc 3 shares no term with the query — the first pass cannot reach it
    assert 3 not in base_docs

    exp = fu.prf_expansion_terms(queries, idx, base, n_feedback=3, n_terms=10)
    exp_terms = {r["term"] for r in exp.collect()}
    # original query terms are excluded from the expansion set
    assert not exp_terms & {"shuffle", "cluster"}
    # expansion mines feedback-doc vocabulary ("joins", "data", ...)
    assert "joins" in exp_terms and "data" in exp_terms

    scored = fu.prf_bm25_scores(queries, idx, base, cfg=cfg, n_feedback=3, n_terms=10)
    prf_docs = {r["doc_id"] for r in scored.collect()}
    # the expansion pass pulls in docs matched only via expansion terms
    assert base_docs <= prf_docs and len(prf_docs) > len(base_docs)


def test_prf_beta_zero_is_identity_ranking(spark, tiny_index):
    docs, idx = tiny_index
    queries = spark.createDataFrame(
        [("q1", "spark shuffle")], "query_id string, query string"
    )
    from beyond_vector_search_spark.operators.retrieval import bm25_scores
    from beyond_vector_search_spark.config import EngineConfig

    cfg = EngineConfig(include_zero_score_docs=False)
    base = bm25_scores(queries, idx, cfg=cfg)
    scored = fu.prf_bm25_scores(queries, idx, base, cfg=cfg, beta=0.0)
    merged = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in base.collect()
    }
    for r in scored.collect():
        key = (r["query_id"], r["doc_id"])
        if key in merged:  # docs matched only by expansion gain score 0
            assert r["score"] == pytest.approx(merged[key])
        else:
            assert r["score"] == pytest.approx(0.0)


# ------------------------------- MMR ---------------------------------------


def test_mmr_diversifies_duplicates(spark, tiny_index):
    docs, idx = tiny_index
    # candidates: doc 1 and its exact duplicate doc 4 lead on
    # relevance; docs 2/3 trail.  Pure relevance would pick 1 then 4;
    # MMR must demote the duplicate.
    cand = spark.createDataFrame(
        [("q", 1, 0.95), ("q", 4, 0.94), ("q", 2, 0.90), ("q", 3, 0.85)],
        "query_id string, doc_id long, score double",
    )
    out = fu.mmr_rerank(cand, idx, k=3, lam=0.7)
    picked = [r["doc_id"] for r in out.orderBy("mmr_rank").collect()]
    assert picked[0] == 1
    assert picked[1] != 4  # the duplicate is NOT the second pick
    assert 4 not in picked[:2]


def test_mmr_lam_one_is_relevance_order(spark, tiny_index):
    docs, idx = tiny_index
    cand = spark.createDataFrame(
        [("q", 1, 0.95), ("q", 4, 0.94), ("q", 2, 0.5)],
        "query_id string, doc_id long, score double",
    )
    out = fu.mmr_rerank(cand, idx, k=3, lam=1.0)
    picked = [r["doc_id"] for r in out.orderBy("mmr_rank").collect()]
    assert picked == [1, 4, 2]


def test_mmr_rerank_releases_candidate_cache(spark, tiny_index):
    """The per-call candidate cache is scoped to the returned DataFrame:
    repeated mmr_rerank calls in a long-lived session must not
    accumulate cached relations (weakref-finalizer release)."""
    import gc

    docs, idx = tiny_index
    jsc = spark.sparkContext._jsc.sc()

    def n_persistent() -> int:
        return jsc.getPersistentRDDs().size()

    cand = spark.createDataFrame(
        [("q", 1, 0.95), ("q", 4, 0.94), ("q", 2, 0.90)],
        "query_id string, doc_id long, score double",
    )
    # Warm-up call BEFORE measuring the baseline: the module fixture's
    # index is .cache()'d, and SQL caches register in the persistent-RDD
    # map lazily at their first materializing action — which, depending
    # on which earlier tests ran, can be THIS test's first count().
    # Those index caches live as long as the index (correctly), so they
    # must be inside `base`, not counted against the per-call candidate
    # cache this test pins.  (Was a real solo-run failure, not a flake:
    # base==0 solo, then the index cache materialized mid-loop.)
    warm = fu.mmr_rerank(cand, idx, k=2, lam=0.7)
    assert warm.count() > 0
    del warm
    import time

    gc.collect()
    deadline = time.time() + 30
    prev = n_persistent()
    while time.time() < deadline:
        gc.collect()
        time.sleep(0.5)
        cur = n_persistent()
        if cur == prev:
            break
        prev = cur
    base = n_persistent()
    rounds = 12
    for _ in range(rounds):
        out = fu.mmr_rerank(cand, idx, k=2, lam=0.7)
        assert out.count() > 0
        del out
        gc.collect()
    # The contract under test is NO ACCUMULATION: a leak retains one
    # cached relation per call (final ≈ base + rounds), while a correct
    # release keeps the count bounded regardless of rounds.  Assert the
    # bound rather than exact return-to-base: the release path is a
    # weakref finalizer whose last 1-2 firings can lag a loaded
    # interpreter past any fixed deadline (observed under full-suite
    # load), and O(1) stragglers are not a leak.  Poll first so the
    # common case settles all the way back to base.
    import time

    deadline = time.time() + 30
    while n_persistent() > base and time.time() < deadline:
        gc.collect()
        time.sleep(0.5)
    assert n_persistent() <= base + 2, (n_persistent(), base, rounds)


def test_candidate_pair_sims_duplicate_is_one(spark, tiny_index):
    docs, idx = tiny_index
    cand = spark.createDataFrame(
        [("q", 1, 1.0), ("q", 4, 1.0), ("q", 5, 0.1)],
        "query_id string, doc_id long, score double",
    )
    sims = {
        (r["doc_a"], r["doc_b"]): r["sim"]
        for r in fu.candidate_pair_sims(cand, idx).collect()
    }
    assert sims[(1, 4)] == pytest.approx(1.0)  # identical docs
    # unrelated docs share almost nothing
    assert sims.get((1, 5), 0.0) < 0.3


# ----------------------------- chunking ------------------------------------


def _chunks(spark, text, size, overlap):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return (
        pt.chunk_documents(df, size=size, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )


def test_chunk_exact_window(spark):
    text = " ".join(f"w{i}" for i in range(64))
    rows = _chunks(spark, text, 64, 16)
    assert len(rows) == 1
    assert rows[0]["n_chunk_tokens"] == 64
    assert rows[0]["start"] == 0


def test_chunk_one_past_window(spark):
    # 65 tokens: second window starts at 48 and has 17 tokens (> overlap)
    text = " ".join(f"w{i}" for i in range(65))
    rows = _chunks(spark, text, 64, 16)
    assert [(r["start"], r["n_chunk_tokens"]) for r in rows] == [(0, 64), (48, 17)]
    assert [r["chunk_id"] for r in rows] == [0, 1]


def test_chunk_tail_fully_overlapped_not_emitted(spark):
    # 70 tokens: window at 48 covers 48..69 (22 new tokens) — emitted;
    # there is no window at 96.  At 64+16=80 tokens the offset-64...
    # check the boundary: n = size + overlap exactly -> second chunk
    # would add zero new tokens beyond overlap and IS still emitted
    # only while offset + overlap < n.
    text = " ".join(f"w{i}" for i in range(80))
    rows = _chunks(spark, text, 64, 16)
    # offsets: range(0, max(80-16,1)-1 = 63, 48) -> 0, 48
    assert [r["start"] for r in rows] == [0, 48]
    assert rows[1]["n_chunk_tokens"] == 32


def test_chunk_short_and_empty_docs(spark):
    assert len(_chunks(spark, "one two three", 64, 16)) == 1
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert pt.chunk_documents(df, size=64, overlap=16).count() == 0


def test_chunk_reconstruction(spark):
    # stride-prefixes of all chunks + the last chunk reconstruct the doc
    text = " ".join(f"w{i}" for i in range(150))
    rows = _chunks(spark, text, 64, 16)
    rebuilt: list[str] = []
    for i, r in enumerate(rows):
        toks = r["chunk_text"].split(" ")
        rebuilt.extend(toks if i == len(rows) - 1 else toks[:48])
    assert " ".join(rebuilt) == text


def test_chunk_invalid_overlap(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pt.chunk_documents(df, size=16, overlap=16)


# --------------------------- Gopher quality --------------------------------


def test_gopher_flags(spark):
    good = "the quick brown fox jumps over the lazy dog and that " + " ".join(
        f"word{i}" for i in range(45)
    )  # >= 50 words, stopwords present, alphabetic
    short = "too short"
    symbols = "the of " + " ".join(["###"] * 60)
    no_alpha = "the of " + " ".join(str(i) for i in range(60))
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, no_alpha)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pt.gopher_quality(df).collect()}
    assert rows[1]["keep"]
    assert not rows[2]["flag_word_count"] and not rows[2]["keep"]
    assert not rows[3]["flag_symbol"] and not rows[3]["keep"]
    assert not rows[4]["flag_alpha"] and not rows[4]["keep"]


def test_gopher_stopword_rule(spark):
    text = " ".join(f"noun{i}" for i in range(60))  # zero stopwords
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = pt.gopher_quality(df).first()
    assert row["n_stopwords"] == 0 and not row["flag_stopwords"]


# --------------------------- bigram log-ppl --------------------------------


def test_bigram_logppl_hand_computed(spark):
    # corpus: "a b a b" and "a b c": bigrams ab(x2+1)=3, ba=1, bc=1
    # unigrams: a=3, b=3, c=1, N=7
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in pt.bigram_logppl(df, lam=0.9).collect()}
    p_ab = 0.9 * (3 / 3) + (1.0 - 0.9) * (3 / 7)
    p_ba = 0.9 * (1 / 3) + (1.0 - 0.9) * (3 / 7)
    p_bc = 0.9 * (1 / 3) + (1.0 - 0.9) * (1 / 7)
    exp1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    exp2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["logppl2"] == pytest.approx(exp1, abs=1e-6)
    assert rows[2]["logppl2"] == pytest.approx(exp2, abs=1e-6)


def test_bigram_logppl_skips_single_token_docs(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens")], "doc_id long, text string"
    )
    out = pt.bigram_logppl(df).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_bigram_repetitive_doc_scores_lower(spark):
    # a doc repeating one common bigram has lower perplexity than a
    # doc of corpus-rare transitions
    common = " ".join(["the cat"] * 20)
    rare = "zephyr quixotic bramble ossify lurid vexing"
    filler = [(i, common) for i in range(3, 10)]
    df = spark.createDataFrame(
        [(1, common), (2, rare)] + filler, "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["logppl2"] for r in pt.bigram_logppl(df).collect()}
    assert rows[1] < rows[2]


# --------------------------- semantic dedup --------------------------------


def test_semantic_dedup_collapses_planted_copies(spark):
    """The semantic_dedup catalog entry: scaled copies and ±2% wobbles
    must cluster under their base vector — exactly the base corpus
    stays canonical."""
    from beyond_vector_search_spark.plans.coverage_queries import q_semantic_dedup

    out = q_semantic_dedup(spark, "/root/testdata/sf0.001").collect()
    canon = [r["vec_id"] for r in out if r["is_canonical"]]
    assert sorted(canon) == list(range(100))
    by_id = {r["vec_id"]: r["cluster_id"] for r in out}
    for i in range(50):
        assert by_id[i + 100000] == by_id[i]  # scaled copy joins base
    for i in range(10):
        assert by_id[i + 200000] == by_id[i]  # wobble joins base


# ------------------------ DSIR importance weights --------------------------


def test_dsir_prefers_target_like_docs(spark):
    """Documents sharing the target domain's bigrams score higher than
    off-domain documents."""
    target = spark.createDataFrame(
        [(100 + i, "machine learning model training loss gradient descent")
         for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "machine learning model training converges"),
            (2, "garlic onion soup recipe with fresh bread"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["logw"] for r in pt.dsir_logweights(raw, target).collect()}
    assert rows[1] > rows[2]


def test_dsir_plan_is_lazy(spark):
    """Constructing the DSIR plan must launch no Spark job (the totals
    ride in as broadcast 1-row aggregates, not eager counts)."""
    docs = spark.createDataFrame(
        [(i, f"token{i} token{i+1} token{i+2}") for i in range(20)],
        "doc_id long, text string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = pt.dsir_logweights(docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1"))
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before
    assert df.count() > 0  # and it still executes


# --------------------------- spell correction ------------------------------


def test_spell_suggestions_finds_typo(spark, tiny_index):
    docs, idx = tiny_index
    terms = spark.createDataFrame([("shufle",), ("brodcast",)], "term string")
    out = fu.spell_suggestions(terms, idx)
    best = {
        r["term"]: r["suggestion"]
        for r in out.where("rank = 1").collect()
    }
    assert best["shufle"] == "shuffle"
    assert best["brodcast"] == "broadcast"
    # distances are true edit distances
    for r in out.collect():
        assert r["distance"] <= 2


def test_spell_suggestions_no_self_match(spark, tiny_index):
    docs, idx = tiny_index
    terms = spark.createDataFrame([("shuffle",)], "term string")  # in-vocab
    out = fu.spell_suggestions(terms, idx).collect()
    assert all(r["suggestion"] != "shuffle" for r in out)


# ----------------------------- phrase search -------------------------------


def test_phrase_counts_exact_and_overlapping(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),       # "a b a" occurs at 1 and 3 (overlap)
            (2, "a b"),             # too short for "a b a"
            (3, "x y z"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["phrase"]): r["phrase_tf"]
        for r in fu.phrase_counts(df, ["a b a", "a b"]).collect()
    }
    assert rows[(1, "a b a")] == 2      # overlapping starts counted
    assert rows[(1, "a b")] == 2
    assert rows[(2, "a b")] == 1
    assert (2, "a b a") not in rows     # doc shorter than phrase
    assert not any(d == 3 for d, _ in rows)  # non-matching doc absent


def test_phrase_counts_tokenizes_phrase(spark):
    # phrase tokenization matches document tokenization (case, punct)
    df = spark.createDataFrame([(1, "Spark JOIN performance")], "doc_id long, text string")
    rows = fu.phrase_counts(df, ["spark join"]).collect()
    assert rows and rows[0]["phrase_tf"] == 1


# --------------------- parquet-loaded index path ---------------------------


def test_fusion_ops_on_loaded_index(spark, tiny_index, tmp_path):
    """mmr/spell work identically on an index reloaded from parquet
    (no gram_tf — candidate_pair_sims takes the flat doc_vec branch)."""
    from beyond_vector_search_spark.operators.corpus_index import CorpusIndex

    docs, idx = tiny_index
    path = str(tmp_path / "idx")
    idx.save(path)
    loaded = CorpusIndex.load(spark, path)
    assert getattr(loaded, "gram_tf", None) is None

    cand = spark.createDataFrame(
        [("q", 1, 0.95), ("q", 4, 0.94), ("q", 2, 0.90)],
        "query_id string, doc_id long, score double",
    )
    live = {(r["doc_a"], r["doc_b"]): r["sim"]
            for r in fu.candidate_pair_sims(cand, idx).collect()}
    cold = {(r["doc_a"], r["doc_b"]): r["sim"]
            for r in fu.candidate_pair_sims(cand, loaded).collect()}
    assert set(live) == set(cold)
    for k in live:
        assert live[k] == pytest.approx(cold[k], abs=1e-9)

    live_mmr = [(r["doc_id"], r["mmr_rank"])
                for r in fu.mmr_rerank(cand, idx, k=3).orderBy("mmr_rank").collect()]
    cold_mmr = [(r["doc_id"], r["mmr_rank"])
                for r in fu.mmr_rerank(cand, loaded, k=3).orderBy("mmr_rank").collect()]
    assert live_mmr == cold_mmr

    terms = spark.createDataFrame([("shufle",)], "term string")
    cold_spell = fu.spell_suggestions(terms, loaded).where("rank = 1").first()
    assert cold_spell["suggestion"] == "shuffle"


# --------------------------- proximity search ------------------------------


def test_proximity_counts_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "spark is a fast join engine spark join"),
            (2, "spark only here"),
            (3, "join appears without the other word nearby nearby nearby spark"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"]): r
        for r in fu.proximity_counts(df, [("spark", "join")], window=3).collect()
    }
    # doc 1: spark@{1,7}, join@{5,8} -> min |7-8| = 1
    assert rows[1]["min_dist"] == 1
    # pairs within 3: (1,?): |1-5|=4 no; (7,5)=2 yes; (7,8)=1 yes; (1,8)=7 no
    assert rows[1]["n_within"] == 2
    # doc 2 lacks 'join' -> absent
    assert 2 not in rows
    # doc 3: join@1, spark@10 -> min 9, none within 3
    assert rows[3]["min_dist"] == 9 and rows[3]["n_within"] == 0


def test_phrase_and_proximity_kernel_matches_expression(spark):
    """The r13-opt Arrow kernels equal the expression forms row for row
    on testdata + edge docs (empty text, doc shorter than the phrase,
    repeated terms, max_positions cap)."""
    from beyond_vector_search_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    extra = spark.createDataFrame(
        [
            (60_001, ""),
            (60_002, "spark"),
            (60_003, "spark join spark join spark join"),
            (60_004, "SPARK Join mixed case query"),
        ],
        "doc_id BIGINT, text STRING",
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    phrases = ["spark join", "slow query", "spark"]
    pk = sorted(map(tuple, fu.phrase_counts(both, phrases).collect()))
    pe = sorted(map(tuple, fu.phrase_counts(both, phrases, kernel=False).collect()))
    assert pk == pe
    pairs = [("spark", "join"), ("slow", "query")]
    for mp in (None, 2):
        xk = sorted(
            map(
                tuple,
                fu.proximity_counts(both, pairs, window=5, max_positions=mp).collect(),
            )
        )
        xe = sorted(
            map(
                tuple,
                fu.proximity_counts(
                    both, pairs, window=5, max_positions=mp, kernel=False
                ).collect(),
            )
        )
        assert xk == xe, mp


def test_proximity_counts_python_parity(spark):
    import random

    rng = random.Random(11)
    alphabet = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(0, 25))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["min_dist"], r["n_within"])
        for r in fu.proximity_counts(df, [("a", "b")], window=2).collect()
    }
    for doc_id, text in docs:
        toks = text.split(" ") if text else []
        pa = [i for i, t in enumerate(toks) if t == "a"]
        pb = [i for i, t in enumerate(toks) if t == "b"]
        dists = [abs(x - y) for x in pa for y in pb]
        if dists:
            assert got[doc_id] == (min(dists), sum(1 for d in dists if d <= 2))
        else:
            assert doc_id not in got


# ------------------------ persisted-tokens variant -------------------------


def test_bigram_logppl_persisted_tokens_matches_and_skips_text(spark, tmp_path):
    """Passing a persisted (doc_id, toks) relation must (a) produce the
    exact same result as tokenizing in-flight and (b) never scan the
    document text — the incremental 100 TB form."""
    from beyond_vector_search_spark.operators.corpus_index import doc_tokens

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x y x y z")], "doc_id long, text string"
    )
    path = str(tmp_path / "toks")
    doc_tokens(df).write.parquet(path)
    toks = spark.read.parquet(path)

    base = {r["doc_id"]: r for r in pt.bigram_logppl(df).collect()}
    via_toks = pt.bigram_logppl(df, tokens=toks)
    got = {r["doc_id"]: r for r in via_toks.collect()}
    assert set(got) == set(base)
    for k in base:
        assert got[k]["logppl2"] == base[k]["logppl2"]
        assert got[k]["n_bigrams"] == base[k]["n_bigrams"]
    # the text column never appears in the executed plan: every scan
    # reads the tokens parquet, zero scans of the documents relation
    plan = via_toks._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan


def test_dsir_persisted_tokens_matches(spark, tmp_path):
    from beyond_vector_search_spark.operators.corpus_index import doc_tokens

    docs = spark.createDataFrame(
        [(i, f"alpha bravo token{i} token{i+1}") for i in range(12)],
        "doc_id long, text string",
    )
    raw, target = docs.where("doc_id % 2 = 0"), docs.where("doc_id % 2 = 1")
    rp, tp = str(tmp_path / "raw"), str(tmp_path / "tgt")
    doc_tokens(raw).write.parquet(rp)
    doc_tokens(target).write.parquet(tp)
    base = {r["doc_id"]: r["logw"] for r in pt.dsir_logweights(raw, target).collect()}
    via = pt.dsir_logweights(
        raw, target,
        raw_tokens=spark.read.parquet(rp),
        target_tokens=spark.read.parquet(tp),
    )
    got = {r["doc_id"]: r["logw"] for r in via.collect()}
    assert got == base
    plan = via._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan


def test_unigram_logppl_persisted_tokens_matches(spark):
    from beyond_vector_search_spark.operators.corpus_index import doc_tokens

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "a c c c")], "doc_id long, text string"
    )
    base = {r["doc_id"]: r["logppl"] for r in pt.unigram_logppl(df).collect()}
    got = {
        r["doc_id"]: r["logppl"]
        for r in pt.unigram_logppl(df, tokens=doc_tokens(df)).collect()
    }
    assert got == base


def test_toked_rejects_bad_tokens_relation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    bad = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError, match="toks"):
        pt.bigram_logppl(df, tokens=bad).collect()
