"""BPE tokenizer training/application + NB quality classifier tests.

The trainer's merge loop is checked against hand-worked expectations
(the Sennrich et al. 2016 worked example shape) and its invariants;
segmentation is checked for exact reconstruction; the NB classifier
against hand-computed add-1 counts on a four-document corpus.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import bpe
from beyond_vector_search_spark.operators.bpe import (
    WORD_END,
    _merge_seq,
    apply_merges,
)
from beyond_vector_search_spark.operators.pretrain import (
    nb_quality_scores,
    wordcount_labels,
)


def _wf(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


def test_merge_seq_is_greedy_left_to_right():
    # canonical BPE on a run: pairs merge left-to-right, non-overlapping
    assert _merge_seq(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_seq(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    # a freshly merged symbol does not re-merge within the same step
    assert _merge_seq(["a", "b", "b"], "a", "b") == ["ab", "b"]
    # boundary-exact: 'xa' followed by 'b' is NOT an (a, b) site
    assert _merge_seq(["xa", "b"], "a", "b") == ["xa", "b"]


def test_bpe_train_hand_worked(spark):
    # lo*10 + low*7 + lowest*3: 'l o' and 'o w' dominate
    wf = _wf(spark, [("lo", 10), ("low", 7), ("lowest", 3)])
    merges = bpe.bpe_train(wf, n_merges=3)
    # pair counts at step 0: (l,o)=20, (o,w)=10, (o,</w>)=10, ...
    assert (merges[0]["left"], merges[0]["right"]) == ("l", "o")
    assert merges[0]["pair_freq"] == 20
    # step 1: (lo,w)=10 vs (lo,</w>)=10 — tie broken right ASC:
    # '</w>' < 'w' in binary order
    assert (merges[1]["left"], merges[1]["right"]) == ("lo", WORD_END)
    assert merges[1]["pair_freq"] == 10
    assert [m["rank"] for m in merges] == [0, 1, 2]


def test_bpe_train_early_stop_and_cap(spark):
    # a single 2-char word exhausts after 2 merges
    wf = _wf(spark, [("ab", 5)])
    merges = bpe.bpe_train(wf, n_merges=10)
    assert len(merges) == 2
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "b")
    assert (merges[1]["left"], merges[1]["right"]) == ("ab", WORD_END)
    # max_words keeps the top-by-(freq, word) slice only: with 'qq'
    # cut, the (z, z)/(z, </w>) tie (100 each) breaks right-ASC to
    # '</w>' and the count is the capped table's, not the full one
    wf2 = _wf(spark, [("zz", 100), ("qq", 1)])
    capped = bpe.bpe_train(wf2, n_merges=1, max_words=1)
    assert (capped[0]["left"], capped[0]["right"]) == ("z", WORD_END)
    assert capped[0]["pair_freq"] == 100


def test_apply_merges_reconstructs():
    merges = [("l", "o"), ("lo", "w"), ("w", "e"), ("e", "s")]
    for w in ["low", "lowest", "l", "slow", "we"]:
        pieces = apply_merges(w, merges)
        assert "".join(pieces) == w + WORD_END
        assert all(p for p in pieces)


def test_segment_terms_matches_apply(spark):
    merges = [
        {"rank": 0, "left": "l", "right": "o", "pair_freq": 9},
        {"rank": 1, "left": "lo", "right": "w", "pair_freq": 5},
    ]
    terms = spark.createDataFrame(
        [("low",), ("lot",), ("hollow",)], "term string"
    )
    got = {
        r["term"]: list(r["pieces"])
        for r in bpe.segment_terms(terms, merges).collect()
    }
    assert got["low"] == ["low", WORD_END]
    assert got["lot"] == ["lo", "t", WORD_END]
    assert got["hollow"] == ["h", "o", "l", "low", WORD_END]


def test_bpe_segment_preserves_document_order(spark):
    docs = spark.createDataFrame(
        [(1, "low lot low"), (2, "hollow")], "doc_id long, text string"
    )
    merges = [("l", "o"), ("lo", "w")]
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in bpe.bpe_segment(docs, merges).collect()
    }
    assert got[1] == ["low", WORD_END, "lo", "t", WORD_END, "low", WORD_END]
    assert got[2] == ["h", "o", "l", "low", WORD_END]


def test_piece_stats_zero_merges_are_char_counts(spark):
    docs = spark.createDataFrame([(1, "ab ab"), (2, "b")], "doc_id long, text string")
    rows = {r["piece"]: r for r in bpe.piece_stats(docs, []).collect()}
    assert rows["a"]["n_occurrences"] == 2 and rows["a"]["n_docs"] == 1
    assert rows["b"]["n_occurrences"] == 3 and rows["b"]["n_docs"] == 2
    assert rows[WORD_END]["n_occurrences"] == 3


def test_trained_segmentation_compresses(spark):
    # on the real testdata, 16 merges must shrink the piece stream
    # relative to raw characters (the point of training)
    from beyond_vector_search_spark.plans.bpe_queries import trained_merges
    from beyond_vector_search_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    merges = trained_merges(spark, "/root/testdata/sf0.001")
    assert len(merges) == 16
    stats = bpe.piece_stats(docs, merges)
    n_pieces = stats.agg(F.sum("n_occurrences")).collect()[0][0]
    n_chars = stats.where(F.length("piece") == 1).count()
    baseline = bpe.piece_stats(docs, [])
    n_base = baseline.agg(F.sum("n_occurrences")).collect()[0][0]
    assert n_pieces < n_base
    assert n_chars > 0  # singles remain for rare contexts


# --------------------- NB quality classifier -------------------------------


def test_wordcount_labels(spark):
    docs = spark.createDataFrame(
        [(1, "  one two   three "), (2, "just four words here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in wordcount_labels(docs, min_words=4).collect()}
    assert got == {1: False, 2: True}


def test_nb_quality_scores_hand_computed(spark):
    # class keep: 2 docs over {good}; class toss: 2 docs over {bad};
    # shared token 'x' in one doc of each class.  alpha=1, V=3.
    docs = spark.createDataFrame(
        [
            (1, "good good x"),
            (2, "good"),
            (3, "bad bad x"),
            (4, "bad"),
        ],
        "doc_id long, text string",
    )
    labels = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, False)], "doc_id long, keep boolean"
    )
    got = {
        r["doc_id"]: r for r in nb_quality_scores(docs, labels, alpha=1.0).collect()
    }
    # c1 = {good: 3, x: 1}, N1 = 4; c0 = {bad: 3, x: 1}, N0 = 4; V = 3
    w_good = math.log((3 + 1) / (4 + 3)) - math.log((0 + 1) / (4 + 3))
    w_x = math.log((1 + 1) / (4 + 3)) - math.log((1 + 1) / (4 + 3))
    w_bad = math.log((0 + 1) / (4 + 3)) - math.log((3 + 1) / (4 + 3))
    prior = math.log((2 + 1) / (2 + 1))
    assert got[1]["log_odds"] == pytest.approx(
        round(prior + 2 * w_good + w_x, 6), abs=1e-6
    )
    assert got[4]["log_odds"] == pytest.approx(round(prior + w_bad, 6), abs=1e-6)
    assert got[1]["pred_keep"] and got[2]["pred_keep"]
    assert not got[3]["pred_keep"] and not got[4]["pred_keep"]
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 1


def test_nb_default_label_is_wordcount_rule(spark):
    from beyond_vector_search_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = nb_quality_scores(docs)
    lab = {r["doc_id"]: r["label_keep"] for r in out.collect()}
    rule = {
        r["doc_id"]: r["keep"] for r in wordcount_labels(docs).collect()
    }
    assert lab == rule
    # both classes present on the testdata (the label is usable)
    assert any(lab.values()) and not all(lab.values())


def test_cli_tokenizer_trains_and_persists(spark, tmp_path):
    import argparse

    from beyond_vector_search_spark.cli import cmd_tokenizer

    out_dir = str(tmp_path / "merges")
    out = cmd_tokenizer(
        argparse.Namespace(
            corpus="/root/reference/data/corpus.jsonl",
            docs_parquet=None,
            merges=8,
            max_words=None,
            out=out_dir,
            stats=True,
        )
    )
    assert out["n_merges"] == 8 and len(out["top_pieces"]) == 20
    # the persisted artifact reloads to the identical merge list, and
    # segmentation from the reloaded merges matches in-session training
    from pyspark.sql import functions as F

    from beyond_vector_search_spark.sources.readers import load_corpus

    docs = load_corpus(spark, "/root/reference/data/corpus.jsonl").select(
        "doc_id", F.concat_ws(" ", "title", "text").alias("text")
    )
    trained = bpe.bpe_train(bpe.word_freqs(docs), n_merges=8)
    reloaded = bpe.load_merges(spark, out_dir)
    assert reloaded == trained
    a = {
        r["piece"]: (r["n_occurrences"], r["n_docs"])
        for r in bpe.piece_stats(docs, reloaded).collect()
    }
    b = {
        r["piece"]: (r["n_occurrences"], r["n_docs"])
        for r in bpe.piece_stats(docs, trained).collect()
    }
    assert a == b


def test_duckdb_fold_matches_merge_seq_hypothesis():
    # the cross-engine equivalence the bpe_merges oracle RELIES on:
    # DuckDB's list_reduce fold (the oracle's per-step merge) must equal
    # the trainer's greedy left-to-right _merge_seq on arbitrary symbol
    # sequences — including runs, merged-symbol collisions, and the
    # </w> marker
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.sampled_from(["a", "b", "ab", "ba", "aa", "x", WORD_END])
    con = duckdb.connect()

    @settings(max_examples=120, deadline=None)
    @given(
        seq=st.lists(sym, min_size=1, max_size=12),
        left=sym,
        right=sym,
    )
    def check(seq, left, right):
        got = con.execute(
            "SELECT string_split(list_reduce($seq, (acc, s) -> "
            "CASE WHEN s = $r AND (acc = $l OR ends_with(acc, ' ' || $l)) "
            "THEN acc[1:length(acc) - length($l)] || $l || $r "
            "ELSE acc || ' ' || s END), ' ')",
            {"seq": seq, "l": left, "r": right},
        ).fetchone()[0]
        assert got == _merge_seq(seq, left, right)

    check()


def test_pack_sequences_counts_param_parity(spark):
    # explicit counts == the default whitespace-tokenize path when fed
    # the same numbers; and BPE piece counts change the packing
    from beyond_vector_search_spark.functions.text import tokenize
    from beyond_vector_search_spark.operators.pretrain import pack_sequences
    from beyond_vector_search_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    default = pack_sequences(docs, seq_len=64)
    explicit = pack_sequences(
        docs,
        seq_len=64,
        counts=docs.select(
            "doc_id", F.size(tokenize(F.col("text"))).alias("n_tokens")
        ),
    )
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    merges = [("e", "r")]
    piece_counts = bpe.bpe_segment(docs, merges).select(
        "doc_id", F.size("pieces").alias("n_tokens")
    )
    packed = pack_sequences(docs, seq_len=64, counts=piece_counts)
    got = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    want = {r["doc_id"]: r["n_tokens"] for r in piece_counts.collect()}
    assert got == want


def test_nb_frozen_model_scores_match_and_stream(spark, tmp_path):
    """nb_quality_model + nb_score == nb_quality_scores on the training
    corpus; the frozen model then scores a document STREAM inside
    foreachBatch with batch-identical results (the percolation pattern:
    model trained once, applied statelessly at ingest)."""
    from beyond_vector_search_spark.operators.pretrain import (
        nb_quality_model,
        nb_score,
    )
    from beyond_vector_search_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    weights, prior = nb_quality_model(docs, cache=True)
    # freeze to parquet and reload — the shipped-artifact path
    wpath, ppath = str(tmp_path / "w"), str(tmp_path / "p")
    weights.write.parquet(wpath)
    prior.write.parquet(ppath)
    wre, pre = spark.read.parquet(wpath), spark.read.parquet(ppath)

    joint = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["pred_keep"])
        for r in nb_quality_scores(docs, cache=True).collect()
    }
    split = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["pred_keep"])
        for r in nb_score(docs, wre, pre).collect()
    }
    assert split == joint

    # all-OOV and empty docs score the bare prior
    odd = spark.createDataFrame(
        [(900001, "zzzqqq xxxyyy"), (900002, "")], "doc_id long, text string"
    )
    b = pre.collect()[0]["b"]
    for r in nb_score(odd, wre, pre).collect():
        assert r["log_odds"] == round(b, 6)

    # streaming: score each micro-batch with the frozen model
    src = tmp_path / "nb_src"
    src.mkdir()
    rows = docs.limit(40).collect()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out: list = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: out.extend(nb_score(df, wre, pre).collect())
        )
        .option("checkpointLocation", str(tmp_path / "nb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["pred_keep"]) for r in out
    }
    assert streamed == {d: joint[d] for d in streamed}
    assert len(streamed) == len(rows)


def test_vocab_ids_roundtrip(spark):
    """encode_ids -> decode_ids reconstructs the tokenized text exactly
    (vocabulary closed over the corpus alphabet + merges; inner joins
    loss-free); vocab ids follow the alphabet-then-merges convention."""
    from beyond_vector_search_spark.functions.text import tokenize
    from beyond_vector_search_spark.sources.readers import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(50)
        .cache()
    )
    wf = bpe.word_freqs(docs)
    merges = bpe.bpe_train(wf, n_merges=8)
    vocab = bpe.bpe_vocab(wf, merges).cache()
    vrows = sorted(
        ((r["piece_id"], r["piece"], r["is_base"]) for r in vocab.collect())
    )
    n_base = sum(1 for _, _, b in vrows if b)
    # contiguous ids; base block sorted ascending; merges in rank order
    assert [i for i, _, _ in vrows] == list(range(len(vrows)))
    base_pieces = [p for _, p, b in vrows if b]
    assert base_pieces == sorted(base_pieces)
    assert [p for _, p, b in vrows if not b] == [
        m["left"] + m["right"] for m in merges
    ]
    assert n_base + len(merges) == len(vrows)

    ids = bpe.encode_ids(docs, merges, vocab)
    # every token accounted for: ids per doc >= token count (pieces
    # split words, never drop them)
    got = decoded = {
        r["doc_id"]: r["text"] for r in bpe.decode_ids(ids, vocab).collect()
    }
    want = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", F.array_join(tokenize(F.col("text")), " ").alias("t")
        ).collect()
    }
    assert got == want and len(decoded) == 50


def test_weighted_sample_es_properties(spark):
    """A-ES weighted sampling: overwhelming weights always win, zero /
    null weights are excluded, and the sample is a pure function of
    (id, seed) — invariant under repartitioning."""
    from beyond_vector_search_spark.operators.scale import weighted_sample

    rows = [(i, 1.0) for i in range(100)] + [(1000 + i, 1e9) for i in range(5)]
    rows += [(2000, 0.0), (2001, None), (2002, -3.0)]
    df = spark.createDataFrame(rows, "doc_id long, wt double")
    out = weighted_sample(df, weight_col="wt", n=5, id_col="doc_id")
    picked = {r["doc_id"] for r in out.collect()}
    assert picked == {1000, 1001, 1002, 1003, 1004}
    # excluded ids can never appear even with a huge n
    all_out = {
        r["doc_id"]
        for r in weighted_sample(df, weight_col="wt", n=1000, id_col="doc_id").collect()
    }
    assert {2000, 2001, 2002}.isdisjoint(all_out)
    # repartition-invariant (keys are hash-of-id, not row-position)
    again = {
        (r["doc_id"], r["es_key"], r["rank"])
        for r in weighted_sample(
            df.repartition(7), weight_col="wt", n=5, id_col="doc_id"
        ).collect()
    }
    first = {(r["doc_id"], r["es_key"], r["rank"]) for r in out.collect()}
    assert again == first


def test_weighted_sample_plans_take_ordered(spark):
    # the global top-n must plan as TakeOrderedAndProject — never a
    # single-partition global window (the scale contract of
    # scale.global_topk_ranked)
    from beyond_vector_search_spark.operators.scale import weighted_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13 + 1.0).alias("wt")
    )
    plan = (
        weighted_sample(df, weight_col="wt", n=10, id_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_bpe_train_min_freq_cut(spark):
    # the standard trainer noise cut: singleton pairs are skippable
    wf = _wf(spark, [("ab", 1)])
    assert bpe.bpe_train(wf, n_merges=4, min_freq=2) == []
    assert len(bpe.bpe_train(wf, n_merges=4, min_freq=1)) == 2


def test_bpe_segment_oracle_survives_early_exhaustion(spark):
    """Training exhausts before N_MERGES on a degenerate corpus: the
    oracle's merge chain must treat missing steps as identity (LEFT
    JOIN ON TRUE), never annihilate the word table — engine and oracle
    must still agree."""
    import duckdb

    from beyond_vector_search_spark.plans.bpe_queries import (
        BPE_SEGMENT_SQL,
        N_MERGES,
    )

    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    merges = bpe.bpe_train(bpe.word_freqs(docs), n_merges=N_MERGES)
    assert len(merges) < N_MERGES  # genuinely exhausts
    got = {
        (r["piece"], r["n_occurrences"], r["n_docs"])
        for r in bpe.piece_stats(docs, merges).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, 'ab ab' AS text "
        "UNION ALL SELECT 2, 'ab'"
    )
    want = {
        (p, int(n), int(d))
        for p, n, d in con.execute(BPE_SEGMENT_SQL).fetchall()
    }
    assert got == want and got  # non-empty and equal


def test_pack_sequences_counts_keeps_uncounted_docs(spark):
    # docs missing from the counts relation appear with n_tokens = 0
    # (the every-doc-appears manifest contract)
    from beyond_vector_search_spark.operators.pretrain import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "")], "doc_id long, text string"
    )
    counts = spark.createDataFrame([(1, 3), (2, 2)], "doc_id long, n_tokens long")
    got = {r["doc_id"]: r["n_tokens"] for r in pack_sequences(docs, counts=counts).collect()}
    assert got == {1: 3, 2: 2, 3: 0}


def test_bpe_train_distributed_matches_driver_trainer(spark):
    """The cluster-resident trainer (bpe_train_distributed: per-step
    pair-count agg + global argmax + F.aggregate merge fold, state
    never collected) is merge-for-merge identical to the driver loop
    on the testdata corpus — including pair_freq counts — and honors
    the same min_freq early stop."""
    from beyond_vector_search_spark.operators import bpe
    from beyond_vector_search_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    wf = bpe.word_freqs(docs).localCheckpoint()
    driver = bpe.bpe_train(wf, n_merges=8, max_words=None)
    dist = bpe.bpe_train_distributed(wf, n_merges=8)
    assert dist == driver

    # min_freq early stop behaves identically
    hi = max(m["pair_freq"] for m in driver[2:]) + 1
    d2 = bpe.bpe_train(wf, n_merges=8, max_words=None, min_freq=hi)
    x2 = bpe.bpe_train_distributed(wf, n_merges=8, min_freq=hi)
    assert x2 == d2
    assert len(x2) < 8


def test_bpe_train_distributed_single_symbol_words(spark):
    """1-symbol sequences (every char merged) must contribute no pairs
    — the sequence(0, size-2) descending-sequence trap — and training
    stops cleanly when no adjacent pair remains anywhere."""
    from beyond_vector_search_spark.operators import bpe

    wf = spark.createDataFrame([("a", 5), ("b", 3)], "word string, freq long")
    driver = bpe.bpe_train(wf, n_merges=10, max_words=None)
    dist = bpe.bpe_train_distributed(wf, n_merges=10)
    assert dist == driver
    # 'a</w>' and 'b</w>' each yield exactly one merge before their
    # sequences hit length 1; then the pair table is empty
    assert len(dist) == 2
