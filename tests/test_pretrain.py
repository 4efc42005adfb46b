"""Unit tests: pretraining-corpus operators (decontamination, PII
scrub, repetition flags, packing, sharding, novelty)."""

from __future__ import annotations

import math
import tempfile

import pytest
from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import pretrain as pt


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven twelve"),
        (3, "spark spark spark spark spark other words here spark spark"),  # repetitive
        (4, "short doc"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_benchmark_contamination_finds_leak(spark, corpus):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r.n_shared for r in pt.benchmark_contamination(corpus, bench, n=8).collect()}
    # doc 1 contains the benchmark's full 8-token span (+2 extra tokens
    # -> 3 corpus shingles, 1 of which is the benchmark's single shingle)
    assert out == {1: 1}


def test_benchmark_contamination_no_false_positives(spark, corpus):
    bench = spark.createDataFrame(
        [(100, "unrelated words that never appear anywhere at all")],
        "doc_id BIGINT, text STRING",
    )
    assert pt.benchmark_contamination(corpus, bench, n=8).count() == 0


def test_benchmark_contamination_broadcast_set_parity(spark, corpus):
    """The r13-opt broadcast-set kernel path (bench shingles collected,
    collisions counted inside the corpus Arrow pass) equals the join
    form row for row, including multi-collision counts; the guard
    rejects the meaningless corpus_shingles combination."""
    from beyond_vector_search_spark.operators.dedup import shingle_rows

    bench = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (101, "one two three four five six seven eight nine ten"),
        ],
        "doc_id BIGINT, text STRING",
    )
    for n in (3, 8):
        join_form = sorted(
            map(tuple, pt.benchmark_contamination(corpus, bench, n=n).collect())
        )
        kernel_form = sorted(
            map(
                tuple,
                pt.benchmark_contamination(
                    corpus, bench, n=n, broadcast_set=True
                ).collect(),
            )
        )
        assert join_form == kernel_form, n
        assert kernel_form  # the planted overlap is found
    with pytest.raises(ValueError, match="broadcast_set"):
        pt.benchmark_contamination(
            corpus,
            bench,
            corpus_shingles=shingle_rows(corpus, n=8),
            broadcast_set=True,
        )


def test_repetition_flags_kernel_matches_expression(spark, corpus):
    """The r13-opt zero-exchange Arrow path equals the explode +
    partial-aggregation expression form row for row (including the
    absent empty-token doc and the single-token no-bigram doc)."""
    k = sorted(map(tuple, pt.repetition_flags(corpus).collect()))
    e = sorted(map(tuple, pt.repetition_flags(corpus, kernel=False).collect()))
    assert k == e
    one_tok = spark.createDataFrame(
        [(10, "solo"), (11, "")], "doc_id BIGINT, text STRING"
    )
    k1 = sorted(map(tuple, pt.repetition_flags(one_tok).collect()))
    e1 = sorted(map(tuple, pt.repetition_flags(one_tok, kernel=False).collect()))
    assert k1 == e1
    assert len(k1) == 1  # the empty doc stays absent on both paths


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.user@example.com or b@x.org phone 25-989-741-2988 ip 10.0.0.1"),
            (2, "no pii here"),
            (3, ""),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r for r in pt.pii_scrub(df).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (2, 1, 1)
    assert out[1].clean_text == "mail <EMAIL> or <EMAIL> phone <PHONE> ip <IP>"
    assert (out[2].n_emails, out[2].n_phones, out[2].n_ips) == (0, 0, 0)
    assert out[2].clean_text == "no pii here"
    assert out[3].clean_text == ""


def test_repetition_flags(spark, corpus):
    out = {r.doc_id: r for r in pt.repetition_flags(corpus).collect()}
    # doc 3: 'spark' x7 of 10 tokens -> top_word_frac 0.7, flagged
    assert math.isclose(out[3].top_word_frac, 0.7)
    assert out[3].flag_repetitive
    # 'spark spark' bigram appears 5x of 9 bigrams
    assert math.isclose(out[3].top_bigram_frac, round(5 / 9, 6))
    # doc 1: all-distinct tokens -> ratio 1.0, not flagged
    assert math.isclose(out[1].distinct_ratio, 1.0)
    assert not out[1].flag_repetitive
    # doc 4: one bigram; doc 5 has no tokens -> absent
    assert out[4].n_tokens == 2
    assert 5 not in out


def test_pack_sequences_contiguous(spark):
    # single shard (n_shards=1) makes offsets easy to check
    rows = [(i, " ".join(["tok"] * 100)) for i in range(1, 6)]  # 5 docs x 100 tokens
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = sorted(
        pt.pack_sequences(df, seq_len=256, n_shards=1).collect(),
        key=lambda r: r.doc_id,
    )
    assert [r.start_offset for r in out] == [0, 100, 200, 300, 400]
    assert [r.seq_id for r in out] == [0, 0, 0, 1, 1]
    assert all(r.shard == 0 for r in out)


def test_pack_sequences_shard_partitioned(spark, corpus):
    out = pt.pack_sequences(corpus, seq_len=8, n_shards=4).collect()
    # offsets restart per shard: every shard's minimum offset is 0
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.start_offset)
    assert all(min(v) == 0 for v in by_shard.values())


def test_assign_shards_deterministic_and_stable(spark, corpus):
    a = {r.doc_id: r.shard for r in pt.assign_shards(corpus, n_shards=8).collect()}
    b = {
        r.doc_id: r.shard
        for r in pt.assign_shards(corpus.repartition(7), n_shards=8).collect()
    }
    assert a == b  # pure function of the key, not the partitioning
    assert all(0 <= s < 8 for s in a.values())


def test_write_shards_roundtrip(spark, corpus):
    with tempfile.TemporaryDirectory() as tmp:
        pt.write_shards(corpus, f"{tmp}/shards", n_shards=4)
        back = spark.read.parquet(f"{tmp}/shards")
        assert back.count() == corpus.count()
        assert "shard" in back.columns
        # membership matches assign_shards exactly
        expect = {r.doc_id: r.shard for r in pt.assign_shards(corpus, n_shards=4).collect()}
        got = {r.doc_id: int(r.shard) for r in back.collect()}
        assert got == expect


def test_mixture_sample_weights_and_stability(spark):
    from beyond_vector_search_spark.operators.scale import mixture_sample

    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING")
    out = mixture_sample(
        df, strata_col="lang", key_col="doc_id",
        weights={"en": 1.0, "zh": 0.25},
    )
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] == 1000                      # fraction 1.0 keeps all
    assert 150 <= by_lang.get("zh", 0) <= 350         # ~0.25 of 1000
    # membership is a pure function of the key: repartitioning changes nothing
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in mixture_sample(
            df.repartition(13), strata_col="lang", key_col="doc_id",
            weights={"en": 1.0, "zh": 0.25},
        ).collect()
    }
    assert a == b
    # unlisted strata default to dropped
    df2 = spark.createDataFrame([(1, "xx")], "doc_id BIGINT, lang STRING")
    assert mixture_sample(df2, strata_col="lang", key_col="doc_id", weights={"en": 1.0}).count() == 0
    with pytest.raises(ValueError):
        mixture_sample(df, strata_col="lang", key_col="doc_id", weights={"en": 1.5})


def test_pack_sequences_property_vs_python(spark):
    """Random corpora: the Spark packing equals a pure-Python packer
    (grouped by the same portable hash shard, id-ordered cumsum)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    corpora: list[list[tuple[int, int]]] = []

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 10_000), st.integers(0, 40)),
            min_size=1, max_size=25, unique_by=lambda t: t[0],
        )
    )
    def collect(rows):
        corpora.append(rows)

    collect()

    def py_shard(doc_id: int, n_shards: int) -> int:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % n_shards

    # evaluate every example in ONE Spark job (batched, like
    # test_properties._Bank): offset each corpus into its own id space;
    # the shard cumsum runs over the COMBINED table, so the Python
    # model does too (packing is per-shard/id-order, corpus-agnostic)
    all_ids: list[tuple[int, int]] = []
    for ci, corpus in enumerate(corpora):
        base = ci * 1_000_000
        all_ids += [(base + i, n) for i, n in corpus]
    all_ids.sort()
    expected, per_shard = {}, {}
    for doc_id, n in all_ids:
        s = py_shard(doc_id, 4)
        start = per_shard.get(s, 0)
        expected[doc_id] = (n, s, start, start // 128)
        per_shard[s] = start + n
    rows = [(doc_id, " ".join(["tok"] * n)) for doc_id, n in all_ids]

    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: (r.n_tokens, r.shard, r.start_offset, r.seq_id)
        for r in pt.pack_sequences(df, seq_len=128, n_shards=4).collect()
    }
    assert got == expected


def test_unigram_logppl_orders_by_rarity(spark):
    """Docs of common words score lower log-perplexity than docs
    carrying rare tokens; a doc that IS the whole distribution of one
    word scores exactly its own -ln(p)."""
    rows = [
        (1, "the the the the the the the the"),   # dominant word
        (2, "the the the the qwertyuiop"),        # one rare token
        (3, "zzz"),                                # unique word
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in pt.unigram_logppl(df).collect()}
    assert out[1].logppl < out[2].logppl            # rare token raises surprise
    # doc 3: p(zzz)=1/14 -> logppl = -ln(1/14)
    assert math.isclose(out[3].logppl, round(-math.log(1 / 14), 6), abs_tol=1e-9)
    assert out[1].n_tokens == 8


def test_shingle_novelty(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),          # pure restatement of doc 1
            (3, "x y z w v"),          # all-fresh content
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r for r in pt.shingle_novelty(df, n=3).collect()}
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0
    assert out[3].novelty == 1.0
    assert out[1].n_shingles == 3


def test_fuzzy_contamination_catches_edited_leaks(spark):
    """Near-dup decontamination: a lightly edited benchmark text in the
    corpus is caught (exact n-gram collision would need an untouched
    8-gram run); unrelated docs are not flagged; the hot-bucket cap
    suppresses a boilerplate bucket."""
    from beyond_vector_search_spark.operators.pretrain import (
        benchmark_contamination,
        fuzzy_contamination,
    )

    words = " ".join(f"w{i}" for i in range(40))
    bench = spark.createDataFrame(
        [(1, words)], "doc_id long, text string"
    )
    # edited leak: an EDIT token injected after every 6th word — no
    # 8-token run survives intact, but most 3-shingles do
    leaked = []
    for i in range(40):
        leaked.append(f"w{i}")
        if i % 6 == 5:
            leaked.append(f"EDIT{i}")
    corpus = spark.createDataFrame(
        [
            (10, " ".join(leaked)),
            (11, "totally different text about spark join performance today"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["jaccard"]
        for r in fuzzy_contamination(
            corpus, bench, threshold=0.3, bands=16, rows_per_band=1
        ).collect()
    }
    assert (10, 1) in got and got[(10, 1)] > 0.3
    assert all(d != 11 for d, _ in got)
    # the edit breaks every 8-gram: the exact sweep misses this leak
    exact = benchmark_contamination(corpus, bench, n=8).collect()
    assert all(r["doc_id"] != 10 for r in exact)
    # cap: with max_bucket_size=0 every bucket is suppressed -> no pairs
    assert (
        fuzzy_contamination(
            corpus, bench, threshold=0.3, bands=16, rows_per_band=1, max_bucket_size=0
        ).count()
        == 0
    )


def test_fuzzy_contamination_scores_a_stream(spark, tmp_path):
    """Decontamination at ingest: fuzzy_contamination is stateless
    against a FROZEN benchmark (its band keys broadcast), so scoring
    each arriving micro-batch inside foreachBatch reproduces exactly
    the batch sweep over the union — the percolation pattern applied
    to contamination."""
    from beyond_vector_search_spark.operators.pretrain import fuzzy_contamination
    from beyond_vector_search_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    bench = docs.where("doc_id % 97 = 0")
    leaks = bench.select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat("text", F.lit(" lightly edited benchmark leak")).alias("text"),
    )
    corpus = docs.where("doc_id % 97 <> 0").unionByName(leaks)

    want = {
        (r["doc_id"], r["bench_id"], r["jaccard"])
        for r in fuzzy_contamination(corpus, bench, max_bucket_size=None).collect()
    }
    assert want  # planted leaks exist

    # two arrival epochs
    src = tmp_path / "fuzzy_src"
    src.mkdir()
    rows = corpus.collect()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(chunk, corpus.schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    bench_cached = bench.cache()
    bench_cached.count()
    out: list = []
    q = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .writeStream.foreachBatch(
            lambda df, _bid: out.extend(
                fuzzy_contamination(df, bench_cached, max_bucket_size=None).collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "fuzzy_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r["doc_id"], r["bench_id"], r["jaccard"]) for r in out}
    assert got == want


def test_fuzzy_contamination_shared_state_parity(spark):
    """fuzzy_contamination with the corpus's PRECOMPUTED dedup state
    (banded_keys rows + shingle_rows) returns row-identical results to
    the from-text path — the shared-signature form a pipeline uses
    after its MinHash dedup pass already signed the corpus.  Also:
    benchmark_contamination with precomputed shingles on both sides
    matches its from-text result."""
    from beyond_vector_search_spark.operators import dedup as dd
    from beyond_vector_search_spark.operators.pretrain import (
        benchmark_contamination,
        fuzzy_contamination,
    )
    from beyond_vector_search_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    bench = docs.where(F.col("doc_id") % 97 == 0)
    leaks = bench.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("EDIT "), F.col("text")).alias("text"),
    )
    corpus = docs.where(F.col("doc_id") % 97 != 0).unionByName(leaks)

    base = fuzzy_contamination(corpus, bench, threshold=0.5)
    pre_bands = dd.banded_keys(dd.minhash_signatures(corpus))
    pre_sh = dd.shingle_rows(corpus, n=3)
    shared = fuzzy_contamination(
        corpus, bench, threshold=0.5, corpus_bands=pre_bands, corpus_shingles=pre_sh
    )
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(shared) == rows(base)
    assert rows(base)  # the planted leaks actually produce matches

    exact = benchmark_contamination(corpus, bench, n=8)
    exact_shared = benchmark_contamination(
        corpus,
        bench,
        n=8,
        corpus_shingles=dd.shingle_rows(corpus, n=8),
        bench_shingles=dd.shingle_rows(bench, n=8),
    )
    assert rows(exact_shared) == rows(exact)


def test_fuzzy_contamination_plan_shape_pinned(spark):
    """Pin the r10 shared-signature win: the catalog fuzzy entry's plan
    must read the documents table at most twice (one fused
    signature+shingle pass per side) and stay under 12 shuffle
    exchanges.  The r9 rederive form scanned documents 21x across 25
    exchanges — this test makes that regression loud."""
    import contextlib
    import io
    import re

    from beyond_vector_search_spark.plans.pretrain_queries import (
        q_fuzzy_contamination,
    )

    df = q_fuzzy_contamination(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # count scans whose block (through the Location line) names the
    # documents table
    doc_scans = sum(
        1
        for m in re.finditer(r"\(\d+\) Scan parquet.*?Location[^\n]*", plan, re.S)
        if "documents" in m.group(0)
    )
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert doc_scans <= 2, f"{doc_scans} documents scans (shared signatures broken?)"
    assert n_exchanges <= 12, f"{n_exchanges} shuffle exchanges (was 9 at r10)"
