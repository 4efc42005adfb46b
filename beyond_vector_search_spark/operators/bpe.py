"""Distributed BPE tokenizer training and application.

The byte-pair-encoding recipe every modern pretraining pipeline runs
(Sennrich et al. 2016; the GPT-2/HF ``tokenizers`` trainer), factored
for Spark's execution model:

1. **word_freqs** — the ONLY corpus-scale pass: tokenize + one hash
   aggregation to (word, freq).  At 100 TB this is the whole cost; the
   result is vocabulary-sized (bounded, millions of rows at web scale).
2. **bpe_train** — the merge loop runs over that bounded word table
   (optionally capped to the top ``max_words`` by mass, the standard
   trainer cut).  This is deliberately a driver-side loop: each merge
   step needs a global argmax over pair counts followed by a mutation
   of every word's symbol sequence — a tiny, serial, vocabulary-sized
   computation (exactly how HuggingFace's trainer works after its own
   word-count pass).  Distributing it would shuffle the same few MB
   ``n_merges`` times.
3. **bpe_segment / piece_stats** — applying a trained merge table back
   to the corpus IS corpus-scale again, so it runs as an Arrow
   mapInPandas kernel over the DISTINCT terms (memoized per word —
   Zipf makes distinct words a tiny fraction of token occurrences),
   joined back to the (doc, term, tf) relation.

Determinism contract (what makes the DuckDB oracle possible): merge
selection orders by (count DESC, left ASC, right ASC); merge
application is greedy left-to-right non-overlapping (the canonical BPE
fold — a freshly merged symbol never re-merges within the same step);
symbol sequences start as characters plus a terminal ``</w>`` marker
('<', '>', '/' are outside the token alphabet, so the marker can never
collide with text).  The oracle in plans/bpe_queries.py replays the
same loop as an unrolled MATERIALIZED-CTE chain whose per-step merge
is a DuckDB ``list_reduce`` fold with the identical semantics.

Reference scope note: the reference engine (mick2004/
beyond-vector-search) has no tokenizer training; this extends the
corpus-prep surface (operators/pretrain.py) the same way dedup/DSIR do.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from beyond_vector_search_spark.operators.pretrain import _toked

WORD_END = "</w>"


def word_freqs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(word, freq) — corpus word frequencies, the trainer's one
    full-corpus pass (tokenize + single hash aggregation; map-side
    partial aggregation makes the shuffle vocabulary-sized)."""
    toked = _toked(df, tokens, id_col=id_col, text_col=text_col)
    return (
        toked.select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _initial_seq(word: str) -> list[str]:
    return list(word) + [WORD_END]


def _merge_seq(seq: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (left, right).

    The canonical BPE application fold: a symbol produced by this
    step's merge can never itself be ``left`` (left+right != left), so
    a single forward pass is exact.
    """
    out: list[str] = []
    merged = left + right
    for s in seq:
        if out and s == right and out[-1] == left:
            out[-1] = merged
        else:
            out.append(s)
    return out


def bpe_train(
    wf: DataFrame,
    *,
    n_merges: int = 16,
    max_words: int | None = 1_000_000,
    min_freq: int = 1,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a (word, freq) relation —
    the DRIVER-side merge loop over a COLLECTED word table.

    Returns ``[{"rank": 0, "left": ..., "right": ..., "pair_freq": N},
    ...]`` in merge order.  ``max_words`` caps the collected word table
    to the top-N by (freq DESC, word ASC) — the deterministic trainer
    cut for web-scale vocabularies.  **The default is a bounded
    1,000,000 words, NOT the full table**: this function materializes
    every surviving word's symbol sequence on the driver (exactly how
    HuggingFace's trainer works after its own word-count pass), so an
    unbounded collect of a web-scale vocabulary (hundreds of millions
    of distinct "words" once noise/URLs/code are in the mix) is a
    driver OOM.  Pass ``max_words=None`` only when the caller KNOWS the
    table is vocabulary-sized; for an uncapped train at 100 TB use
    :func:`bpe_train_distributed`, whose state never leaves the
    cluster and which is pinned row-identical to this loop.

    Selection tie-break: (count DESC, left ASC, right ASC) — binary
    string order on both engines.  Stops early when no adjacent pair
    remains, or when the best pair's count drops below ``min_freq``
    (the standard trainer noise cut is 2; the default 1 keeps every
    merge, which is what the unrolled oracle chain replays).
    """
    q = wf.select("word", F.col("freq").cast("long").alias("freq"))
    if max_words is not None:
        q = q.orderBy(F.desc("freq"), F.asc("word")).limit(int(max_words))
    rows = q.collect()
    seqs: list[tuple[list[str], int]] = [
        (_initial_seq(r["word"]), int(r["freq"])) for r in rows
    ]
    merges: list[dict] = []
    for rank in range(int(n_merges)):
        counts: dict[tuple[str, str], int] = {}
        for seq, freq in seqs:
            for i in range(len(seq) - 1):
                pair = (seq[i], seq[i + 1])
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < int(min_freq):
            break
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_freq": cnt}
        )
        seqs = [(_merge_seq(seq, left, right), freq) for seq, freq in seqs]
    return merges


def bpe_train_distributed(
    wf: DataFrame,
    *,
    n_merges: int = 16,
    min_freq: int = 1,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges with the word table LEFT ON THE
    CLUSTER — the 100 TB trainer path (row-identical to
    :func:`bpe_train`, pinned by test).

    The state is a (seq ARRAY<STRING>, freq) DataFrame, never
    collected.  Each of the bounded ``n_merges`` steps costs exactly:

    1. one pair-count aggregation — adjacent pairs generated JVM-side
       (``transform`` over index ``sequence``), exploded, and
       hash-aggregated; map-side partial aggregation makes the shuffle
       distinct-pair-sized, not occurrence-sized;
    2. one global argmax — ``orderBy(cnt DESC, l, r).limit(1)``, which
       Spark executes as TakeOrderedAndProject (per-partition top-1 +
       driver merge of #partitions rows), the irreducible driver
       round-trip any global-argmax trainer pays per merge;
    3. one merge application — the SAME greedy left-to-right
       non-overlapping fold as :func:`_merge_seq`, expressed as an
       ``F.aggregate`` array fold with the winning pair as literals (a
       broadcast of two strings, no join, no shuffle).

    Per-step ``localCheckpoint`` truncates lineage (the PageRank
    lesson: 16 stacked aggregate-lambdas otherwise make each step
    re-analyze an ever-deeper plan) and keeps every step's input
    materialized for its two actions.  Driver memory high-water mark:
    one (pair, count) row — the argmax winner.

    Determinism contract identical to the driver loop: tie-break
    (count DESC, left ASC, right ASC) in binary string order, greedy
    non-overlapping application, ``</w>`` terminal marker.
    """
    seqs = wf.select(
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit("")),
            F.array(F.lit(WORD_END)),
        ).alias("seq"),
        F.col("freq").cast("long").alias("freq"),
    ).localCheckpoint()
    merges: list[dict] = []
    for rank in range(int(n_merges)):
        # filter BEFORE the pair generation: sequence(0, size-2) on a
        # 1-symbol seq would be a DESCENDING sequence (Spark defaults
        # step to -1 when start > stop), not empty
        pairs = seqs.where(F.size("seq") >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("seq") - 2),
                    lambda i: F.struct(
                        F.get("seq", i).alias("l"),
                        F.get("seq", i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        if cnt < int(min_freq):
            break
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_freq": cnt}
        )
        merged = left + right
        folded = F.aggregate(
            "seq",
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (s == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        seqs = seqs.select(folded.alias("seq"), "freq").localCheckpoint()
    return merges


MERGES_SCHEMA = StructType(
    [
        StructField("rank", LongType()),
        StructField("left_sym", StringType()),
        StructField("right_sym", StringType()),
        StructField("pair_freq", LongType()),
    ]
)


def merges_df(spark: SparkSession, merges: Iterable[dict]) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left_sym,
    right_sym, pair_freq) — the persistable tokenizer artifact."""
    data = [
        (int(m["rank"]), m["left"], m["right"], int(m["pair_freq"]))
        for m in merges
    ]
    return spark.createDataFrame(data, MERGES_SCHEMA)


def apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word with a trained merge list (in rank order).

    Sequential rank-order application equals the lowest-rank-first
    priority algorithm: a merge's constituents exist only after all
    lower-rank merges, and merging never makes two OTHER symbols
    adjacent, so later merges cannot create sites for earlier ones.
    """
    seq = _initial_seq(word)
    for left, right in merges:
        if len(seq) < 2:
            break
        seq = _merge_seq(seq, left, right)
    return seq


def segment_terms(
    terms: DataFrame,
    merges: list[dict] | list[tuple[str, str]],
    *,
    term_col: str = "term",
) -> DataFrame:
    """(term, pieces ARRAY<STRING>) — apply a trained merge table to a
    relation of distinct terms via an Arrow kernel (memoized per word
    within each batch; Zipf makes the distinct-term relation a tiny
    fraction of corpus token mass, which is why segmentation runs at
    term grain and joins back, never per occurrence)."""
    pairs = [
        (m["left"], m["right"]) if isinstance(m, dict) else (m[0], m[1])
        for m in merges
    ]
    out_schema = StructType(
        [
            StructField("term", StringType()),
            StructField("pieces", ArrayType(StringType())),
        ]
    )
    src = terms.select(F.col(term_col).cast("string").alias("term"))

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            pieces = []
            for w in pdf["term"]:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = apply_merges(w, pairs)
                pieces.append(got)
            yield pd.DataFrame({"term": pdf["term"], "pieces": pieces})

    return src.mapInPandas(_segment, out_schema)


def bpe_segment(
    df: DataFrame,
    merges: list[dict] | list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, pieces ARRAY<STRING>) — the tokenized corpus: each
    document's words segmented by the trained merges, in document
    order.  Segmentation runs once per DISTINCT term (Arrow kernel) and
    joins back on term; per-doc order is restored with posexplode +
    sort, so the join never carries document text."""
    toked = _toked(df, tokens, id_col=id_col, text_col=text_col)
    pos = toked.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    )
    seg = segment_terms(pos.select("term").distinct(), merges)
    return (
        pos.join(seg, "term")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
                    ),
                    lambda s: s["pieces"],
                )
            ).alias("pieces")
        )
    )


def piece_stats(
    df: DataFrame,
    merges: list[dict] | list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(piece, n_occurrences, n_docs) — corpus statistics of the
    trained tokenizer's output vocabulary: how often each BPE piece
    occurs (weighted by term frequency) and in how many documents.

    The post-training sanity report every tokenizer build ships with
    (piece coverage/balance); also the relation a piece-level token
    budget is computed from.  Shape: (doc, term, tf) partial agg +
    term-grain segmentation joined back on term — the corpus text is
    scanned once."""
    toked = _toked(df, tokens, id_col=id_col, text_col=text_col)
    wtf = (
        toked.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    seg = segment_terms(wtf.select("term").distinct(), merges)
    return (
        wtf.join(seg, "term")
        .select("doc_id", "tf", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(
            F.sum("tf").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
    )


def save_merges(
    spark: SparkSession, merges: Iterable[dict], path: str
) -> None:
    """Persist a trained merge table to parquet — the tokenizer
    artifact a pipeline ships between its training and application
    stages (the PQIndex/IndexDelta persistence contract applied to the
    tokenizer).  One small file; rank order is the schema's contract."""
    merges_df(spark, merges).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark: SparkSession, path: str) -> list[dict]:
    """Reload a persisted merge table in rank order, ready for
    :func:`bpe_segment` / :func:`piece_stats`."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [
        {
            "rank": int(r["rank"]),
            "left": r["left_sym"],
            "right": r["right_sym"],
            "pair_freq": int(r["pair_freq"]),
        }
        for r in rows
    ]


def bpe_vocab(
    wf: DataFrame, merges: Iterable[dict] | list[tuple[str, str]]
) -> DataFrame:
    """(piece_id, piece, is_base) — the trained tokenizer's id-assigned
    vocabulary: every base symbol the word table's characters produce
    (plus the ``</w>`` marker) sorted ascending gets ids 0..B-1, then
    each merge's product gets B+rank — the GPT-2 convention (alphabet
    first, merge order after), fully deterministic.

    Vocabulary-sized relation; the single-partition ranking window is
    fine at any corpus scale because the input is the (bounded) piece
    set, never the corpus.
    """
    spark = wf.sparkSession
    base = (
        wf.select(F.explode(F.split(F.col("word"), "")).alias("piece"))
        .where(F.col("piece") != "")
        .distinct()
        .union(spark.createDataFrame([(WORD_END,)], "piece string"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.orderBy("piece")
    based = base.select(
        (F.row_number().over(w) - 1).cast("long").alias("piece_id"),
        "piece",
        F.lit(True).alias("is_base"),
    )
    pairs = [
        (m["left"], m["right"]) if isinstance(m, dict) else (m[0], m[1])
        for m in merges
    ]
    merged = spark.createDataFrame(
        [(i, left + right) for i, (left, right) in enumerate(pairs)],
        "rank long, piece string",
    )
    n_base = based.agg(F.count("*").cast("long").alias("nb"))
    merged_ids = merged.crossJoin(F.broadcast(n_base)).select(
        (F.col("rank") + F.col("nb")).alias("piece_id"),
        "piece",
        F.lit(False).alias("is_base"),
    )
    return based.unionByName(merged_ids)


def encode_ids(
    df: DataFrame,
    merges: Iterable[dict] | list[tuple[str, str]],
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, ids ARRAY<BIGINT>) — the tokenized corpus as id
    sequences, the artifact a training data loader reads.  Composition:
    :func:`bpe_segment` (term-grain Arrow kernel) → posexplode →
    vocabulary join → order-restoring re-collect; pieces are guaranteed
    in-vocabulary because the vocabulary is closed over the same
    character alphabet + merges (an inner join is loss-free — pinned by
    the roundtrip test)."""
    seg = bpe_segment(
        df, list(merges), id_col=id_col, text_col=text_col, tokens=tokens
    )
    pos = seg.select("doc_id", F.posexplode("pieces").alias("pos", "piece"))
    vz = vocab.select("piece", F.col("piece_id").cast("long").alias("piece_id"))
    return (
        pos.join(vz, "piece")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("piece_id")))
                ),
                lambda s: s["piece_id"],
            ).alias("ids")
        )
    )


def decode_ids(ids_df: DataFrame, vocab: DataFrame) -> DataFrame:
    """(doc_id, text) — invert :func:`encode_ids`: ids → pieces →
    words (split on the ``</w>`` marker).  The roundtrip-parity check a
    tokenizer ships with; also the de-tokenization a data loader runs
    for inspection samples."""
    pos = ids_df.select("doc_id", F.posexplode("ids").alias("pos", "piece_id"))
    vz = vocab.select(F.col("piece_id").cast("long").alias("piece_id"), "piece")
    joined = (
        pos.join(vz, "piece_id")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("piece")))
                    ),
                    lambda s: s["piece"],
                ),
            ).alias("joined")
        )
    )
    return joined.select(
        "doc_id",
        F.trim(F.replace(F.col("joined"), F.lit(WORD_END), F.lit(" "))).alias(
            "text"
        ),
    )
