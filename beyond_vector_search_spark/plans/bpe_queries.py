"""BPE tokenizer-training catalog entries + DuckDB oracles.

The oracle replays the exact trainer loop (operators/bpe.py) as an
unrolled MATERIALIZED-CTE chain — the same technique as the mmr/NN-
Descent oracles: step k computes weighted adjacent-pair counts from the
word-symbol table, picks the argmax under the (count DESC, left ASC,
right ASC) tie-break, and applies the merge with a ``list_reduce`` fold
whose semantics are exactly the trainer's greedy left-to-right
non-overlapping pass (a freshly merged symbol can never equal its own
left constituent, so one forward fold is canonical BPE).

``AS MATERIALIZED`` on every step CTE is load-bearing: DuckDB inlines
CTEs by default and the chain references each step 2-3x (see
ROADMAP round-5 note — inlining re-derives the chain exponentially).
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

from beyond_vector_search_spark.operators import bpe
from beyond_vector_search_spark.plans.pretrain_queries import _TOKS
from beyond_vector_search_spark.sources.readers import load_table

N_MERGES = 16

_WF_CTES = (
    "wfx AS (SELECT unnest(tokens) AS word FROM toks), "
    "wf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq "
    "FROM wfx GROUP BY word), "
    "s0 AS MATERIALIZED (SELECT word, freq, "
    "list_append(list_transform(range(1, length(word) + 1), "
    "i -> substr(word, i, 1)), '</w>') AS seq FROM wf)"
)


def _step_ctes(k: int) -> str:
    """CTEs for merge step ``k``: pair counts over s{k}, argmax b{k},
    merged sequences s{k+1}."""
    return (
        f"px{k} AS (SELECT freq, seq, unnest(range(1, len(seq))) AS i FROM s{k}), "
        f"p{k} AS (SELECT seq[i] AS l, seq[i + 1] AS r, sum(freq) AS cnt "
        f"FROM px{k} GROUP BY 1, 2), "
        f"b{k} AS MATERIALIZED (SELECT CAST({k} AS BIGINT) AS rank, l, r, "
        f"CAST(cnt AS BIGINT) AS cnt FROM p{k} "
        "ORDER BY cnt DESC, l ASC, r ASC LIMIT 1), "
        f"s{k + 1} AS MATERIALIZED (SELECT word, freq, "
        # LEFT JOIN ON TRUE, not a cross join: when training exhausts
        # before this step (b{k} empty — the Python trainer's early
        # break), the step must be the IDENTITY, not annihilate the
        # word table (a cross join with an empty single-row relation
        # would empty every later s{j} and zero the segment oracle)
        "CASE WHEN b.l IS NULL THEN seq ELSE "
        "string_split(list_reduce(seq, (acc, s) -> "
        "CASE WHEN s = b.r AND (acc = b.l OR ends_with(acc, ' ' || b.l)) "
        "THEN acc[1:length(acc) - length(b.l)] || b.l || b.r "
        "ELSE acc || ' ' || s END), ' ') END AS seq "
        f"FROM s{k} LEFT JOIN b{k} b ON TRUE)"
    )


def _chain(n_merges: int) -> str:
    return f"WITH {_TOKS}, {_WF_CTES}, " + ", ".join(
        _step_ctes(k) for k in range(n_merges)
    )


BPE_MERGES_SQL = (
    _chain(N_MERGES)
    + " SELECT rank, l AS left_sym, r AS right_sym, cnt AS pair_freq FROM ("
    + " UNION ALL ".join(f"SELECT * FROM b{k}" for k in range(N_MERGES))
    + ")"
)

BPE_SEGMENT_SQL = (
    _chain(N_MERGES)
    + ", wtf AS (SELECT doc_id, term, count(*) AS tf FROM "
    "(SELECT doc_id, unnest(tokens) AS term FROM toks) GROUP BY doc_id, term) "
    "SELECT piece, CAST(sum(tf) AS BIGINT) AS n_occurrences, "
    "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
    f"FROM wtf JOIN (SELECT word AS term, unnest(seq) AS piece FROM s{N_MERGES}) seg "
    "USING (term) GROUP BY piece"
)


# One trained merge table per (live session, sf_dir): both entries and
# any caller composing segment+merges reuse the same driver-side train
# (the word-freq aggregation is the only Spark job it launches).
_MERGES_CACHE: "WeakKeyDictionary[SparkSession, dict[str, list[dict]]]" = (
    WeakKeyDictionary()
)


def trained_merges(spark: SparkSession, sf_dir: str) -> list[dict]:
    per = _MERGES_CACHE.setdefault(spark, {})
    if sf_dir not in per:
        wf = bpe.word_freqs(load_table(spark, sf_dir, "documents"))
        per[sf_dir] = bpe.bpe_train(wf, n_merges=N_MERGES)
    return per[sf_dir]


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): ONE
    corpus-scale word-frequency aggregation, then the canonical merge
    loop over the bounded word table — the learned merge table (rank,
    left_sym, right_sym, pair_freq) is the tokenizer artifact.  The
    oracle replays all 16 merge steps as an unrolled MATERIALIZED-CTE
    chain with a list_reduce fold per step."""
    return bpe.merges_df(spark, trained_merges(spark, sf_dir))


def q_bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained tokenizer applied back to the corpus (Arrow kernel
    over DISTINCT terms, joined to the (doc, term, tf) relation):
    per-piece corpus occurrence counts and document frequencies — the
    post-training vocabulary report.  Catalog tail: restates
    bpe_merges' in-window trainer chain plus the term-grain
    kernel-join shape of text_profile/postings."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe.piece_stats(docs, trained_merges(spark, sf_dir))
