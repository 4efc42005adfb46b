"""Fusion / expansion / diversification catalog entries (operators/
fusion.py): Reciprocal Rank Fusion, pseudo-relevance-feedback BM25,
and Maximal Marginal Relevance — each against a full DuckDB oracle
built from the same CTE stacks as the core retrieval entries.

The MMR oracle unrolls the greedy selection loop as ``k`` CTE steps
(argmax → union into the selected set → next argmax): plain ANSI SQL,
no recursion, bit-deterministic because every comparison value is
rounded to 6 decimals with ascending-id tie-breaks — the same rule the
Spark kernel applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import fusion as fu
from beyond_vector_search_spark.plans.entry_queries import (
    _BM25_SCORED_CTE,
    _CFG,
    _DOC_VEC_CTE,
    _EXPLODED_CTE,
    _GRAM_STATS_CTE,
    _GRAMS_CTE,
    _HYBRID_CTE,
    _QUERIES_CTE,
    _SCALARS_CTE,
    _TERM_STATS_CTE,
    _TOKS_CTE,
    _POSTINGS_CTE,
    _VEC_QUERY_CTE,
    _VEC_SCORED_CTE,
    _docs_index,
    _queries_df,
    _ranked,
    _rank_sql,
    _scores,
    register,
)

_BOTH_ARMS_STACK = (
    f"{_QUERIES_CTE}, {_TOKS_CTE}, {_SCALARS_CTE}, {_EXPLODED_CTE}, "
    f"{_TERM_STATS_CTE}, {_POSTINGS_CTE}, {_BM25_SCORED_CTE}, "
    f"{_GRAMS_CTE}, {_GRAM_STATS_CTE}, {_DOC_VEC_CTE}, {_VEC_QUERY_CTE}, "
    f"{_VEC_SCORED_CTE}"
)

# ------------------------- reciprocal rank fusion ---------------------------

_RRF_K0 = 60

_RRF_CTE = (
    "kr AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
    "ORDER BY round(score, 6) DESC, doc_id ASC) AS r FROM kscored), "
    "vr AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
    "ORDER BY round(score, 6) DESC, doc_id ASC) AS r FROM vscored), "
    f"rrf AS (SELECT query_id, doc_id, sum(1.0 / ({_RRF_K0} + r)) AS score "
    "FROM (SELECT * FROM kr UNION ALL SELECT * FROM vr) GROUP BY query_id, doc_id)"
)


# Registered at the catalog TAIL (coverage_queries.register_all):
# RRF restates hybrid_topk's union + single-hash-agg shape, so it
# yields its driver-window slot to distinctive operators
# (semantic_dedup, data_quality).
RRF_TOPK_SQL = f"WITH {_BOTH_ARMS_STACK}, {_RRF_CTE} {_rank_sql('rrf')}"


def q_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of the BM25 and cosine arms (Cormack et
    al. 2009): rank-only fusion, no score normalization — the robust
    default when arm score scales are incomparable."""
    fused = fu.rrf_scores(
        {
            "keyword": _scores(spark, sf_dir, "keyword"),
            "vector": _scores(spark, sf_dir, "vector"),
        },
        k0=_RRF_K0,
    )
    return _ranked(fused)


# ---------------------- pseudo-relevance feedback ---------------------------

_PRF_FEEDBACK = 5
_PRF_TERMS = 10
_PRF_BETA = 0.4

_PRF_CTE = (
    # top-n_feedback docs of the first BM25 pass
    "fb AS (SELECT query_id, doc_id FROM (SELECT query_id, doc_id, "
    "row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id ASC) AS rn "
    f"FROM kscored) WHERE rn <= {_PRF_FEEDBACK}), "
    # Rocchio-style expansion-term mass: idf * sum of tf over feedback docs,
    # original query terms excluded
    "emass AS (SELECT f.query_id, p.term, sum(p.tf) AS ftf "
    "FROM fb f JOIN postings p ON p.doc_id = f.doc_id GROUP BY f.query_id, p.term), "
    "ew AS (SELECT m.query_id, m.term, i.idf * m.ftf AS weight "
    "FROM emass m JOIN term_idf i USING (term) "
    "WHERE NOT EXISTS (SELECT 1 FROM qterms q WHERE q.query_id = m.query_id AND q.term = m.term)), "
    "etop AS (SELECT query_id, term FROM (SELECT query_id, term, "
    "row_number() OVER (PARTITION BY query_id ORDER BY round(weight, 6) DESC, term ASC) AS rn "
    f"FROM ew) WHERE rn <= {_PRF_TERMS}), "
    # second BM25 pass over the expansion terms, weighted by beta
    f"econtrib AS (SELECT e.query_id, p.doc_id, {_PRF_BETA!r} * "
    "i.idf * (p.tf * (1.5 + 1.0)) / (p.tf + 1.5 * (1.0 - 0.75 + 0.75 * (d.dl / "
    "coalesce(nullif(s.avg_dl, 0.0), 1.0)))) AS part "
    "FROM etop e JOIN term_idf i USING (term) JOIN postings p USING (term) "
    "JOIN (SELECT doc_id, CAST(len(tokens) AS DOUBLE) AS dl FROM toks) d ON p.doc_id = d.doc_id, scalars s), "
    "pscored AS (SELECT query_id, doc_id, sum(part) AS score FROM ("
    "SELECT query_id, doc_id, score AS part FROM kscored "
    "UNION ALL SELECT query_id, doc_id, part FROM econtrib) GROUP BY query_id, doc_id)"
)


# Catalog tail, same rationale as RRF_TOPK_SQL (PRF reuses the
# broadcast BM25 shape already pinned by bm25_topk).
PRF_TOPK_SQL = (
    f"WITH {_QUERIES_CTE}, {_TOKS_CTE}, {_SCALARS_CTE}, {_EXPLODED_CTE}, "
    f"{_TERM_STATS_CTE}, {_POSTINGS_CTE}, {_BM25_SCORED_CTE}, {_PRF_CTE} "
    f"{_rank_sql('pscored')}"
)


def q_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback BM25 (Rocchio/RM3 family): mine the
    top-5 first-pass docs for the 10 highest-weight expansion terms,
    add a beta-weighted second scoring pass."""
    idx = _docs_index(spark, sf_dir)
    scored = fu.prf_bm25_scores(
        _queries_df(spark),
        idx,
        _scores(spark, sf_dir, "keyword"),
        cfg=_CFG,
        n_feedback=_PRF_FEEDBACK,
        n_terms=_PRF_TERMS,
        beta=_PRF_BETA,
    )
    return _ranked(scored)


# ----------------------- maximal marginal relevance -------------------------

_MMR_N = 12   # candidate pool: top-N cosine docs per query
_MMR_K = 5    # selected set size
_MMR_LAM = 0.7


def _mmr_sql() -> str:
    """Unrolled greedy MMR as plain CTE steps (no recursion): step i
    computes every remaining candidate's marginal value against the
    selected set u{i-1}, picks the (rounded val DESC, doc_id ASC)
    argmax, and unions it in."""
    lam = repr(float(_MMR_LAM))
    one_minus = repr(1.0 - float(_MMR_LAM))
    # AS MATERIALIZED throughout: DuckDB inlines CTEs by default, and
    # each step references the previous selected-set CTE three times
    # (join / NOT EXISTS / union) — inlined, the u-chain re-derives the
    # whole vector pipeline 3^k times (measured: 170 s at sf0.001 vs
    # ~1 s materialized).
    steps = [
        "cand AS MATERIALIZED (SELECT query_id, doc_id, round(score, 6) AS rel FROM ("
        "SELECT query_id, doc_id, score, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(score, 6) DESC, doc_id ASC) AS rn FROM vscored) "
        f"WHERE rn <= {_MMR_N})",
        "cd AS (SELECT DISTINCT doc_id FROM cand)",
        "cv AS (SELECT v.doc_id, v.gram, v.weight, n.norm "
        "FROM doc_vec v JOIN doc_norm n USING (doc_id) JOIN cd USING (doc_id))",
        "psim AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "round(sum(a.weight * b.weight) / (max(a.norm) * max(b.norm)), 6) AS sim "
        "FROM cv a JOIN cv b ON a.gram = b.gram AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id)",
        f"m1 AS (SELECT query_id, doc_id, round({lam} * rel, 6) AS val FROM cand)",
        "sel1 AS MATERIALIZED (SELECT query_id, doc_id, val FROM (SELECT query_id, doc_id, val, "
        "row_number() OVER (PARTITION BY query_id ORDER BY val DESC, doc_id ASC) AS rn "
        "FROM m1) WHERE rn = 1)",
        "u1 AS MATERIALIZED (SELECT query_id, doc_id, val FROM sel1)",
    ]
    for i in range(2, _MMR_K + 1):
        prev = f"u{i - 1}"
        steps.append(
            f"m{i} AS (SELECT c.query_id, c.doc_id, "
            f"round({lam} * c.rel - {one_minus} * max(coalesce(p.sim, 0.0)), 6) AS val "
            f"FROM cand c JOIN {prev} s ON s.query_id = c.query_id "
            "LEFT JOIN psim p ON p.doc_a = least(c.doc_id, s.doc_id) "
            "AND p.doc_b = greatest(c.doc_id, s.doc_id) "
            f"WHERE NOT EXISTS (SELECT 1 FROM {prev} x "
            "WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id) "
            "GROUP BY c.query_id, c.doc_id, c.rel)"
        )
        steps.append(
            f"sel{i} AS MATERIALIZED (SELECT query_id, doc_id, val FROM (SELECT query_id, doc_id, val, "
            "row_number() OVER (PARTITION BY query_id ORDER BY val DESC, doc_id ASC) AS rn "
            f"FROM m{i}) WHERE rn = 1)"
        )
        steps.append(
            f"u{i} AS MATERIALIZED (SELECT query_id, doc_id, val FROM {prev} "
            f"UNION ALL SELECT query_id, doc_id, val FROM sel{i})"
        )
    final = " UNION ALL ".join(
        f"SELECT query_id, doc_id, CAST({i} AS INTEGER) AS mmr_rank, val AS mmr_score FROM sel{i}"
        for i in range(1, _MMR_K + 1)
    )
    return ", ".join(steps) + " " + final


@register(
    "mmr_topk",
    f"WITH {_QUERIES_CTE}, {_GRAMS_CTE}, {_GRAM_STATS_CTE}, {_DOC_VEC_CTE}, "
    f"{_VEC_QUERY_CTE}, {_VEC_SCORED_CTE}, {_mmr_sql()}",
)
def q_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein 1998): greedy λ-tradeoff selection of 5 docs from each
    query's top-12 cosine candidates, pair similarities from the
    char-gram TF-IDF space, greedy loop as a cogrouped Arrow kernel."""
    idx = _docs_index(spark, sf_dir)
    cand = _ranked(_scores(spark, sf_dir, "vector"), k=_MMR_N).select(
        "query_id", "doc_id", "score"
    )
    return fu.mmr_rerank(cand, idx, k=_MMR_K, lam=_MMR_LAM)


# -------------------- phrase search (catalog tail) --------------------------

_PHRASES = ["spark join", "hash index scan", "slow query"]


def _phrase_arm_sql(phrase: str) -> str:
    toks = phrase.split(" ")
    m = len(toks)
    target = "[" + ", ".join(f"'{t}'" for t in toks) + "]"
    return (
        f"SELECT doc_id, '{phrase}' AS phrase, CAST(CASE WHEN len(tokens) - {m - 1} < 1 THEN 0 ELSE "
        f"list_sum(list_transform(range(1, len(tokens) - {m - 1} + 1), "
        f"i -> CASE WHEN tokens[i:i+{m - 1}] = {target} THEN 1 ELSE 0 END)) END AS BIGINT) AS phrase_tf "
        "FROM toks"
    )


PHRASE_SEARCH_SQL = (
    f"WITH {_TOKS_CTE}, arms AS ("
    + " UNION ALL ".join(_phrase_arm_sql(p) for p in _PHRASES)
    + ") SELECT doc_id, phrase, phrase_tf FROM arms WHERE phrase_tf > 0"
)


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase positional matching (operators/fusion.phrase_counts)
    over the documents table for a fixed phrase workload."""
    from beyond_vector_search_spark.sources.readers import load_table

    return fu.phrase_counts(load_table(spark, sf_dir, "documents"), _PHRASES)


# ---------------- ranking-quality metrics (catalog tail) --------------------

# MRR / nDCG@k / hit@k per strategy, with the BM25 top-1 doc as the
# (single, binary) pseudo-relevant document — the answer_eval entry's
# expected-doc convention extended into the standard ranking metrics.
# With one relevant doc, nDCG@k = 1/log2(1+rank) (ideal DCG = 1).
_RM_K = 5

_RM_CTE = (
    # deterministic per-arm rankings (the catalog rule)
    "krank AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
    "ORDER BY round(score, 6) DESC, doc_id ASC) AS rank FROM kscored), "
    "vrank AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
    "ORDER BY round(score, 6) DESC, doc_id ASC) AS rank FROM vscored), "
    "hrank AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id "
    "ORDER BY round(score, 6) DESC, doc_id ASC) AS rank FROM blended), "
    "expected AS (SELECT query_id, doc_id AS exp_doc FROM krank WHERE rank = 1), "
    "tagged AS (SELECT 'keyword' AS strategy, * FROM krank "
    "UNION ALL SELECT 'vector', * FROM vrank "
    "UNION ALL SELECT 'hybrid', * FROM hrank), "
    f"hits AS (SELECT t.strategy, t.query_id, t.rank FROM tagged t "
    f"JOIN expected e ON e.query_id = t.query_id AND e.exp_doc = t.doc_id "
    f"WHERE t.rank <= {_RM_K}), "
    "per_q AS (SELECT e.query_id, s.strategy, "
    "coalesce(1.0 / h.rank, 0.0) AS rr, "
    "coalesce(1.0 / (ln(1.0 + h.rank) / ln(2.0)), 0.0) AS ndcg, "
    "CASE WHEN h.rank IS NOT NULL THEN 1.0 ELSE 0.0 END AS hit "
    "FROM expected e CROSS JOIN (VALUES ('keyword'), ('vector'), ('hybrid')) AS s(strategy) "
    "LEFT JOIN hits h ON h.query_id = e.query_id AND h.strategy = s.strategy)"
)

RANKING_METRICS_SQL = (
    f"WITH {_QUERIES_CTE}, {_TOKS_CTE}, {_SCALARS_CTE}, {_EXPLODED_CTE}, "
    f"{_TERM_STATS_CTE}, {_POSTINGS_CTE}, {_BM25_SCORED_CTE}, "
    f"{_GRAMS_CTE}, {_GRAM_STATS_CTE}, {_DOC_VEC_CTE}, {_VEC_QUERY_CTE}, "
    f"{_VEC_SCORED_CTE}, {_HYBRID_CTE}, {_RM_CTE} "
    "SELECT strategy, CAST(count(*) AS BIGINT) AS n_queries, "
    "round(avg(rr), 6) AS mrr, round(avg(ndcg), 6) AS ndcg, "
    "round(avg(hit), 6) AS hit_rate "
    "FROM per_q GROUP BY strategy"
)


def q_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR / nDCG@5 / hit@5 per strategy against the BM25-top-1
    pseudo-truth — per-query metric rows reduced by one aggregation."""
    from pyspark.sql import Window

    key = _scores(spark, sf_dir, "keyword")
    vec = _scores(spark, sf_dir, "vector")
    hyb = _scores(spark, sf_dir, "hybrid")  # memoized blend, shared with hybrid_topk

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
    )

    def ranked(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("strategy"), "query_id", "doc_id",
            F.row_number().over(w).alias("rank"),
        )

    krank = ranked(key, "keyword")
    # renamed columns: expected shares krank's lineage with tagged's
    # first arm — qualified self-join references would be ambiguous
    expected = krank.where("rank = 1").select(
        F.col("query_id").alias("eq"), F.col("doc_id").alias("exp_doc")
    )
    tagged = krank.unionByName(ranked(vec, "vector")).unionByName(ranked(hyb, "hybrid"))
    hits = (
        tagged.where(F.col("rank") <= _RM_K)
        .join(
            F.broadcast(expected),
            (F.col("query_id") == F.col("eq")) & (F.col("doc_id") == F.col("exp_doc")),
        )
        .select("strategy", "query_id", "rank")
    )
    strategies = spark.createDataFrame(
        [("keyword",), ("vector",), ("hybrid",)], "strategy string"
    )
    per_q = (
        expected.select(F.col("eq").alias("query_id"))
        .crossJoin(F.broadcast(strategies))
        .join(F.broadcast(hits), ["query_id", "strategy"], "left")
        .select(
            "strategy",
            F.coalesce(1.0 / F.col("rank"), F.lit(0.0)).alias("rr"),
            F.coalesce(
                1.0 / (F.log(1.0 + F.col("rank")) / F.log(F.lit(2.0))), F.lit(0.0)
            ).alias("ndcg"),
            F.when(F.col("rank").isNotNull(), 1.0).otherwise(0.0).alias("hit"),
        )
    )
    return per_q.groupBy("strategy").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
        F.round(F.avg("hit"), 6).alias("hit_rate"),
    )


# ---------------- learning-to-rank feature export (tail) --------------------

# The (query, doc) feature relation an LTR trainer consumes: both arm
# scores (0 when unmatched), document length, and vector norm — the
# engine's score relations re-used as feature columns, the standard
# "export features from the retrieval stack" job.
LTR_FEATURES_SQL = (
    f"WITH {_QUERIES_CTE}, {_TOKS_CTE}, {_SCALARS_CTE}, {_EXPLODED_CTE}, "
    f"{_TERM_STATS_CTE}, {_POSTINGS_CTE}, {_BM25_SCORED_CTE}, "
    f"{_GRAMS_CTE}, {_GRAM_STATS_CTE}, {_DOC_VEC_CTE}, {_VEC_QUERY_CTE}, "
    f"{_VEC_SCORED_CTE}, "
    "pairs AS (SELECT query_id, doc_id FROM kscored "
    "UNION SELECT query_id, doc_id FROM vscored), "
    "feats AS (SELECT p.query_id, p.doc_id, "
    "round(coalesce(k.score, 0.0), 6) AS f_bm25, "
    "round(coalesce(v.score, 0.0), 6) AS f_cosine "
    "FROM pairs p LEFT JOIN kscored k USING (query_id, doc_id) "
    "LEFT JOIN vscored v USING (query_id, doc_id)) "
    "SELECT f.query_id, f.doc_id, f.f_bm25, f.f_cosine, "
    "CAST(len(t.tokens) AS BIGINT) AS f_doc_len, "
    "round(n.norm, 6) AS f_doc_norm "
    "FROM feats f JOIN toks t ON t.doc_id = f.doc_id "
    "JOIN doc_norm n ON n.doc_id = f.doc_id"
)


def q_ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTR feature export: the union of both arms' matched (query, doc)
    pairs with per-pair scores and per-doc stats as feature columns."""
    idx = _docs_index(spark, sf_dir)
    key = _scores(spark, sf_dir, "keyword")
    vec = _scores(spark, sf_dir, "vector")
    pairs = key.select("query_id", "doc_id").union(
        vec.select("query_id", "doc_id")
    ).distinct()
    feats = (
        pairs.join(key.withColumnRenamed("score", "_k"), ["query_id", "doc_id"], "left")
        .join(vec.withColumnRenamed("score", "_v"), ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            F.round(F.coalesce("_k", F.lit(0.0)), 6).alias("f_bm25"),
            F.round(F.coalesce("_v", F.lit(0.0)), 6).alias("f_cosine"),
        )
    )
    return (
        feats.join(
            idx.doc_stats.select("doc_id", F.col("doc_len").cast("long").alias("f_doc_len")),
            "doc_id",
        )
        .join(idx.doc_norm.select("doc_id", F.round("norm", 6).alias("f_doc_norm")), "doc_id")
        .select("query_id", "doc_id", "f_bm25", "f_cosine", "f_doc_len", "f_doc_norm")
    )


# ------------------ proximity search (catalog tail) -------------------------

_PROX_PAIRS = [("spark", "join"), ("hash", "index"), ("slow", "query")]
_PROX_WINDOW = 5


def _prox_arm_sql(a: str, b: str) -> str:
    def pos(t: str) -> str:
        return (
            "list_filter(range(1, greatest(len(tokens), 1) + 1), "
            f"i -> tokens[i] = '{t}')"
        )

    return (
        f"SELECT doc_id, '{a}' AS term_a, '{b}' AS term_b, "
        f"CAST(list_min(dists) AS BIGINT) AS min_dist, "
        f"CAST(len(list_filter(dists, d -> d <= {_PROX_WINDOW})) AS BIGINT) AS n_within "
        f"FROM (SELECT doc_id, flatten(list_transform({pos(a)}, "
        f"x -> list_transform({pos(b)}, y -> abs(x - y)))) AS dists FROM toks)"
    )


PROXIMITY_SEARCH_SQL = (
    f"WITH {_TOKS_CTE}, arms AS ("
    + " UNION ALL ".join(_prox_arm_sql(a, b) for a, b in _PROX_PAIRS)
    + ") SELECT doc_id, term_a, term_b, min_dist, n_within FROM arms "
    "WHERE min_dist IS NOT NULL"
)


def q_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional proximity (operators/fusion.proximity_counts): minimum
    token distance + within-window pair counts for a fixed term-pair
    workload over the documents table."""
    from beyond_vector_search_spark.sources.readers import load_table

    return fu.proximity_counts(
        load_table(spark, sf_dir, "documents"), _PROX_PAIRS, window=_PROX_WINDOW
    )


# ------------------- spell correction (catalog tail) ------------------------

_WORD_GRAMS_SQL = (
    "CASE WHEN length({c}) < 3 THEN [{c}] "
    "ELSE list_transform(range(1, length({c}) - 1), i -> substring({c}, i, 3)) END"
)

# Typos synthesized from the vocabulary itself (last char -> 'x',
# distance exactly 1 from the source term), filtered to those that are
# genuinely OOV — both engines derive the identical typo set.
SPELL_SUGGEST_SQL = (
    f"WITH {_TOKS_CTE}, {_SCALARS_CTE}, {_EXPLODED_CTE}, {_TERM_STATS_CTE}, "
    "typos AS (SELECT DISTINCT substring(term, 1, length(term) - 1) || 'x' AS term "
    "FROM term_idf WHERE length(term) >= 4), "
    "oov AS (SELECT t.term FROM typos t "
    "WHERE NOT EXISTS (SELECT 1 FROM term_idf v WHERE v.term = t.term)), "
    "vg AS (SELECT term AS suggestion, df, "
    f"unnest(list_distinct({_WORD_GRAMS_SQL.format(c='term')})) AS g FROM term_idf), "
    "tg AS (SELECT term, "
    f"unnest(list_distinct({_WORD_GRAMS_SQL.format(c='term')})) AS g FROM oov), "
    "cand AS (SELECT DISTINCT term, suggestion, df FROM tg JOIN vg USING (g)), "
    "ver AS (SELECT term, suggestion, CAST(levenshtein(term, suggestion) AS INTEGER) AS distance, "
    "CAST(df AS BIGINT) AS df FROM cand "
    "WHERE levenshtein(term, suggestion) <= 2 AND term <> suggestion) "
    "SELECT term, suggestion, distance, df, "
    "CAST(row_number() OVER (PARTITION BY term ORDER BY distance ASC, df DESC, suggestion ASC) AS INTEGER) AS rank "
    "FROM ver QUALIFY rank <= 3"
)


def q_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram-blocked + Levenshtein-verified spell correction
    (operators/fusion.spell_suggestions) over typos synthesized from
    the index vocabulary (last char mutated, OOV-filtered)."""
    idx = _docs_index(spark, sf_dir)
    vocab = idx.term_stats
    typos = (
        vocab.where(F.length("term") >= 4)
        .select(
            F.concat(
                F.col("term").substr(F.lit(1), F.length("term") - 1), F.lit("x")
            ).alias("term")
        )
        .distinct()
    )
    oov = typos.join(vocab.select("term"), "term", "left_anti")
    return fu.spell_suggestions(oov, idx)


def register_all() -> None:
    """Import side effect registered the in-window entry (mmr_topk);
    rrf/prf/spell/phrase/proximity/ltr/ranking-metrics register at the
    catalog tail via coverage_queries.register_all."""
