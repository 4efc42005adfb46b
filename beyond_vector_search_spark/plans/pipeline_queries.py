"""Training-data-pipeline operator coverage: dedup (exact, MinHash-LSH,
SimHash, n-gram Jaccard), text analysis, and embedding similarity —
each as an engine plan + DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beyond_vector_search_spark.operators import dedup as dd
from beyond_vector_search_spark.operators import similarity as sim
from beyond_vector_search_spark.operators import text_analysis as ta
from beyond_vector_search_spark.plans.entry_queries import _SQL_TOKENIZE, register
from beyond_vector_search_spark.sources.readers import load_table

_TOKS = (
    "toks AS (SELECT doc_id, "
    + _SQL_TOKENIZE.format(col="text")
    + " AS tokens FROM documents)"
)

# ------------------------------- exact dedup -------------------------------


@register(
    "dedup_exact",
    "WITH hashed AS (SELECT doc_id, md5(text) AS content_hash FROM documents) "
    "SELECT doc_id, content_hash, min(doc_id) OVER (PARTITION BY content_hash) AS keeper_id "
    "FROM hashed",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup_map(load_table(spark, sf_dir, "documents"))


# ------------------------------ MinHash + LSH ------------------------------

_SHINGLES_SQL = (
    "sh AS (SELECT doc_id, CASE WHEN len(tokens) < 3 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_distinct(list_transform(range(1, len(tokens) - 1), "
    "i -> array_to_string(tokens[i:i+2], ' '))) END AS shingles FROM toks)"
)

_SIG_SQL = (
    "sig AS (SELECT doc_id, list_transform(range(0, 16), "
    "i -> list_min(list_transform(shingles, g -> md5(i || ':' || g)))) AS sig FROM sh)"
)


@register(
    "doc_hashes",
    # Per-doc content-hash suite in ONE relation (formerly three
    # entries: minhash_signatures + simhash64 + doc_fingerprint): the
    # 16-hash MinHash signature over word 2-shingles, the 32-bit-folded
    # SimHash64 over the distinct-token set, and the canonical
    # sorted-vocabulary md5 fingerprint.  All three are per-row codegen
    # expressions (no shuffle) joined on doc_id.
    f"WITH {_TOKS}, {_SHINGLES_SQL}, {_SIG_SQL}, "
    "dtk AS (SELECT doc_id, list_distinct(tokens) AS dt FROM toks), "
    "th AS (SELECT doc_id, list_transform(dt, t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs FROM dtk), "
    "bits AS (SELECT doc_id, list_transform(range(0, 32), j -> CASE WHEN "
    "list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END) AS bv FROM th), "
    "sh64 AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), j -> bv[CAST(j AS INTEGER) + 1] << j)) AS BIGINT) AS simhash FROM bits), "
    "fp AS (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS fingerprint FROM toks) "
    "SELECT g.doc_id, array_to_string(g.sig, '|') AS sig_str, h.simhash, f.fingerprint "
    "FROM sig g JOIN sh64 h USING (doc_id) JOIN fp f USING (doc_id)",
)
def q_doc_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # MinHash + SimHash + fingerprint from ONE Arrow pass
    # (dedup.doc_signatures(fingerprint=True) — column-identical to the
    # standalone operators, pinned by test).  The pre-r13-opt form
    # joined a second text scan (ta.doc_fingerprint) onto the kernel
    # output: one extra corpus scan + a corpus-wide join for a column
    # the kernel's tokens already determine.
    return dd.doc_signatures(docs, fingerprint=True).select(
        "doc_id", F.concat_ws("|", "sig").alias("sig_str"), "simhash", "fingerprint"
    )


# LSH near-dup pairs over a corpus that CONTAINS near-duplicates: the
# first 50 docs plus perturbed copies (id+10000, a short suffix added).
# The perturbed corpus is derived deterministically inside the query so
# both engines see identical input.
_NEARDUP_BASE_SQL = (
    "base(doc_id, text) AS (SELECT doc_id, text FROM documents WHERE doc_id < 50 "
    "UNION ALL SELECT doc_id + 10000, text || ' extra token tail' FROM documents WHERE doc_id < 50)"
)

_NEARDUP_TOKS_SQL = (
    "toks AS (SELECT doc_id, "
    + _SQL_TOKENIZE.format(col="text")
    + " AS tokens FROM base)"
)

_BANDS_SQL = (
    "bands AS (SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS band_key "
    "FROM sig, (SELECT unnest(range(0, 4)) AS b))"
)


# SimHash banded-hamming near-dup pairs over a corpus with planted
# duplicates: exact copies (hamming 0) and token-appended copies (small
# hamming).  The Spark side runs the BANDED join (dedup.simhash_pairs);
# the oracle computes the ALL-PAIRS hamming filter — they must agree
# exactly because banding with bands > max_hamming is lossless by
# pigeonhole (at most max_hamming of the disjoint bands can differ).
_SIMHASH_BASE_SQL = (
    "base(doc_id, text) AS (SELECT doc_id, text FROM documents WHERE doc_id < 150 "
    "UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25 "
    "UNION ALL SELECT doc_id + 200000, text || ' qq tail' FROM documents "
    "WHERE doc_id >= 25 AND doc_id < 50)"
)

_SIMHASH_SQL = (
    "btoks AS (SELECT doc_id, "
    + _SQL_TOKENIZE.format(col="text")
    + " AS tokens FROM base), "
    "dtk AS (SELECT doc_id, list_distinct(tokens) AS dt FROM btoks), "
    "th AS (SELECT doc_id, list_transform(dt, t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs FROM dtk), "
    "sbits AS (SELECT doc_id, list_transform(range(0, 32), j -> CASE WHEN "
    "list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END) AS bv FROM th), "
    "sh64 AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), j -> bv[CAST(j AS INTEGER) + 1] << j)) AS BIGINT) AS simhash FROM sbits)"
)


# r10 rotation demotion (selection_pipeline took a window slot): the
# generic banded-hamming join is also exercised in-window by
# minhash_pairs' banded-LSH shape and pinned by the phash kernel tests;
# registered in coverage_queries.register_all's tail section — still
# fully oracled in the local artifacts.
SIMHASH_PAIRS_SQL = (
    f"WITH {_SIMHASH_BASE_SQL}, {_SIMHASH_SQL}, "
    "hpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming "
    "FROM sh64 a JOIN sh64 b ON a.doc_id < b.doc_id) "
    "SELECT doc_a, doc_b, hamming FROM hpairs WHERE hamming <= 3"
)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = (
        docs.where("doc_id < 150").select("doc_id", "text")
        .unionByName(
            docs.where("doc_id < 25").select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.where("doc_id >= 25 AND doc_id < 50").select(
                (F.col("doc_id") + 200000).alias("doc_id"),
                F.concat("text", F.lit(" qq tail")).alias("text"),
            )
        )
    )
    return dd.simhash_pairs(base, bits=32, bands=4, max_hamming=3)


@register(
    "minhash_pairs",
    f"WITH {_NEARDUP_BASE_SQL}, {_NEARDUP_TOKS_SQL}, {_SHINGLES_SQL}, {_SIG_SQL}, {_BANDS_SQL} "
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
    "JOIN bands b ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id",
)
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 50")
    perturbed = docs.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" extra token tail")).alias("text"),
    )
    base = docs.select("doc_id", "text").unionByName(perturbed)
    sigs = dd.minhash_signatures(base)
    return dd.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)


@register(
    "dedup_clusters",
    # transitive closure of the LSH pair graph via a recursive
    # reachability CTE (Spark side: iterative min-label propagation —
    # dedup.connected_components)
    "WITH RECURSIVE "
    f"{_NEARDUP_BASE_SQL}, {_NEARDUP_TOKS_SQL}, {_SHINGLES_SQL}, {_SIG_SQL}, {_BANDS_SQL}, "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
    "JOIN bands b ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id), "
    "edges AS (SELECT doc_a AS u, doc_b AS v FROM cand UNION SELECT doc_b, doc_a FROM cand), "
    "reach(node, r) AS (SELECT u, u FROM edges "
    "UNION SELECT reach.node, edges.v FROM reach JOIN edges ON reach.r = edges.u), "
    "comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node) "
    "SELECT b.doc_id, coalesce(c.component, b.doc_id) AS cluster_id, "
    "b.doc_id = coalesce(c.component, b.doc_id) AS is_canonical "
    "FROM base b LEFT JOIN comp c ON b.doc_id = c.node",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering end-to-end: LSH candidate pairs -> connected
    components -> one canonical doc per duplicate cluster."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 50")
    perturbed = docs.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" extra token tail")).alias("text"),
    )
    base = docs.select("doc_id", "text").unionByName(perturbed)
    pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(base), bands=4, rows_per_band=4)
    return dd.dedup_clusters(base, pairs)


# Incremental near-dup: the perturbed copies arrive as a NEW batch and
# are checked against the base corpus's signatures — the corpus never
# self-joins.  Registered at the catalog TAIL (coverage_queries.
# register_all): it restates minhash_pairs' in-window banded-join shape
# in its asymmetric, ingest-time form.  The oracle derives the SAME
# band relation and keeps only pairs touching the new batch (ids >=
# 10000) — exactly the operator's contract (cross ∪ new-self).
INCREMENTAL_DEDUP_SQL = (
    f"WITH {_NEARDUP_BASE_SQL}, {_NEARDUP_TOKS_SQL}, {_SHINGLES_SQL}, {_SIG_SQL}, {_BANDS_SQL} "
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
    "JOIN bands b ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id "
    "WHERE a.doc_id >= 10000 OR b.doc_id >= 10000"
)


def q_incremental_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup.lsh_pairs_against_corpus — ingest-time near-dup: the new
    batch's band keys join the corpus's (cross pairs) and themselves
    (new-self pairs); equivalence with the monolithic join is pinned by
    test_incremental_lsh_matches_monolithic."""
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 50")
    new = docs.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" extra token tail")).alias("text"),
    )
    return dd.lsh_pairs_against_corpus(
        dd.minhash_signatures(new),
        dd.minhash_signatures(docs.select("doc_id", "text")),
        bands=4,
        rows_per_band=4,
    )


# r9 rotation: this window slot goes to incremental_dedup_pairs — the
# ingest-time ASYMMETRIC banded join (new batch × persisted corpus
# bands, new-self pairs included, corpus never self-joins), the shape
# every streaming-ingest dedup runs and one nothing else in-window
# exercises.  ngram_jaccard_pairs moves to the tail (coverage_queries.
# register_all), still fully oracled there: its verify math is the
# token-set Jaccard that duplicate_spans' in-window shingle self-join
# and the fuzzy-contamination tail oracle both replay.
def _register_r9_rotation() -> None:
    register("incremental_dedup_pairs", INCREMENTAL_DEDUP_SQL)(
        q_incremental_dedup_pairs
    )


_register_r9_rotation()


# --------------------------- n-gram (token) Jaccard ------------------------


NGRAM_JACCARD_SQL = (
    "WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 60), "
    f"dtoks AS (SELECT doc_id, list_distinct({_SQL_TOKENIZE.format(col='text')}) AS tokens FROM sub), "
    "ex AS (SELECT doc_id, unnest(tokens) AS t FROM dtoks), "
    "sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni "
    "FROM ex a JOIN ex b ON a.t = b.t AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) "
    "SELECT doc_a, doc_b, CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard "
    "FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id "
    "WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.8"
)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 60")
    # shingle_n=1 -> distinct-token-set Jaccard (int-exact division)
    return dd.jaccard_pairs(docs, shingle_n=1, threshold=0.8)


@register(
    "duplicate_spans",
    # Cross-document EXACT duplicated token spans (the relational form
    # of Lee et al. 2022's exact-substring dedup): maximal runs of
    # consecutive matching 8-token shingles at constant offset, via the
    # positional inverted shingle index + a gaps-and-islands window.
    # The derived corpus plants two signals: a 12-token span shared by
    # the doc_id%31 docs (df 7 — KEPT, must surface as maximal spans)
    # and a 10-token boilerplate on every even doc (df 100 — must be
    # dropped by the max_shingle_df=20 hot-key guard in both engines).
    "WITH sub AS (SELECT doc_id, "
    "text || "
    "CASE WHEN doc_id % 31 = 0 THEN ' exact duplicated training span alpha beta gamma delta epsilon zeta eta theta' ELSE '' END || "
    "CASE WHEN doc_id % 2 = 0 THEN ' common boilerplate footer appears in half of all documents here' ELSE '' END AS text "
    "FROM documents WHERE doc_id < 200), "
    f"toked AS (SELECT doc_id, {_SQL_TOKENIZE.format(col='text')} AS toks FROM sub), "
    "sh AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, "
    "array_to_string(toks[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)], ' ') AS sh "
    "FROM (SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - 6, 1))) AS i FROM toked)), "
    "keep AS (SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS df FROM sh GROUP BY sh) WHERE df <= 20), "
    "kept AS (SELECT s.doc_id, s.pos, s.sh FROM sh s JOIN keep USING (sh)), "
    "m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b "
    "FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id), "
    "isl AS (SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS off, "
    "pos_a - row_number() OVER (PARTITION BY id_a, id_b, pos_a - pos_b ORDER BY pos_a) AS isl "
    "FROM m), "
    "spans AS (SELECT id_a, id_b, min(pos_a) AS start_a, min(pos_b) AS start_b, "
    "CAST(count(*) + 7 AS BIGINT) AS span_tokens "
    "FROM isl GROUP BY id_a, id_b, off, isl) "
    "SELECT id_a, id_b, start_a, start_b, span_tokens FROM spans WHERE span_tokens >= 8",
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 200")
    plant1 = F.when(
        F.col("doc_id") % 31 == 0,
        F.lit(" exact duplicated training span alpha beta gamma delta epsilon zeta eta theta"),
    ).otherwise(F.lit(""))
    plant2 = F.when(
        F.col("doc_id") % 2 == 0,
        F.lit(" common boilerplate footer appears in half of all documents here"),
    ).otherwise(F.lit(""))
    planted = docs.select("doc_id", F.concat("text", plant1, plant2).alias("text"))
    return dd.duplicate_spans(planted, n=8, max_shingle_df=20)


# ------------------------------ text analysis ------------------------------


_STOP_EN_SQL = "('" + "', '".join(ta.STOPWORDS_EN) + "')"


def _votes_sql(words: list[str]) -> str:
    return "CAST(len(list_filter(tokens, x -> x IN ('" + "', '".join(words) + "'))) AS BIGINT)"


@register(
    "text_profile",
    # Per-doc text-analysis suite in ONE relation (formerly three
    # entries: token_stats + quality_score + lang_guess): token
    # accounting, length/alpha/stopword quality ratios with the blended
    # quality score, and the stopword-vote n-gram language ID.  Each
    # component is the corresponding operators.text_analysis function;
    # the oracle recomputes all of it in pure SQL.
    f"WITH {_TOKS}, "
    "tstats AS (SELECT t.doc_id, CAST(len(t.tokens) AS BIGINT) AS n_tokens, "
    "CAST(len(list_distinct(t.tokens)) AS BIGINT) AS n_distinct, "
    "CASE WHEN len(t.tokens) = 0 THEN 0.0 ELSE "
    "CAST(list_sum(list_transform(t.tokens, x -> length(x))) AS DOUBLE) / len(t.tokens) END AS avg_token_len, "
    # token-budget counters: whitespace split + lookahead-free GPT-2-ish
    # pre-tokenizer (apostrophe doubled for the SQL literal)
    "CAST(len(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS ws_tokens, "
    "CAST(len(regexp_extract_all(d.text, "
    "'''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+')) AS BIGINT) AS bpe_ish_tokens "
    "FROM toks t JOIN documents d USING (doc_id)), "
    "base AS (SELECT d.doc_id, d.text, t.tokens, length(d.text) AS n_chars, "
    "length(regexp_replace(d.text, '[^A-Za-z0-9]', '', 'g')) AS n_alpha, "
    f"len(list_filter(t.tokens, x -> x IN {_STOP_EN_SQL})) AS n_stop "
    "FROM documents d JOIN toks t USING (doc_id)), "
    "quality AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
    "CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_chars END AS alpha_ratio, "
    "CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / len(tokens) END AS stopword_ratio "
    "FROM base), "
    "qscore AS (SELECT doc_id, n_chars, alpha_ratio, stopword_ratio, "
    "0.4 * alpha_ratio + 0.4 * least(1.0, stopword_ratio * 5) + "
    "0.2 * (CASE WHEN n_chars >= 50 AND n_chars <= 5000 THEN 1.0 ELSE 0.0 END) AS quality "
    "FROM quality), "
    "votes AS (SELECT d.doc_id, d.text, "
    f"{_votes_sql(ta.STOPWORDS_EN)} AS votes_en, "
    f"{_votes_sql(ta.STOPWORDS_DE)} AS votes_de, "
    f"{_votes_sql(ta.STOPWORDS_FR)} AS votes_fr, "
    f"{_votes_sql(ta.STOPWORDS_ES)} AS votes_es "
    "FROM documents d JOIN toks t USING (doc_id)), "
    "lang AS (SELECT doc_id, CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' "
    "WHEN votes_en >= votes_de AND votes_en >= votes_fr AND votes_en >= votes_es AND votes_en > 0 THEN 'en' "
    "WHEN votes_de >= votes_es AND votes_de >= votes_fr AND votes_de > 0 THEN 'de' "
    "WHEN votes_es >= votes_fr AND votes_es > 0 THEN 'es' "
    "WHEN votes_fr > 0 THEN 'fr' ELSE 'unknown' END AS lang_guess, "
    "votes_en, votes_de, votes_fr, votes_es FROM votes) "
    "SELECT t.doc_id, t.n_tokens, t.n_distinct, t.avg_token_len, "
    "t.ws_tokens, t.bpe_ish_tokens, "
    "q.n_chars, q.alpha_ratio, q.stopword_ratio, q.quality, "
    "l.lang_guess, l.votes_en, l.votes_de, l.votes_fr, l.votes_es "
    "FROM tstats t JOIN qscore q USING (doc_id) JOIN lang l USING (doc_id)",
)
def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # one scan, one projection (r13 optimization): all 15 columns are
    # per-row, so the former token_stats ⋈ quality_score ⋈ lang_guess
    # compose paid three text scans + two corpus-wide joins for a
    # relation one narrow map produces (parity pinned by test)
    return ta.text_profile(docs)


# --------------------------- embedding similarity --------------------------

_COS_SQL = (
    "CASE WHEN sqrt(list_sum(list_transform(qv, x -> x * x))) * "
    "sqrt(list_sum(list_transform(cv, x -> x * x))) = 0 THEN 0.0 "
    "ELSE list_dot_product(qv, cv) / (sqrt(list_sum(list_transform(qv, x -> x * x))) * "
    "sqrt(list_sum(list_transform(cv, x -> x * x)))) END"
)


_QUANT_SQL = (
    # symmetric per-vector int8: scale = max|v|/127, q = round(v/scale)
    "SELECT vec_id, CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 "
    "THEN list_transform(v, x -> 0) "
    "ELSE list_transform(v, x -> CAST(round(x / (list_max(list_transform(v, y -> abs(y))) / 127.0)) AS INTEGER)) END AS qv "
    "FROM {src}"
)


@register(
    "knn_topk",
    # Brute-force cosine top-k at BOTH serving precisions in one entry
    # (formerly knn_cosine_topk + knn_quantized_topk): method='exact' is
    # the float64 scan (the correctness baseline every ANN variant is
    # measured against); method='int8' is the symmetric per-vector
    # int8-quantized scan (4x memory-bandwidth lever at 100 TB) with
    # integer-exact dot/norms and one float division.
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), "
    "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), "
    f"xscored AS (SELECT query_id, neighbor_id, {_COS_SQL} AS cos "
    "FROM q CROSS JOIN c WHERE query_id <> neighbor_id), "
    "xranked AS (SELECT query_id, neighbor_id, round(cos, 6) AS cos, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS INTEGER) AS rank "
    "FROM xscored), "
    "qe AS (" + _QUANT_SQL.format(src="e") + "), "
    "qq AS (SELECT vec_id AS query_id, qv AS qa FROM qe WHERE vec_id < 5), "
    "qc AS (SELECT vec_id AS neighbor_id, qv AS qb FROM qe), "
    "iscored AS (SELECT query_id, neighbor_id, "
    "list_sum(list_transform(range(1, len(qa) + 1), i -> qa[CAST(i AS INTEGER)] * qb[CAST(i AS INTEGER)])) AS dot, "
    "list_sum(list_transform(qa, x -> x * x)) AS na, "
    "list_sum(list_transform(qb, x -> x * x)) AS nb "
    "FROM qq CROSS JOIN qc WHERE query_id <> neighbor_id), "
    "iranked AS (SELECT query_id, neighbor_id, "
    "round(CASE WHEN na = 0 OR nb = 0 THEN 0.0 "
    "ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) END, 6) AS cos, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(CASE WHEN na = 0 OR nb = 0 THEN 0.0 "
    "ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) END, 6) DESC, "
    "neighbor_id ASC) AS INTEGER) AS rank FROM iscored) "
    "SELECT 'exact' AS method, query_id, neighbor_id, cos, rank FROM xranked WHERE rank <= 5 "
    "UNION ALL "
    "SELECT 'int8', query_id, neighbor_id, cos, rank FROM iranked WHERE rank <= 5",
)
def q_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # one fused Arrow pass for both precisions (knn_dual_topk) — each
    # corpus vector crosses the Python boundary once for the pair of
    # arms; bit-identical to the single-method kernels (pinned)
    return sim.knn_dual_topk(emb, queries, k=5)


@register(
    "pq_topk",
    # Product-quantization ANN (Jegou et al., TPAMI 2011) in both serving
    # shapes, one tagged relation: method='adc' is the pure asymmetric-
    # distance scan over 8-byte PQ codes (32x less I/O than raw float32
    # vectors at 100 TB); method='adc_rerank' re-ranks the ADC top-50
    # shortlist with the exact squared L2 (the refinement stage that buys
    # recall back — the shortlist is q x 50 ids, a broadcast, never a
    # corpus rescan).  Codebooks are the deterministic head-sample rule
    # (subspace slices of the 16 lowest-id vectors), so unlike MLlib's
    # LSH the whole ANN path is cross-engine hash-checkable.
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
    "heads AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code_id, v AS hv "
    "FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)), "
    "pos AS (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS i), "
    "subpos AS (SELECT i, CAST(floor((i - 1) / 8) AS INTEGER) AS sub FROM pos), "
    "enc0 AS (SELECT x.vec_id, s.sub, h.code_id, "
    "round(sum((x.v[s.i] - h.hv[s.i]) * (x.v[s.i] - h.hv[s.i])), 6) AS d2 "
    "FROM e x CROSS JOIN subpos s CROSS JOIN heads h GROUP BY x.vec_id, s.sub, h.code_id), "
    "enc AS (SELECT vec_id, sub, code_id FROM ("
    "SELECT vec_id, sub, code_id, "
    "row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, code_id ASC) AS rn "
    "FROM enc0) WHERE rn = 1), "
    "q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5), "
    "lut AS (SELECT qq.query_id, s.sub, h.code_id, "
    "round(sum((qq.v[s.i] - h.hv[s.i]) * (qq.v[s.i] - h.hv[s.i])), 6) AS d2 "
    "FROM q qq CROSS JOIN subpos s CROSS JOIN heads h GROUP BY qq.query_id, s.sub, h.code_id), "
    "adc AS (SELECT l.query_id, en.vec_id AS neighbor_id, round(sum(l.d2), 6) AS dist "
    "FROM enc en JOIN lut l ON l.sub = en.sub AND l.code_id = en.code_id "
    "WHERE en.vec_id <> l.query_id GROUP BY l.query_id, en.vec_id), "
    "adcr AS (SELECT query_id, neighbor_id, dist, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(dist, 6) ASC, neighbor_id ASC) AS INTEGER) AS rank "
    "FROM adc), "
    "short AS (SELECT query_id, neighbor_id FROM adcr WHERE rank <= 50), "
    "exact AS (SELECT s.query_id, s.neighbor_id, "
    "round(sum((qv.v[p.i] - cv.v[p.i]) * (qv.v[p.i] - cv.v[p.i])), 6) AS dist "
    "FROM short s JOIN e qv ON qv.vec_id = s.query_id JOIN e cv ON cv.vec_id = s.neighbor_id "
    "CROSS JOIN pos p GROUP BY s.query_id, s.neighbor_id), "
    "exr AS (SELECT query_id, neighbor_id, dist, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(dist, 6) ASC, neighbor_id ASC) AS INTEGER) AS rank "
    "FROM exact), "
    # --- method='ivfpq_residual': the full FAISS-IVFADC composition ---
    # vectors coded as offsets from their assigned centroid; queries
    # probe top-2 centroids and score bucket members with a
    # per-probed-centroid LUT built from the QUERY residual.  Centroids
    # are the 8 lowest-id vectors (the ivf_topk_probe convention);
    # residual codebooks are the head-sample rule applied to RESIDUALS.
    "cents AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8), "
    "rass0 AS (SELECT e.vec_id, c.centroid_id, "
    "CASE WHEN sqrt(list_sum(list_transform(e.v, x -> x * x))) * "
    "sqrt(list_sum(list_transform(c.cv, x -> x * x))) = 0 THEN 0.0 "
    "ELSE list_dot_product(e.v, c.cv) / (sqrt(list_sum(list_transform(e.v, x -> x * x))) * "
    "sqrt(list_sum(list_transform(c.cv, x -> x * x)))) END AS cos "
    "FROM e CROSS JOIN cents c), "
    "rass AS (SELECT vec_id, centroid_id FROM ("
    "SELECT vec_id, centroid_id, row_number() OVER (PARTITION BY vec_id "
    "ORDER BY round(cos, 6) DESC, centroid_id ASC) AS rn FROM rass0) WHERE rn = 1), "
    "resid AS MATERIALIZED (SELECT a.vec_id, a.centroid_id, "
    "list_transform(range(1, 65), i -> e.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) AS rv "
    "FROM rass a JOIN e ON e.vec_id = a.vec_id JOIN cents c USING (centroid_id)), "
    "rheads AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code_id, rv AS hv "
    "FROM (SELECT * FROM resid ORDER BY vec_id LIMIT 16)), "
    "renc0 AS (SELECT r.vec_id, r.centroid_id, s.sub, h.code_id, "
    "round(sum((r.rv[s.i] - h.hv[s.i]) * (r.rv[s.i] - h.hv[s.i])), 6) AS d2 "
    "FROM resid r CROSS JOIN subpos s CROSS JOIN rheads h GROUP BY r.vec_id, r.centroid_id, s.sub, h.code_id), "
    "renc AS MATERIALIZED (SELECT vec_id, centroid_id, sub, code_id FROM ("
    "SELECT vec_id, centroid_id, sub, code_id, "
    "row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, code_id ASC) AS rn "
    "FROM renc0) WHERE rn = 1), "
    "rprobe0 AS (SELECT qq.query_id, c.centroid_id, "
    "CASE WHEN sqrt(list_sum(list_transform(qq.v, x -> x * x))) * "
    "sqrt(list_sum(list_transform(c.cv, x -> x * x))) = 0 THEN 0.0 "
    "ELSE list_dot_product(qq.v, c.cv) / (sqrt(list_sum(list_transform(qq.v, x -> x * x))) * "
    "sqrt(list_sum(list_transform(c.cv, x -> x * x)))) END AS cos "
    "FROM q qq CROSS JOIN cents c), "
    "rprobe AS (SELECT query_id, centroid_id FROM ("
    "SELECT query_id, centroid_id, row_number() OVER (PARTITION BY query_id "
    "ORDER BY round(cos, 6) DESC, centroid_id ASC) AS rn FROM rprobe0) WHERE rn <= 2), "
    "qres AS (SELECT p.query_id, p.centroid_id, "
    "list_transform(range(1, 65), i -> qq.v[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) AS rv "
    "FROM rprobe p JOIN q qq USING (query_id) JOIN cents c USING (centroid_id)), "
    "rlut AS MATERIALIZED (SELECT qr.query_id, qr.centroid_id, s.sub, h.code_id, "
    "round(sum((qr.rv[s.i] - h.hv[s.i]) * (qr.rv[s.i] - h.hv[s.i])), 6) AS d2 "
    "FROM qres qr CROSS JOIN subpos s CROSS JOIN rheads h "
    "GROUP BY qr.query_id, qr.centroid_id, s.sub, h.code_id), "
    "radc AS (SELECT l.query_id, en.vec_id AS neighbor_id, round(sum(l.d2), 6) AS dist "
    "FROM renc en JOIN rlut l ON l.centroid_id = en.centroid_id "
    "AND l.sub = en.sub AND l.code_id = en.code_id "
    "WHERE en.vec_id <> l.query_id GROUP BY l.query_id, en.vec_id), "
    "radcr AS (SELECT query_id, neighbor_id, dist, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(dist, 6) ASC, neighbor_id ASC) AS INTEGER) AS rank "
    "FROM radc) "
    "SELECT 'adc' AS method, query_id, neighbor_id, dist, rank FROM adcr WHERE rank <= 5 "
    "UNION ALL "
    "SELECT 'adc_rerank', query_id, neighbor_id, dist, rank FROM exr WHERE rank <= 5 "
    "UNION ALL "
    "SELECT 'ivfpq_residual', query_id, neighbor_id, dist, rank FROM radcr WHERE rank <= 5",
)
def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # ONE quantized scan serves both ADC arms (r13-opt): pq_topk(k=50)
    # is exactly the rerank arm's shortlist (same window, same
    # (dist, neighbor_id) tie-breaks), so the pure-ADC top-5 is its
    # rank<=5 prefix and pq_rerank refines the same 50 rows the old
    # two-call form did — which paid a SECOND full ADC kernel pass over
    # the corpus codes for rows the first pass already ordered (at
    # 100 TB: one corpus scan saved per batch).  Derivation pinned by
    # test_pq_topk_shared_scan_derivation; lazy localCheckpoint so the
    # union's single action materializes the 250-row shortlist once.
    short = sim.pq_topk(
        emb, queries, m=8, dim=64, n_codes=16, k=50
    ).localCheckpoint(eager=False)
    adc = short.where(F.col("rank") <= 5)
    rr = sim.pq_rerank(short, emb, queries, k=5)
    centroids = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    rez = sim.ivfpq_residual_topk(
        emb, queries, centroids, m=8, dim=64, n_codes=16, k=5, nprobe=2
    )
    return (
        adc.select(F.lit("adc").alias("method"), "*")
        .unionByName(rr.select(F.lit("adc_rerank").alias("method"), "*"))
        .unionByName(rez.select(F.lit("ivfpq_residual").alias("method"), "*"))
    )


@register(
    "sampling_methods",
    # The three deterministic sampling operators in ONE tagged relation
    # (formerly deterministic_sample + stratified_sample_lang +
    # mixture_sample_lang).  All are md5-hash-driven — reproducible
    # across engines, runs, and cluster sizes (never rand()), with no
    # join or shuffle beyond the stratified rank:
    #   hash_fraction    ~20% keep by hash bucket; detail = bucket
    #   stratified_fixed_n  10 docs per lang by seeded hash rank;
    #                       detail = sample_rank
    #   domain_mixture   Pile/Gopher-style per-lang keep fractions;
    #                    detail = NULL (membership is the output)
    "WITH det AS (SELECT doc_id, lang, "
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket "
    "FROM documents), "
    "strat AS (SELECT doc_id, lang, "
    "CAST(row_number() OVER (PARTITION BY lang ORDER BY "
    "CAST('0x' || substring(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) ASC, doc_id ASC) AS BIGINT) AS sample_rank "
    "FROM documents), "
    "mix AS (SELECT doc_id, lang, "
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS h, "
    "CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000 WHEN 'fr' THEN 500000 "
    "WHEN 'es' THEN 250000 WHEN 'zh' THEN 250000 ELSE 0 END AS cut FROM documents) "
    "SELECT 'hash_fraction' AS method, doc_id, lang, CAST(bucket AS BIGINT) AS detail "
    "FROM det WHERE bucket < 20 "
    "UNION ALL SELECT 'stratified_fixed_n', doc_id, lang, sample_rank "
    "FROM strat WHERE sample_rank <= 10 "
    "UNION ALL SELECT 'domain_mixture', doc_id, lang, CAST(NULL AS BIGINT) "
    "FROM mix WHERE h < cut",
)
def q_sampling_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beyond_vector_search_spark.functions.hashing import hash64
    from beyond_vector_search_spark.operators.scale import (
        mixture_sample,
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = F.pmod(hash64(F.col("doc_id")), F.lit(100)).cast("long")
    det = (
        docs.select("doc_id", "lang", bucket.alias("detail"))
        .where(F.col("detail") < 20)
        .select(F.lit("hash_fraction").alias("method"), "doc_id", "lang", "detail")
    )
    strat = stratified_sample(
        docs, strata_col="lang", key_col="doc_id", n_per_stratum=10, seed=7
    ).select(
        F.lit("stratified_fixed_n").alias("method"),
        "doc_id",
        "lang",
        F.col("sample_rank").cast("long").alias("detail"),
    )
    mix = mixture_sample(
        docs, strata_col="lang", key_col="doc_id",
        weights={"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25},
    ).select(
        F.lit("domain_mixture").alias("method"),
        "doc_id",
        "lang",
        F.lit(None).cast("long").alias("detail"),
    )
    return det.unionByName(strat).unionByName(mix)


def _docs_index_pipeline(spark, sf_dir):
    from beyond_vector_search_spark.plans.entry_queries import _docs_index

    return _docs_index(spark, sf_dir)


# --------------------- NN-Descent kNN graph (tail entry) ---------------------


def _nndescent_graph_sql(
    *, k: int = 5, iterations: int = 2, L: int = 15, sample_rate: float = 1.0
) -> str:
    """The NN-Descent graph unrolled as chained MATERIALIZED CTEs (the
    mmr-oracle pattern: DuckDB inlines plain CTEs, and an iterative
    chain re-derives exponentially without MATERIALIZED).  Every stage
    mirrors operators/similarity.nndescent_knn_graph exactly: md5-hash
    bucket init under two seeds, per-round "new"-edge flags (an edge is
    new iff absent from the round-before-last graph — Dong et al.'s
    incremental search), reverse-capped undirection, optional
    deterministic ρ-sampling of each (node, flag) adjacency group by
    md5-hash order, neighbor-of-neighbor candidates gated on at least
    one new edge, fresh-pair scoring, top-L merge — cosines rounded to
    6 on both engines before every ranking."""
    import math as _math

    nb_div = 2 * (L + 1)
    samp_cap = (
        max(1, _math.ceil(sample_rate * L)) if sample_rate < 1.0 else None
    )
    cos = (
        "round(CASE WHEN a.nrm * c.nrm = 0 THEN 0.0 "
        "ELSE list_dot_product(a.v, c.v) / (a.nrm * c.nrm) END, 6)"
    )

    def bucket(seed: int) -> str:
        return (
            f"b{seed} AS (SELECT id, CAST('0x' || substring(md5('{seed}:' || "
            f"CAST(id AS VARCHAR)), 1, 15) AS BIGINT) % nb.nb AS b FROM e, nb), "
        )

    sql = (
        "WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        "nrm AS MATERIALIZED (SELECT id, v, "
        "sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e), "
        f"nb AS (SELECT greatest(1, count(*) // {nb_div}) AS nb FROM e), "
        + bucket(1)
        + bucket(2)
        + "ip AS (SELECT x.id AS node_id, y.id AS neighbor_id "
        "FROM b1 x JOIN b1 y USING (b) WHERE x.id <> y.id "
        "UNION SELECT x.id, y.id FROM b2 x JOIN b2 y USING (b) WHERE x.id <> y.id), "
        f"s0 AS MATERIALIZED (SELECT p.node_id, p.neighbor_id, {cos} AS cos "
        "FROM ip p JOIN nrm a ON a.id = p.node_id JOIN nrm c ON c.id = p.neighbor_id), "
        "g0 AS MATERIALIZED (SELECT * FROM (SELECT node_id, neighbor_id, cos, "
        "CAST(row_number() OVER (PARTITION BY node_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank "
        f"FROM s0) WHERE rank <= {L}), "
    )
    for r in range(1, iterations + 1):
        p = r - 1
        if r == 1:
            sql += (
                f"f{r} AS (SELECT node_id, neighbor_id, cos, 1 AS new FROM g{p}), "
            )
        else:
            sql += (
                f"f{r} AS (SELECT g.node_id, g.neighbor_id, g.cos, "
                f"CASE WHEN h.node_id IS NULL THEN 1 ELSE 0 END AS new "
                f"FROM g{p} g LEFT JOIN g{r - 2} h "
                f"ON h.node_id = g.node_id AND h.neighbor_id = g.neighbor_id), "
            )
        sql += (
            f"rev{r} AS (SELECT node_id, neighbor_id, new FROM ("
            f"SELECT g.neighbor_id AS node_id, g.node_id AS neighbor_id, g.new, "
            f"row_number() OVER (PARTITION BY g.neighbor_id ORDER BY g.cos DESC, g.node_id ASC) AS rr "
            f"FROM f{r} g) WHERE rr <= {L}), "
            f"u{r} AS MATERIALIZED (SELECT node_id, neighbor_id, max(new) AS new FROM ("
            f"SELECT node_id, neighbor_id, new FROM f{r} "
            f"UNION ALL SELECT node_id, neighbor_id, new FROM rev{r}) "
            f"GROUP BY node_id, neighbor_id), "
        )
        uname = f"u{r}"
        if samp_cap is not None:
            sql += (
                f"su{r} AS MATERIALIZED (SELECT node_id, neighbor_id, new FROM ("
                f"SELECT u.*, row_number() OVER (PARTITION BY node_id, new "
                f"ORDER BY CAST('0x' || substring(md5('{r}:' || CAST(node_id AS VARCHAR) "
                f"|| ':' || CAST(neighbor_id AS VARCHAR)), 1, 15) AS BIGINT) ASC, "
                f"neighbor_id ASC) AS rs FROM u{r} u) WHERE rs <= {samp_cap}), "
            )
            uname = f"su{r}"
        sql += (
            f"cand{r} AS (SELECT DISTINCT p.node_id, q.neighbor_id "
            f"FROM {uname} p JOIN {uname} q ON p.neighbor_id = q.node_id "
            f"WHERE p.node_id <> q.neighbor_id AND (p.new = 1 OR q.new = 1)), "
            f"fr{r} AS (SELECT c.node_id, c.neighbor_id FROM cand{r} c "
            f"WHERE NOT EXISTS (SELECT 1 FROM g{p} g "
            f"WHERE g.node_id = c.node_id AND g.neighbor_id = c.neighbor_id)), "
            f"sc{r} AS MATERIALIZED (SELECT f.node_id, f.neighbor_id, {cos} AS cos "
            f"FROM fr{r} f JOIN nrm a ON a.id = f.node_id JOIN nrm c ON c.id = f.neighbor_id), "
            f"m{r} AS (SELECT node_id, neighbor_id, max(cos) AS cos FROM ("
            f"SELECT node_id, neighbor_id, cos FROM g{p} "
            f"UNION ALL SELECT node_id, neighbor_id, cos FROM sc{r}) "
            f"GROUP BY node_id, neighbor_id), "
            f"g{r} AS MATERIALIZED (SELECT * FROM (SELECT node_id, neighbor_id, cos, "
            f"CAST(row_number() OVER (PARTITION BY node_id ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank "
            f"FROM m{r}) WHERE rank <= {L}), "
        )
    sql = sql.rstrip(", ")
    sql += (
        f" SELECT node_id, neighbor_id, cos, rank FROM g{iterations} WHERE rank <= {k}"
    )
    return sql


KNN_GRAPH_NND_SQL = _nndescent_graph_sql(k=5, iterations=2, L=15, sample_rate=0.5)


def q_knn_graph_nnd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine kNN GRAPH over every embedding via NN-Descent
    (similarity.nndescent_knn_graph) — driver-window entry (r7
    rotation) with a full hash-checked oracle: the algorithm is
    deterministic end-to-end
    (md5-hash init buckets AND md5-hash ρ-sampling, rounded cosines, id
    tie-breaks), so the unrolled DuckDB chain reproduces the graph
    byte-for-byte — including the incremental new-edge candidate rule
    and the sampled adjacency lists (sample_rate=0.5, the production
    cost-control shape).  iterations=2 bounds the oracle's CTE chain;
    recall quality at the production setting is pinned separately
    (test_nndescent_knn_graph_recall)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.nndescent_knn_graph(emb, k=5, iterations=2, sample_rate=0.5)


FILTERED_KNN_SQL = (
    # Filtered vector search in both serving shapes, one tagged
    # relation: method='pre_lang_en' filters FIRST (cross-table allowed
    # set: embeddings whose doc is English) and runs the exact cosine
    # top-5 over survivors — perfect recall within the filter, scan I/O
    # tracks selectivity; method='post_label3' searches the FULL corpus
    # for the global top-20, then filters to label=3 and renumbers —
    # filter-independent scan cost, but the selective filter UNDER-FILLS
    # (queries return < 5 rows), the classic vector-store post-filter
    # caveat made driver-visible in the result relation itself.
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5), "
    "allowed AS (SELECT doc_id FROM documents WHERE lang = 'en'), "
    "pc AS (SELECT vec_id AS neighbor_id, v AS cv FROM e "
    "WHERE vec_id IN (SELECT doc_id FROM allowed)), "
    f"pscored AS (SELECT query_id, neighbor_id, {_COS_SQL} AS cos "
    "FROM q CROSS JOIN pc WHERE query_id <> neighbor_id), "
    "pranked AS (SELECT query_id, neighbor_id, round(cos, 6) AS cos, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS INTEGER) AS rank "
    "FROM pscored), "
    "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), "
    f"gscored AS (SELECT query_id, neighbor_id, {_COS_SQL} AS cos "
    "FROM q CROSS JOIN c WHERE query_id <> neighbor_id), "
    "granked AS (SELECT query_id, neighbor_id, round(cos, 6) AS cos, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS INTEGER) AS rank "
    "FROM gscored), "
    "post AS (SELECT query_id, neighbor_id, cos, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY rank ASC) AS INTEGER) AS rank "
    "FROM granked WHERE rank <= 20 "
    "AND neighbor_id IN (SELECT vec_id FROM e WHERE label = 3)) "
    "SELECT 'pre_lang_en' AS method, query_id, neighbor_id, cos, rank "
    "FROM pranked WHERE rank <= 5 "
    "UNION ALL "
    "SELECT 'post_label3', query_id, neighbor_id, cos, rank FROM post WHERE rank <= 5"
)


def q_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (similarity.filtered_knn_topk) — the
    metadata-predicate + top-k serving pattern in both modes: 'pre'
    (cross-table allowed= semi-join before the exact scan; the 100 TB
    shape for selective filters — predicate pushdown pinned by
    test_filtered_knn_predicate_pushes_into_parquet_scan) and 'post'
    (global top-20 then filter; under-fill visible in the relation).
    Driver-window entry since the r7 rotation (filtered serving is a
    headline vector-store feature; topk_alldocs_parity restates the
    plain topk shape from the tail instead)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pre = sim.filtered_knn_topk(
        emb, queries, allowed=docs.where("lang = 'en'").select("doc_id"), k=5
    )
    post = sim.filtered_knn_topk(
        emb, queries, predicate="label = 3", mode="post", oversample=4, k=5
    )
    return pre.select(F.lit("pre_lang_en").alias("method"), "*").unionByName(
        post.select(F.lit("post_label3").alias("method"), "*")
    )


# ---------------- PageRank over the kNN similarity graph -------------------

_PR_K = 5
_PR_ITERS = 5
_PR_DAMPING = 0.85


def _pagerank_sql() -> str:
    """Unrolled power iteration (the NN-Descent oracle technique for
    iterative fixpoints) in the operator's 1e-9 FIXED-POINT INTEGER
    arithmetic — every step is exact BIGINT math (``//`` here, ``div``
    in Spark), so there is no float rounding boundary for the engines
    to disagree on.  See operators/graph.py's determinism note: the
    rounded-float alternative measurably diverges (0.85 × the 2e-10
    contribution grid lands exactly on 1e-9 half-boundaries)."""
    from beyond_vector_search_spark.operators.graph import (
        RANK_SCALE,
        _damping_fraction,
    )

    d_num, d_den = _damping_fraction(_PR_DAMPING)
    base_units = ((d_den - d_num) * RANK_SCALE) // d_den
    ctes = (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e), "
        "c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e), "
        f"xscored AS (SELECT query_id, neighbor_id, {_COS_SQL} AS cos "
        "FROM q CROSS JOIN c WHERE query_id <> neighbor_id), "
        "edges AS MATERIALIZED (SELECT query_id AS src, neighbor_id AS dst FROM "
        "(SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rnk FROM xscored) "
        f"WHERE rnk <= {_PR_K}), "
        "deg AS MATERIALIZED (SELECT src, count(*) AS od FROM edges GROUP BY src), "
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges "
        "UNION SELECT DISTINCT dst FROM edges), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes), "
        f"r0 AS MATERIALIZED (SELECT id, CAST({RANK_SCALE} AS BIGINT) // n AS u "
        "FROM nodes, nn)"
    )
    for k in range(_PR_ITERS):
        ctes += (
            f", r{k + 1} AS MATERIALIZED (SELECT nodes.id, "
            f"CAST({base_units} AS BIGINT) // n "
            f"+ ({d_num} * coalesce(t.m, CAST(0 AS BIGINT))) // {d_den} AS u "
            "FROM nodes LEFT JOIN (SELECT dst AS id, sum(r.u // od) AS m "
            f"FROM edges JOIN deg USING (src) JOIN r{k} r ON r.id = edges.src "
            "GROUP BY dst) t ON t.id = nodes.id, nn)"
        )
    return ctes + (
        " SELECT n.id AS vec_id, CAST(r.u AS BIGINT) AS rank_units, "
        f"round(r.u / {float(RANK_SCALE)!r}, 9) AS rank, "
        "coalesce(i.in_deg, 0) AS in_deg "
        f"FROM nodes n JOIN r{_PR_ITERS} r ON r.id = n.id "
        "LEFT JOIN (SELECT dst AS id, CAST(count(*) AS BIGINT) AS in_deg "
        "FROM edges GROUP BY dst) i ON i.id = n.id"
    )


GRAPH_PAGERANK_SQL = _pagerank_sql()


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the exact cosine-kNN digraph
    (operators/graph.py): 5 power-iteration steps, damping 0.85, in
    1e-9 fixed-point integer arithmetic — the data-selection/centrality
    signal over the embedding corpus.  Catalog tail: restates
    knn_graph_nnd's in-window iterative-graph-over-knn-edges shape
    (exact edges here so the oracle is an all-pairs ranking, the
    knn_topk pattern)."""
    from beyond_vector_search_spark.operators import graph as gr

    emb = load_table(spark, sf_dir, "embeddings")
    edges = gr.knn_edges(emb, k=_PR_K)
    pr = gr.pagerank(edges, n_iter=_PR_ITERS, damping=_PR_DAMPING)
    return pr.select(
        F.col("id").alias("vec_id"), "rank_units", "rank", "in_deg"
    )


# -------------- weighted sampling without replacement (A-ES) ----------------

_WS_N = 200
_WS_SEED = 7

WEIGHTED_SAMPLE_SQL = (
    # the same Efraimidis-Spirakis keys from the same portable hash,
    # max-normalized like the operator (scale-invariant key magnitudes);
    # the oracle uses the window form of the global top-n (the engine
    # side plans TakeOrderedAndProject instead — see scale.py)
    "WITH wm AS (SELECT max(CAST(n_chars AS DOUBLE)) AS wmax FROM documents "
    "WHERE n_chars IS NOT NULL AND n_chars > 0), "
    "k AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight, "
    f"round(ln((CAST('0x' || substring(md5('{_WS_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) "
    "% 1000003 + 1) / 1000004.0) * (wmax / CAST(n_chars AS DOUBLE)), 9) AS es_key "
    "FROM documents, wm WHERE n_chars IS NOT NULL AND n_chars > 0) "
    "SELECT doc_id, weight, es_key, "
    "CAST(row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS INTEGER) AS rank "
    f"FROM k ORDER BY es_key DESC, doc_id ASC LIMIT {_WS_N}"
)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (scale.weighted_sample — Efraimidis-Spirakis reservoir keys from
    the portable hash, weight = document length): the quality-weighted
    subsampling step of a curation pipeline.  Catalog tail: restates
    sampling_methods' portable-hash shape + the global-top-k ranking
    every *_topk entry pins."""
    from beyond_vector_search_spark.operators.scale import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample(
        docs, weight_col="n_chars", n=_WS_N, id_col="doc_id", seed=_WS_SEED
    )
    return out.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("weight"),
        "es_key",
        "rank",
    )


# ------------------- corpus snapshot diff (versioning) ----------------------

CORPUS_DIFF_SQL = (
    # two snapshots derived deterministically from the one documents
    # table: "old" = ids not divisible by 3, with a simulated edit on
    # ids divisible by 5; "new" = ids not divisible by 7.  The diff is
    # digest-only past the projections (md5 — the engine's md5_hex
    # convention); membership comes from join-side presence, the
    # changed test is null-safe (IS DISTINCT FROM).
    "WITH oldc AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 "
    "THEN text || ' [v1]' ELSE text END AS text "
    "FROM documents WHERE doc_id % 3 <> 0), "
    "newc AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0), "
    "oh AS (SELECT doc_id, md5(text) AS h FROM oldc), "
    "nh AS (SELECT doc_id, md5(text) AS h FROM newc) "
    "SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, "
    "CASE WHEN o.doc_id IS NULL THEN 'added' "
    "WHEN n.doc_id IS NULL THEN 'removed' "
    "ELSE 'changed' END AS change, "
    "o.h AS old_hash, n.h AS new_hash "
    "FROM oh o FULL OUTER JOIN nh n ON o.doc_id = n.doc_id "
    "WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR (o.h IS DISTINCT FROM n.h)"
)


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change-set between two corpus versions
    (versioning.corpus_diff — the incremental-crawl primitive feeding
    IndexDelta.remove/union via apply_corpus_diff): added / removed /
    changed documents by null-safe content-digest comparison over a
    full outer join on doc_id.  Driver window since the r12 rotation
    (the catalog's only snapshot-versioning oracle); the md5 digest
    convention restates dedup_exact's in-window content hashing."""
    from beyond_vector_search_spark.operators.versioning import corpus_diff

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [v1]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    new = docs.where(F.col("doc_id") % 7 != 0)
    return corpus_diff(old, new).select("doc_id", "change", "old_hash", "new_hash")


# ---------------------- HTML markup extraction ------------------------------

_HTML_PRE = (
    "<html><head><style>p{color:red}</style></head><body><h1>Doc "
)
_HTML_MID = "</h1><p>"
_HTML_POST = "</p><!-- boilerplate --><script>var x=1;</script></body></html>"

HTML_EXTRACT_SQL = (
    # synthesize a deterministic HTML page per document (entity-escaped
    # body so the strip->unescape roundtrip is exact), then run the
    # SAME extraction chain as text_analysis.strip_markup: every regex
    # stays in the Java-regex ∩ RE2 subset; DuckDB needs the explicit
    # 'g' flag (its regexp_replace is first-match by default, Spark's
    # is always global).
    "WITH h AS (SELECT doc_id, "
    f"'{_HTML_PRE}' || CAST(doc_id AS VARCHAR) || '{_HTML_MID}' || "
    "replace(replace(text, '&', '&amp;'), '<', '&lt;') || "
    f"'{_HTML_POST}' AS html FROM documents), "
    "s AS (SELECT doc_id, html, "
    "regexp_replace(regexp_replace(regexp_replace(html, "
    "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), "
    "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), "
    "'(?s)<!--.*?-->', ' ', 'g') AS t1 FROM h), "
    "s2 AS (SELECT doc_id, html, regexp_replace(regexp_replace(t1, "
    "'(?i)<br[^>]*>|</p>|</div>|</li>|</tr>|</h[1-6]>', '\n', 'g'), "
    "'<[^>]+>', ' ', 'g') AS t2 FROM s), "
    "s3 AS (SELECT doc_id, html, "
    "replace(replace(replace(replace(replace(replace(replace(t2, "
    "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), "
    "'&apos;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t3 FROM s2) "
    "SELECT doc_id, "
    "trim(regexp_replace(t3, '[ \t\r\n]+', ' ', 'g')) AS text, "
    "CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags, "
    "CAST(length(html) AS INTEGER) AS n_chars_raw, "
    "CAST(length(trim(regexp_replace(t3, '[ \t\r\n]+', ' ', 'g'))) AS INTEGER) "
    "AS n_chars_text "
    "FROM s3"
)


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup extraction (text_analysis.strip_markup / html_extract —
    the CCNet/RefinedWeb-style first step over raw crawl HTML): a
    deterministic HTML page is synthesized around each document's
    entity-escaped text, then stripped back — script/style/comment
    payload removal, block-break preservation, entity unescape,
    whitespace collapse — with tag-count and size-drop diagnostics.
    The synthesize->extract roundtrip makes the oracle exact: both
    engines must reproduce 'Doc {id} {original text}' (modulo the
    collapse of the text's own whitespace).  Catalog tail: pure
    regexp_replace/replace chains — the expression-only codegen shape
    every text_analysis entry pins, exercised here through a shared
    Java-regex ∩ RE2 pattern subset."""
    from beyond_vector_search_spark.operators.text_analysis import html_extract

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    esc = F.replace(
        F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
        F.lit("<"),
        F.lit("&lt;"),
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PRE),
            F.col("doc_id").cast("string"),
            F.lit(_HTML_MID),
            esc,
            F.lit(_HTML_POST),
        ).alias("html"),
    )
    out = html_extract(pages)
    return out.select(
        "doc_id",
        "text",
        F.col("n_tags").cast("long").alias("n_tags"),
        F.col("n_chars_raw").cast("int").alias("n_chars_raw"),
        F.col("n_chars_text").cast("int").alias("n_chars_text"),
    )


# ------------------------- join-key skew profile ----------------------------

SKEW_PROFILE_SQL = (
    # the same partial+final count / 1-row totals / top-k chain as
    # scale.skew_profile, over the events table's event_type key
    "WITH c AS (SELECT event_type, count(*) AS n_rows FROM events "
    "GROUP BY event_type), "
    "t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS total, "
    "CAST(sum(n_rows) AS DOUBLE) / count(*) AS avg_k FROM c) "
    "SELECT event_type, n_rows, "
    "round(n_rows / total, 9) AS share, "
    "round(avg_k, 9) AS avg_rows_per_key, "
    "round(n_rows / avg_k, 9) AS skew_factor, "
    "CAST(row_number() OVER (ORDER BY n_rows DESC, event_type ASC) AS INTEGER) "
    "AS rank "
    "FROM c, t ORDER BY n_rows DESC, event_type ASC LIMIT 10"
)


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/aggregation-key skew diagnostic (scale.skew_profile — the
    measurement in front of salted_join and AQE's skew threshold): the
    hottest keys of the events table's event_type with row count,
    share, and skew_factor = rows / mean-rows-per-key.  Catalog tail:
    restates the partial+final count aggregation every groupBy entry
    pins plus the *_topk global ranking (TakeOrderedAndProject, pinned
    by test to never plan a corpus-wide window)."""
    from beyond_vector_search_spark.operators.scale import skew_profile

    events = load_table(spark, sf_dir, "events")
    return skew_profile(events, "event_type", top=10)


# ----------------------- per-domain corpus profile --------------------------

_URL_CASE_SQL = (
    "CASE CAST(doc_id % 6 AS INTEGER) WHEN 0 THEN 'news.alpha.com' "
    "WHEN 1 THEN 'blog.alpha.com' WHEN 2 THEN 'beta.org' "
    "WHEN 3 THEN 'cdn.gamma.net' WHEN 4 THEN 'www.delta.co.uk' "
    "ELSE 'docs.epsilon.github.io' END"
)


def _suffix_in_list() -> str:
    """The bundled multi-label suffix table as a SQL IN list — the
    oracle restates the SAME data the Spark expression folds in
    (functions/suffixes.py), so the two engines disagree only if the
    registered-domain pick logic itself diverges."""
    from beyond_vector_search_spark.functions.suffixes import MULTI_LABEL_SUFFIXES

    return ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)


URL_DOMAINS_SQL = (
    # deterministic URLs synthesized per document (incl. a malformed
    # share at doc_id%11=0 that must group under NULL, never drop, a
    # co.uk host and a github.io host that must resolve one label past
    # the public suffix), then the SAME parse chain as
    # text_analysis.url_parts: host extract -> lowercase ->
    # suffix-aware registered domain -> grouped counts/shares/avg_chars.
    "WITH u AS (SELECT doc_id, text, "
    "CASE WHEN doc_id % 11 = 0 THEN 'not a url' ELSE "
    f"'https://' || {_URL_CASE_SQL} || '/p/' || CAST(doc_id % 13 AS VARCHAR) || "
    "CASE WHEN doc_id % 3 = 0 THEN '?ref=1' ELSE '' END END AS url "
    "FROM documents), "
    "h AS (SELECT doc_id, text, nullif(lower(regexp_extract(url, "
    "'^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)), '') AS host FROM u), "
    "p AS (SELECT doc_id, text, "
    "CASE WHEN nullif(regexp_extract(host, '([^.]+\\.[^.]+)$', 1), '') "
    f"IN ({_suffix_in_list()}) "
    "AND nullif(regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1), '') IS NOT NULL "
    "THEN nullif(regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1), '') "
    "ELSE nullif(regexp_extract(host, '([^.]+\\.[^.]+)$', 1), '') END AS domain FROM h), "
    "c AS (SELECT domain, count(*) AS n_docs, "
    "round(avg(length(text)), 6) AS avg_chars FROM p GROUP BY domain), "
    "t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM c) "
    "SELECT domain, n_docs, round(n_docs / tot, 9) AS share, avg_chars "
    "FROM c, t"
)


def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus profile (text_analysis.url_profile
    + domain_stats — the relation per-domain budgets and blocklists
    read): deterministic URLs are synthesized per document (including
    a malformed share that must group under NULL, never silently
    drop), parsed with the shared Java-regex ∩ RE2 chains, and
    aggregated to (domain, n_docs, share, avg_chars).  Catalog tail:
    restates the partial+final groupBy + broadcast-totals shape
    skew_profile pins, through the url-parsing expression chain."""
    from beyond_vector_search_spark.operators.text_analysis import domain_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    host = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("news.alpha.com"))
        .when(F.col("doc_id") % 6 == 1, F.lit("blog.alpha.com"))
        .when(F.col("doc_id") % 6 == 2, F.lit("beta.org"))
        .when(F.col("doc_id") % 6 == 3, F.lit("cdn.gamma.net"))
        # the two suffix-table paths: a ccTLD second-level registry and
        # a hosting-platform (private-section) suffix — both must
        # resolve one label PAST the suffix, not to it
        .when(F.col("doc_id") % 6 == 4, F.lit("www.delta.co.uk"))
        .otherwise(F.lit("docs.epsilon.github.io"))
    )
    url = F.when(F.col("doc_id") % 11 == 0, F.lit("not a url")).otherwise(
        F.concat(
            F.lit("https://"),
            host,
            F.lit("/p/"),
            (F.col("doc_id") % 13).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?ref=1")).otherwise(F.lit("")),
        )
    )
    pages = docs.select("doc_id", url.alias("url"), "text")
    return domain_stats(pages)
