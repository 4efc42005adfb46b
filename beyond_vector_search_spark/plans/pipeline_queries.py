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
    "minhash_signatures",
    f"WITH {_TOKS}, {_SHINGLES_SQL}, {_SIG_SQL} "
    "SELECT doc_id, array_to_string(sig, '|') AS sig_str FROM sig",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dd.minhash_signatures(load_table(spark, sf_dir, "documents"))
    return sigs.select("doc_id", F.concat_ws("|", "sig").alias("sig_str"))


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


# --------------------------------- SimHash ---------------------------------


@register(
    "simhash64",
    f"WITH dtoks AS (SELECT doc_id, list_distinct({_SQL_TOKENIZE.format(col='text')}) AS tokens FROM documents), "
    "th AS (SELECT doc_id, list_transform(tokens, t -> CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)) AS hs FROM dtoks), "
    "bits AS (SELECT doc_id, list_transform(range(0, 32), j -> CASE WHEN "
    "list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0 THEN 1 ELSE 0 END) AS bv FROM th) "
    "SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), j -> bv[CAST(j AS INTEGER) + 1] << j)) AS BIGINT) AS simhash FROM bits",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash64(load_table(spark, sf_dir, "documents"))


# --------------------------- n-gram (token) Jaccard ------------------------


@register(
    "ngram_jaccard_pairs",
    "WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 60), "
    f"dtoks AS (SELECT doc_id, list_distinct({_SQL_TOKENIZE.format(col='text')}) AS tokens FROM sub), "
    "ex AS (SELECT doc_id, unnest(tokens) AS t FROM dtoks), "
    "sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni "
    "FROM ex a JOIN ex b ON a.t = b.t AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) "
    "SELECT doc_a, doc_b, CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard "
    "FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id "
    "WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.8",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where("doc_id < 60")
    # shingle_n=1 -> distinct-token-set Jaccard (int-exact division)
    return dd.jaccard_pairs(docs, shingle_n=1, threshold=0.8)


# ------------------------------ text analysis ------------------------------


@register(
    "token_stats",
    f"WITH {_TOKS} SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens, "
    "CAST(len(list_distinct(tokens)) AS BIGINT) AS n_distinct, "
    "CASE WHEN len(tokens) = 0 THEN 0.0 ELSE "
    "CAST(list_sum(list_transform(tokens, t -> length(t))) AS DOUBLE) / len(tokens) END AS avg_token_len "
    "FROM toks",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ta.token_stats(load_table(spark, sf_dir, "documents"))


_STOP_EN_SQL = "('" + "', '".join(ta.STOPWORDS_EN) + "')"


@register(
    "quality_score",
    f"WITH {_TOKS}, "
    "base AS (SELECT d.doc_id, d.text, t.tokens, length(d.text) AS n_chars, "
    "length(regexp_replace(d.text, '[^A-Za-z0-9]', '', 'g')) AS n_alpha, "
    f"len(list_filter(t.tokens, x -> x IN {_STOP_EN_SQL})) AS n_stop "
    "FROM documents d JOIN toks t USING (doc_id)), "
    "ratios AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
    "CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_chars END AS alpha_ratio, "
    "CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / len(tokens) END AS stopword_ratio, "
    "n_chars AS nc FROM base) "
    "SELECT doc_id, n_chars, alpha_ratio, stopword_ratio, "
    "0.4 * alpha_ratio + 0.4 * least(1.0, stopword_ratio * 5) + "
    "0.2 * (CASE WHEN nc >= 50 AND nc <= 5000 THEN 1.0 ELSE 0.0 END) AS quality "
    "FROM ratios",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ta.quality_score(load_table(spark, sf_dir, "documents"))


def _votes_sql(words: list[str]) -> str:
    return "CAST(len(list_filter(tokens, x -> x IN ('" + "', '".join(words) + "'))) AS BIGINT)"


@register(
    "lang_guess",
    f"WITH {_TOKS}, "
    "votes AS (SELECT d.doc_id, d.text, "
    f"{_votes_sql(ta.STOPWORDS_EN)} AS votes_en, "
    f"{_votes_sql(ta.STOPWORDS_DE)} AS votes_de, "
    f"{_votes_sql(ta.STOPWORDS_FR)} AS votes_fr, "
    f"{_votes_sql(ta.STOPWORDS_ES)} AS votes_es "
    "FROM documents d JOIN toks t USING (doc_id)) "
    "SELECT doc_id, CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh' "
    "WHEN votes_en >= votes_de AND votes_en >= votes_fr AND votes_en >= votes_es AND votes_en > 0 THEN 'en' "
    "WHEN votes_de >= votes_es AND votes_de >= votes_fr AND votes_de > 0 THEN 'de' "
    "WHEN votes_es >= votes_fr AND votes_es > 0 THEN 'es' "
    "WHEN votes_fr > 0 THEN 'fr' ELSE 'unknown' END AS lang_guess, "
    "votes_en, votes_de, votes_fr, votes_es FROM votes",
)
def q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ta.lang_guess(load_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    f"WITH {_TOKS} SELECT doc_id, "
    "md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS fingerprint FROM toks",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ta.doc_fingerprint(load_table(spark, sf_dir, "documents"))


# --------------------------- embedding similarity --------------------------

_COS_SQL = (
    "CASE WHEN sqrt(list_sum(list_transform(qv, x -> x * x))) * "
    "sqrt(list_sum(list_transform(cv, x -> x * x))) = 0 THEN 0.0 "
    "ELSE list_dot_product(qv, cv) / (sqrt(list_sum(list_transform(qv, x -> x * x))) * "
    "sqrt(list_sum(list_transform(cv, x -> x * x)))) END"
)


@register(
    "knn_cosine_topk",
    "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5), "
    "c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings), "
    f"scored AS (SELECT query_id, neighbor_id, {_COS_SQL} AS cos "
    "FROM q CROSS JOIN c WHERE query_id <> neighbor_id), "
    "ranked AS (SELECT query_id, neighbor_id, round(cos, 6) AS cos, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS INTEGER) AS rank "
    "FROM scored) "
    "SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5",
)
def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.knn_bruteforce(emb, queries, k=5)


_QUANT_SQL = (
    # symmetric per-vector int8: scale = max|v|/127, q = round(v/scale)
    "SELECT vec_id, CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 "
    "THEN list_transform(v, x -> 0) "
    "ELSE list_transform(v, x -> CAST(round(x / (list_max(list_transform(v, y -> abs(y))) / 127.0)) AS INTEGER)) END AS qv "
    "FROM {src}"
)


@register(
    "knn_quantized_topk",
    # int8-quantized cosine: integer-exact dot and norms, one float
    # division — both engines do identical integer arithmetic
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
    "qe AS (" + _QUANT_SQL.format(src="e") + "), "
    "q AS (SELECT vec_id AS query_id, qv AS qa FROM qe WHERE vec_id < 5), "
    "c AS (SELECT vec_id AS neighbor_id, qv AS qb FROM qe), "
    "scored AS (SELECT query_id, neighbor_id, "
    "list_sum(list_transform(range(1, len(qa) + 1), i -> qa[CAST(i AS INTEGER)] * qb[CAST(i AS INTEGER)])) AS dot, "
    "list_sum(list_transform(qa, x -> x * x)) AS na, "
    "list_sum(list_transform(qb, x -> x * x)) AS nb "
    "FROM q CROSS JOIN c WHERE query_id <> neighbor_id), "
    "ranked AS (SELECT query_id, neighbor_id, "
    "round(CASE WHEN na = 0 OR nb = 0 THEN 0.0 "
    "ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) END, 6) AS cos, "
    "CAST(row_number() OVER (PARTITION BY query_id ORDER BY "
    "round(CASE WHEN na = 0 OR nb = 0 THEN 0.0 "
    "ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) END, 6) DESC, "
    "neighbor_id ASC) AS INTEGER) AS rank FROM scored) "
    "SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5",
)
def q_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id < 5")
    return sim.knn_quantized_topk(emb, queries, k=5)


@register(
    "deterministic_sample",
    # hash-based sampling: reproducible across engines, runs, and
    # cluster sizes (unlike rand()-based sample) — the only kind of
    # sampling a training-data pipeline should use.  ~20% of docs,
    # stratum label carried for audit.
    "WITH hashed AS (SELECT doc_id, lang, n_chars, "
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket "
    "FROM documents) "
    "SELECT doc_id, lang, n_chars, CAST(bucket AS BIGINT) AS bucket FROM hashed WHERE bucket < 20",
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beyond_vector_search_spark.functions.hashing import hash64

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(hash64(F.col("doc_id")), F.lit(100)).cast("long")
    return docs.select("doc_id", "lang", "n_chars", bucket.alias("bucket")).where(
        F.col("bucket") < 20
    )


@register(
    "stratified_sample_lang",
    # fixed-N per stratum: 10 docs per language, ranked by the portable
    # md5-derived hash of doc_id (seeded), doc_id tie-break
    "WITH hashed AS (SELECT doc_id, lang, "
    "CAST('0x' || substring(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h "
    "FROM documents), "
    "ranked AS (SELECT doc_id, lang, "
    "CAST(row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) AS INTEGER) AS sample_rank "
    "FROM hashed) "
    "SELECT doc_id, lang, sample_rank FROM ranked WHERE sample_rank <= 10",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from beyond_vector_search_spark.operators.scale import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs.select("doc_id", "lang"),
        strata_col="lang",
        key_col="doc_id",
        n_per_stratum=10,
        seed=7,
    )


@register(
    "token_histogram",
    # corpus vocabulary analysis: top-50 tokens by document frequency,
    # ties broken by token for a deterministic cut
    f"WITH {_TOKS}, "
    "ex AS (SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks), "
    "df AS (SELECT term, count(*) AS doc_freq FROM ex GROUP BY term), "
    "ranked AS (SELECT term, doc_freq, "
    "CAST(row_number() OVER (ORDER BY doc_freq DESC, term ASC) AS INTEGER) AS rank FROM df) "
    "SELECT term, doc_freq, rank FROM ranked WHERE rank <= 50",
)
def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # At 100 TB the vocabulary is billions of terms: a global
    # row_number() window would move them all to one partition.
    # global_topk_ranked keeps per-task top-k (TakeOrderedAndProject)
    # and numbers only the 50 survivors.
    from beyond_vector_search_spark.operators.scale import global_topk_ranked

    idx = _docs_index_pipeline(spark, sf_dir)
    return global_topk_ranked(
        idx.term_stats.select("term", F.col("df").alias("doc_freq")),
        50,
        F.desc("doc_freq"),
        F.asc("term"),
    )


def _docs_index_pipeline(spark, sf_dir):
    from beyond_vector_search_spark.plans.entry_queries import _docs_index

    return _docs_index(spark, sf_dir)


@register("ann_lsh_topk", None)  # Spark-internal LSH hash family -> rows-only
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH approximate NN (seeded,
    deterministic within Spark, but the hash family is engine-internal
    so there is no cross-engine oracle; exact paths are oracled as
    knn_cosine_topk / ivf_topk_probe)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    return sim.lsh_ann_topk(emb, queries, k=5)


@register(
    "ivf_assign",
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings), "
    "c AS (SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id < 8), "
    f"scored AS (SELECT vec_id, centroid_id, {_COS_SQL} AS cos FROM e CROSS JOIN c), "
    "ranked AS (SELECT vec_id, centroid_id, round(cos, 6) AS cos, "
    "row_number() OVER (PARTITION BY vec_id ORDER BY round(cos, 6) DESC, centroid_id ASC) AS rn FROM scored) "
    "SELECT vec_id, centroid_id, cos FROM ranked WHERE rn = 1",
)
def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where("vec_id < 8").select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return sim.assign_centroids(emb, centroids)
