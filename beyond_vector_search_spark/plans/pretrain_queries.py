"""Pretraining-pipeline query catalog: decontamination, PII scrub,
repetition flags, sequence packing, shard stats, shingle novelty —
each as an engine plan (operators/pretrain.py) + DuckDB oracle.

The PII entry synthesizes its input INSIDE the query (deterministic
contact strings derived from customer keys) because the driver testdata
carries no PII columns — both engines see byte-identical text, same
pattern as pipeline_queries' derived near-dup corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beyond_vector_search_spark.functions.text import tokenize
from beyond_vector_search_spark.operators import pretrain as pt
from beyond_vector_search_spark.plans.entry_queries import _SQL_TOKENIZE, register
from beyond_vector_search_spark.sources.readers import load_table

_TOKS = (
    "toks AS (SELECT doc_id, "
    + _SQL_TOKENIZE.format(col="text")
    + " AS tokens FROM documents)"
)


# --------------------------- decontamination -------------------------------

# The corpus side carries INJECTED leaks — benchmark texts re-appearing
# with an id offset and a suffix (the realistic contamination shape:
# an eval answer pasted into a crawled page).  Natural 8-gram
# collisions in the synthetic testdata are zero, so the injected rows
# are exactly what the sweep must find; both engines derive them
# identically (same pattern as pipeline_queries' near-dup base).
_CONTAM_CORPUS_SQL = (
    "corpus(doc_id, text) AS ("
    "SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0 "
    "UNION ALL SELECT doc_id + 100000, text || ' leaked benchmark copy' "
    "FROM documents WHERE doc_id % 97 = 0)"
)

_CONTAM_TOKS_SQL = (
    "btoks AS (SELECT doc_id, "
    + _SQL_TOKENIZE.format(col="text")
    + " AS tokens FROM documents WHERE doc_id % 97 = 0), "
    "ctoks AS (SELECT doc_id, "
    + _SQL_TOKENIZE.format(col="text")
    + " AS tokens FROM corpus)"
)


def _sh8(src: str) -> str:
    return (
        f"(SELECT doc_id, CASE WHEN len(tokens) < 8 THEN CAST([] AS VARCHAR[]) "
        "ELSE list_distinct(list_transform(range(1, len(tokens) - 6), "
        f"i -> array_to_string(tokens[i:i+7], ' '))) END AS shingles FROM {src})"
    )


@register(
    "benchmark_contamination",
    f"WITH {_CONTAM_CORPUS_SQL}, {_CONTAM_TOKS_SQL}, "
    f"bsh AS {_sh8('btoks')}, csh AS {_sh8('ctoks')}, "
    "bex AS (SELECT DISTINCT unnest(shingles) AS sh FROM bsh), "
    "cex AS (SELECT doc_id, unnest(shingles) AS sh FROM csh) "
    "SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared "
    "FROM cex c JOIN bex USING (sh) GROUP BY c.doc_id",
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sweep: every ~97th document plays the held-out
    benchmark; the corpus (with deterministically injected leaks of
    benchmark text) is checked for 8-token-gram collisions against it
    (operators/pretrain.benchmark_contamination).

    Serves the broadcast-set shape (r13 optimization): the benchmark's
    distinct shingles collect once (the bench side is ~1% of the docs)
    and the corpus side counts collisions inside ONE Arrow pass — the
    corpus's ~300 shingles/doc never leave the Python worker, where the
    pre-r13-opt shared-cache form materialized every corpus shingle
    row (a corpus-scale cache fill + broadcast join + count exchange)
    to ship back counts that are per-document anyway.  Join-form
    parity is pinned by tests/test_pretrain.py."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    leaks = bench.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" leaked benchmark copy")).alias("text"),
    )
    corpus = docs.where(F.col("doc_id") % 97 != 0).unionByName(leaks)
    return pt.benchmark_contamination(corpus, bench, n=8, broadcast_set=True)


# ------------------------------- PII scrub ---------------------------------

# Deterministic synthetic contact text from customer keys — identical
# string construction in both engines.
_PII_TEXT_SQL = (
    "pii(c_custkey, text) AS (SELECT c_custkey, "
    "'Contact ' || c_name || ' <user' || CAST(c_custkey AS VARCHAR) || "
    "'@example.com> segment ' || c_mktsegment || ' phone ' || "
    "lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') || '-' || "
    "lpad(CAST((c_custkey * 3) % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' || "
    "lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0') || "
    "' ip 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' || "
    "CAST((c_custkey * 3) % 256 AS VARCHAR) || '.' || "
    "CAST((c_custkey * 7) % 256 AS VARCHAR) "
    "FROM customer)"
)

_EMAIL = pt.EMAIL_RE
_PHONE = pt.PHONE_RE
_IPV4 = pt.IPV4_RE


def _pii_text_col() -> F.Column:
    c = F.col("c_custkey").cast("bigint")

    def pad(expr, width):
        return F.lpad(expr.cast("string"), width, "0")

    return F.concat(
        F.lit("Contact "), F.col("c_name"),
        F.lit(" <user"), c.cast("string"), F.lit("@example.com> segment "),
        F.col("c_mktsegment"), F.lit(" phone "),
        pad(c % 100, 2), F.lit("-"),
        pad((c * 3) % 1000, 3), F.lit("-"),
        pad((c * 7) % 1000, 3), F.lit("-"),
        pad((c * 13) % 10000, 4),
        F.lit(" ip 10."), (c % 256).cast("string"), F.lit("."),
        ((c * 3) % 256).cast("string"), F.lit("."),
        ((c * 7) % 256).cast("string"),
    )


@register(
    "pii_scrub_customers",
    # sequential counts on the cascade's intermediate strings — the
    # operator's contract: each count equals that family's tokens in
    # clean_text (see pretrain.pii_scrub)
    f"WITH {_PII_TEXT_SQL}, "
    f"s1 AS (SELECT c_custkey, text, "
    f"regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g') AS t1 FROM pii), "
    f"s2 AS (SELECT *, regexp_replace(t1, '{_PHONE}', '<PHONE>', 'g') AS t2 FROM s1) "
    "SELECT c_custkey, "
    f"CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails, "
    f"CAST(len(regexp_extract_all(t1, '{_PHONE}')) AS BIGINT) AS n_phones, "
    f"CAST(len(regexp_extract_all(t2, '{_IPV4}')) AS BIGINT) AS n_ips, "
    f"regexp_replace(t2, '{_IPV4}', '<IP>', 'g') AS clean_text "
    "FROM s2",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pii = cust.select("c_custkey", _pii_text_col().alias("text"))
    return pt.pii_scrub(pii, id_col="c_custkey", text_col="text")


# --------------------------- repetition flags ------------------------------

# reusable CTE block: per-doc word/bigram aggregates (over `toks`)
_REP_CTES = (
    "w AS (SELECT doc_id, unnest(tokens) AS term FROM toks), "
    "wtf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term), "
    "wagg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, "
    "CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(tf) AS BIGINT) AS max_tf, "
    "CAST(sum(length(term) * tf) AS BIGINT) AS sum_len FROM wtf GROUP BY doc_id), "
    "bg AS (SELECT doc_id, unnest(CASE WHEN len(tokens) < 2 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_transform(range(1, len(tokens)), i -> array_to_string(tokens[i:i+1], ' ')) END) AS b FROM toks), "
    "btf AS (SELECT doc_id, b, count(*) AS tf FROM bg GROUP BY doc_id, b), "
    "bagg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total_bi, "
    "CAST(max(tf) AS BIGINT) AS max_bi FROM btf GROUP BY doc_id), "
    "rep AS (SELECT wagg.doc_id, n_tokens, n_distinct, max_tf, sum_len, total_bi, max_bi, "
    "(round(max_tf / n_tokens, 6) > 0.20 OR "
    "round(coalesce(max_bi / total_bi, 0.0), 6) > 0.18) AS flag_repetitive "
    "FROM wagg LEFT JOIN bagg USING (doc_id))"
)

_REP_SQL = (
    f"WITH {_TOKS}, {_REP_CTES} "
    "SELECT doc_id, n_tokens, "
    "round(n_distinct / n_tokens, 6) AS distinct_ratio, "
    "round(max_tf / n_tokens, 6) AS top_word_frac, "
    "round(coalesce(max_bi / total_bi, 0.0), 6) AS top_bigram_frac, "
    "round(sum_len / n_tokens, 6) AS mean_word_len, "
    "flag_repetitive "
    "FROM rep"
)


@register("repetition_flags", _REP_SQL)
def q_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pt.repetition_flags(load_table(spark, sf_dir, "documents"))


# --------------------------- sequence packing ------------------------------

_HASH_SHARD_SQL = (
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 8"
)

_COUNTS_SQL = (
    "counts AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens FROM toks), "
    f"sharded AS (SELECT doc_id, n_tokens, {_HASH_SHARD_SQL} AS shard FROM counts)"
)


@register(
    "pack_sequences",
    f"WITH {_TOKS}, {_COUNTS_SQL}, "
    "packed AS (SELECT doc_id, n_tokens, shard, "
    "CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset "
    "FROM sharded) "
    "SELECT doc_id, n_tokens, shard, start_offset, "
    "CAST(floor(start_offset / 512.0) AS BIGINT) AS seq_id FROM packed",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pt.pack_sequences(
        load_table(spark, sf_dir, "documents"), seq_len=512, n_shards=8
    )


# Registered at the catalog TAIL (fusion/coverage register_tail): a
# plain groupBy over pack_sequences' own sharding CTE — the in-window
# pack_sequences entry already pins the hash-shard assignment.
SHARD_STATS_SQL = (
    f"WITH {_TOKS}, {_COUNTS_SQL} "
    "SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM sharded GROUP BY shard"
)


def q_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens")
    )
    sharded = pt.assign_shards(counts, id_col="doc_id", n_shards=8)
    return sharded.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


# --------------------------- shingle novelty -------------------------------

_SH3_SQL = (
    "sh AS (SELECT doc_id, CASE WHEN len(tokens) < 3 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_distinct(list_transform(range(1, len(tokens) - 1), "
    "i -> array_to_string(tokens[i:i+2], ' '))) END AS shingles FROM toks)"
)


@register(
    "shingle_novelty",
    f"WITH {_TOKS}, {_SH3_SQL}, "
    "ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh), "
    "first AS (SELECT sh, min(doc_id) AS first_doc FROM ex GROUP BY sh) "
    "SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, "
    "round(avg(CASE WHEN ex.doc_id = f.first_doc THEN 1.0 ELSE 0.0 END), 6) AS novelty "
    "FROM ex JOIN first f USING (sh) GROUP BY ex.doc_id",
)
def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pt.shingle_novelty(load_table(spark, sf_dir, "documents"), n=3)


# --------------------------- mixture sampling ------------------------------

_MIX_WEIGHTS = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25}


# (the standalone mixture-sampling entry lives in pipeline_queries'
# merged ``sampling_methods``; _MIX_WEIGHTS stays the shared constant
# for the end-to-end pretrain_corpus_pipeline below)


# ------------------------ unigram log-perplexity ---------------------------


# Tail entry: the in-window bigram_logppl below subsumes this shape
# (same explode/agg/join skeleton, higher-order counts + interpolation).
UNIGRAM_LOGPPL_SQL = (
    f"WITH {_TOKS}, "
    "w AS (SELECT doc_id, unnest(tokens) AS term FROM toks), "
    "wtf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term), "
    "ctf AS (SELECT term, sum(tf) AS ctf FROM wtf GROUP BY term), "
    "z AS (SELECT sum(ctf) AS n FROM ctf), "
    "probs AS (SELECT term, ctf / n AS p FROM ctf, z) "
    "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, "
    "round(sum(tf * -ln(p)) / sum(tf), 6) AS logppl "
    "FROM wtf JOIN probs USING (term) GROUP BY doc_id"
)


def q_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pt.unigram_logppl(load_table(spark, sf_dir, "documents"))


# ------------------- bigram LM log-perplexity (in-window) ------------------

_BIGRAM_LAM = 0.9

_BG_CTES = (
    "bgx AS (SELECT doc_id, unnest(CASE WHEN len(tokens) < 2 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_transform(range(1, len(tokens)), i -> array_to_string(tokens[i:i+1], ' ')) END) AS bg FROM toks), "
    "btf AS (SELECT doc_id, bg, count(*) AS tf FROM bgx GROUP BY doc_id, bg), "
    "cbg AS (SELECT bg, sum(tf) AS cbg FROM btf GROUP BY bg), "
    "w AS (SELECT doc_id, unnest(tokens) AS term FROM toks), "
    "wtf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term), "
    "ctf AS (SELECT term, sum(tf) AS ctf FROM wtf GROUP BY term), "
    "z AS (SELECT sum(ctf) AS n FROM ctf), "
    f"bprobs AS (SELECT bg, {_BIGRAM_LAM!r} * (cbg / c1.ctf) + {1.0 - _BIGRAM_LAM!r} * (c2.ctf / n) AS p "
    "FROM cbg JOIN ctf c1 ON c1.term = split_part(bg, ' ', 1) "
    "JOIN ctf c2 ON c2.term = split_part(bg, ' ', 2), z)"
)


@register(
    "bigram_logppl",
    f"WITH {_TOKS}, {_BG_CTES} "
    "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams, "
    "round(sum(tf * -ln(p)) / sum(tf), 6) AS logppl2 "
    "FROM btf JOIN bprobs USING (bg) GROUP BY doc_id",
)
def q_bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer-interpolated corpus bigram LM perplexity per doc
    (operators/pretrain.bigram_logppl) — the 2-gram form of the CCNet
    LM-quality filter.  ``cache=True`` persists the two per-doc tf
    relations so the corpus text is tokenized exactly twice instead of
    ~5x (Catalyst does not share subtrees across joins) — the 100 TB
    form materializes the same relations to parquet."""
    return pt.bigram_logppl(
        load_table(spark, sf_dir, "documents"), lam=_BIGRAM_LAM, cache=True
    )


# ------------------------ document chunking (RAG) --------------------------

_CHUNK_SIZE = 64
_CHUNK_OVERLAP = 16
_CHUNK_STRIDE = _CHUNK_SIZE - _CHUNK_OVERLAP


@register(
    "doc_chunks",
    f"WITH {_TOKS}, "
    "t2 AS (SELECT doc_id, tokens, len(tokens) AS n FROM toks WHERE len(tokens) > 0), "
    f"offs AS (SELECT doc_id, tokens, n, unnest(range(0, greatest(n - {_CHUNK_OVERLAP}, 1), {_CHUNK_STRIDE})) AS o FROM t2) "
    f"SELECT doc_id, CAST(floor(o / {_CHUNK_STRIDE}.0) AS BIGINT) AS chunk_id, "
    "CAST(o AS BIGINT) AS start, "
    f"CAST(len(tokens[o + 1:o + {_CHUNK_SIZE}]) AS BIGINT) AS n_chunk_tokens, "
    f"array_to_string(tokens[o + 1:o + {_CHUNK_SIZE}], ' ') AS chunk_text FROM offs",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token-window chunking
    (operators/pretrain.chunk_documents) — the RAG/embedding
    preprocessing fan-out, 64-token windows sliding by 48."""
    return pt.chunk_documents(
        load_table(spark, sf_dir, "documents"),
        size=_CHUNK_SIZE,
        overlap=_CHUNK_OVERLAP,
    )


# ------------------------ Gopher quality rules -----------------------------

_GOPHER_STOP_SQL = "['" + "', '".join(pt.GOPHER_STOPWORDS) + "']"

_GOPHER_CTES = (
    "gw AS (SELECT doc_id, text, tokens, "
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> '') AS words FROM documents JOIN toks USING (doc_id)), "
    "gm AS (SELECT doc_id, "
    "CAST(len(words) AS BIGINT) AS n_words, "
    "coalesce(round(list_sum(list_transform(words, w -> length(w))) / CAST(len(words) AS DOUBLE), 6), 0.0) AS mean_word_len, "
    "coalesce(round((len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.'))) / CAST(len(words) AS DOUBLE), 6), 0.0) AS symbol_ratio, "
    "coalesce(round(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) / CAST(len(words) AS DOUBLE), 6), 0.0) AS alpha_word_frac, "
    f"CAST(len(list_intersect(list_distinct(tokens), {_GOPHER_STOP_SQL})) AS BIGINT) AS n_stopwords "
    "FROM gw), "
    "gf AS (SELECT *, "
    "(n_words >= 50 AND n_words <= 100000) AS flag_word_count, "
    "(mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS flag_word_len, "
    "(symbol_ratio <= 0.1) AS flag_symbol, "
    "(alpha_word_frac >= 0.8) AS flag_alpha, "
    "(n_stopwords >= 2) AS flag_stopwords FROM gm)"
)


@register(
    "gopher_quality",
    f"WITH {_TOKS}, {_GOPHER_CTES} "
    "SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac, n_stopwords, "
    "flag_word_count, flag_word_len, flag_symbol, flag_alpha, flag_stopwords, "
    "(flag_word_count AND flag_word_len AND flag_symbol AND flag_alpha AND flag_stopwords) AS keep "
    "FROM gf",
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule set (Rae et al. 2021 appendix A) as
    per-document metrics + flags (operators/pretrain.gopher_quality)."""
    return pt.gopher_quality(load_table(spark, sf_dir, "documents"))


# ------------------ DSIR importance weights (tail) -------------------------

# Tail entry: raw = documents not divisible by 97, target = the same
# every-97th benchmark slice the decontamination entry uses — so the
# weights measure "looks like the benchmark domain".
_DSIR_BUCKETS = 4096

DSIR_LOGWEIGHTS_SQL = (
    f"WITH {_TOKS}, "
    "bgall AS (SELECT doc_id, unnest(CASE WHEN len(tokens) < 2 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_transform(range(1, len(tokens)), i -> array_to_string(tokens[i:i+1], ' ')) END) AS bg FROM toks), "
    f"brows AS (SELECT doc_id, CAST('0x' || substring(md5(bg), 1, 15) AS BIGINT) % {_DSIR_BUCKETS} AS bucket FROM bgall), "
    "traw AS (SELECT * FROM brows WHERE doc_id % 97 <> 0), "
    "ttgt AS (SELECT * FROM brows WHERE doc_id % 97 = 0), "
    "rc AS (SELECT bucket, count(*) AS cr FROM traw GROUP BY bucket), "
    "tc AS (SELECT bucket, count(*) AS ct FROM ttgt GROUP BY bucket), "
    "nr AS (SELECT CAST(sum(cr) AS DOUBLE) AS n_raw FROM rc), "
    "nt AS (SELECT CAST(sum(ct) AS DOUBLE) AS n_tgt FROM tc), "
    "ratios AS (SELECT bucket, "
    f"ln((coalesce(ct, 0) + 1.0) / (coalesce(n_tgt, 0.0) + {1.0 * _DSIR_BUCKETS!r})) - "
    f"ln((coalesce(cr, 0) + 1.0) / (coalesce(n_raw, 0.0) + {1.0 * _DSIR_BUCKETS!r})) AS lr "
    "FROM rc FULL OUTER JOIN tc USING (bucket), nr, nt) "
    "SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_feats, round(sum(lr), 6) AS logw "
    "FROM traw t JOIN ratios USING (bucket) GROUP BY t.doc_id"
)


def q_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) of the raw corpus
    against the every-97th-doc benchmark slice as the target domain
    (operators/pretrain.dsir_logweights)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw = docs.where(F.col("doc_id") % 97 != 0)
    target = docs.where(F.col("doc_id") % 97 == 0)
    # cache=True: each side's hashed-bigram rows persist, so the raw
    # corpus is scanned once (not ~3x) — the single-scan 100 TB form
    return pt.dsir_logweights(raw, target, n_buckets=_DSIR_BUCKETS, cache=True)


# ------------------- end-to-end corpus preparation -------------------------

_PIPE_SQL = (
    f"WITH {_TOKS}, "
    # 1. exact dedup: keep the min-id doc per content hash
    "keepers AS (SELECT doc_id FROM (SELECT doc_id, "
    "min(doc_id) OVER (PARTITION BY md5(text)) AS k FROM documents) WHERE doc_id = k), "
    # 2. benchmark held out (every ~97th doc); corpus = kept non-benchmark docs
    "base AS (SELECT d.doc_id, d.lang FROM documents d JOIN keepers USING (doc_id) "
    "WHERE d.doc_id % 97 <> 0), "
    f"bsh AS {_sh8('(SELECT doc_id, tokens FROM toks WHERE doc_id % 97 = 0)')}, "
    "bex AS (SELECT DISTINCT unnest(shingles) AS sh FROM bsh), "
    f"csh AS {_sh8('(SELECT t.doc_id, t.tokens FROM toks t JOIN base USING (doc_id))')}, "
    "contaminated AS (SELECT DISTINCT c.doc_id FROM "
    "(SELECT doc_id, unnest(shingles) AS sh FROM csh) c JOIN bex USING (sh)), "
    "clean AS (SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)), "
    # 3. repetition + minimum-length quality gate
    f"{_REP_CTES}, "
    "kept AS (SELECT c.doc_id, c.lang, r.n_tokens FROM clean c JOIN rep r USING (doc_id) "
    "WHERE NOT r.flag_repetitive AND r.n_tokens >= 5), "
    # 4. language mixture
    "mixed AS (SELECT doc_id, lang, n_tokens FROM (SELECT *, "
    "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS h, "
    "CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000 WHEN 'fr' THEN 500000 "
    "WHEN 'es' THEN 250000 WHEN 'zh' THEN 250000 ELSE 0 END AS cut FROM kept) WHERE h < cut), "
    # 5. pack into 512-token sequences per hash shard
    "sharded AS (SELECT doc_id, lang, n_tokens, "
    f"{_HASH_SHARD_SQL} AS shard FROM mixed), "
    "packed AS (SELECT doc_id, lang, n_tokens, shard, "
    "CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset "
    "FROM sharded) "
    "SELECT doc_id, lang, n_tokens, shard, start_offset, "
    "CAST(floor(start_offset / 512.0) AS BIGINT) AS seq_id FROM packed"
)


@register("pretrain_corpus_pipeline", _PIPE_SQL)
def q_pretrain_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-preparation flow, operators chained end to end:
    exact dedup -> benchmark decontamination -> repetition/length
    filter -> language mixture -> sequence packing.  Composition of
    the module's public operators, not a reimplementation — the shape
    a real pretraining data job runs nightly."""
    from beyond_vector_search_spark.operators import dedup as dd
    from beyond_vector_search_spark.operators.scale import mixture_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    keepers = (
        dd.exact_dedup_map(docs)
        .where(F.col("doc_id") == F.col("keeper_id"))
        .select("doc_id")
    )
    base = docs.join(keepers, "doc_id").where(F.col("doc_id") % 97 != 0)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    contaminated = pt.benchmark_contamination(base, bench, n=8).select("doc_id")
    clean = base.join(contaminated, "doc_id", "left_anti")
    rep = pt.repetition_flags(docs).select("doc_id", "n_tokens", "flag_repetitive")
    kept = (
        clean.join(rep, "doc_id")
        .where(~F.col("flag_repetitive") & (F.col("n_tokens") >= 5))
        .select("doc_id", "text", "lang")
    )
    # lazy-localCheckpoint the selection: ``mixed`` is consumed by BOTH
    # the packing stage and the final lang join, and an uncached
    # reference re-inlines the entire upstream chain (dedup map +
    # contamination kernel + repetition kernel) per consumer — the
    # whole pipeline ran twice per action (r13-opt; measured 2.07 ->
    # 1.68 s median at sf0.1, rows identical).
    mixed = mixture_sample(
        kept, strata_col="lang", key_col="doc_id", weights=_MIX_WEIGHTS
    ).localCheckpoint(eager=False)
    packed = pt.pack_sequences(mixed, seq_len=512, n_shards=8)
    return packed.join(mixed.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "n_tokens", "shard", "start_offset", "seq_id"
    )


def register_all() -> None:
    """Import side effect already registered everything."""


# ------------- learned quality classifier (Naive Bayes, in-window) ---------

_NB_ALPHA = 1.0

NB_QUALITY_SQL = (
    # whole train+score loop in one query: weak label (Gopher word-count
    # gate) -> per-class token counts -> add-alpha NB weights -> per-doc
    # log-odds.  All counts exact integers; ln only at the weight /
    # prior step; the one cross-row float sum is rounded to 6 (catalog
    # rule) and the rounded value decides pred_keep on BOTH engines.
    f"WITH {_TOKS}, "
    "lab AS (SELECT doc_id, "
    "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> '')) >= 50 AS keep "
    "FROM documents), "
    "wx AS (SELECT doc_id, unnest(tokens) AS term FROM toks), "
    "wtf AS (SELECT wx.doc_id, term, count(*) AS tf, bool_and(keep) AS keep "
    "FROM wx JOIN lab USING (doc_id) GROUP BY wx.doc_id, term), "
    "cls AS (SELECT term, sum(CASE WHEN keep THEN tf ELSE 0 END) AS c1, "
    "sum(CASE WHEN NOT keep THEN tf ELSE 0 END) AS c0 FROM wtf GROUP BY term), "
    "tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0, count(*) AS v FROM cls), "
    "pri AS (SELECT sum(CASE WHEN keep THEN 1 ELSE 0 END) AS d1, "
    "sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS d0 FROM lab), "
    f"wt AS (SELECT term, ln((c1 + {_NB_ALPHA!r}) / (n1 + {_NB_ALPHA!r} * v)) "
    f"- ln((c0 + {_NB_ALPHA!r}) / (n0 + {_NB_ALPHA!r} * v)) AS w FROM cls, tot), "
    "sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, sum(tf * w) AS s "
    "FROM wtf JOIN wt USING (term) GROUP BY doc_id) "
    f"SELECT lab.doc_id, lab.keep AS label_keep, coalesce(n_tokens, 0) AS n_tokens, "
    f"round(ln((d1 + {_NB_ALPHA!r}) / (d0 + {_NB_ALPHA!r})) + coalesce(s, 0.0), 6) AS log_odds, "
    f"round(ln((d1 + {_NB_ALPHA!r}) / (d0 + {_NB_ALPHA!r})) + coalesce(s, 0.0), 6) > 0 AS pred_keep "
    "FROM lab LEFT JOIN sc USING (doc_id), pri"
)


def q_nb_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial-NB quality classifier bootstrapped from the Gopher
    word-count rule and applied back to the corpus
    (operators/pretrain.nb_quality_scores) — the fastText-style learned
    quality filter of the public pretraining recipes, as one
    deterministic relational train+score plan."""
    return pt.nb_quality_scores(
        load_table(spark, sf_dir, "documents"), alpha=_NB_ALPHA, cache=True
    )


# ---------------- fuzzy benchmark decontamination (tail) --------------------

_FUZZY_MARK = 9_000_000  # benchmark ids marked into the monolithic oracle
_FUZZY_LEAK_OFFSET = 500_000
_FUZZY_THRESHOLD = 0.5


def _fuzzy_contamination_sql() -> str:
    """The oracle runs the MONOLITHIC sig/band pipeline over corpus ∪
    marked-benchmark and keeps cross pairs — equivalent to the engine's
    asymmetric join by the disjoint-union property incremental_dedup
    already pins — then verifies exact shingle Jaccard from the same
    shingle lists."""
    from beyond_vector_search_spark.plans.pipeline_queries import (
        _BANDS_SQL,
        _SHINGLES_SQL,
        _SIG_SQL,
    )

    base = (
        "base(doc_id, text) AS ("
        "SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0 "
        f"UNION ALL SELECT doc_id + {_FUZZY_MARK}, text FROM documents WHERE doc_id % 97 = 0 "
        f"UNION ALL SELECT doc_id + {_FUZZY_LEAK_OFFSET}, text || ' lightly edited benchmark leak' "
        "FROM documents WHERE doc_id % 97 = 0)"
    )
    toks = (
        "toks AS (SELECT doc_id, "
        + _SQL_TOKENIZE.format(col="text")
        + " AS tokens FROM base)"
    )
    return (
        f"WITH {base}, {toks}, {_SHINGLES_SQL}, {_SIG_SQL}, {_BANDS_SQL}, "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_id, "
        f"b.doc_id - {_FUZZY_MARK} AS bench_id "
        "FROM bands a JOIN bands b ON a.b = b.b AND a.band_key = b.band_key "
        f"AND a.doc_id < {_FUZZY_MARK} AND b.doc_id >= {_FUZZY_MARK}), "
        "jac AS (SELECT c.doc_id, c.bench_id, "
        "round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
        "len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard "
        "FROM cand c JOIN sh sa ON sa.doc_id = c.doc_id "
        f"JOIN sh sb ON sb.doc_id = c.bench_id + {_FUZZY_MARK}) "
        f"SELECT doc_id, bench_id, jaccard FROM jac WHERE jaccard >= {_FUZZY_THRESHOLD!r}"
    )


FUZZY_CONTAMINATION_SQL = _fuzzy_contamination_sql()


def q_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-near-dup decontamination vs the benchmark set
    (pretrain.fuzzy_contamination — the Llama-2-style fuzzy sweep that
    catches lightly-edited eval text exact n-gram collision misses).
    The corpus carries INJECTED fuzzy leaks (benchmark texts with a
    short appended edit) so the sweep's catch is driver-visible.
    Catalog tail: restates benchmark_contamination's broadcast-eval-set
    shape + incremental_dedup_pairs' asymmetric banded join.

    Scan discipline: the EVAL SET (small by definition) is cached once,
    so the leak-injection union and the operator's benchmark side read
    it without re-reading parquet; the operator's shared-signature form
    (default since r10 — one fused sig+shingle pass per side,
    ``cache=True`` here so the audited plan keeps its real lineage
    visible) scans ``documents`` exactly TWICE — the corpus branch and
    the bench materialize — where the r9 from-scratch form scanned it
    21 times."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where("doc_id % 97 = 0").select("doc_id", "text").cache()
    corpus = (
        docs.where("doc_id % 97 <> 0")
        .select("doc_id", "text")
        .unionByName(
            bench.select(
                (F.col("doc_id") + _FUZZY_LEAK_OFFSET).alias("doc_id"),
                F.concat(
                    "text", F.lit(" lightly edited benchmark leak")
                ).alias("text"),
            )
        )
    )
    return pt.fuzzy_contamination(
        corpus, bench, threshold=_FUZZY_THRESHOLD, max_bucket_size=None, cache=True
    )
