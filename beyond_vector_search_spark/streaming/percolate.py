"""Streaming percolation: standing queries over a document stream —
reverse search (the Elasticsearch "percolator" / alerting pattern).

Classic search runs many queries against a fixed corpus; percolation
inverts it: a FIXED set of registered queries is evaluated against
every arriving document, emitting (query, doc, score) matches above a
threshold — saved-search alerts, routing rules, topic subscriptions.

The Spark-first shape: the standing queries are COMPILED INTO THE PLAN.
Their terms and idf weights come from a frozen serving-index snapshot
(a one-time driver-side collect over the queries' own terms — tiny by
definition), and scoring is pure per-row column expressions over the
arriving document's token array:

    readStream(docs) ── tokenize ── per-query BM25 fold (literals)
                     ── explode (query, score) ── score >= threshold
                     ──> match stream

Zero streaming state, zero shuffles, append mode with immediate
emission — a document is scored the moment it arrives, and 1 or 1000
executors percolate independently.  Contrast a stream-side
groupBy(query, doc) aggregation: Spark would hold state for every
(query, doc) pair until a watermark passes, delaying every alert by
the watermark for no benefit (a document's tokens all arrive in one
row).

Semantics match operators/retrieval.bm25_scores (matched-only profile)
on the frozen statistics: same smoothed idf, same k1/b saturation,
same duplicate-query-term dedup — pinned by a stream==batch parity
test.  Index updates (new df/idf) are a recompile: call
``compile_standing_queries`` again and restart the query — the
percolator set is configuration, not state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beyond_vector_search_spark.config import DEFAULT, EngineConfig
from beyond_vector_search_spark.functions.text import tokenize
from beyond_vector_search_spark.operators.corpus_index import CorpusIndex


@dataclass(frozen=True)
class StandingQueries:
    """Compiled standing-query set: per query, the (term, idf) weights
    from the serving snapshot, plus the snapshot's avg_dl."""

    terms: dict[str, list[tuple[str, float]]]  # query_id -> [(term, idf)]
    avg_dl: float


def compile_standing_queries(
    queries: DataFrame,
    index: CorpusIndex,
    *,
    cfg: EngineConfig = DEFAULT,
) -> StandingQueries:
    """Resolve each standing query's terms against the index snapshot.

    One driver-side collect bounded by |queries| x terms-per-query —
    the standing set is small by definition (it is configuration).
    OOV terms drop (the bm25_scores inner-join rule); a query whose
    terms are all OOV compiles to an empty weight list and never
    matches.
    """
    q_terms = (
        queries.select(
            "query_id", F.explode(F.array_distinct(tokenize("query"))).alias("term")
        )
        .join(index.term_stats.select("term", "idf"), "term")
        .collect()
    )
    terms: dict[str, list[tuple[str, float]]] = {}
    for r in sorted(q_terms, key=lambda r: (r["query_id"], r["term"])):
        terms.setdefault(r["query_id"], []).append((r["term"], float(r["idf"])))
    # queries with zero in-vocabulary terms still register (empty arm)
    for r in queries.select("query_id").distinct().collect():
        terms.setdefault(r["query_id"], [])
    _, avg_dl = index.scalar_values()
    return StandingQueries(terms=terms, avg_dl=avg_dl if avg_dl != 0.0 else 1.0)


def percolate_embedding_stream(
    vec_stream: DataFrame,
    standing_vectors: list[tuple[str, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, query_id, cos[, extra...]) — the vector twin of
    :func:`percolate_doc_stream`: a fixed set of (query_id, embedding)
    standing vectors is folded into the plan as literals, and every
    arriving embedding row is cosine-scored against all of them —
    matches at or above ``threshold`` emit immediately.

    Same scale shape as the text percolator: stateless per-row
    expressions (one ``aggregate`` dot product per standing vector),
    no shuffle, no Python; the standing set is configuration-sized.
    Semantic-alerting use: "tell me when something near THIS embedding
    arrives" — topic subscriptions over an embedding firehose.
    """
    import math

    v = F.col(vec_col).cast("array<double>")
    v_norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    arms = []
    for query_id, qv in standing_vectors:
        qn = math.sqrt(sum(x * x for x in qv)) or 1.0
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(x)) for x in qv]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cos = F.when(v_norm == 0.0, F.lit(0.0)).otherwise(dot / (v_norm * qn))
        arms.append(F.struct(F.lit(query_id).alias("query_id"), cos.alias("cos")))
    if not arms:
        raise ValueError("no standing vectors given")
    return (
        vec_stream.select(
            F.col(id_col).alias("vec_id"), *extra_cols, F.explode(F.array(*arms)).alias("m")
        )
        .select("vec_id", *extra_cols, F.col("m.query_id"), F.col("m.cos"))
        .where(F.col("cos") >= threshold)
    )


def live_percolate_batch_fn(
    queries_path: str,
    index: CorpusIndex,
    sink,
    *,
    id_col: str = "doc_id",
    text: Column | str = "text",
    threshold: float = 0.0,
    cfg: EngineConfig = DEFAULT,
    extra_cols: tuple[str, ...] = (),
):
    """A ``foreachBatch`` function that RE-READS the standing-query set
    from ``queries_path`` (a small (query_id, query) parquet table) on
    every micro-batch, so alert rules can change live — no stream
    restart.

    :func:`compile_standing_queries` is configuration-as-plan: the
    compiled literals are frozen into the streaming plan, so adding a
    rule normally means recompile + restart.  This variant moves the
    compile INSIDE the batch function — per micro-batch it costs one
    bounded collect (the standing set is configuration-sized) plus the
    same stateless zero-shuffle percolation over the batch rows, and
    batch N+1 sees whatever rules batch N+1's read finds.  There is
    still no per-(query, doc) state of any kind.

    ``sink(matches_df, batch_id)`` receives each batch's matches (the
    usual foreachBatch contract: write to a table, push alerts, ...).
    An EMPTY standing table emits nothing for that batch — unlike the
    compiled form, which treats zero queries as a configuration error.

    Wire it up:

        stream.writeStream.foreachBatch(
            live_percolate_batch_fn(path, idx, my_sink)
        ).start()
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        queries = spark.read.parquet(queries_path)
        standing = compile_standing_queries(queries, index, cfg=cfg)
        if not standing.terms:
            return
        matches = percolate_doc_stream(
            batch_df,
            standing,
            id_col=id_col,
            text=text,
            threshold=threshold,
            cfg=cfg,
            extra_cols=extra_cols,
        )
        sink(matches, batch_id)

    return _fn


def percolate_doc_stream(
    doc_stream: DataFrame,
    standing: StandingQueries,
    *,
    id_col: str = "doc_id",
    text: Column | str = "text",
    threshold: float = 0.0,
    cfg: EngineConfig = DEFAULT,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, query_id, score[, extra_cols...]) — matches of the
    standing queries against each arriving document: the document must
    share at least one term with the query (matched-only, the
    bm25_scores profile) AND score at or above ``threshold``.

    The ``>=`` rule is shared with :func:`percolate_embedding_stream`
    (one matching rule for both percolators); at the default
    ``threshold=0.0`` the matched-terms condition alone decides, which
    is exactly batch matched-only BM25 (matched docs always score > 0:
    tf > 0 and the smoothed idf is strictly positive).

    .. note:: **Boundary change (release note).** The rule used to be
       ``score > threshold``; it is now ``matched AND score >=
       threshold`` for cross-percolator consistency.  Callers running a
       nonzero threshold will see documents scoring EXACTLY the
       threshold start matching where they previously did not; at the
       default 0.0 behavior is unchanged.

    Works identically on a batch DataFrame (the parity tests run both):
    the plan is a stateless projection either way.
    """
    text_col = F.col(text) if isinstance(text, str) else text
    toks = tokenize(text_col)
    dl = F.size(toks).cast("double")
    k1, b = cfg.bm25_k1, cfg.bm25_b
    norm = k1 * (1.0 - b + b * (dl / F.lit(standing.avg_dl)))

    def term_tf(term: str) -> Column:
        return F.size(F.filter(toks, lambda t: t == F.lit(term))).cast("double")

    arms = []
    for query_id, weights in sorted(standing.terms.items()):
        score = F.lit(0.0)
        matched = F.lit(False)
        for term, idf in weights:
            tf = term_tf(term)
            score = score + F.when(
                tf > 0, F.lit(idf) * (tf * (k1 + 1.0)) / (tf + norm)
            ).otherwise(F.lit(0.0))
            matched = matched | (tf > 0)
        arms.append(
            F.struct(
                F.lit(query_id).alias("query_id"),
                score.alias("score"),
                matched.alias("matched"),
            )
        )
    if not arms:
        raise ValueError("no standing queries compiled")
    return (
        doc_stream.select(
            F.col(id_col).alias("doc_id"),
            *extra_cols,
            F.explode(F.array(*arms)).alias("m"),
        )
        .where(F.col("m.matched") & (F.col("m.score") >= threshold))
        .select("doc_id", *extra_cols, F.col("m.query_id"), F.col("m.score"))
    )
