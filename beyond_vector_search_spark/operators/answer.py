"""Answer generation + context packing over ranked top-k results.

Batched: input is the (query_id, doc_id, score, rank) top-k relation
joined back to documents; output is one row per query.  The greedy
context packer (reference answer.py:15-25) is a per-query fold over a
k-element array — computed with ``aggregate()`` inside codegen, since
"stop at first overflow" is a BREAK, not a filter: a later short block
must not sneak in after an overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beyond_vector_search_spark.config import DEFAULT, EngineConfig
from beyond_vector_search_spark.functions.text import join_top_sentences

FALLBACK_ANSWER = "I couldn't find relevant context in the toy corpus."  # answer.py:30


def _ranked_structs(top_k: DataFrame, documents: DataFrame, *, id_col: str, title_col: str | None, text_col: str) -> DataFrame:
    """(query_id, hits: array<struct<rank, doc_id, title, snippet>>) sorted by rank."""
    title = F.col(title_col) if title_col else F.col(id_col).cast("string")
    joined = top_k.join(
        documents.select(
            F.col(id_col).alias("doc_id"),
            title.alias("title"),
            join_top_sentences(F.col(text_col)).alias("snippet"),
        ),
        "doc_id",
    )
    return joined.groupBy("query_id").agg(
        F.array_sort(
            F.collect_list(F.struct("rank", "doc_id", "title", "snippet"))
        ).alias("hits")
    )


def generate_answers(
    top_k: DataFrame,
    documents: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    title_col: str | None = "title",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """(query_id, query, answer, citations, context, top_doc_ids) —
    reference answer.py:28-39 template + answer.py:15-25 context.

    Answer template (empty top-k -> fixed apology):
      "Based on the retrieved context, here's the best match:\\n\\n
       {title}\\n{first-2-sentences}\\n\\n(Query: {query})"
    """
    hits = _ranked_structs(top_k, documents, id_col=id_col, title_col=title_col, text_col=text_col)
    with_q = queries.join(hits, "query_id", "left")

    top1 = F.element_at("hits", 1)
    answer = F.when(
        F.coalesce(F.size("hits"), F.lit(0)) == 0, F.lit(FALLBACK_ANSWER)
    ).otherwise(
        F.concat(
            F.lit("Based on the retrieved context, here's the best match:\n\n"),
            top1.getField("title"),
            F.lit("\n"),
            top1.getField("snippet"),
            F.lit("\n\n(Query: "),
            F.col("query"),
            F.lit(")"),
        )
    )
    citations = F.when(
        F.coalesce(F.size("hits"), F.lit(0)) == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.array(top1.getField("doc_id").cast("string")))

    # Greedy context packing: blocks "[doc_id] title: snippet", appended
    # while cumulative length + len(block) <= max_chars, BREAK on first
    # overflow (answer.py:21-22).  Fold state: (used_chars, ctx, stopped).
    blocks = F.transform(
        F.coalesce(F.col("hits"), F.array().cast(with_q.schema["hits"].dataType)),
        lambda h: F.concat(
            F.lit("["), h.getField("doc_id").cast("string"), F.lit("] "),
            h.getField("title"), F.lit(": "), h.getField("snippet"),
        ),
    )
    context = F.aggregate(
        blocks,
        F.struct(
            F.lit(0).cast("int").alias("used"),
            F.lit("").alias("ctx"),
            F.lit(False).alias("stopped"),
        ),
        lambda acc, b: F.when(
            acc.getField("stopped") | ((acc.getField("used") + F.length(b)) > cfg.max_context_chars),
            F.struct(
                acc.getField("used").alias("used"),
                acc.getField("ctx").alias("ctx"),
                F.lit(True).alias("stopped"),
            ),
        ).otherwise(
            F.struct(
                (acc.getField("used") + F.length(b)).cast("int").alias("used"),
                F.when(acc.getField("ctx") == "", b)
                .otherwise(F.concat(acc.getField("ctx"), F.lit("\n"), b))
                .alias("ctx"),
                F.lit(False).alias("stopped"),
            )
        ),
        lambda acc: acc.getField("ctx"),
    )
    top_doc_ids = F.transform(
        F.coalesce(F.col("hits"), F.array().cast(with_q.schema["hits"].dataType)),
        lambda h: h.getField("doc_id").cast("string"),
    )
    return with_q.select(
        "query_id",
        "query",
        answer.alias("answer"),
        citations.alias("citations"),
        context.alias("context"),
        top_doc_ids.alias("top_doc_ids"),
    )
