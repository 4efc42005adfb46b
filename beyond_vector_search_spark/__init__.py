"""beyond_vector_search_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``mick2004/beyond-vector-search`` (an adaptive retrieval router: TF-IDF
char-n-gram "vector" search, BM25 keyword search, hybrid blend, feature
router with learned weights, offline eval loop, telemetry), plus the
operators a large-scale LLM-training-data pipeline needs (dedup,
similarity search over embedding columns, text analysis).

Design principles (see SURVEY.md):
- DataFrame/SQL only; every operator is a lazy DataFrame -> DataFrame
  transform so Catalyst handles pushdown, pruning, join selection, AQE.
- Queries are *batched*: retrieval operators take a ``(query_id, query)``
  DataFrame — one query and 10M queries produce the same plan.
- Indexes (term stats, postings, gram vectors) are built once as
  DataFrames and persisted, not rebuilt per call.
- Determinism: every top-k uses the stable tie-break (score desc,
  doc_id asc) of reference text.py:52-54.
- No row-at-a-time Python UDFs anywhere in the engine.
"""

__version__ = "0.1.0"

from beyond_vector_search_spark.config import EngineConfig

__all__ = ["EngineConfig"]
