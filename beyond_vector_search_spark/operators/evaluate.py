"""Offline evaluation loop: batch scoring + ordered feedback fold.

Reference evaluate.py:16-116 loops queries sequentially, rebuilding
nothing but mutating router weights between queries.  The Spark shape
(SURVEY.md §3.2): ALL heavy work — 3 strategies × all labels scoring,
answer generation, hit@k / exact-match — runs as ONE batch dataflow;
the only sequential piece, the K-row winner->weight trajectory, is
folded on the driver in label order.  1 query and 10M queries are the
same plan; only the fold's input (one tiny row per labeled query)
ever reaches the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beyond_vector_search_spark.config import DEFAULT, EngineConfig
from beyond_vector_search_spark.functions.text import norm_answer
from beyond_vector_search_spark.operators.answer import generate_answers
from beyond_vector_search_spark.operators.corpus_index import CorpusIndex
from beyond_vector_search_spark.operators.retrieval import search_all
from beyond_vector_search_spark.operators.router import (
    RouterState,
    choose_with_state,
    heuristic_columns,
    query_features,
    update_from_scores,
)

HIT_WEIGHT, EM_WEIGHT = 0.7, 0.3  # reference evaluator.py:13-16


def strategy_eval(
    top_k: DataFrame,
    documents: DataFrame,
    labels: DataFrame,
    *,
    id_col: str = "doc_id",
    title_col: str | None = "title",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
) -> DataFrame:
    """(query_id, hit_at_k, exact_match, total, top_doc_ids) for one
    strategy's top-k relation (reference evaluator.py:19-40)."""
    queries = labels.select("query_id", "query")
    ans = generate_answers(
        top_k, documents, queries, id_col=id_col, title_col=title_col, text_col=text_col, cfg=cfg
    )
    j = ans.join(
        labels.select("query_id", "expected_doc_id", "expected_answer"), "query_id"
    )
    hit = F.when(
        F.array_contains("top_doc_ids", F.col("expected_doc_id").cast("string")), 1.0
    ).otherwise(0.0)
    em = F.when(norm_answer("answer") == norm_answer("expected_answer"), 1.0).otherwise(0.0)
    return j.select(
        "query_id",
        hit.alias("hit_at_k"),
        em.alias("exact_match"),
        (HIT_WEIGHT * hit + EM_WEIGHT * em).alias("total"),
        "top_doc_ids",
    )


def fold_weights_windowed(merged: DataFrame, state: RouterState) -> DataFrame:
    """The eval feedback fold (reference evaluate.py:59-69 +
    router.py:120-164) as COLUMN EXPRESSIONS — no driver loop.

    Key fact making this exact: ``update_from_scores`` deltas depend
    only on that row's three eval scores, never on the current weights
    (winner is argmax of scores; winner +lr, each loser −lr/2; all-tied
    → no-op).  So the weights query i routes with are

        w0 + Σ deltas of rows < i   (prefix sum in query_id order)

    — a window aggregate — and the routing choice at row i is the same
    CASE chain as :func:`router.route` applied to (heuristics + those
    prefix weights).  The winner's argmax tie-break "alphabetical by
    name" is exactly the hybrid ≥ keyword ≥ vector precedence chain
    (hybrid < keyword < vector alphabetically).

    Scale note: the window is a global ORDER BY over ONE skinny row per
    label — the classic bounded case (the corpus never enters).  At
    extreme label counts, replace with the two-pass range-partitioned
    prefix sum; the driver fold in :func:`evaluate_all` remains the
    reference semantics.

    Adds: winner, d_vector/d_keyword/d_hybrid (this row's deltas),
    w_vector/w_keyword/w_hybrid (weights BEFORE this row), chosen,
    chosen_score.
    """
    from pyspark.sql import Window

    s = {"vector": F.col("s_vec"), "keyword": F.col("s_key"), "hybrid": F.col("s_hyb")}
    winner = (
        F.when((s["hybrid"] >= s["keyword"]) & (s["hybrid"] >= s["vector"]), "hybrid")
        .when(s["keyword"] >= s["vector"], "keyword")
        .otherwise("vector")
    )
    all_eq = (s["vector"] == s["keyword"]) & (s["keyword"] == s["hybrid"])
    df = merged.withColumn("winner", winner)
    for name in ("vector", "keyword", "hybrid"):
        df = df.withColumn(
            f"d_{name}",
            F.when(all_eq, F.lit(0.0)).otherwise(
                F.when(F.col("winner") == name, F.lit(state.lr)).otherwise(
                    F.lit(-state.lr / 2.0)
                )
            ),
        )
    before = Window.orderBy("query_id").rowsBetween(Window.unboundedPreceding, -1)
    w0 = {
        "vector": state.weight_vector,
        "keyword": state.weight_keyword,
        "hybrid": state.weight_hybrid,
    }
    for name in ("vector", "keyword", "hybrid"):
        df = df.withColumn(
            f"w_{name}",
            F.lit(w0[name]) + F.coalesce(F.sum(f"d_{name}").over(before), F.lit(0.0)),
        )
    sk = F.col("heuristic_keyword") + F.col("w_keyword")
    sv = F.col("heuristic_vector") + F.col("w_vector")
    sh = F.col("heuristic_hybrid") + F.col("w_hybrid")
    chosen = (
        F.when((sh >= sk) & (sh >= sv), "hybrid")
        .when(sk >= sv, "keyword")
        .otherwise("vector")
    )
    df = df.withColumn("chosen", chosen)
    return df.withColumn(
        "chosen_score",
        F.when(F.col("chosen") == "vector", s["vector"])
        .when(F.col("chosen") == "keyword", s["keyword"])
        .otherwise(s["hybrid"]),
    )


@dataclass
class EvalReport:
    mean_score: float
    n: int
    router_state: dict
    per_query: list[dict] = field(default_factory=list)

    def to_json(self) -> dict:
        return {
            "mean_score": self.mean_score,
            "n": self.n,
            "router_state": self.router_state,
            "per_query": self.per_query,
        }


def evaluate_all(
    labels: DataFrame,
    documents: DataFrame,
    index: CorpusIndex,
    *,
    state: RouterState | None = None,
    id_col: str = "doc_id",
    title_col: str | None = "title",
    text_col: str = "text",
    cfg: EngineConfig = DEFAULT,
    k: int | None = None,
    tops: dict[str, DataFrame] | None = None,
    evals: dict[str, DataFrame] | None = None,
    fold: str = "driver",
) -> tuple[EvalReport, RouterState, DataFrame]:
    """Run the full evaluation; returns (report, final_state, runs_df).

    ``runs_df`` is the telemetry relation (one row per query, reference
    evaluate.py:71-100) ready for the telemetry sink.  Query order for
    the feedback fold = ascending query_id (the labels file is ordered
    Q-001.. so file order == query_id order).

    Pass precomputed ``tops`` ({strategy: top-k DataFrame}) to reuse
    cached score relations across callers, or precomputed ``evals``
    ({strategy: strategy_eval output}) to skip the answer/hit/EM
    derivation entirely (callers that serve the loop repeatedly cache
    those three tiny relations — plans/coverage_queries.q_eval_loop).

    ``fold="driver"`` replays the weight trajectory as a sequential
    driver fold (the reference semantics, one tiny row per label);
    ``fold="windowed"`` computes the identical trajectory as window
    expressions (:func:`fold_weights_windowed`) — the fully
    distributed form for label sets too large to fold on the driver.
    Both produce bit-identical reports (pinned by
    tests/test_eval_parity.py).
    """
    state = state or RouterState()
    k = k if k is not None else cfg.k
    queries = labels.select("query_id", "query")

    if evals is None:
        tops = tops or search_all(queries, index, k=k, cfg=cfg)
        evals = {
            s: strategy_eval(
                tops[s], documents, labels,
                id_col=id_col, title_col=title_col, text_col=text_col, cfg=cfg,
            )
            for s in ("vector", "keyword", "hybrid")
        }
    feats = heuristic_columns(query_features(queries, index.term_stats))

    # One tiny row per query: all three arms' scores + routing heuristics.
    merged = (
        feats.join(evals["vector"].select("query_id", F.col("total").alias("s_vec"), F.col("top_doc_ids").alias("ids_vec")), "query_id")
        .join(evals["keyword"].select("query_id", F.col("total").alias("s_key"), F.col("top_doc_ids").alias("ids_key")), "query_id")
        .join(evals["hybrid"].select("query_id", F.col("total").alias("s_hyb"), F.col("top_doc_ids").alias("ids_hyb")), "query_id")
        .orderBy("query_id")
    )
    if fold == "windowed":
        # trajectory computed engine-side; the collect returns RESULTS
        # (chosen arm + weights), not a sequential dependency
        rows = fold_weights_windowed(merged, state).orderBy("query_id").collect()
    else:
        rows = merged.collect()

    per_query: list[dict] = []
    run_rows: list[tuple] = []
    total = 0.0
    for r in rows:
        d = r.asDict()
        if fold == "windowed":
            chosen = d["chosen"]
            chosen_score = d["chosen_score"]
            total += chosen_score
            state = RouterState(
                weight_vector=d["w_vector"] + d["d_vector"],
                weight_keyword=d["w_keyword"] + d["d_keyword"],
                weight_hybrid=d["w_hybrid"] + d["d_hybrid"],
                lr=state.lr,
            )
        else:
            chosen = choose_with_state(d, state)
            chosen_score = {"vector": d["s_vec"], "keyword": d["s_key"], "hybrid": d["s_hyb"]}[chosen]
            total += chosen_score
            state = update_from_scores(
                state, {"vector": d["s_vec"], "keyword": d["s_key"], "hybrid": d["s_hyb"]}
            )
        per_query.append(
            {
                "query_id": d["query_id"],
                "query": d["query"],
                "chosen": chosen,
                "chosen_score": chosen_score,
                "vector_score": d["s_vec"],
                "keyword_score": d["s_key"],
                "hybrid_score": d["s_hyb"],
            }
        )
        run_rows.append((d["query"], chosen, chosen_score, d["query_id"]))

    n = len(rows)
    report = EvalReport(
        mean_score=total / max(1, n),
        n=n,
        router_state=state.to_json(),
        per_query=per_query,
    )
    spark = labels.sparkSession
    chosen_df = spark.createDataFrame(
        run_rows, "query STRING, strategy STRING, score DOUBLE, query_id STRING"
    )
    # Rich telemetry meta (reference evaluate.py:71-100) built JVM-side
    # with to_json(struct(...)) — features, per-arm scores, top doc ids.
    meta = F.to_json(
        F.struct(
            F.lit(True).alias("eval"),
            F.col("query_id"),
            F.struct(
                F.col("n_tokens"), F.col("digit_ratio"), F.col("oov_ratio"), F.col("rare_ratio")
            ).alias("features"),
            F.struct(F.col("s_vec").alias("score_total"), F.col("ids_vec").alias("top_doc_ids")).alias("vector"),
            F.struct(F.col("s_key").alias("score_total"), F.col("ids_key").alias("top_doc_ids")).alias("keyword"),
            F.struct(F.col("s_hyb").alias("score_total"), F.col("ids_hyb").alias("top_doc_ids")).alias("hybrid"),
        )
    )
    runs_df = (
        chosen_df.join(merged, ["query_id", "query"])
        .select(
            "query",
            "strategy",
            "score",
            "query_id",
            meta.alias("meta_json"),
        )
        .withColumn("ts_unix", F.unix_timestamp(F.current_timestamp()).cast("double"))
    )
    return report, state, runs_df
