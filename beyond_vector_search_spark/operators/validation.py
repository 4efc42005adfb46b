"""Data-quality validation: declarative column constraints checked in
ONE aggregation pass (the Deequ/Great-Expectations core, engine-native).

A 100 TB ingest job needs its gate BEFORE the expensive operators run:
null-rate spikes, key-uniqueness breaks, out-of-range values, and
format drift are all cheaper to catch at the scan.  Every rule compiles
to a conditional-count expression over the same single `agg()` — the
whole report is one partial+final aggregation over one table scan, no
matter how many rules (uniqueness adds a count_distinct to the same
aggregate).  Fully deterministic => DuckDB-oracle-checkable.

Rule kinds (params):

- ``not_null``                    — violations = NULL values
- ``unique``                      — violations = rows beyond the first
  of each value (n_nonnull - n_distinct; NULLs are not counted as
  duplicates of each other)
- ``min`` (value) / ``max`` (value) — violations = non-NULL values
  outside the bound
- ``between`` (lo, hi)            — violations outside [lo, hi]
- ``regex`` (pattern)             — violations = non-NULL strings not
  fully matching (Java regex; keep patterns RE2-portable for oracles)
- ``allowed`` (values)            — violations = non-NULL values not in
  the set
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    rule_id: str
    column: str
    kind: str
    params: tuple = field(default_factory=tuple)


def _violation_expr(rule: Rule) -> Column:
    c = F.col(rule.column)
    k = rule.kind
    if k == "not_null":
        cond = c.isNull()
    elif k == "min":
        cond = c.isNotNull() & (c < F.lit(rule.params[0]))
    elif k == "max":
        cond = c.isNotNull() & (c > F.lit(rule.params[0]))
    elif k == "between":
        lo, hi = rule.params
        cond = c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
    elif k == "regex":
        cond = c.isNotNull() & ~c.rlike(rule.params[0])
    elif k == "allowed":
        cond = c.isNotNull() & ~c.isin(list(rule.params[0]))
    else:
        raise ValueError(f"unknown rule kind: {k!r}")
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def data_quality_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule_id, column, kind, n_rows, n_violations, passed) — one row
    per rule, all computed in a single aggregation over a single scan.

    ``unique`` compiles to ``count(col) - count_distinct(col)`` inside
    the same aggregate; every other kind is a conditional count.  The
    scan reads only the referenced columns (column pruning), and the
    aggregation is partial+final — the report costs one pass at any
    scale.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, r in enumerate(rules):
        if r.kind == "unique":
            aggs.append(
                (F.count(F.col(r.column)) - F.count_distinct(F.col(r.column)))
                .cast("long")
                .alias(f"_v{i}")
            )
        else:
            aggs.append(_violation_expr(r).alias(f"_v{i}"))
    row = df.agg(*aggs)
    reports = []
    for i, r in enumerate(rules):
        reports.append(
            F.struct(
                F.lit(r.rule_id).alias("rule_id"),
                F.lit(r.column).alias("column"),
                F.lit(r.kind).alias("kind"),
                F.col("_n").alias("n_rows"),
                F.coalesce(F.col(f"_v{i}"), F.lit(0)).cast("long").alias("n_violations"),
                (F.coalesce(F.col(f"_v{i}"), F.lit(0)) == 0).alias("passed"),
            )
        )
    return (
        row.select(F.explode(F.array(*reports)).alias("r"))
        .select("r.rule_id", "r.column", "r.kind", "r.n_rows", "r.n_violations", "r.passed")
    )


def assert_quality(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Gate form: returns ``df`` unchanged if every rule passes, else
    raises ``ValueError`` naming the failed rules (count + first
    violations are in the message).  The eager check is one aggregation
    job — run it once per ingest batch, not per downstream query."""
    failed = [
        r
        for r in data_quality_report(df, rules).collect()
        if not r["passed"]
    ]
    if failed:
        detail = "; ".join(
            f"{r['rule_id']}({r['kind']} on {r['column']}): {r['n_violations']}/{r['n_rows']}"
            for r in failed
        )
        raise ValueError(f"data quality gate failed: {detail}")
    return df
