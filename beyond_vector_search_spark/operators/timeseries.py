"""Time-series joins Spark lacks as builtins: as-of and range joins.

``asof_join`` uses the union+window trick instead of an inequality
join: tag both sides, union them, and carry the most recent right-side
value forward with ``last_value IGNORE NULLS`` over (key, time).  One
shuffle on (key, time) — no O(n*m) inequality-join explosion, no skew
amplification; this is the shape that survives a 100 TB events table.

``range_join`` expresses the bounded-inequality join with an equi-join
on a coarse time *bucket* plus the exact predicate: Spark turns the
bucket condition into a hash join and the residual range filter runs
post-join, instead of falling back to BroadcastNestedLoopJoin over the
raw inequality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right.on <= left.on`` within the same ``by`` group (DuckDB/kdb
    ASOF JOIN semantics; left rows with no match keep NULLs).

    ``on``: ordering column name (must be comparable; same name both
    sides).  ``by``: equality key.  ``right_cols``: right columns to
    carry (default: all but on/by), suffixed ``_right`` on clash.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    out_names = [c + "_right" if c in left.columns else c for c in right_cols]

    l_tag = left.withColumn("_is_left", F.lit(True))
    r_tag = right.select(
        by,
        F.col(on).alias(on),
        F.lit(False).alias("_is_left"),
        *[F.col(c).alias(o) for c, o in zip(right_cols, out_names)],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for o in out_names:
        if o not in l_tag.columns:
            l_tag = l_tag.withColumn(o, F.lit(None).cast(dict(r_tag.dtypes)[o]))

    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))
    # right rows sort BEFORE left rows at equal timestamps (asc on
    # _is_left: False < True), so an exact-tie right row is visible to
    # the left row — matching ASOF's <= semantics.
    w = (
        Window.partitionBy(by)
        .orderBy(F.asc(on), F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "_is_left",
        *[
            F.last(F.when(~F.col("_is_left"), F.col(o)), ignorenulls=True)
            .over(w)
            .alias(o + "_c")
            for o in out_names
        ],
    )
    return carried.where("_is_left").select(
        *[c for c in left.columns if c != "_is_left"],
        *[F.col(o + "_c").alias(o) for o in out_names],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    left_time: str,
    right_time: str,
    lower_ms: int,
    upper_ms: int,
    bucket_ms: int | None = None,
) -> DataFrame:
    """Pairs with ``lower_ms <= right_time - left_time <= upper_ms``
    within the same ``by`` group, both times in epoch millis.

    Implemented as an equi-join on (key, time bucket) over the buckets
    each right row can fall into, + the exact residual predicate — a
    hash join Catalyst can shuffle/broadcast, never a nested-loop scan.
    """
    bucket_ms = bucket_ms or max(1, upper_ms - lower_ms)

    l = left.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor((F.col(left_time) + lower_ms) / bucket_ms).cast("bigint"),
                F.floor((F.col(left_time) + upper_ms) / bucket_ms).cast("bigint"),
            )
        ),
    )
    # F.floor to match the left side: a bare bigint cast truncates
    # toward zero, which disagrees with floor for negative epoch-millis
    # and silently drops boundary pairs.
    r = right.withColumn("_b", F.floor(F.col(right_time) / bucket_ms).cast("bigint"))
    cond = (
        (F.col(f"r.{right_time}") - F.col(f"l.{left_time}") >= lower_ms)
        & (F.col(f"r.{right_time}") - F.col(f"l.{left_time}") <= upper_ms)
    )
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col(f"l.{by}") == F.col(f"r.{by}")) & (F.col("l._b") == F.col("r._b")),
        )
        .where(cond)
        .select("l.*", *[F.col(f"r.{c}").alias(c + "_right") for c in right.columns if c != by])
        .drop("_b", "_b_right")
    )
