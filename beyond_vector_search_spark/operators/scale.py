"""Scale utilities: skew-salted joins and bucketed index tables.

These are the knobs the engine reaches for when a 100 TB run hits the
two classic wall-clock killers: a hot key (stopword-grade terms in the
postings join; a celebrity user in sessionization) and a repeated
shuffle of a large fact table on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the large side's hot keys spread over ``salt`` buckets.

    The large side gets a random-but-deterministic salt (hash of its
    whole row modulo ``salt``); the small side is exploded ``salt``
    times.  Each (key, salt) shard lands in its own task, so one hot
    key occupies ``salt`` tasks instead of straggling on one.

    Use when AQE's skew-join splitting isn't available (e.g. the skew
    is in an aggregation feeding the join) or the skew factor is known
    up front.  Output columns = large ∪ small minus the helper salt.
    """
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt))
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return salted_large.join(exploded_small, [key, "_salt"], how).drop("_salt")


def save_bucketed_index(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a relation bucketed (and optionally sorted) by its join
    key.  Readers joining two tables bucketed the same way skip the
    shuffle AND the sort — for the postings/doc_vec index this turns
    every scoring join into a zip of co-located buckets.

    Bucketing requires the table catalog (``saveAsTable``); plain
    ``.parquet()`` files cannot carry bucket metadata.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
