"""Input sources.

The reference loads line-delimited JSON with hand-rolled loops
(data.py:20-50); Spark's native JSON reader with an EXPLICIT schema is
the equivalent (the reference's dataclass constructors make the schema
fixed — we never rely on inference, which would require an extra pass
over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = "doc_id STRING, title STRING, text STRING"
LABELS_SCHEMA = "query_id STRING, query STRING, expected_doc_id STRING, expected_answer STRING"

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    """JSONL corpus -> (doc_id, title, text); blank lines dropped natively
    (reference data.py:20-30)."""
    return spark.read.schema(CORPUS_SCHEMA).json(path).where("doc_id IS NOT NULL")


def load_labels(spark: SparkSession, path: str) -> DataFrame:
    """JSONL labels -> (query_id, query, expected_doc_id, expected_answer)
    (reference data.py:33-50)."""
    return spark.read.schema(LABELS_SCHEMA).json(path).where("query_id IS NOT NULL")


def _set_conf(spark: SparkSession, key: str, value: str) -> None:
    """Best-effort conf set: the driver may hand us a session we didn't
    build, and some legacy/static confs are not runtime-settable on every
    Spark version."""
    try:
        spark.conf.set(key, value)
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver testdata parquet table (TESTDATA.md).

    events.ts has shipped as both TIMESTAMP(NANOS) (readable only with
    the legacy nanosAsLong flag, as BIGINT nanos) and plain
    timestamp[us]; normalize to a micros timestamp either way by
    branching on the dtype Spark actually read.
    """
    _set_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp->string casts (oracle-facing) must be TZ-stable even if
    # the caller's session didn't set a timezone
    _set_conf(spark, "spark.sql.session.timeZone", "UTC")
    # right-size shuffles for callers running Spark's 200-partition
    # default against these small-SF tables (AQE coalesces, but the
    # initial partitioning still costs task overhead)
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        _set_conf(spark, "spark.sql.shuffle.partitions", "32")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type in ("bigint", "long", "int"):
            # legacy nanos-as-BIGINT file: convert to a real timestamp
            # truncated to micros (the same truncation DuckDB applies)
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        elif ts_type == "timestamp_ntz":
            # The NTZ->LTZ cast interprets wall-clock in the SESSION
            # timezone; it is value-preserving only under the UTC pin
            # above.  The pin is best-effort (caller-owned sessions),
            # so VERIFY it took effect — silently shifting every event
            # timestamp by a zone offset would corrupt results, and a
            # loud config error beats that.
            if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
                raise RuntimeError(
                    "events.ts is TIMESTAMP_NTZ and spark.sql.session.timeZone "
                    "could not be set to UTC on this session; set it at session "
                    "build time (UTC) so the NTZ->timestamp cast is value-preserving"
                )
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


# register_testdata_views memo: one (sf_dir) marker per live session.
# WeakKey so a stopped/collected session never pins the entry, and a
# NEW session object (even at a recycled id()) starts unregistered.
from weakref import WeakKeyDictionary  # noqa: E402

_REGISTERED_VIEWS: "WeakKeyDictionary[SparkSession, str]" = WeakKeyDictionary()


def register_testdata_views(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> None:
    """Register all testdata tables as temp views for spark.sql use.

    Memoized per (session, sf_dir): catalog entries call this
    defensively before every spark.sql, and re-reading 10 parquet
    footers + re-analyzing 10 view plans per query is pure fixed
    overhead (~0.2 s/call on local[32]).  Re-registers when sf_dir
    changes; pass force=True after dropping views externally.
    """
    if not force and _REGISTERED_VIEWS.get(spark) == sf_dir:
        return
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    _REGISTERED_VIEWS[spark] = sf_dir
