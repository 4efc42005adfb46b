"""Telemetry sinks: the runs log and the router-state KV store.

Reference (telemetry.py:37-92) uses SQLite/Postgres UPSERTs; the Spark
shapes are:

- ``runs`` -> an APPEND-ONLY parquet log.  A global autoincrement
  run_id is an anti-pattern on a cluster; identity is (ts_unix, seq
  within batch) and ``monotonically_increasing_id`` supplies a
  collision-free surrogate per batch.
- ``router_state`` -> append + LAST-WRITER-WINS view (row_number over
  key ordered by version desc).  With a Delta/Iceberg table this would
  be ``MERGE INTO``; plain parquet gets the same read semantics from
  the LWW view without table-format dependencies.

Both sinks partition nothing at this size; at scale, ``runs`` is
date-partitioned (``.partitionBy(run_date)``) so the drift queries
prune partitions.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RUNS_SCHEMA = (
    "run_id BIGINT, ts_unix DOUBLE, query STRING, strategy STRING, "
    "score DOUBLE, meta_json STRING"
)
# what runs() actually returns: RUNS_SCHEMA plus the run_date partition
# column the parquet layout carries — the empty-store fallback and the
# JDBC backend must present the SAME shape, or a query written against
# a populated store (e.g. partition-pruning on run_date) breaks the
# first time it meets a fresh store or a different backend
RUNS_VIEW_SCHEMA = RUNS_SCHEMA + ", run_date DATE"
STATE_SCHEMA = "key STRING, value_json STRING, version BIGINT"


class TelemetryStore:
    """Parquet-backed telemetry with the reference's three operations
    (log_run / get_state / set_state, telemetry.py:70-92)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._runs = os.path.join(path, "runs")

    # -- runs ---------------------------------------------------------------

    def log_runs(self, df: DataFrame) -> None:
        """Append a batch of runs.  ``df``: (query, strategy, score[,
        ts_unix][, meta_json])."""
        cols = df.columns
        out = df
        if "ts_unix" not in cols:
            out = out.withColumn("ts_unix", F.lit(time.time()))
        if "meta_json" not in cols:
            out = out.withColumn("meta_json", F.lit("{}"))
        out = out.select(
            F.monotonically_increasing_id().alias("run_id"),
            F.col("ts_unix").cast("double"),
            "query",
            "strategy",
            F.col("score").cast("double"),
            "meta_json",
            # date partitioning: drift/inspection queries over a time
            # range prune partitions instead of scanning the full log
            F.to_date(F.to_timestamp(F.col("ts_unix"))).alias("run_date"),
        )
        out.write.mode("append").partitionBy("run_date").parquet(self._runs)

    def log_run(self, *, query: str, strategy: str, score: float, meta: dict | None = None) -> None:
        df = self.spark.createDataFrame(
            [(query, strategy, float(score), time.time(), json.dumps(meta or {}, sort_keys=True))],
            "query STRING, strategy STRING, score DOUBLE, ts_unix DOUBLE, meta_json STRING",
        )
        self.log_runs(df)

    def runs(self) -> DataFrame:
        from beyond_vector_search_spark.sources import fsutil

        # Hadoop FS probe, not os.path: the log lives wherever the
        # parquet does (HDFS/S3A on a cluster)
        if not fsutil.exists(self.spark, self._runs):
            return self.spark.createDataFrame([], RUNS_VIEW_SCHEMA)
        return self.spark.read.parquet(self._runs)

    # -- state KV -----------------------------------------------------------

    def _state_root(self) -> str:
        """Current state-log directory: the committed
        ``router_state-v{N}`` (fsutil pointer protocol, written by
        ``compact_state``) or the legacy/initial ``router_state``."""
        from beyond_vector_search_spark.sources import fsutil

        return fsutil.resolve_version(self.spark, self.path, "router_state")

    def set_state(self, key: str, value: dict) -> None:
        df = self.spark.createDataFrame(
            [(key, json.dumps(value, sort_keys=True), time.time_ns())],
            STATE_SCHEMA,
        )
        df.write.mode("append").parquet(self._state_root())

    def _state_view(self) -> DataFrame:
        from beyond_vector_search_spark.sources import fsutil

        root = self._state_root()
        if not fsutil.exists(self.spark, root):
            return self.spark.createDataFrame([], STATE_SCHEMA)
        self.spark.catalog.refreshByPath(root)
        w = Window.partitionBy("key").orderBy(F.desc("version"))
        return (
            self.spark.read.parquet(root)
            .withColumn("_rn", F.row_number().over(w))
            .where("_rn = 1")
            .drop("_rn")
        )

    def compact_state(self) -> int:
        """Rewrite the append-only state log down to its LWW winners —
        the plain-parquet copy-on-write equivalent of the Delta/Iceberg
        ``MERGE INTO`` (+ OPTIMIZE) the reference's SQL UPSERT implies
        (telemetry.py:86-92).  ``get_state`` results are identical
        before and after; what changes is that the log stops growing
        O(appends) and the LWW window reads one row per key.

        Commit protocol is the versioned pointer file (sources/
        fsutil.py): the winners view is written in full to a fresh
        ``router_state-v{N}`` directory, committed by ONE atomic
        marker-file create, then older versions are garbage-collected.
        Readers resolve the highest committed version, so a crash at
        any step leaves them a complete, consistent log — on any
        filesystem Spark writes to, including S3A (the previous
        implementation swapped with ``os.rename``, which was both
        local-only and a two-step non-atomic swap).  Single-writer
        like every directory store here: serialize ``set_state``
        against ``compact_state``.
        Returns the surviving row count (distinct keys).
        """
        from beyond_vector_search_spark.sources import fsutil

        root = self._state_root()
        if not fsutil.exists(self.spark, root):
            return 0
        n = fsutil.next_version(self.spark, self.path, "router_state")
        new = f"{self.path}/router_state-v{n}"
        self._state_view().write.mode("overwrite").parquet(new)
        cnt = self.spark.read.parquet(new).count()
        fsutil.commit_version(self.spark, self.path, "router_state", n)
        fsutil.gc_versions(self.spark, self.path, "router_state")
        return cnt

    def get_state(self, key: str, default: dict | None = None) -> dict:
        rows = self._state_view().where(F.col("key") == key).collect()
        if not rows:
            return default if default is not None else {}
        return json.loads(rows[0].value_json)

    # -- the demo notebook's ad-hoc SQL surface (reference demo.py:315,383) --

    def register_views(self) -> None:
        self.runs().createOrReplaceTempView("runs")
        self._state_view().createOrReplaceTempView("router_state")


class JdbcTelemetryStore(TelemetryStore):
    """JDBC-backed runs log (the reference's Postgres backend,
    telemetry.py:95-186, as ``df.write.jdbc``).  The state KV stays on
    parquet (JDBC has no portable upsert through the DataFrame API).

    Requires a JDBC driver jar on the Spark classpath — constructing
    the store does not; only the first write touches the database.
    """

    def __init__(self, spark: SparkSession, path: str, *, url: str, table: str = "runs", properties: dict | None = None):
        super().__init__(spark, path)
        self.url = url
        self.table = table
        self.properties = properties or {}

    def log_runs(self, df: DataFrame) -> None:
        out = df
        if "ts_unix" not in df.columns:
            out = out.withColumn("ts_unix", F.lit(time.time()))
        if "meta_json" not in out.columns:
            out = out.withColumn("meta_json", F.lit("{}"))
        out.select("ts_unix", "query", "strategy", "score", "meta_json").write.mode(
            "append"
        ).jdbc(self.url, self.table, properties=self.properties)

    def runs(self) -> DataFrame:
        # align to the parquet backend's view shape (RUNS_VIEW_SCHEMA):
        # the JDBC table has no run_id/run_date columns, so derive them
        # — backend choice must not change the relation a consumer sees
        df = self.spark.read.jdbc(self.url, self.table, properties=self.properties)
        if "run_id" not in df.columns:
            df = df.withColumn("run_id", F.monotonically_increasing_id())
        if "run_date" not in df.columns:
            df = df.withColumn(
                "run_date", F.to_date(F.to_timestamp(F.col("ts_unix")))
            )
        return df.select(
            "run_id", "ts_unix", "query", "strategy", "score", "meta_json", "run_date"
        )


def telemetry_from_env(spark: SparkSession, path: str) -> TelemetryStore:
    """Backend dispatch (reference telemetry.py:189-209, env
    ``BVS_TELEMETRY``): default parquet store; ``jdbc`` selects the
    JDBC runs log with ``BVS_JDBC_URL``/``BVS_JDBC_TABLE``."""
    backend = os.environ.get("BVS_TELEMETRY", "parquet").lower()
    if backend == "jdbc":
        url = os.environ.get("BVS_JDBC_URL")
        if not url:
            raise ValueError("BVS_TELEMETRY=jdbc requires BVS_JDBC_URL")
        return JdbcTelemetryStore(
            spark, path, url=url, table=os.environ.get("BVS_JDBC_TABLE", "runs")
        )
    return TelemetryStore(spark, path)
