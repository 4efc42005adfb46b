"""Driver-testdata smoke: every table must load through the real
``load_table`` path against the driver's actual parquet files.

Round 3 shipped a fully green 80-test suite alongside a reader that
crashed on the driver's ``events.parquet`` (its ``ts`` dtype had drifted
from nanos-as-BIGINT to timestamp[us]); the suite never exercised
``load_table`` against the real files.  This module makes that class of
schema drift a local failure in seconds.
"""

from __future__ import annotations

import os

import pytest

from beyond_vector_search_spark.sources.readers import (
    TESTDATA_TABLES,
    load_table,
    register_testdata_views,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata not present at {SF_DIR}"
)


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_load_table_reads_driver_parquet(spark, table):
    df = load_table(spark, SF_DIR, table)
    rows = df.limit(1).collect()
    assert len(rows) == 1, f"{table} loaded empty"


def test_events_ts_is_timestamp(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # and it is usable by the epoch-extraction functions the queries rely on
    got = ev.selectExpr("unix_millis(ts) AS ms").limit(1).collect()
    assert got[0]["ms"] > 0


def test_register_testdata_views_sql_roundtrip(spark):
    register_testdata_views(spark, SF_DIR)
    n = spark.sql("SELECT count(*) AS c FROM events").collect()[0]["c"]
    assert n > 0


def test_load_table_legacy_nanos_parquet(spark, tmp_path):
    """The historical testdata format stored events.ts as
    TIMESTAMP(NANOS) (readable only as BIGINT nanos under the legacy
    flag); load_table must still convert that shape to a micros
    timestamp with the same wall-clock values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = pa.array([1704067798778549000, 1704068166738090123], type=pa.timestamp("ns"))
    t = pa.table(
        {
            "event_id": pa.array([0, 1], type=pa.int64()),
            "ts": ns,
            "user_id": pa.array([13, 12], type=pa.int64()),
            "event_type": pa.array(["error", "signup"]),
            "value": pa.array([185.22, 106.03]),
            "props": pa.array(['{"k": 87}', '{"k": 0}']),
        }
    )
    # version>=2.6 keeps nanosecond resolution instead of coercing to us
    pq.write_table(t, str(tmp_path / "events.parquet"), version="2.6")

    ev = load_table(spark, str(tmp_path), "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = [r["ms"] for r in ev.selectExpr("unix_millis(ts) AS ms").orderBy("event_id").collect()]
    assert got == [1704067798778, 1704068166738]


def test_catalog_on_pristine_driver_session():
    """The external driver builds its own SparkSession with stock confs
    (no get_spark tuning). Drive the entry contract the same way in a
    clean subprocess: plain builder, entry() + an events-dependent
    catalog query — the combination that broke in round 3."""
    import subprocess
    import sys

    script = r"""
import importlib.util
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").appName("pristine").getOrCreate()
spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
assert m.entry(spark).count() >= 0
q = m.queries()
assert q["events_sessions"](spark, "SFDIR").count() > 0
assert q["tpch_q1"](spark, "SFDIR").count() > 0
print("PRISTINE-OK")
""".replace("SFDIR", SF_DIR)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert "PRISTINE-OK" in out.stdout, out.stderr[-2000:]
