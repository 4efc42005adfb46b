#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
to the matching ``oracle_sql()`` via DuckDB: row-count, schema (column
names), and an order-insensitive value hash.

Usage:
    python3 tools/oracle_check.py              # all queries
    python3 tools/oracle_check.py bm25_topk …  # subset
    python3 tools/oracle_check.py --json CORRECTNESS_LOCAL.json   # + artifact
    SPARK_GRAFT_SF_DIR_ORACLE=/root/testdata/sf0.001 python3 tools/oracle_check.py

``--json PATH`` writes a driver-format artifact (one record per query:
rows/schema/hash matches) covering the ENTIRE catalog — the standing
evidence for entries past the driver's ~50-entry correctness cap.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    only = set(args)
    records: dict[str, dict] = {}

    import __spark_entry__ as entry

    from beyond_vector_search_spark.session import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} spark error: {e}")
            failures.append(name)
            records[name] = {"rows_match": False, "err": f"spark: {e}"}
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name:28s} rows={len(srows)} (no oracle — rows-only check)"
                  f"  [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"      WARNING: {name} returned 0 rows")
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            orel = con.execute(sql)
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:28s} duckdb error: {e}")
            failures.append(name)
            records[name] = {"rows_match": False, "err": f"duckdb: {e}"}
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={scols} oracle={ocols}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"value-hash spark={sh} oracle={oh}")
                # show first diffs for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                srt = sorted("|".join(_canon(r[i]) for i in order_s) for r in srows)
                ort = sorted("|".join(_canon(r[i]) for i in order_o) for r in orows)
                for a, b in zip(srt, ort):
                    if a != b:
                        problems.append(f"  first diff:\n    spark : {a[:200]}\n    oracle: {b[:200]}")
                        break
        if problems:
            print(f"FAIL  {name:28s} " + "; ".join(problems[:2]))
            for p in problems[2:]:
                print(p)
            failures.append(name)
        else:
            print(f"OK    {name:28s} rows={len(srows)}  [{time.time()-t0:.1f}s]")
        records[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None if not problems else "; ".join(problems[:2]),
        }

    if json_path:
        with open(json_path, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {json_path} ({len(records)} records)")

    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        return 1
    print("all queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
