"""Pre-flight mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the same query on DuckDB over the identical parquet tables;
compares row count, column names, and canonically-sorted values.

Usage: python scripts/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        # The DRIVER's pandas canonicalizer cannot sort list cells
        # (unhashable) — it errors the entry. Mirror that exactly so
        # mirror-green ⇒ driver-green (r5 lesson: list-handling here hid
        # the ext_embed_quantize driver failure for two rounds).
        raise TypeError(
            "list-valued result column — driver cannot canonicalize; "
            "emit a scalar encoding (concat_ws/to_json) instead")
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    if os.environ.get("PLAIN_SESSION"):
        # mirror the driver: a SparkSession built without our factory's confs
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[32]")
                 .appName("plain-check")
                 .config("spark.sql.shuffle.partitions", "32")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
    else:
        from graphdb_free_mocha_sa_spark.session import get_spark
        spark = get_spark()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = list(df.columns)
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(cols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(cols)} "
                  f"oracle={sorted(ocols)}")
            n_fail += 1
            continue
        try:
            a, b = canon_rows(cols, rows), canon_rows(ocols, orows)
        except TypeError as e:
            print(f"FAIL {name}: canonicalization: {e}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount spark={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(a)} rows [{time.time()-t0:.1f}s]")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
