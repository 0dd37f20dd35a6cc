"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir; compare row count, column names, and an
order-insensitive value multiset.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from gluestick_ts_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value normalization: repr of the double
        return f"{v!r}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def row_key(row, cols_order):
    return tuple(norm_value(row[i]) for i in cols_order)


def compare(name: str, spark, con, sf_dir: str) -> dict:
    q = entrymod.queries()[name]
    t0 = time.time()
    sdf = q(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    spark_sec = time.time() - t0

    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        return {
            "name": name, "mode": "rows_only", "spark_rows": len(srows),
            "spark_sec": round(spark_sec, 2), "ok": len(srows) >= 0,
        }

    t0 = time.time()
    ocur = con.sql(sql)
    ocols = [d[0] for d in ocur.description]
    orows = ocur.fetchall()
    duck_sec = time.time() - t0

    result = {
        "name": name, "mode": "oracle",
        "spark_rows": len(srows), "oracle_rows": len(orows),
        "spark_cols": sorted(scols), "oracle_cols": sorted(ocols),
        "spark_sec": round(spark_sec, 2), "duck_sec": round(duck_sec, 2),
    }
    ok = True
    if sorted(scols) != sorted(ocols):
        ok = False
        result["col_mismatch"] = True
    if len(srows) != len(orows):
        ok = False
    if ok:
        s_order = [scols.index(c) for c in sorted(scols)]
        o_order = [ocols.index(c) for c in sorted(ocols)]
        s_set = sorted(row_key(r, s_order) for r in srows)
        o_set = sorted(row_key(r, o_order) for r in orows)
        if s_set != o_set:
            ok = False
            diffs = [
                (a, b) for a, b in zip(s_set, o_set) if a != b
            ][:3]
            result["value_diff_sample"] = diffs
    result["ok"] = ok
    return result


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(
        app_name="correctness-check",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "8g"},
    )
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    names = only or list(entrymod.queries())
    failures = 0
    for name in names:
        try:
            r = compare(name, spark, con, sf_dir)
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
            continue
        status = "ok  " if r["ok"] else "FAIL"
        if not r["ok"]:
            failures += 1
        extra = ""
        if r["mode"] == "oracle":
            extra = f"spark={r['spark_rows']} duck={r['oracle_rows']}"
            if r.get("col_mismatch"):
                extra += f" COLS spark={r['spark_cols']} duck={r['oracle_cols']}"
            if r.get("value_diff_sample"):
                extra += f" DIFF {r['value_diff_sample'][0]}"
        else:
            extra = f"rows={r['spark_rows']} (rows-only)"
        print(f"{status} {name:28s} {r['spark_sec']:6.1f}s  {extra}")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
