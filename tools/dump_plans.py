"""Dump ``explain("formatted")`` for bench queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> [query ...]

The round dir is ``$SPARK_GRAFT_PLANS_ROUND`` (default r17).
Writes plans/<round>/<query>_<suffix>.txt for each query (default: every
bench query). Queries whose construction runs eager work (training,
pagerank) still produce their post-checkpoint plan — same convention
as tools/plan_audit.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gluestick_ts_spark.plans.queries import QUERIES
from gluestick_ts_spark.session import get_spark


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        from bench import BENCH_QUERIES

        names = list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="gluestick-ts-spark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            txt = f"ERROR building/explaining {name}: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
