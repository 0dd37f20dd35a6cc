"""cProfile the CONSTRUCTION of a query (fn(spark, sf_dir) only, no
action): separates py4j expression-tree chatter from eager Spark jobs
fired at build time. Prints the top cumulative functions plus the
total build seconds.

Usage: python tools/profile_build.py <query> [query ...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gluestick_ts_spark.plans.queries import QUERIES
from gluestick_ts_spark.session import get_spark


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gluestick-ts-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        # one warm pass so codegen/JVM warmup isn't charged to the profile
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        del df
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        df = fn(spark, sf_dir)
        pr.disable()
        build = time.time() - t0
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        execute = time.time() - t1
        buf = io.StringIO()
        st = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
        st.print_stats(25)
        print(f"===== {name}: build {build:.3f}s exec {execute:.3f}s =====")
        print("\n".join(buf.getvalue().splitlines()[:40]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
