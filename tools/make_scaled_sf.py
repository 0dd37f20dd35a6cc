"""Build a LARGER synthetic SF dir by tiling the sf0.1 tables — the
scale-evidence fixture for optimization spot-benches (round 17).

The driver's test data tops out at sf0.1 (documents = 5,000 rows in a
single 1-row-group file), where every 8-vs-32-core ratio is ~1 and
structural claims ("fewer job barriers at scale", "shuffle fewer
bytes") cannot be falsified locally. This tool tiles the corpus tables
K times (default 10 — "sf1-ish") with deterministic per-tile
perturbations chosen so the *selectivity shape* of each pipeline
survives:

- ``documents``: doc_id shifted by k*285000 (a multiple of every
  modulus the queries take on doc_id — 2,3,4,5,19,20,250 — so planted
  fractions hold per tile, and far above the +100000/+200000 planted-id
  ranges so no tile collides with them); every 5th word of ``text``
  gets a per-tile suffix token, so tiles are NOT near-duplicates of
  each other (without this, every doc has K-1 cross-tile twins and the
  minhash/banding joins explode unrepresentatively).
- ``embeddings``: vec_id shifted by k*300000; vectors perturbed
  per-position by a small tile-dependent, position-dependent delta
  (cosine-visible — a pure scale factor would be invisible to cosine
  and leave K-1 exact semantic twins per vector).
- ``events``: event_id shifted by k*3000000 (multiple of 2,3,4,5),
  user_id by k*1000000 (distinct users grow with scale), ts unchanged
  (event density grows — the realistic direction).

Everything else (orders/lineitem/customer/... and the dimension
tables) is copied as-is: the spot-bench targets are the corpus legs.
Output tables are written as multi-file parquet DIRECTORIES named
``<table>.parquet`` (the reader handles dirs), sharded so scans yield
>= defaultParallelism splits and ``_spread`` no-ops — i.e. the layout
a real sharded corpus has.

Usage: python tools/make_scaled_sf.py <out_dir> [K=10] [src=/root/testdata/sf0.1]

NOT oracle data: planted cross-tile interactions are not verified.
This fixture is for MEASUREMENT (task counts, shuffle bytes, wall
clock), never for correctness gates.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gluestick_ts_spark.session import get_spark

TILED = {"documents", "embeddings", "events"}
COPIED = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    k_tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="gluestick-ts-spark-make-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    n_shards = max(32, spark.sparkContext.defaultParallelism)

    # documents
    d = spark.read.parquet(os.path.join(src, "documents.parquet"))
    tiles = []
    for k in range(k_tiles):
        t = d.select(
            (F.col("doc_id") + F.lit(k * 285000)).alias("doc_id"),
            (
                F.col("text")
                if k == 0
                else F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w, i: F.when(
                            i % 5 == 4, F.concat(w, F.lit(f" zqt{k}"))
                        ).otherwise(w),
                    ),
                )
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        tiles.append(t)
    docs = tiles[0]
    for t in tiles[1:]:
        docs = docs.unionByName(t)
    docs.repartition(n_shards).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    # embeddings
    e = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    tiles = []
    for k in range(k_tiles):
        vec = (
            F.col("embedding")
            if k == 0
            else F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x
                    + F.lit(float(0.017 * k))
                    * F.cos(i.cast("double") * F.lit(1.7) + F.lit(float(k)))
                ).cast("float"),
            )
        )
        tiles.append(
            e.select(
                (F.col("vec_id") + F.lit(k * 300000)).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    emb = tiles[0]
    for t in tiles[1:]:
        emb = emb.unionByName(t)
    emb.repartition(n_shards).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    # events
    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    tiles = []
    for k in range(k_tiles):
        tiles.append(
            ev.select(
                (F.col("event_id") + F.lit(k * 3_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(k * 1_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    evs = tiles[0]
    for t in tiles[1:]:
        evs = evs.unionByName(t)
    evs.repartition(n_shards).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    for name in COPIED:
        src_f = os.path.join(src, f"{name}.parquet")
        dst_f = os.path.join(out, f"{name}.parquet")
        if os.path.isdir(dst_f):
            shutil.rmtree(dst_f)
        elif os.path.exists(dst_f):
            os.remove(dst_f)
        shutil.copyfile(src_f, dst_f)
    print(f"scaled sf dir written: {out} (K={k_tiles}, shards={n_shards})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
