"""Cluster entry point: the world-module attribute layer (SURVEY §2.10)
as one spark-submit job — run every tag→value derivation over an
element parquet and write one wide attribute table.

Usage (cluster):
    tools/submit.sh jobs/attributes_job.py \
        --master spark://host:7077 \
        --input /data/elements_parquet --out /data/attributes

Usage (sandbox):
    python jobs/attributes_job.py --input elements.parquet --out /tmp/attrs

Input: any parquet with a `tags map<string,string>` column (plus
whatever id columns the caller carries — all preserved).  Output: the
input columns plus every attribute column the layer derives —
buildings (btype … min_height), roads (n_lanes* / width), barriers,
railways, trees, waterways, aeroways, structural flags.  The whole job
is ONE zero-shuffle projection (plan-pinned by
tests/test_plan_shape.py), so at any scale it costs exactly the
read + write.  Power-line cable runs need segment topology (two
frames) and stay on the Engine facade (`Engine.power_cables`).

Prints one JSON summary line (row count, non-null counts per family).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--master", default=None)
    p.add_argument("--input", required=True,
                   help="elements parquet with a tags map column")
    p.add_argument("--out", required=True)
    p.add_argument("--tags-col", default="tags")
    p.add_argument("--forest-tree-height", type=float, default=None,
                   help="use 20.0 for forest elements (default 10.0)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from osm2world_spark.api import Engine
    from osm2world_spark.session import get_spark

    kw = {}
    if args.shuffle_partitions:
        kw["shuffle_partitions"] = args.shuffle_partitions
    spark = get_spark(master=args.master, app_name="attributes-job", **kw)
    e = Engine(spark)

    df = spark.read.parquet(args.input)
    tc = args.tags_col

    out = e.building_attributes(df, tags_col=tc)
    out = e.road_attributes(out, tags_col=tc)
    out = e.barrier_attributes(out, tags_col=tc)
    out = e.railway_attributes(out, tags_col=tc)
    tree_kw = {}
    if args.forest_tree_height is not None:
        tree_kw["default_height"] = args.forest_tree_height
    out = e.tree_attributes(out, tags_col=tc, **tree_kw)
    out = e.waterway_attributes(out, tags_col=tc)
    out = e.aeroway_attributes(out, tags_col=tc)
    out = e.structure_attributes(out, tags_col=tc)

    out.write.mode("overwrite").parquet(args.out)

    # one aggregation pass over the written table (count(col) skips
    # NULLs), not one scan per family
    written = spark.read.parquet(args.out)
    row = written.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count("btype").alias("buildings"),
        F.count(F.col(tc)["highway"]).alias("roads"),
        F.count("barrier_kind").alias("barriers"),
        F.count("gauge_m").alias("railways"),
        F.count("waterway_kind").alias("waterways"),
        F.count("aeroway_kind").alias("aeroways"),
        F.count_if(F.col("is_bridge")).alias("bridges"),
    ).collect()[0]
    summary = {**row.asDict(), "out": args.out}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
