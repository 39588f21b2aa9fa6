"""Cluster entry point: the resumable docs -> tiles+overlaps pipeline as a
spark-submit job.

This is the analogue of the reference's bulk tiling driver
(`osm2world tileset --bbox ... --baseDir ...`,
/root/reference/desktop/src/main/java/org/osm2world/console/commands/
TilesetCommand.java:99-137): enumerate work, skip completed tiles, run the
conversion per tile, contain per-tile failures, record metrics.

Usage (cluster):
    tools/submit.sh jobs/tile_pipeline_job.py \
        --master spark://host:7077 \
        --input /data/documents_parquet --out /data/out --run-ts run1

Usage (sandbox, two parallelism levels for the scaling protocol):
    python jobs/tile_pipeline_job.py --master 'local[8]'  --n-docs 40000 --out /tmp/o8
    python jobs/tile_pipeline_job.py --master 'local[32]' --n-docs 40000 --out /tmp/o32

The job reads an interleaved-document parquet directory (doc_id, spans)
— or synthesizes one deterministically with --n-docs — and runs the
committed-manifest-resumable TilePipeline. Re-running with the same --out
resumes: committed tiles are anti-joined away (TilesetCommand
filterTileNumbers semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# spark-submit runs this file as __main__ from anywhere; the package comes
# either from --py-files or from the repo checkout next to this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--master", default=None, help="override master (else spark-submit decides)")
    p.add_argument("--input", default=None, help="documents parquet dir (doc_id, spans)")
    p.add_argument("--n-docs", type=int, default=None, help="synthesize N documents instead of --input")
    p.add_argument("--out", required=True, help="output root (stages + _commits + _lineage)")
    p.add_argument("--run-ts", default="run0")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    # ConvertCommand/TilesetCommand parity flags
    p.add_argument(
        "--tile", default=None, metavar="Z,X,Y",
        help="restrict to documents intersecting one tile "
             "(convert --tile semantics)")
    p.add_argument(
        "--bbox", default=None, metavar="MINLAT,MINLON,MAXLAT,MAXLON",
        help="restrict to documents intersecting a bbox "
             "(mutually exclusive with --tile)")
    p.add_argument(
        "--models", default=None,
        choices=["obj", "pov", "gltf", "fpbf", "png"],
        help="also serialize per-tile model files (S8 sinks)")
    p.add_argument(
        "--with-tileset", action="store_true",
        help="also write the tileset index (TilesetOutput layout)")
    args = p.parse_args()
    if args.tile and args.bbox:
        p.error("--tile and --bbox are mutually exclusive "
                "(OSMDataReaderView.java:49-52)")

    from osm2world_spark.session import get_spark
    from osm2world_spark.plans.pipeline import TilePipeline

    kw = {}
    if args.master:
        kw["master"] = args.master
    if args.shuffle_partitions:
        kw["shuffle_partitions"] = args.shuffle_partitions
    spark = get_spark(app_name="tile_pipeline_job", **kw)
    spark.sparkContext.setLogLevel("WARN")

    if args.input:
        docs = spark.read.parquet(args.input)
    elif args.n_docs:
        from osm2world_spark.sources.documents import synthetic_documents

        docs = synthetic_documents(spark, args.n_docs, seed=42)
    else:
        p.error("one of --input or --n-docs is required")

    if args.tile or args.bbox:
        from osm2world_spark.sources.views import bounded_docs

        if args.tile:
            z, x, y = (int(v) for v in args.tile.split(","))
            docs = bounded_docs(docs, tile=(z, x, y))
        else:
            lo_lat, lo_lon, hi_lat, hi_lon = (
                float(v) for v in args.bbox.split(","))
            docs = bounded_docs(docs, bounds=(lo_lat, lo_lon, hi_lat, hi_lon))

    t0 = time.monotonic()
    stats = TilePipeline(spark, args.out).run(
        docs, run_ts=args.run_ts,
        with_tileset=args.with_tileset,
        with_models=args.models,
    )
    wall = time.monotonic() - t0
    print(json.dumps({"job": "tile_pipeline", "wall_sec": round(wall, 3), **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
