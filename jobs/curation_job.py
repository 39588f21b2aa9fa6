"""Cluster entry point: the single-pass corpus-curation plan
(plans/curation.py: quality gate -> exact dedup -> leakage-safe split ->
sequence packing) as a spark-submit job — the LLM-pipeline sibling of
jobs/tile_pipeline_job.py.

Usage (cluster):
    tools/submit.sh jobs/curation_job.py \
        --master spark://host:7077 \
        --input /data/documents_parquet --out /data/curated

Usage (sandbox):
    python jobs/curation_job.py --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated --min-words 10

Output layout: `<out>/audit` — one row per input document with the full
audit trail (keep_quality, is_canonical, split, bucket, bin_id,
n_tokens), written partitioned by `split` so a training loader reads
`split=train` with partition pruning and nothing is silently dropped.
Prints one JSON summary line (counts per stage) to stdout.
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
    p.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    p.add_argument("--out", required=True)
    p.add_argument("--val-frac", type=float, default=0.1)
    p.add_argument("--budget-tokens", type=int, default=2048)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--min-words", type=int, default=50)
    p.add_argument("--min-stop-words", type=int, default=2)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from osm2world_spark.plans.curation import curate
    from osm2world_spark.session import get_spark

    kw = {}
    if args.master:
        kw["master"] = args.master
    if args.shuffle_partitions:
        kw["shuffle_partitions"] = args.shuffle_partitions
    spark = get_spark(app_name="curation_job", **kw)
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input).select("doc_id", "text")
    audit = curate(
        docs,
        val_frac=args.val_frac,
        budget_tokens=args.budget_tokens,
        n_buckets=args.n_buckets,
        min_words=args.min_words,
        min_stop_words=args.min_stop_words,
    )
    audit.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(args.out, "audit")
    )

    back = spark.read.parquet(os.path.join(args.out, "audit"))
    summary = {
        r["split"]: r["n"]
        for r in back.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = back.count()
    kept = back.where(F.col("is_canonical")).count()
    print(
        json.dumps(
            {
                "docs": total,
                "canonical": kept,
                "by_split": {str(k): v for k, v in summary.items()},
                "out": args.out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
