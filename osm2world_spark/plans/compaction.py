"""Small-file compaction for partitioned parquet stage tables.

At 100 TB every incremental run (plans/pipeline.py writes per-tile;
plans/pipeline.invalidate rewrites touched tiles) accretes small files,
and scan cost becomes dominated by file-open overhead instead of bytes.
This module is the standard maintenance pass (the bin-pack strategy of
Iceberg/Delta OPTIMIZE, public design): group undersized files into
~target-size rewrite groups per partition, leave right-sized files
alone, rewrite each group as one file.

Two pieces:
- ``plan_compaction`` — the pure planner over a (partition, file_path,
  size_bytes) listing. Same next-fit window shape as
  operators/packing.pack_sequences with the zero-contribution trick
  from plans/curation: ineligible (already >= target) files ride the
  window contributing nothing, so eligible files bin exactly as if the
  big files were absent, and the whole plan is TWO windows over the
  same partition key (bin assignment, then group-size accounting —
  one exchange; the second window's key extends the first's, so the
  clustering is reused). Deterministic: order by (size desc, path).
- ``compact_parquet_dir`` — a working executor for a
  ``partitionBy(col)`` parquet directory: one Spark job scans the table
  directory, keeps only rewrite-group rows via a broadcast join on
  (partition, input_file_name) — dynamic partition pruning drops
  untouched partition directories at runtime — repartitions by group id
  (each group lands in exactly one task => exactly one output file per
  group), writes them through the same partitionBy layout, then swaps
  the originals out. The file LISTING is driver-side (os.walk /
  manifest — bounded by file count, the same listing any table format
  does in its manifest layer), but neither a data row nor the victim
  path LIST ever materializes on the driver (paths stream out via
  toLocalIterator for the unlink pass).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Static partition-pruning bound for the compaction executor: touched
# partition values up to this count are pushed down as a partition
# filter (a ~10k-literal IN keeps the plan small); beyond it the scan
# relies on the broadcast row-filter join alone.
_STATIC_PRUNE_MAX = 10_000


def plan_compaction(
    files: DataFrame,
    target_bytes: int,
    partition_cols: tuple[str, ...] = ("partition",),
    path_col: str = "file_path",
    size_col: str = "size_bytes",
) -> DataFrame:
    """(partition_cols..., file_path, size_bytes, group_id, n_in_group,
    group_bytes, action): next-fit bin assignment of undersized files.

    action = 'keep' for files already >= target_bytes AND for eligible
    files alone in their bin (rewriting a single file buys nothing);
    'rewrite' for every bin holding >= 2 files. group_id is NULL for
    keep-because-big files.
    """
    pcols = list(partition_cols)
    eligible = F.col(size_col) < target_bytes
    contrib = F.when(eligible, F.col(size_col)).otherwise(F.lit(0))
    w = (
        Window.partitionBy(*pcols)
        .orderBy(F.col(size_col).desc(), F.col(path_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(contrib).over(w)
    binned = files.select(
        *pcols,
        path_col,
        size_col,
        F.when(eligible, F.floor((cum - contrib) / F.lit(target_bytes)))
        .cast("bigint")
        .alias("group_id"),
    )
    wg = Window.partitionBy(*pcols, "group_id")
    n_in_group = F.when(
        F.col("group_id").isNotNull(), F.count("*").over(wg)
    ).cast("int")
    group_bytes = F.when(
        F.col("group_id").isNotNull(), F.sum(size_col).over(wg)
    ).cast("bigint")
    return binned.select(
        *pcols,
        path_col,
        size_col,
        "group_id",
        n_in_group.alias("n_in_group"),
        group_bytes.alias("group_bytes"),
        F.when(F.col("group_id").isNull() | (n_in_group == 1), F.lit("keep"))
        .otherwise(F.lit("rewrite"))
        .alias("action"),
    )


def list_partitioned_parquet(
    spark: SparkSession, root: str, partition_col: str
) -> DataFrame:
    """(partition_value, file_path, size_bytes) for a one-level
    ``partitionBy(partition_col)`` parquet layout. Driver-side walk —
    the manifest-layer operation, bounded by file count."""
    rows = []
    for entry in sorted(os.listdir(root)):
        full = os.path.join(root, entry)
        if not (os.path.isdir(full) and entry.startswith(partition_col + "=")):
            continue
        pval = entry.split("=", 1)[1]
        for fn in sorted(os.listdir(full)):
            if fn.endswith(".parquet"):
                fp = os.path.join(full, fn)
                rows.append((pval, fp, os.path.getsize(fp)))
    return spark.createDataFrame(
        rows, f"{partition_col} string, file_path string, size_bytes bigint"
    )


def compact_parquet_dir(
    spark: SparkSession,
    root: str,
    partition_col: str,
    target_bytes: int,
    plan: DataFrame | None = None,
) -> dict:
    """Execute a compaction plan over a partitionBy(partition_col)
    parquet dir in ONE distributed job. Returns a summary dict.

    Reads only files in 'rewrite' groups, tags each row with its group
    via a broadcast join on the source file path, repartitions by
    (partition, group) so each group is exactly one task -> one output
    file, writes through the same partition layout into the live
    directory, then removes the replaced originals. Crash between write
    and remove leaves duplicates visible — callers needing atomicity
    route through the pipeline's commit manifest instead; this is the
    bare-directory tool.
    """
    if plan is None:
        listing = list_partitioned_parquet(spark, root, partition_col)
        plan = plan_compaction(
            listing, target_bytes, partition_cols=(partition_col,)
        )
    todo = plan.where(F.col("action") == "rewrite").select(
        partition_col, "file_path", "group_id"
    )
    n_victims = todo.count()
    if n_victims == 0:
        return {"groups_rewritten": 0, "files_removed": 0}
    n_groups = todo.select(partition_col, "group_id").distinct().count()

    # Scan the table DIRECTORY and tag rewrite rows with a broadcast
    # join on (partition, source file) — the victim path LIST never
    # passes through the driver (at 100-TB maintenance it is easily
    # 10^5-10^6 paths, too many for a read.parquet(*victims) argument
    # list). Untouched partition directories are pruned STATICALLY: the
    # distinct touched partition VALUES (bounded by directory count, a
    # strictly smaller set than file paths) become a pushed-down
    # partition filter when they number <= _STATIC_PRUNE_MAX; above
    # that, the scan falls back to the join-only row filter, which is
    # correct at any scale (Catalyst's DPP heuristic cannot be relied
    # on here — the plan side is a stats-less window subtree). The
    # partition column is typed string via an explicit read schema so
    # the join key matches the plan's without a scan-side cast; one
    # victim file's footer provides the data schema (a 1-row lookup).
    from pyspark.sql.types import StringType, StructField, StructType

    one_victim = todo.select("file_path").first()["file_path"]
    data_schema = spark.read.parquet(one_victim).schema
    full_schema = StructType(
        [f for f in data_schema if f.name != partition_col]
        + [StructField(partition_col, StringType())]
    )
    touched = [
        r[0]
        for r in todo.select(partition_col)
        .distinct()
        .limit(_STATIC_PRUNE_MAX + 1)
        .collect()
    ]
    reader = spark.read.schema(full_schema).parquet(root)
    if len(touched) <= _STATIC_PRUNE_MAX:
        reader = reader.where(F.col(partition_col).isin(touched))
    rows = (
        reader
        # input_file_name is a percent-encoded URI (file:///...); decode
        # and strip the scheme so it matches the os.walk listing
        .withColumn(
            "_src",
            F.url_decode(
                F.regexp_replace(F.input_file_name(), "^file:/*", "/")
            ),
        )
    )
    tagged = rows.join(
        F.broadcast(todo.withColumnRenamed("file_path", "_src")),
        [partition_col, "_src"],
    )
    # refuse to delete anything a path-normalization mismatch failed to
    # re-tag (url_decode's '+'-as-space rule is one known gap): data
    # loss is never an acceptable failure mode for a maintenance tool
    matched = tagged.select("_src").distinct().count()
    if matched != n_victims:
        raise RuntimeError(
            f"compaction tagged {matched}/{n_victims} source files; "
            "refusing to rewrite (path normalization mismatch)"
        )

    # write through a leading-underscore temp dir (invisible to parquet
    # readers of `root`), partitioned by (partition, group): hash
    # repartition puts each group in exactly one task, and the group
    # DIRECTORY keeps colliding groups in separate files, so the
    # one-file-per-group contract survives hash collisions
    tmp = os.path.join(root, "_compact_tmp")
    (
        tagged.drop("_src")
        .withColumnRenamed("group_id", "_cgrp")
        .repartition(n_groups, partition_col, "_cgrp")
        .write.mode("overwrite")
        .partitionBy(partition_col, "_cgrp")
        .parquet(tmp)
    )
    import shutil

    n_files_out = 0
    for ptdir in sorted(os.listdir(tmp)):
        if not ptdir.startswith(partition_col + "="):
            continue
        dest = os.path.join(root, ptdir)
        os.makedirs(dest, exist_ok=True)
        for gdir in sorted(os.listdir(os.path.join(tmp, ptdir))):
            if not gdir.startswith("_cgrp="):
                continue
            gval = gdir.split("=", 1)[1]
            for fn in sorted(os.listdir(os.path.join(tmp, ptdir, gdir))):
                if fn.endswith(".parquet"):
                    os.replace(
                        os.path.join(tmp, ptdir, gdir, fn),
                        os.path.join(dest, f"compact-g{gval}-{fn}"),
                    )
                    n_files_out += 1
    # stream the victim paths partition-by-partition instead of
    # materializing the full list driver-side (bounded driver memory at
    # any victim count)
    n_removed = 0
    for r in todo.select("file_path").toLocalIterator():
        os.remove(r["file_path"])
        n_removed += 1
    shutil.rmtree(tmp)
    return {
        "groups_rewritten": n_groups,
        "files_removed": n_removed,
        "files_written": n_files_out,
    }
