"""Small-file compaction for parquet state stores.

Beyond-reference maintenance operator motivated by this engine's own
incremental stores: the streaming sinks (``streaming/incremental_*``)
append ONE partition directory per micro-batch via dynamic partition
overwrite, and each micro-batch writes as many files as it had tasks. At
100 TB ingest that is the classic small-file death spiral — a year of
5-minute batches is ~10⁵ partitions × tasks files, and every downstream
scan pays a namenode/listing round-trip plus a parquet footer read PER
FILE while whole-stage codegen starves on 2 MB splits. (The reference
has the same exposure in miniature: it re-parquets every inter-stage
handoff, distributed_compute.py:648-670, one file per Dask partition.)

``compact_parquet`` rewrites the store in place, partition directory by
partition directory, into ~``target_file_bytes`` files:

* **planning is metadata-only** — Hadoop ``FileSystem`` listing (works on
  file://, hdfs://, s3a:// alike), no data read: a leaf directory is
  compacted only when its file count exceeds both ``min_files`` and its
  byte-derived target count, so an already-compacted store is a no-op
  (idempotent by construction, not by marker files);
* **each leaf compacts independently** — read the leaf, ``coalesce`` to
  ``ceil(bytes / target_file_bytes)`` (narrow, shuffle-free: compaction
  must not pay a cluster-wide exchange to merge files), write to a
  hidden sibling temp dir, THEN verify row-count equality (a parquet
  footer/metadata count on both sides, no data scan) before the swap;
* **the swap is two renames** — ``leaf → leaf.old``, ``tmp → leaf`` —
  atomic on rename-capable filesystems (HDFS, POSIX). Object stores
  without atomic rename (raw S3) should run compaction inside a table
  format's transaction (Delta ``OPTIMIZE``, Iceberg ``rewrite_data_files``)
  instead; this module is the engine-level primitive those systems wrap.
  Writers must be quiesced for the swapped leaf — for the micro-batch
  stores that means compacting only partitions older than the stream's
  current batch id, which ``partition_filter`` expresses.

Partition-column values live in the DIRECTORY NAME, not the files, so an
in-place leaf rewrite preserves the store's partitioning, pruning, and
the replay-idempotency contract: a later dynamic-overwrite replay of a
compacted batch still replaces exactly its own partition.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class LeafPlan:
    """One leaf directory's compaction decision."""

    path: str
    n_files: int
    bytes: int
    target_files: int

    @property
    def needs_compaction(self) -> bool:
        return self.n_files > self.target_files


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _is_hidden(name: str) -> bool:
    return name.startswith(".") or name.startswith("_")


def _leaf_dirs(fs, jpath, jvm):
    """Yield (dir_path, [(name, len)]) for every directory under jpath
    that directly contains data files. Metadata-only recursive listing."""
    stack = [jpath]
    while stack:
        d = stack.pop()
        files = []
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if st.isDirectory():
                if not _is_hidden(name):
                    stack.append(st.getPath())
            elif not _is_hidden(name):
                files.append((name, st.getLen()))
        if files:
            yield d, files


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> list[LeafPlan]:
    """Metadata-only compaction plan: one entry per leaf data directory.

    ``target_files = max(min_files, ceil(bytes / target_file_bytes))``;
    a leaf needs work only when its current file count exceeds that —
    so re-planning a compacted store yields zero actionable entries.
    """
    fs, jpath, jvm = _fs(spark, path)
    # qualify up front so every plan path (including the root-as-leaf
    # case of an unpartitioned store) shares the scheme/authority prefix
    # that compact_parquet strips to compute filter-relative paths
    jpath = fs.makeQualified(jpath)
    plans = []
    for d, files in _leaf_dirs(fs, jpath, jvm):
        total = sum(ln for _, ln in files)
        target = max(min_files, math.ceil(total / target_file_bytes) or 1)
        plans.append(
            LeafPlan(
                path=d.toString(),
                n_files=len(files),
                bytes=total,
                target_files=target,
            )
        )
    return sorted(plans, key=lambda p: p.path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
    partition_filter=None,
    dry_run: bool = False,
) -> dict:
    """Compact every leaf directory of the parquet store at ``path`` that
    holds more files than its size warrants. Returns a summary dict.

    ``partition_filter``: optional ``str -> bool`` over the leaf path
    (relative to the store root) selecting which leaves MAY be touched —
    e.g. ``lambda p: batch_of(p) < current_batch`` quiesces the live
    micro-batch partition of a streaming store.

    Safety order per leaf: write tmp → footer-count both sides → swap.
    A crash before the swap leaves the store untouched (tmp dirs are
    hidden from Spark/Hadoop readers by the ``.``-prefix); a crash
    between the two renames leaves ``<leaf>.old`` — recoverable by hand,
    and impossible to half-read because the store is whole-directory
    swapped, never mixed.
    """
    fs, root, jvm = _fs(spark, path)
    HPath = jvm.org.apache.hadoop.fs.Path
    root_str = fs.makeQualified(root).toString()

    plans = plan_compaction(spark, path, target_file_bytes, min_files)
    summary = {
        "leaves_scanned": len(plans),
        "leaves_compacted": 0,
        "files_before": 0,
        "files_after": 0,
        "bytes_compacted": 0,
        "skipped_by_filter": 0,
    }
    for plan in plans:
        if not plan.needs_compaction:
            continue
        rel = plan.path[len(root_str):].lstrip("/")
        if partition_filter is not None and not partition_filter(rel):
            summary["skipped_by_filter"] += 1
            continue
        summary["files_before"] += plan.n_files
        summary["bytes_compacted"] += plan.bytes
        if dry_run:
            summary["leaves_compacted"] += 1
            summary["files_after"] += plan.target_files
            continue

        leaf = HPath(plan.path)
        tmp_hidden = HPath(
            leaf.getParent(), "." + leaf.getName() + ".compact-tmp"
        )
        fs.delete(tmp_hidden, True)
        # read ONLY this leaf's files: no partition columns (they live in
        # the dir name), no sibling partitions
        src = spark.read.parquet(plan.path)
        src.coalesce(plan.target_files).write.mode("overwrite").parquet(
            tmp_hidden.toString()
        )
        # footer-only row-count check on both sides before any rename
        n_src = spark.read.parquet(plan.path).count()
        n_tmp = spark.read.parquet(tmp_hidden.toString()).count()
        if n_src != n_tmp:  # pragma: no cover - defensive
            fs.delete(tmp_hidden, True)
            raise RuntimeError(
                f"compaction row-count mismatch at {plan.path}: "
                f"{n_src} -> {n_tmp}; store left untouched"
            )
        old = HPath(plan.path + ".old")
        fs.delete(old, True)
        if not fs.rename(leaf, old):  # pragma: no cover - defensive
            fs.delete(tmp_hidden, True)
            raise RuntimeError(f"compaction swap failed renaming {plan.path}")
        if not fs.rename(tmp_hidden, leaf):  # pragma: no cover - defensive
            fs.rename(old, leaf)  # roll back
            raise RuntimeError(
                f"compaction swap failed installing {plan.path}; rolled back"
            )
        fs.delete(old, True)
        n_after = len(
            [
                st
                for st in fs.listStatus(leaf)
                if not st.isDirectory() and not _is_hidden(st.getPath().getName())
            ]
        )
        summary["leaves_compacted"] += 1
        summary["files_after"] += n_after
    return summary
