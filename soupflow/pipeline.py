"""Ray Data extraction pipeline: read → map_batches(extract kernel) →
partitioned write with per-partition lineage manifest + resume.

Scale design (SURVEY.md §4.2, BASELINE.json north_rule):
 * The corpus is processed in COARSE partitions (groups of input files /
   fragments). Each partition is one streaming Ray Data pipeline —
   blocks flow read → extract → write with backpressure; nothing is
   materialized. At 100 TB a partition is ~100 GB (one manifest entry),
   so the driver loop is thousands of iterations, each fully parallel
   across the cluster.
 * Resume: a partition writes ``manifest/{pid}.json`` (input files,
   row count, bytes, wall ms, docs/s, kernel version, status) only after
   its output is durably written; a restarted run skips partitions whose
   manifest says done. Output lives under ``parts/{pid}/`` so partial
   writes of a crashed partition are overwritten, never double-counted.
 * Skew: per-row cost is data-dependent (deep DOMs). Blocks are
   size-split by Ray; pathological docs are bounded by the kernel's
   iterative (non-recursive) parse/walk. For known-heavy corpora use
   ``salt_by_cost`` to spread heavy docs across blocks before the map.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional

import pyarrow as pa

from . import __version__

MANIFEST_DIR = "manifest"
PARTS_DIR = "parts"


def _kernel_version() -> str:
    import soupflow.extract as ex
    with open(ex.__file__, "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()[:12]


def list_input_files(input_path: str) -> list[str]:
    import glob
    if os.path.isdir(input_path):
        return sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    return [input_path]


def partition_inputs(files: list[str],
                     files_per_partition: int = 1) -> list[list[str]]:
    return [files[i:i + files_per_partition]
            for i in range(0, len(files), files_per_partition)]


def completed_partitions(output_dir: str,
                         kernel_version: Optional[str] = None) -> set[int]:
    """Partition ids with a done manifest. If ``kernel_version`` is
    given, partitions processed by a DIFFERENT kernel are treated as
    incomplete (lineage-based invalidation: bump the kernel → stale
    partitions reprocess on the next resume)."""
    mdir = os.path.join(output_dir, MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            if m.get("status") != "done":
                continue
            if kernel_version is not None and \
                    m.get("kernel_version") != kernel_version:
                continue
            done.add(int(m["partition_id"]))
        except (ValueError, KeyError, json.JSONDecodeError):
            continue
    return done


def default_read_blocks(rows: int, nbytes: int, cpus: int,
                        docs_per_task: int = 2500,
                        target_block_bytes: int = 128 << 20) -> int:
    """Read-split count for the extraction pipeline: ~``docs_per_task``
    documents per task (enough parse work that Ray's fixed per-task
    dispatch cost is noise), floored at one task per CPU slot so the
    pool fills, and at one block per ``target_block_bytes`` so
    huge-document corpora keep heap-bounded blocks. Ray's default
    splitting targets ~200 blocks, which on a small corpus yields
    sub-100 ms tasks whose dispatch cost dominates (measured
    11.7k → 18.2k docs/s at 20 k docs / 32 CPUs); at real scale the
    byte target takes over and this matches the default regime."""
    return max(cpus, rows // docs_per_task,
               nbytes // target_block_bytes, 1)


def salt_by_cost(ds, num_buckets: int = 64):
    """Optional skew pre-pass: route documents to salted buckets by a
    cheap cost hint (total span text bytes), spreading pathological
    docs. Adds a 'salt' column; follow with ds.repartition(num_buckets).

    Fully vectorized (Arrow list-flatten + segment cumsum for the cost
    hint, pandas siphash for the id) and DETERMINISTIC across worker
    processes — Python's builtin ``hash`` is seed-randomized per
    process, which would make resume/debug runs route differently."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def add_salt(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        offs = spans.offsets.to_numpy()
        offs = offs - offs[0]
        lens = pc.binary_length(
            pc.fill_null(spans.flatten().field("text"), "")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
        cost = cs[offs[1:]] - cs[offs[:-1]]
        ids = pd.util.hash_array(
            np.asarray(batch.column("doc_id").to_pylist(),
                       dtype=object)).astype(np.int64)
        salt = ((ids ^ (cost // 65536)) % num_buckets).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, pa.int32()))
    add_salt.__name__ = "salt_by_cost"

    return ds.map_batches(add_salt, batch_format="pyarrow")


def run_extract_partition(files: list[str], out_dir: str, pid: int, *,
                          whitelist: Optional[str] = None,
                          drop_boilerplate: bool = True,
                          link_density_threshold: float = 0.0,
                          concurrency: Optional[int] = None,
                          batch_size: Optional[int] = None,
                          salt_buckets: Optional[int] = None,
                          override_num_blocks: Optional[int] = None) -> dict:
    """One streaming partition: read files → extract → write + manifest.

    ``salt_buckets``: optional skew pre-pass for corpora with known
    pathological deep-DOM documents — adds a cost-hint salt column and
    shuffles rows across that many blocks so heavy docs spread instead
    of clustering in one straggler block. One extra all-to-all per
    partition; leave off for uniform corpora."""
    import ray.data

    from .io import read_corpus

    t0 = time.monotonic()
    in_bytes = sum(os.path.getsize(f) for f in files)
    if override_num_blocks is None and \
            all(f.endswith(".parquet") for f in files):
        # task-sized read splits (see default_read_blocks); parquet
        # footers give exact row counts for O(files) I/O. Non-parquet
        # (lance) inputs keep Ray's default splitting.
        import pyarrow.parquet as _pq
        import ray as _ray
        rows = sum(_pq.read_metadata(f).num_rows for f in files)
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        override_num_blocks = default_read_blocks(rows, in_bytes, cpus)
    ds = read_corpus(files, override_num_blocks=override_num_blocks)
    if salt_buckets:
        ds = salt_by_cost(ds, salt_buckets)
        ds = ds.repartition(salt_buckets, shuffle=True)
        ds = ds.drop_columns(["salt"])
    def kernel(batch):
        # task-based kernel: compiled state is a per-worker-process
        # singleton (see soupflow.extract.get_extract_kernel — measured
        # ~7× the actor-pool throughput on a saturated node)
        from soupflow.extract import get_extract_kernel
        return get_extract_kernel(whitelist, drop_boilerplate,
                                  link_density_threshold)(batch)

    # batch_size=None (whole blocks): blocks are already heap-bounded
    # by target_max_block_size, and an explicit batch_size BUNDLES
    # small blocks into fewer tasks — measured ~10% headline loss from
    # 128-row bundling at sf0.1. Pass a row cap only for corpora whose
    # blocks are oversized for the parse kernel's working set.
    ds = ds.map_batches(
        kernel,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    part_dir = os.path.join(out_dir, PARTS_DIR, f"{pid:05d}")
    # a crashed earlier attempt may have left partial files (no manifest
    # was written, so we're re-running) — clear them or write_parquet
    # would ADD files and double-count the partition
    if os.path.isdir(part_dir):
        import shutil
        shutil.rmtree(part_dir)
    os.makedirs(part_dir, exist_ok=True)
    from .io import write_corpus
    write_corpus(ds, part_dir)
    # manifest row count from parquet FOOTERS only (0.02 s vs 2.5 s
    # for a Dataset re-read per partition — footer I/O stays O(files)
    # at 100 TB; lance datasets fall back to the dataset count)
    import glob as _glob
    pfiles = _glob.glob(os.path.join(part_dir, "*.parquet"))
    if pfiles:
        import pyarrow.parquet as _pq
        rows = sum(_pq.read_metadata(f).num_rows for f in pfiles)
    else:
        rows = read_corpus(part_dir).count()
    wall = time.monotonic() - t0
    try:
        # per-stage Ray Data execution stats (wall time per operator,
        # rows, memory) — the "metrics" half of lineage+metrics
        stage_stats = ds.stats()[:4000]
    except Exception:
        stage_stats = None
    manifest = {
        "partition_id": pid,
        "input_files": files,
        "input_bytes": in_bytes,
        "row_count": rows,
        "wall_s": round(wall, 3),
        "docs_per_s": round(rows / wall, 2) if wall > 0 else None,
        "kernel_version": _kernel_version(),
        "engine_version": __version__,
        "status": "done",
        "stage_stats": stage_stats,
    }
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{pid:05d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(mdir, f"{pid:05d}.json"))
    return manifest


def run_extract(input_path: str, output_dir: str, *,
                whitelist: Optional[str] = None,
                drop_boilerplate: bool = True,
                link_density_threshold: float = 0.0,
                files_per_partition: int = 4,
                concurrency: Optional[int] = None,
                batch_size: Optional[int] = None,
                salt_buckets: Optional[int] = None,
                resume: bool = True,
                strict_kernel: bool = False) -> list[dict]:
    """Full resumable extraction run over a directory of parquet files.

    ``strict_kernel=True`` invalidates partitions whose manifest was
    written by a different kernel version (see completed_partitions)."""
    files = list_input_files(input_path)
    partitions = partition_inputs(files, files_per_partition)
    kv = _kernel_version() if strict_kernel else None
    done = completed_partitions(output_dir, kv) if resume else set()
    manifests = []
    for pid, part_files in enumerate(partitions):
        if pid in done:
            continue
        manifests.append(run_extract_partition(
            part_files, output_dir, pid, whitelist=whitelist,
            drop_boilerplate=drop_boilerplate,
            link_density_threshold=link_density_threshold,
            concurrency=concurrency, batch_size=batch_size,
            salt_buckets=salt_buckets))
    return manifests
