#!/usr/bin/env python
"""Cluster entrypoint for the extraction pipeline.

On a real fixed-size cluster this is submitted as a Ray job:

    ray job submit --working-dir . -- \\
        python scripts/run_extract_job.py \\
        --input  /data/corpus/            \\
        --output /data/extracted/         \\
        --files-per-partition 64 --batch-size 128

Inside the job, ``ray.init()`` with no address connects to the
cluster that launched it; standalone it starts a local session. The
run is resumable: re-submitting after a failure skips partitions with
a done manifest (add --strict-kernel to also invalidate partitions
processed by an older kernel).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# make the repo importable when launched as `python scripts/...` or as
# a ray job with --working-dir (the package lives next to scripts/)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="corpus directory (parquet/lance files)")
    ap.add_argument("--output", required=True,
                    help="output directory (parts/ + manifest/)")
    ap.add_argument("--whitelist", default=None,
                    help="cleaner whitelist preset name (optional)")
    ap.add_argument("--files-per-partition", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--salt-buckets", type=int, default=None,
                    help="optional skew pre-pass bucket count")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--strict-kernel", action="store_true")
    ap.add_argument("--link-density-threshold", type=float, default=0.0)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init()  # cluster address from the job env; local standalone

    from soupflow.pipeline import run_extract
    try:
        manifests = run_extract(
            args.input, args.output,
            whitelist=args.whitelist,
            link_density_threshold=args.link_density_threshold,
            files_per_partition=args.files_per_partition,
            batch_size=args.batch_size,
            salt_buckets=args.salt_buckets,
            resume=not args.no_resume,
            strict_kernel=args.strict_kernel)
        total_rows = sum(m["row_count"] for m in manifests)
        total_wall = sum(m["wall_s"] for m in manifests)
        print(json.dumps({
            "partitions_processed": len(manifests),
            "rows": total_rows,
            "wall_s": round(total_wall, 3),
            "docs_per_s": round(total_rows / total_wall, 2)
            if total_wall else None,
        }))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
