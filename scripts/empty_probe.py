"""Catalog-wide fully-empty-input probe.

Builds an sf dir where every corpus table keeps its real schema but
holds ZERO rows (the filter-eliminated-everything regime a production
pipeline hits when an upstream stage drops every row), then invokes
every `queries()` entry against it and reports OK/RAISE per query.

Ray 2.49 crash classes this regime exercises:
  - hash joins raise ArrowInvalid when a side is fully empty;
  - collecting an all-empty groupby/sort yields a SCHEMA-LESS table
    whose column access KeyErrors.
Queries either carry in-function guards or are wrapped by the
registration-level guard in queries.py (EMPTY_RESULT_SCHEMAS), so the
expected outcome is OK for all catalog entries.

Usage: python scripts/empty_probe.py [schema_src_sf_dir]
       (default /root/testdata/sf0.001; empty dir built in /tmp)
"""
import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def build_empty_dir(src_sf: str, dst: str) -> str:
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(f"{src_sf}/*.parquet"):
        schema = pq.read_schema(p)
        pq.write_table(schema.empty_table(),
                       os.path.join(dst, os.path.basename(p)))
    return dst


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sys.path.insert(0, os.getcwd())
    import __ray_entry__ as m
    empty_dir = build_empty_dir(src, "/tmp/soupflow_empty_probe")
    qs = m.queries()
    n_bad = 0
    for name in sorted(qs):
        try:
            r = qs[name](empty_dir)
            n = (r.num_rows if isinstance(r, pa.Table)
                 else (r.count() if hasattr(r, "count") else len(r)))
            print(f"{name}: OK rows={n}", flush=True)
        except Exception as e:  # noqa: BLE001 - probe reports, not raises
            print(f"{name}: RAISE {type(e).__name__} "
                  f"{str(e)[:150]}", flush=True)
            n_bad += 1
    print(f"SUMMARY ok={len(qs) - n_bad} raise={n_bad}")
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
