"""Mini-driver: run queries()[name] vs oracle_sql()[name] on a sf dir,
compare rows/schema/value-hash the way the graft driver does.

FLOAT-FINISH RECIPE (how to add a query whose hash can never flake):
the compare sorts rows by the ALPHABETICAL column list, so any float
column that sorts BEFORE the row's unique key lets ULP noise decide
row order when two rows tie mathematically — DuckDB's ln() and
numpy's log() differ in ULPs (measured; ln is NOT correctly rounded),
so bit-equality of transcendental floats across engines is
impossible and tie-broken row order diverges. Rules, in force across
the whole catalog (hunted down in round 4, user_entropy):

 1. Keep every core statistic INTEGER (cents, µs, doubled ranks,
    exact rationals num/den) for as long as possible; hash integers,
    not floats, whenever the semantics allow.
 2. When a float must be emitted, NAME it to sort AFTER the row's
    unique key column(s) (e.g. `x_entropy`, not `entropy`, when the
    key is `user_id`) so ties in the float never decide row order.
 3. Make the float evaluation ORDER-FIXED and mirrored term-for-term
    in the SQL: fixed-order pivots/sums (no data-order dependence),
    and only IEEE-correctly-rounded ops on int-derived doubles —
    casts, +, −, ×, ÷, sqrt are safe; ln/exp/pow are NOT (compute
    those only when rule 2 already protects the ordering, and round
    to 6 decimals mentally — canon() rounds floats to 6dp).
 4. Integer moment products that can exceed int64 go to driver
    Python ints (oracle side: HUGEINT) BEFORE the float finish
    (see spearman_qty_disc / spend_gini for the full pattern).
"""
import hashlib
import sys

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa
        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha1()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.astype(str)
        elif str(s.dtype).startswith("float"):
            vals = s.round(6).astype(str)
        else:
            vals = s.astype(str)
        h.update(("\n".join(vals) + "|" + col).encode())
    return h.hexdigest()


def main(sf_dir, names):
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True,
                 logging_level="ERROR")
    import __ray_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    if not names:
        names = list(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    failed = []
    for name in names:
        try:
            res = to_pandas(qs[name](sf_dir))
        except Exception as exc:  # keep sweeping — one bad query
            # (or a transient Ray failure) must not mask the rest
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        if name not in osql:
            print(f"{name}: rows={len(res)} (no_oracle)")
            continue
        orc = con.execute(osql[name]).fetchdf()
        rows = len(res) == len(orc)
        schema = sorted(res.columns) == sorted(orc.columns)
        hmatch = canon(res) == canon(orc) if rows and schema else False
        print(f"{name}: rows={len(res)}/{len(orc)} rows_match={rows} "
              f"schema_match={schema} hash_match={hmatch}")
        if not (rows and schema and hmatch):
            print("  ray cols:", list(res.columns))
            print("  orc cols:", list(orc.columns))
            print(res.head(8))
            print(orc.head(8))


    if failed:
        print(f"FAILED ({len(failed)}): {' '.join(failed)}")
        sys.exit(1)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(sf, sys.argv[2:])
