"""Streaming sketches: KMV distinct-count, Count-Min heavy hitters,
HyperLogLog registers.

The 100-TB cardinality primitive: estimate |distinct(col)| without
shuffling the column — each block contributes its k smallest distinct
hashes (a few KB), the driver merges, and the estimate is
``(k-1) * 2^64 // h_k`` from the k-th smallest distinct hash
(Bar-Yossef et al. 2002). Unlike HyperLogLog the whole computation is
exact integer arithmetic over a deterministic hash, so a SQL oracle
reproduces the estimate BIT-FOR-BIT (DuckDB HUGEINT), not just within
an error bound — the sketch itself is testable, not only its accuracy.

Scale shape: ONE streaming pass, per-batch np.unique + partition-based
k-smallest partials, driver-side merge of ≤ k×num_blocks int64s. The
relative error is ~1/sqrt(k-2) (k=256 → ~6%); when the true distinct
count is below k the sketch holds every hash and the estimate is
exact.

Count-Min (Cormode & Muthukrishnan 2005) is the frequency twin: a
d×w integer matrix where cell[r][h_r(x) % w] accumulates every
occurrence of x. Sums commute, so per-block partial matrices merge by
addition under ANY partitioning, and the estimate min_r cell[r][h_r(x)]
is a deterministic integer — SQL-oracle-able bit-for-bit, including
its one-sided collision overestimates.

HyperLogLog (Flajolet et al. 2007) registers are max-merged per-block
partials: register[b] = max rank of the hash suffix over all values
hashing to bucket b. Max commutes like sum, so the register table —
and the integer-scaled harmonic denominator Σ 2^(SCALE - rank) — is
partitioning-independent and exactly reproducible in SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sampling import PHI64, _mix

_U64 = 1 << 64


def kmv_partials(ds, col: str, k: int = 256):
    """Per-block bottom-k distinct hashes → narrow (hv,) rows."""
    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        hv = np.unique(_mix(vals))          # sorted distinct uint64
        hv = hv[:k]
        return pa.table({"hv": pa.array(hv.astype(np.uint64),
                                        pa.uint64())})
    partial.__name__ = f"kmv{k}_partial"
    return ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")


def kmv_distinct(ds, col: str, k: int = 256):
    """→ 1-row pyarrow Table (est_distinct: int64). Deterministic:
    the same hash + integer arithmetic as the SQL oracle.

    Input contract: ``col`` must be a NON-NEGATIVE integer column —
    the splitmix helper ``_mix`` raises ``ValueError`` on negative
    ids (numpy would wrap them into uint64 space while DuckDB's
    HUGEINT ``%`` keeps the dividend's sign, silently diverging from
    the oracle)."""
    from ..io import collect_table

    t = collect_table(kmv_partials(ds, col, k))
    if t.num_columns == 0 or t.num_rows == 0:
        return pa.table({"est_distinct": pa.array([0], pa.int64())})
    hv = np.unique(t.column("hv").to_numpy(zero_copy_only=False))
    if hv.size < k:
        est = int(hv.size)
    else:
        hk = int(hv[k - 1])
        est = (k - 1) * _U64 // hk
    return pa.table({"est_distinct": pa.array([est], pa.int64())})


# -- HyperLogLog registers ---------------------------------------------------

def hll_registers(ds, col: str, p: int = 12):
    """→ pyarrow Table (bucket, maxrank) for every NON-EMPTY HLL
    register: bucket = top ``p`` hash bits, rank = position of the
    leftmost 1 in the remaining ``w = 64-p`` bits (w+1 when they are
    all zero). Registers are the sketch's whole state — the classic
    estimate is alpha·m² / Σ 2^(-rank_b) over all m=2^p buckets
    (empty ⇒ rank 0) — and unlike the float estimate they are pure
    integers, so the SQL oracle matches them bit-for-bit.

    Scale shape: ONE streaming pass; each block folds its values into
    a local m-register array (np.maximum.at — max commutes, so any
    partitioning gives identical registers) and ships ≤ m (bucket,
    rank) ints; the driver max-merges ≤ m × num_blocks rows. The
    column itself never shuffles. Input contract: non-negative ints
    (see _mix)."""
    from ..io import collect_table

    m = 1 << p
    w = 64 - p
    shift = np.uint64(w)
    mask = np.uint64((1 << w) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        hv = _mix(vals)
        bucket = (hv >> shift).astype(np.int64)
        rest = (hv & mask).astype(np.float64)  # < 2^52: float-exact
        _, e = np.frexp(rest)                  # e = bit_length(rest)
        rank = w - e.astype(np.int64) + 1      # rest==0 → e=0 → w+1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rank)
        nz = np.nonzero(regs)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "maxrank": pa.array(regs[nz])})
    partial.__name__ = f"hll{p}_partial"

    t = collect_table(ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow"))
    regs = np.zeros(m, dtype=np.int64)
    if t.num_rows:
        np.maximum.at(
            regs,
            t.column("bucket").to_numpy(zero_copy_only=False),
            t.column("maxrank").to_numpy(zero_copy_only=False))
    nz = np.nonzero(regs)[0]
    return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                     "maxrank": pa.array(regs[nz])})


def hll_oracle_sql(table: str, col: str, p: int = 12) -> str:
    """DuckDB SQL for hll_registers: HUGEINT splitmix hash, // 2^w
    bucket split, bit_length via binary format()."""
    w = 64 - p
    pow_w = 1 << w
    return f"""
    WITH h AS (
        SELECT ((CAST({col} AS HUGEINT) * {PHI64})
                % 18446744073709551616) AS hv
        FROM {table}),
    br AS (
        SELECT CAST(hv // {pow_w} AS BIGINT) AS bucket,
               CAST(hv % {pow_w} AS BIGINT) AS rest
        FROM h),
    rk AS (
        SELECT bucket,
               CASE WHEN rest = 0 THEN {w + 1}
                    ELSE {w} - length(format('{{:b}}', rest)) + 1
               END AS rank
        FROM br)
    SELECT bucket, CAST(max(rank) AS BIGINT) AS maxrank
    FROM rk GROUP BY bucket
    """


def hll_audience_overlap(ds, *, type_col: str, id_col: str,
                         types: tuple = ("view", "purchase"),
                         p: int = 12) -> pa.Table:
    """HLL SET ALGEBRA — the audience-overlap sketch question ("how
    many users did BOTH X and Y?") answered without ever shuffling
    user ids: registers are max-mergeable across blocks AND across
    sets, so the union sketch of two audiences is the elementwise max
    of their registers, and the intersection estimate follows by
    inclusion–exclusion (|A∩B| ≈ est(A) + est(B) − est(A∪B)) on the
    consumer side. Output stays PURE INTEGER — one (aud, bucket,
    maxrank) row per non-empty register for each audience plus the
    literal 'union' audience — so the SQL oracle matches
    bit-for-bit; no float estimate exists in the engine.

    Scale shape: ONE streaming pass; each block folds each type's ids
    into a local 2^p-register array (np.maximum.at — max commutes, so
    partitioning never matters; duplicate ids are free since max is
    idempotent, no DISTINCT pre-pass needed) and ships ≤ 2·2^p ints;
    the driver max-merges O(blocks × 2^p) rows and takes the
    register-wise max for the union. The id column never shuffles."""
    from ..io import collect_table

    m = 1 << p
    w = 64 - p
    shift = np.uint64(w)
    mask = np.uint64((1 << w) - 1)
    t0, t1 = types

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column(type_col)
        out_aud, out_bucket, out_rank = [], [], []
        for aud in (t0, t1):
            sel = batch.filter(pc.equal(et, aud))
            if sel.num_rows == 0:
                continue
            vals = sel.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64, copy=False)
            hv = _mix(vals)
            bucket = (hv >> shift).astype(np.int64)
            rest = (hv & mask).astype(np.float64)  # < 2^52: exact
            _, e = np.frexp(rest)
            rank = w - e.astype(np.int64) + 1
            regs = np.zeros(m, dtype=np.int64)
            np.maximum.at(regs, bucket, rank)
            nz = np.nonzero(regs)[0]
            out_aud.extend([aud] * nz.size)
            out_bucket.append(nz.astype(np.int64))
            out_rank.append(regs[nz])
        if not out_aud:
            return pa.table({"aud": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "maxrank": pa.array([], pa.int64())})
        return pa.table({
            "aud": pa.array(out_aud, pa.string()),
            "bucket": pa.array(np.concatenate(out_bucket)),
            "maxrank": pa.array(np.concatenate(out_rank))})
    partial.__name__ = f"hll{p}_overlap_partial"

    t = collect_table(ds.select_columns([type_col, id_col])
                      .map_batches(partial, batch_format="pyarrow"))
    regs = {t0: np.zeros(m, np.int64), t1: np.zeros(m, np.int64)}
    if t.num_rows:
        auds = np.asarray(t.column("aud").to_pylist(), dtype=object)
        bks = t.column("bucket").to_numpy(zero_copy_only=False)
        rks = t.column("maxrank").to_numpy(zero_copy_only=False)
        for aud in (t0, t1):
            sel = auds == aud
            np.maximum.at(regs[aud], bks[sel], rks[sel])
    union = np.maximum(regs[t0], regs[t1])
    out_aud, out_bucket, out_rank = [], [], []
    for aud, r in ((t0, regs[t0]), (t1, regs[t1]), ("union", union)):
        nz = np.nonzero(r)[0]
        out_aud.extend([aud] * nz.size)
        out_bucket.append(nz.astype(np.int64))
        out_rank.append(r[nz])
    if not out_aud:
        return pa.table({"aud": pa.array([], pa.string()),
                         "bucket": pa.array([], pa.int64()),
                         "maxrank": pa.array([], pa.int64())})
    return pa.table({
        "aud": pa.array(out_aud, pa.string()),
        "bucket": pa.array(np.concatenate(out_bucket)),
        "maxrank": pa.array(np.concatenate(out_rank))})


def hll_overlap_oracle_sql(table: str, type_col: str, id_col: str,
                           types: tuple = ("view", "purchase"),
                           p: int = 12) -> str:
    """DuckDB SQL for hll_audience_overlap: per-type registers via
    the splitmix HUGEINT hash, then the union audience as the
    register-wise max over both types."""
    w = 64 - p
    pow_w = 1 << w
    t0, t1 = types
    return f"""
    WITH h AS (
        SELECT {type_col} AS aud,
               ((CAST({id_col} AS HUGEINT) * {PHI64})
                % 18446744073709551616) AS hv
        FROM {table}
        WHERE {type_col} IN ('{t0}', '{t1}')),
    br AS (
        SELECT aud, CAST(hv // {pow_w} AS BIGINT) AS bucket,
               CAST(hv % {pow_w} AS BIGINT) AS rest
        FROM h),
    rk AS (
        SELECT aud, bucket,
               CASE WHEN rest = 0 THEN {w + 1}
                    ELSE {w} - length(format('{{:b}}', rest)) + 1
               END AS rank
        FROM br),
    per AS (
        SELECT aud, bucket, max(rank) AS maxrank
        FROM rk GROUP BY aud, bucket)
    SELECT aud, bucket, CAST(maxrank AS BIGINT) AS maxrank FROM per
    UNION ALL
    SELECT 'union' AS aud, bucket,
           CAST(max(maxrank) AS BIGINT) AS maxrank
    FROM per GROUP BY bucket
    """


# -- Count-Min heavy hitters -------------------------------------------------

_HEXDIG = "0123456789abcdef"


def _md5_positions(terms, d: int, w: int) -> np.ndarray:
    """(len(terms), d) int64 CMS columns: md5('term#r') first 8 hex
    digits mod w — the one string hash both numpy and the DuckDB
    oracle reproduce digit-for-digit (strpos ladder over md5() hex).
    Python loop is VOCAB-bounded (runs on distinct terms only, never
    per occurrence)."""
    out = np.empty((len(terms), d), dtype=np.int64)
    for i, t in enumerate(terms):
        tb = t.encode("utf-8", "surrogatepass")
        for r in range(d):
            hx = hashlib.md5(tb + b"#%d" % r).hexdigest()[:8]
            out[i, r] = int(hx, 16) % w
    return out


def term_count_partials(docs):
    """ONE streaming pass: text → per-block distinct (term, cnt)
    narrow rows (lowercased whitespace tokens, empties dropped). The
    text never shuffles; each block ships a vocab-bounded partial."""
    from .textstats import _text_array, _ws_tokens

    def partial(batch: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(_text_array(batch))
        _, flat = _ws_tokens(arr)
        vc = flat.value_counts()
        terms = vc.field("values")
        cnts = vc.field("counts")
        mask = pc.not_equal(terms, "")
        return pa.table({
            "term": terms.filter(mask),
            "cnt": pc.cast(cnts.filter(mask), pa.int64()),
        })
    partial.__name__ = "term_count_partial"
    return docs.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow")


def cms_heavy_hitters(docs, d: int = 4, w: int = 1024, k: int = 20):
    """→ pyarrow Table (term, true_cnt, cms_est): the k most frequent
    corpus tokens with their exact count and the Count-Min estimate
    (d rows × w columns; est = min_r cell[r][h_r(term)], always
    ≥ true_cnt — collisions only ADD). Deterministic end to end: the
    SQL oracle rebuilds the same matrix from the same md5 columns and
    matches bit-for-bit, overestimates included.

    Scale shape: one streaming tokenize pass reduces the corpus to
    narrow (term, cnt) partials; ONE vocab-bounded groupby-sum gives
    exact counts (the ground-truth side — at open-web vocab you would
    drop this and keep only the sketch + a candidate heap, same
    partial shape); the matrix itself is built from ≤ d×w-cell
    per-block partials merged by addition (np.add.at, order-free),
    so the sketch never shuffles anything wider than 4096 ints."""
    from ray.data.aggregate import Sum

    from ..io import collect_table

    counts = term_count_partials(docs) \
        .groupby("term").aggregate(Sum("cnt", alias_name="true_cnt")) \
        .materialize()  # vocab-bounded; reused by cells + top-k

    def cell_partial(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        cnt = batch.column("true_cnt").to_numpy(zero_copy_only=False)
        mat = np.zeros((d, w), dtype=np.int64)
        pos = _md5_positions(terms, d, w)
        for r in range(d):
            np.add.at(mat[r], pos[:, r], cnt)
        rr, cc = np.nonzero(mat)
        return pa.table({
            "r": pa.array(rr.astype(np.int64)),
            "col": pa.array(cc.astype(np.int64)),
            "cell": pa.array(mat[rr, cc]),
        })
    cell_partial.__name__ = "cms_cell_partial"

    cell_rows = collect_table(
        counts.map_batches(cell_partial, batch_format="pyarrow"))
    mat = np.zeros((d, w), dtype=np.int64)
    if cell_rows.num_rows:
        np.add.at(
            mat,
            (cell_rows.column("r").to_numpy(zero_copy_only=False),
             cell_rows.column("col").to_numpy(zero_copy_only=False)),
            cell_rows.column("cell").to_numpy(zero_copy_only=False))

    top = collect_table(
        counts.sort(["true_cnt", "term"], descending=[True, False])
        .limit(k))
    terms = top.column("term").to_pylist()
    pos = _md5_positions(terms, d, w)
    est = mat[np.arange(d), pos].min(axis=1) if terms else \
        np.zeros(0, np.int64)
    return pa.table({
        "term": top.column("term"),
        "true_cnt": top.column("true_cnt"),
        "cms_est": pa.array(est, pa.int64()),
    })


def cms_oracle_sql(d: int = 4, w: int = 1024, k: int = 20) -> str:
    """DuckDB SQL reproducing cms_heavy_hitters bit-for-bit: the
    md5-hex → integer conversion is a strpos ladder over the first 8
    hex digits (fits BIGINT), matching _md5_positions exactly."""
    hex2int = " + ".join(
        f"(strpos('{_HEXDIG}', substr(hx, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}"
        for i in range(8))
    rows = ", ".join(f"({r})" for r in range(d))
    return f"""
    WITH toks AS (
        SELECT unnest(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS term
        FROM documents),
    cnt AS (SELECT term, count(*) AS true_cnt FROM toks GROUP BY term),
    hxs AS (
        SELECT term, true_cnt, r,
               substr(md5(term || '#' || CAST(r AS VARCHAR)), 1, 8)
                   AS hx
        FROM cnt CROSS JOIN (VALUES {rows}) rr(r)),
    pos AS (
        SELECT term, true_cnt, r, ({hex2int}) % {w} AS col FROM hxs),
    cells AS (SELECT r, col, sum(true_cnt) AS cell
              FROM pos GROUP BY r, col),
    est AS (
        SELECT p.term, p.true_cnt, min(c.cell) AS cms_est
        FROM pos p JOIN cells c ON p.r = c.r AND p.col = c.col
        GROUP BY p.term, p.true_cnt),
    ranked AS (
        SELECT *, row_number() OVER (
            ORDER BY true_cnt DESC, term) AS rn
        FROM est)
    SELECT term, CAST(true_cnt AS BIGINT) AS true_cnt,
           CAST(cms_est AS BIGINT) AS cms_est
    FROM ranked WHERE rn <= {k}
    """


def histogram_quantiles(ds, col: str, *, lo: int, width: int,
                        nbins: int, qs: tuple[int, ...] = (25, 50, 75)):
    """Fixed-bin mergeable QUANTILE sketch — the fourth sketch class
    (KMV/HLL = distinct, CMS = frequency, Bloom = membership, this =
    quantiles). For unbounded/unknown value domains where the exact
    per-value histogram of rank.py `quantiles` would blow up, a
    CONSTANT-size equi-width histogram (``nbins`` int64 cells,
    independent of both row count and value domain) answers any
    quantile with error ≤ one bin width.

    Sums commute, so per-block (bin, n) partials merge exactly under
    ANY partitioning; the estimate — the UPPER EDGE ``lo + (b+1)·width``
    of the first bin where 100·cumcount ≥ q·total — is pure integer
    arithmetic, so a SQL oracle reproduces it bit-for-bit (the
    cross-multiplied comparison avoids float division entirely).

    Scale shape: ONE streaming pass of vectorized clip+bincount
    partials, ONE groupby over ≤ nbins narrow rows, driver-side
    cumsum over the tiny bin table. The value column never shuffles.
    """
    from ray.data.aggregate import Sum

    from ..io import collect_table

    if nbins <= 0 or width <= 0:
        raise ValueError("nbins and width must be positive")

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = np.clip((v - lo) // width, 0, nbins - 1)
        n = np.bincount(b, minlength=nbins).astype(np.int64)
        nz = np.flatnonzero(n)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(n[nz], pa.int64())})
    partial.__name__ = "hist_bin_partial"

    agg = collect_table(
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin").aggregate(Sum("n", alias_name="n")))
    # Ray 2.49: a groupby over an empty dataset collects to a
    # SCHEMA-LESS empty table — guard before touching columns
    if agg.num_rows == 0 or "bin" not in agg.schema.names:
        return pa.table({"q_pct": pa.array([], pa.int64()),
                         "upper_edge": pa.array([], pa.int64())})
    bins = agg.column("bin").to_numpy(zero_copy_only=False)
    counts = agg.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(bins)
    bins, counts = bins[order], counts[order]
    cum = np.cumsum(counts)
    if cum.size == 0:
        return pa.table({"q_pct": pa.array([], pa.int64()),
                         "upper_edge": pa.array([], pa.int64())})
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        # first bin where 100*cum >= q*total (integer-exact)
        pos = np.searchsorted(cum * 100, q * total)
        out_q.append(int(q))
        out_v.append(int(lo + (bins[pos] + 1) * width))
    return pa.table({"q_pct": pa.array(out_q, pa.int64()),
                     "upper_edge": pa.array(out_v, pa.int64())})


def histogram_quantiles_oracle_sql(table: str, col: str, *, lo: int,
                                   width: int, nbins: int,
                                   qs: tuple[int, ...]) -> str:
    """Exact SQL mirror of histogram_quantiles (shared integer
    arithmetic, cross-multiplied threshold)."""
    qvals = ", ".join(f"({q})" for q in qs)
    return f"""
    WITH b AS (
        SELECT LEAST(GREATEST(({col} - {lo}) // {width}, 0),
                     {nbins} - 1) AS bin, count(*) AS n
        FROM {table} GROUP BY 1),
    c AS (
        SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum,
               (SELECT SUM(n) FROM b) AS tot
        FROM b)
    SELECT q_pct, CAST({lo} + (MIN(bin) + 1) * {width} AS BIGINT)
               AS upper_edge
    FROM c CROSS JOIN (VALUES {qvals}) AS qs(q_pct)
    WHERE cum * 100 >= q_pct * tot
    GROUP BY q_pct
    """


def hll_grouped(ds, group_col: str, col: str, p: int = 8):
    """GROUPED HyperLogLog — approximate ``COUNT(DISTINCT col) GROUP
    BY group_col`` when the exact two-phase distinct shape (see
    q_daily_active_users) is too heavy: per-group register state is
    ``2^p`` int64s regardless of group size, so a billion-member group
    costs the same shuffle bytes as a ten-member one.

    Scale shape: per-block, groups are factorized once (np.unique)
    and ALL (group, bucket) registers fold in a single np.maximum.at
    over packed ``code·m + bucket`` scatter keys — no per-group
    Python; ONE groupby((group, bucket)) MAX over ≤ |groups|·m narrow
    rows finishes (max commutes, so any partitioning yields identical
    registers). The hashed column never shuffles. Output is the
    sketch's full integer state, bit-for-bit reproducible in SQL
    (hll_grouped_oracle_sql)."""
    from ray.data.aggregate import Max

    m = 1 << p
    w = 64 - p
    shift = np.uint64(w)
    mask = np.uint64((1 << w) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        gtype = batch.schema.field(group_col).type
        if batch.num_rows == 0:
            return pa.table({
                group_col: pa.array([], gtype),
                "bucket": pa.array([], pa.int64()),
                "maxrank": pa.array([], pa.int64())})
        vals = batch.column(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        g_uniq, g_codes = np.unique(grp, return_inverse=True)
        hv = _mix(vals)
        bucket = (hv >> shift).astype(np.int64)
        rest = (hv & mask).astype(np.float64)  # < 2^52: float-exact
        _, e = np.frexp(rest)
        rank = w - e.astype(np.int64) + 1
        regs = np.zeros(len(g_uniq) * m, dtype=np.int64)
        np.maximum.at(regs, g_codes * m + bucket, rank)
        nz = np.nonzero(regs)[0]
        return pa.table({
            group_col: pa.array(g_uniq[nz // m].tolist(), gtype),
            "bucket": pa.array((nz % m).astype(np.int64)),
            "maxrank": pa.array(regs[nz])})
    partial.__name__ = f"hll{p}_grouped_partial"

    return ds.select_columns([group_col, col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "bucket"]) \
        .aggregate(Max("maxrank", alias_name="maxrank"))


def hll_grouped_oracle_sql(table: str, group_col: str, col: str,
                           p: int = 8) -> str:
    """DuckDB SQL mirror of hll_grouped (same arithmetic as
    hll_oracle_sql with the group key threaded through)."""
    w = 64 - p
    pow_w = 1 << w
    return f"""
    WITH h AS (
        SELECT {group_col},
               ((CAST({col} AS HUGEINT) * {PHI64})
                % 18446744073709551616) AS hv
        FROM {table}),
    br AS (
        SELECT {group_col},
               CAST(hv // {pow_w} AS BIGINT) AS bucket,
               CAST(hv % {pow_w} AS BIGINT) AS rest
        FROM h),
    rk AS (
        SELECT {group_col}, bucket,
               CASE WHEN rest = 0 THEN {w + 1}
                    ELSE {w} - length(format('{{:b}}', rest)) + 1
               END AS rank
        FROM br)
    SELECT {group_col}, bucket, CAST(max(rank) AS BIGINT) AS maxrank
    FROM rk GROUP BY {group_col}, bucket
    """


def misra_gries_heavy(docs, k: int = 29):
    """Deterministic heavy hitters via the Misra-Gries mergeable
    summary (Misra & Gries 1982; merge rule and error bound: Agarwal
    et al., "Mergeable Summaries", 2013): every term with frequency
    > n/(k+1), output with its EXACT count.

    The fifth sketch class, and the constant-size counterpoint to
    Count-Min: where CMS ships a d×w matrix, MG ships AT MOST k
    (term, counter) pairs per block no matter the block vocabulary.
    Each block's exact counts are reduced by subtracting the
    (k+1)-th largest counter and dropping non-positives (per-block
    error ≤ n_b/(k+1)); summaries merge by addition and reduce the
    same way, so total undercount ≤ n/(k+1) and every term with true
    frequency above that threshold necessarily survives with a
    positive merged counter. The ≤ k surviving candidates broadcast
    for ONE exact confirming pass (candidate-bounded narrow partials
    + ONE groupby), and the final HAVING (k+1)·f > n is pure integer
    arithmetic — so the output is deterministic and SQL-oracle-able
    even though the first pass is approximate.

    Scale shape: two streaming passes over text; nothing wider than
    k+1 rows per block ever leaves a block, and the broadcast is
    ≤ k strings."""
    import ray
    from ray.data.aggregate import Sum

    from ..io import collect_table
    from .textstats import _text_array, _ws_tokens

    def _reduce(terms: np.ndarray, cnts: np.ndarray):
        if cnts.size <= k:
            return terms, cnts
        t = np.partition(cnts, cnts.size - k - 1)[cnts.size - k - 1]
        c2 = cnts - t
        keep = c2 > 0
        return terms[keep], c2[keep]

    def partial(batch: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(_text_array(batch))
        _, flat = _ws_tokens(arr)
        vc = flat.value_counts()
        terms = np.asarray(vc.field("values").to_pylist(),
                           dtype=object)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mask = terms != ""
        terms, cnts = terms[mask], cnts[mask]
        n_b = int(cnts.sum())
        terms, cnts = _reduce(terms, cnts)
        return pa.table({
            "term": pa.array(list(terms) + [""], pa.string()),
            "c": pa.array(np.append(cnts, n_b), pa.int64())})
    partial.__name__ = "mg_summary_partial"

    parts = collect_table(
        docs.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow"))
    terms = np.asarray(parts.column("term").to_pylist(), dtype=object)
    cnts = parts.column("c").to_numpy(zero_copy_only=False)
    sent = terms == ""
    n_total = int(cnts[sent].sum())
    terms, cnts = terms[~sent], cnts[~sent]
    if terms.size:
        order = np.argsort(terms, kind="stable")
        terms, cnts = terms[order], cnts[order]
        starts = np.flatnonzero(
            np.r_[True, terms[1:] != terms[:-1]])
        merged = np.add.reduceat(cnts, starts)
        terms, cnts = _reduce(terms[starts], merged)

    empty = pa.table({"term": pa.array([], pa.string()),
                      "n_occurrences": pa.array([], pa.int64())})
    if not terms.size:
        return ray.data.from_arrow(empty)

    cand = sorted(terms.tolist())
    handle = ray.put(cand)

    def confirm(batch: pa.Table) -> pa.Table:
        cands = ray.get(handle)
        arr = pc.utf8_lower(_text_array(batch))
        _, flat = _ws_tokens(arr)
        pos = pc.index_in(flat, value_set=pa.array(cands, pa.string()))
        hit = pos.drop_null().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bc = np.bincount(hit, minlength=len(cands))
        nz = np.flatnonzero(bc)
        return pa.table({
            "term": pa.array([cands[i] for i in nz], pa.string()),
            "n": pa.array(bc[nz], pa.int64())})
    confirm.__name__ = "mg_confirm_partial"

    agg = docs.select_columns(["text"]) \
        .map_batches(confirm, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n_occurrences"))

    def having(b: pa.Table) -> pa.Table:
        if "n_occurrences" not in b.schema.names:  # empty-groupby guard
            return empty
        keep = pc.greater(
            pc.multiply(b.column("n_occurrences"),
                        pa.scalar(k + 1, pa.int64())),
            pa.scalar(n_total, pa.int64()))
        return b.filter(keep).select(["term", "n_occurrences"])
    having.__name__ = "mg_having"

    return agg.map_batches(having, batch_format="pyarrow")


def misra_gries_oracle_sql(k: int = 29) -> str:
    """Exact ground truth for misra_gries_heavy: terms with
    (k+1)·count > total token count — the deterministic final output
    the two-pass MG computation must reproduce exactly."""
    return f"""
    WITH t AS (
        SELECT unnest(list_filter(
                   regexp_split_to_array(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS w
        FROM documents)
    SELECT w AS term, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM t GROUP BY w
    HAVING {k + 1} * count(*) > (SELECT count(*) FROM t)
    """
