"""Similarity search over an embedding column (list<float>).

 * brute_force_topk: the exact baseline — the small query matrix is
   broadcast once via ``ray.put`` and read inside every map task
   (NOT re-shipped per batch); each batch computes a numpy matmul and
   emits only its per-batch top-k candidates, so the single groupby
   shuffles k×num_queries rows per block, not the corpus.
 * ivf_topk: the scale path — vectors are bucketed by nearest centroid
   (one groupby on bucket id); queries probe only their nearest
   ``nprobe`` buckets.

Scale hygiene (round 2):
 * all small-side vector fetches are expression filters (Arrow
   predicate, C-path) — never per-row Python lambdas;
 * batch → matrix conversion is a zero-copy Arrow flatten + reshape,
   not ``to_pylist``;
 * exact near-dup pairing streams the corpus through the object store
   in bounded chunks (no whole-table ``take_all`` on the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..io import collect_rows, collect_table


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(rows, dim) float64 matrix from a list<float> column.

    Zero-copy path: flatten the list values buffer and reshape — no
    per-row Python objects. Assumes rectangular, null-free lists
    (embedding tables); falls back to to_pylist otherwise."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        # combine_chunks returns an Array on recent pyarrow, a
        # ChunkedArray on older releases — normalize to Array
        arr = arr.combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = (arr.chunk(0) if arr.num_chunks
                   else pa.array([], type=pa.list_(pa.float32())))
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    try:
        vals = arr.flatten().to_numpy(zero_copy_only=False)
        if vals.size % n:
            raise ValueError("ragged embedding lists")
        return vals.reshape(n, -1).astype(np.float64, copy=False)
    except (ValueError, pa.ArrowInvalid):
        return np.array(arr.to_pylist(), dtype=np.float64)


def _ids_array(batch: pa.Table, id_col: str) -> np.ndarray:
    return batch.column(id_col).to_numpy(zero_copy_only=False)


def _fetch_vectors(ds, ids: list[int], id_col: str, col: str):
    """Fetch a handful of vectors by id: Arrow expression filter
    (pushed down C-path — never a per-row Python lambda scan)."""
    expr = " or ".join(f"({id_col} == {int(i)})" for i in ids)
    rows = collect_rows(ds.filter(expr=expr))
    rows.sort(key=lambda r: r[id_col])
    mat = np.array([r[col] for r in rows], dtype=np.float64)
    return [r[id_col] for r in rows], mat


def brute_force_topk(ds, query_ids: list[int], k: int = 10,
                     id_col: str = "vec_id", col: str = "embedding"):
    """Exact cosine top-k for each query vector → rows
    (query_id, neighbor_id, rank), rank 1-based, ties broken by id."""
    import ray

    qids, qraw = _fetch_vectors(ds, query_ids, id_col, col)
    qmat = _normalize(qraw)
    handle = ray.put((qids, qmat))  # broadcast once

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, q = ray.get(handle)
        m = _normalize(_batch_matrix(batch, col))
        ids = _ids_array(batch, id_col)
        scores = m @ q.T  # (batch, queries)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            col_scores = scores[:, qi]
            mask = ids != qid
            cand_ids = ids[mask]
            cand_scores = col_scores[mask]
            if cand_ids.size == 0:
                continue
            take = min(k, cand_ids.size)
            idx = np.argpartition(-cand_scores, take - 1)[:take]
            out_q.extend([qid] * take)
            out_n.extend(cand_ids[idx].tolist())
            out_s.extend(cand_scores[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    candidates = ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "neighbor_id"],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "query_id": g["query_id"],
            "neighbor_id": g["neighbor_id"],
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return candidates.groupby("query_id").map_groups(
        final_topk, batch_format="pandas")


class IvfIndexActor:
    """IVF bucketing stage: centroid matrix built once per actor from a
    deterministic seed sample; per-batch assignment is one matmul."""

    def __init__(self, centroids: np.ndarray,
                 col: str = "embedding") -> None:
        self.centroids = _normalize(np.asarray(centroids,
                                               dtype=np.float64))
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.col))
        assign = np.argmax(m @ self.centroids.T, axis=1)
        return batch.append_column(
            "bucket", pa.array(assign.astype("int32"), pa.int32()))


def ivf_topk(ds, query_ids: list[int], k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             col: str = "embedding"):
    """Approximate cosine top-k: bucket by nearest centroid, probe the
    nprobe closest buckets per query. Centroids = first n_centroids
    vectors by id (deterministic; swap in k-means for real corpora).

    With ``nprobe == n_centroids`` probing is exhaustive and the result
    is exactly the brute-force top-k (the oracle-checked config); the
    pruned configs are exercised in pytest."""
    import ray

    seed = collect_rows(
        ds.filter(expr=f"{id_col} < {int(n_centroids)}"))
    seed.sort(key=lambda r: r[id_col])
    centroids = np.array([r[col] for r in seed], dtype=np.float64)
    cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    bucketed = ds.map_batches(
        IvfIndexActor, batch_format="pyarrow", concurrency=(1, cpus),
        fn_constructor_kwargs={"centroids": centroids, "col": col})

    qids, qraw = _fetch_vectors(ds, query_ids, id_col, col)
    qmat = _normalize(qraw)
    cn = _normalize(centroids)
    probes = {qid: set(np.argsort(-(cn @ qmat[i]))[:nprobe].tolist())
              for i, qid in enumerate(qids)}
    handle = ray.put((qids, qmat, probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, q, probe_map = ray.get(handle)
        m = _normalize(_batch_matrix(batch, col))
        ids = _ids_array(batch, id_col)
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        scores = m @ q.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            mask = np.isin(buckets, list(probe_map[qid])) & (ids != qid)
            cand_ids = ids[mask]
            cand_scores = scores[mask, qi]
            if cand_ids.size == 0:
                continue
            take = min(k, cand_ids.size)
            idx = np.argpartition(-cand_scores, take - 1)[:take]
            out_q.extend([qid] * take)
            out_n.extend(cand_ids[idx].tolist())
            out_s.extend(cand_scores[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    candidates = bucketed.map_batches(partial_topk,
                                      batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "neighbor_id"],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "query_id": g["query_id"],
            "neighbor_id": g["neighbor_id"],
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return candidates.groupby("query_id").map_groups(
        final_topk, batch_format="pandas")


# -- embedding-cosine near-duplicate detection ------------------------------

def embed_near_dups(ds, threshold: float = 0.95, id_col: str = "vec_id",
                    col: str = "embedding", chunk_rows: int = 32768):
    """Exact cosine near-dup pairs → (id_a, id_b) with id_a < id_b and
    cosine >= threshold.

    Chunked block self-join: the corpus is streamed through the driver
    in ``chunk_rows`` slices, each ``ray.put`` into the object store
    once (bounded driver memory — never a whole-table ``take_all``).
    Every map task then scores its batch against each chunk (zero-copy
    plasma reads) and emits only over-threshold pairs with
    batch-id < chunk-id, so each unordered pair surfaces exactly once.
    Exact (full recall) with O(n²/cluster) compute — inherent to exact
    all-pairs; use embed_near_dups_lsh as the approximate scale path."""
    import ray

    narrow = ds.select_columns([id_col, col])
    chunk_refs = []
    for chunk in narrow.iter_batches(batch_size=chunk_rows,
                                     batch_format="pyarrow"):
        ids_c = _ids_array(chunk, id_col).astype(np.int64)
        mat_c = _normalize(_batch_matrix(chunk, col))
        chunk_refs.append(ray.put((ids_c, mat_c)))

    def pairs(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, col))
        ids = _ids_array(batch, id_col).astype(np.int64)
        out_a, out_b = [], []
        for ref in chunk_refs:
            ids_c, mat_c = ray.get(ref)
            scores = m @ mat_c.T  # (batch, chunk)
            bi, ci = np.nonzero(scores >= threshold)
            keep = ids[bi] < ids_c[ci]
            out_a.append(ids[bi][keep])
            out_b.append(ids_c[ci][keep])
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
        })

    return ds.map_batches(pairs, batch_format="pyarrow")


class HyperplaneLshActor:
    """Random-hyperplane signature stage: the projection matrix is
    generated once per actor from a fixed seed; per batch one matmul,
    then vectorized sign-bit packing into int64 band keys
    (band << n_bits | bit-value) — no per-row Python loop.

    ``payload``: attach the embedding to each band row (only used for
    the candidate pass over duplicate buckets, never for the full
    corpus). ``only_keys``: sorted int64 band keys — rows whose key is
    not in the set are dropped (np.isin, C-path)."""

    def __init__(self, dim: int, n_bits: int = 8, bands: int = 8,
                 seed: int = 42, col: str = "embedding",
                 payload: bool = False, only_keys=None) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_bits * bands))
        self.n_bits = n_bits
        self.bands = bands
        self.col = col
        self.payload = payload
        if only_keys is not None:
            import ray
            if isinstance(only_keys, ray.ObjectRef):
                only_keys = ray.get(only_keys)  # once per actor
        self.only_keys = only_keys

    def band_keys(self, m: np.ndarray) -> np.ndarray:
        """(rows, bands) int64 band keys for a normalized matrix."""
        bits = (m @ self.planes) > 0  # (rows, bands*n_bits)
        powers = (np.int64(1) << np.arange(self.n_bits, dtype=np.int64))
        vals = bits.reshape(m.shape[0], self.bands, self.n_bits) \
            .astype(np.int64) @ powers
        band_ids = np.arange(self.bands, dtype=np.int64)
        return (band_ids << self.n_bits)[None, :] + vals

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.col))
        n = m.shape[0]
        keys = self.band_keys(m).ravel()
        take_idx = np.repeat(np.arange(n), self.bands)
        if self.only_keys is not None:
            keep = np.isin(keys, self.only_keys)
            keys, take_idx = keys[keep], take_idx[keep]
        cols = {
            "band_key": pa.array(keys, pa.int64()),
            "vec_id": batch.column("vec_id").take(take_idx),
        }
        if self.payload:
            cols["embedding"] = batch.column(self.col).take(take_idx)
        return pa.table(cols)


def embed_near_dups_lsh(ds, threshold: float = 0.95, n_bits: int = 8,
                        bands: int = 8, id_col: str = "vec_id",
                        col: str = "embedding"):
    """Scale path: random-hyperplane LSH bands → candidates co-located
    by band key → exact cosine verification inside the group.
    Deterministic (fixed projection seed): the result is exactly
    {pairs sharing ≥1 band key} ∩ {cosine ≥ threshold}, which the SQL
    oracle reproduces by baking the same projection matrix into the
    query (see queries._lsh_oracle_sql). Approximate vs the exact
    all-pairs op: recall < 1 possible for pairs near the threshold.

    Two-phase scale shape (like ngram_jaccard / simhash): phase 1
    shuffles only narrow (band_key, vec_id) rows through ONE C-path
    groupby-count; the duplicate-bucket keys (true candidate clusters,
    a tiny set) are broadcast via ray.put; phase 2 re-bands the corpus
    map-side and attaches the embedding payload ONLY for rows landing
    in a duplicate bucket, so full vectors are never duplicated ×bands
    through a shuffle."""
    import ray
    from ray.data.aggregate import Count

    dim = len(ds.take(1)[0][col])
    cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    lsh_kwargs = {"dim": dim, "n_bits": n_bits, "bands": bands,
                  "col": col}
    narrow = ds.map_batches(
        HyperplaneLshActor, batch_format="pyarrow",
        concurrency=(1, cpus), fn_constructor_kwargs=lsh_kwargs)
    agg = narrow.groupby("band_key").aggregate(Count(alias_name="n"))
    dk_tbl = collect_table(agg.filter(expr="n >= 2"))
    dup_keys = np.sort(dk_tbl.column("band_key")
                       .to_numpy(zero_copy_only=False)
                       .astype(np.int64)) \
        if dk_tbl.num_columns else np.array([], dtype=np.int64)
    if dup_keys.size == 0:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))
    candidates = ds.map_batches(
        HyperplaneLshActor, batch_format="pyarrow",
        concurrency=(1, cpus),
        fn_constructor_kwargs={**lsh_kwargs, "payload": True,
                               "only_keys": ray.put(dup_keys)})

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        g = group.sort_values("vec_id").reset_index(drop=True)
        m = _normalize(np.array(g["embedding"].to_list(),
                                dtype=np.float64))
        ids = g["vec_id"].to_numpy()
        scores = m @ m.T
        ai, bi = np.nonzero(np.triu(scores >= threshold, k=1))
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi]})

    pairs = candidates.groupby("band_key").map_groups(
        verify, batch_format="pandas")
    # a pair can surface from several bands — dedup with one groupby
    uniq = pairs.groupby(["id_a", "id_b"]).aggregate(
        Count(alias_name="n_bands"))
    return uniq.select_columns(["id_a", "id_b"])


# -- distributed k-means (the real IVF centroid builder) --------------------

def kmeans(ds, k: int = 16, iters: int = 5, id_col: str = "vec_id",
           col: str = "embedding"):
    """Distributed Lloyd's k-means over the embedding column.

    Scale shape per iteration: centroids are broadcast once via
    ``ray.put``; each batch does ONE matmul assignment and emits only
    k partial sums + counts (k×dim floats — constant size per block);
    the tiny partials are collected driver-side and reduced. No
    shuffle of the corpus, ever. Deterministic init: first k vectors
    by id (expression-filter fetch, not a Python-lambda scan).

    Returns (centroids ndarray, assignments Dataset[id_col, cluster]).
    """
    import ray

    # iterative algorithm: materialize the NARROW projection once —
    # a lazy ds would re-execute the read on every Lloyd pass (iters+2
    # executions). The pinned copy is (id, vector) only and lives in
    # the object store (spillable), which beats iters× re-reads from
    # storage at any scale.
    ds = ds.select_columns([id_col, col]).materialize()
    seed_rows = collect_rows(ds.filter(expr=f"{id_col} < {int(k)}"))
    seed_rows.sort(key=lambda r: r[id_col])
    centroids = np.array([r[col] for r in seed_rows], dtype=np.float64)

    for _ in range(iters):
        handle = ray.put(centroids)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(handle)
            m = _batch_matrix(batch, col)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, m)
            np.add.at(counts, assign, 1)
            return pa.table({
                "cluster": pa.array(range(len(c)), pa.int32()),
                "sum": pa.array([row.tolist() for row in sums]),
                "count": pa.array(counts, pa.int64()),
            })

        parts = collect_rows(
            ds.map_batches(partials, batch_format="pyarrow"))
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for row in parts:
            sums[row["cluster"]] += np.asarray(row["sum"])
            counts[row["cluster"]] += row["count"]
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]

    handle = ray.put(centroids)

    def assign_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(handle)
        m = _batch_matrix(batch, col)
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(d2.argmin(axis=1).astype("int32"),
                                pa.int32()),
        })

    return centroids, ds.map_batches(assign_batch,
                                     batch_format="pyarrow")


def quantize_embeddings(ds, id_col: str = "vec_id",
                        col: str = "embedding", levels: int = 256,
                        out: str = "list"):
    """Per-dimension min-max INT8 quantization — the vector-compression
    scale path every 100-TB ANN store runs before indexing (4× smaller
    than float32, distance-preserving enough for IVF/LSH candidate
    generation; re-rank on the float originals).

    Shape: elements fold to exact integer micro-units map-side
    (``floor(float64(x)·1e6)`` — float32→float64 is exact and the IEEE
    multiply is bit-identical in any engine), each block reduces to
    ONE (dim, min, max) row pair per dimension via a reshape +
    axis-reduce (no per-row Python), ONE groupby over ≤ dim rows
    finishes the global ranges, and the bounded range table broadcasts
    for a zero-shuffle scoring map. Codes are pure integer arithmetic
    (``(v−mn)·(levels−1) // (mx−mn)``, floor division on non-negative
    operands) so any engine reproduces them bit-for-bit.

    ``out="list"`` (production layout) returns (id, codes
    fixed-width list<int64>); ``out="long"`` unnests to (id, dim,
    code) rows — 𝑂(dim)× larger, for SQL-oracle comparison only.
    Rectangular, null-free lists required (ragged input raises in
    _batch_matrix's reshape)."""
    import ray
    from ray.data.aggregate import Max, Min

    from ..io import collect_table

    def v6_matrix(batch: pa.Table) -> np.ndarray:
        m = _batch_matrix(batch, col)
        return np.floor(m * 1e6).astype(np.int64)

    def range_partial(batch: pa.Table) -> pa.Table:
        v = v6_matrix(batch)
        if v.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "dim": pa.array(np.arange(v.shape[1]), pa.int64()),
            "mn": pa.array(v.min(axis=0), pa.int64()),
            "mx": pa.array(v.max(axis=0), pa.int64())})
    range_partial.__name__ = "quant_range_partial"

    ranges = collect_table(
        ds.select_columns([col])
        .map_batches(range_partial, batch_format="pyarrow")
        .groupby("dim").aggregate(Min("mn", alias_name="mn"),
                                  Max("mx", alias_name="mx")))
    dims = ranges.column("dim").to_numpy(zero_copy_only=False)
    order = np.argsort(dims)
    mn = ranges.column("mn").to_numpy(zero_copy_only=False)[order]
    mx = ranges.column("mx").to_numpy(zero_copy_only=False)[order]
    if not np.array_equal(np.sort(dims), np.arange(dims.size)):
        raise ValueError("non-contiguous dimension indices — ragged "
                         "embedding lists upstream")
    handle = ray.put((mn, mx))

    def score(batch: pa.Table) -> pa.Table:
        from .windows import _cached_get
        bmn, bmx = _cached_get(handle)
        v = v6_matrix(batch)
        if v.size and v.shape[1] != bmn.size:
            raise ValueError("embedding width != range table width")
        span = bmx - bmn
        codes = np.where(
            span > 0,
            (v - bmn) * (levels - 1) // np.maximum(span, 1),
            0).astype(np.int64)
        ids = _ids_array(batch, id_col)
        if out == "long":
            d = v.shape[1] if v.size else bmn.size
            return pa.table({
                id_col: pa.array(np.repeat(ids, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d), ids.size),
                                pa.int64()),
                "code": pa.array(codes.ravel(), pa.int64())})
        return pa.table({
            id_col: batch.column(id_col),
            "codes": pa.array(list(codes),
                              pa.list_(pa.int64()))})
    score.__name__ = "quant_score"

    return ds.select_columns([id_col, col]) \
        .map_batches(score, batch_format="pyarrow")



def jl_signs(dim: int, k: int) -> np.ndarray:
    """Deterministic Rademacher ±1 projection matrix (dim, k) — the
    sign of cell c ∈ [0, dim·k) comes from the repo's splitmix-style
    multiplicative mix ((c+1)·PHI64 mod 2^64, top bit), so the matrix
    is a pure function of its shape: every worker, every engine, and
    the inlined SQL oracle see identical signs with no RNG state and
    no matrix shipping (any task can rebuild it in microseconds)."""
    from .sampling import PHI64

    idx = np.arange(dim * k, dtype=np.uint64) + np.uint64(1)
    with np.errstate(over="ignore"):
        h = idx * np.uint64(PHI64)
    return np.where((h >> np.uint64(63)) == 0, 1, -1) \
        .astype(np.int64).reshape(dim, k)


def jl_project(ds, id_col: str = "vec_id", col: str = "embedding",
               k: int = 8, out: str = "long"):
    """Johnson–Lindenstrauss RANDOM PROJECTION to k dimensions — the
    dimensionality-reduction pass an ANN/LSH pipeline runs before
    bucketing (distance-preserving sketch at k ≪ dim, Achlioptas ±1
    variant: no dense Gaussian needed, the projection is an integer
    matmul). EXACT in integer micro-units: elements fold to
    v6 = floor(float64(x)·1e6) map-side (bit-identical in any
    engine), and each output coordinate is Σ_d sign(d,j)·v6_d — an
    int64 dot product with |result| ≤ dim·max|v6|, no float ever
    crosses engines.

    ZERO-shuffle: one map over the blocks computes the (rows, dim)
    int64 matrix @ (dim, k) sign matrix per batch; the sign matrix is
    rebuilt in-task from jl_signs (pure function of shape — cheaper
    than broadcasting). ``out="list"`` (production) returns (id,
    proj fixed-width list<int64>); ``out="long"`` unnests to (id, j,
    p) rows for SQL-oracle comparison. Rectangular, null-free lists
    required (the reshape raises otherwise)."""

    def project(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, col)
        ids = _ids_array(batch, id_col)
        n = m.shape[0]
        if n == 0:
            if out == "long":
                e = pa.array([], pa.int64())
                return pa.table({id_col: e, "j": e, "p": e})
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "proj": pa.array([], pa.list_(pa.int64()))})
        v6 = np.floor(m * 1e6).astype(np.int64)
        p = v6 @ jl_signs(v6.shape[1], k)          # (n, k) int64
        if out == "long":
            return pa.table({
                id_col: pa.array(np.repeat(ids, k)),
                "j": pa.array(np.tile(
                    np.arange(k, dtype=np.int64), n)),
                "p": pa.array(p.reshape(-1), pa.int64())})
        return pa.table({
            id_col: pa.array(ids),
            "proj": pa.FixedSizeListArray.from_arrays(
                pa.array(p.reshape(-1), pa.int64()), k).cast(
                    pa.list_(pa.int64()))})
    project.__name__ = f"jl_project_k{k}"

    return ds.select_columns([id_col, col]) \
        .map_batches(project, batch_format="pyarrow")


def gram_matrix(ds, col: str = "embedding"):
    """Exact integer GRAM (second-moment) matrix of the embedding
    column — the d×d reduction PCA / whitening / linear-probing
    pipelines start from (covariance = G/n − μμᵀ; the mean vector is
    a trivial extra reduce on the same partials). This is the
    catalog's distributed LINEAR-ALGEBRA reduction class: the output
    is DIMENSION-bounded (d·(d+1)/2 upper-triangle cells), never
    row-bounded, so the whole corpus folds map-side and nothing wide
    ever shuffles.

    ZERO-shuffle shape: elements fold to exact
    v6 = floor(float64(x)·1e6) micro-units (float32→float64 is exact
    and the IEEE multiply+floor is bit-identical in any engine — the
    same fold jl_project and quantize_embeddings use); each block
    reduces to ONE upper-triangle partial via an int64 QᵀQ matmul (no
    per-row Python), pre-checked against int64 overflow
    (n_b·max|v6|² < 2⁶² raises in the WORKER before a wrap can
    happen); the driver sums the O(blocks × d²) partial cells in
    PYTHON INTS (the SQL side is HUGEINT) and re-checks each global
    cell fits int64 before emitting (i, j, gram), i ≤ j. Rectangular,
    null-free lists required (ragged input raises in the reshape)."""

    def block_gram(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, col)
        if m.size == 0:
            e = pa.array([], pa.int64())
            return pa.table({"i": e, "j": e, "s": e})
        v6 = np.floor(m * 1e6).astype(np.int64)
        mx = int(np.abs(v6).max())
        if v6.shape[0] * mx * mx >= (1 << 62):
            raise ValueError(
                "gram_matrix block partial would overflow int64 "
                f"(rows={v6.shape[0]}, max|v6|={mx}) — shrink the "
                "batch or rescale the micro-unit")
        g = v6.T @ v6
        iu, ju = np.triu_indices(g.shape[0])
        return pa.table({"i": pa.array(iu.astype(np.int64)),
                         "j": pa.array(ju.astype(np.int64)),
                         "s": pa.array(g[iu, ju], pa.int64())})
    block_gram.__name__ = "gram_block_partial"

    parts = collect_table(
        ds.select_columns([col])
        .map_batches(block_gram, batch_format="pyarrow",
                     batch_size=None))
    acc: dict = {}
    if parts.num_rows:    # all-empty collects can be schema-less
        for i, j, s in zip(parts.column("i").to_pylist(),
                           parts.column("j").to_pylist(),
                           parts.column("s").to_pylist()):
            acc[(i, j)] = acc.get((i, j), 0) + s  # Python ints: no wrap
    keys = sorted(acc)
    vals = [acc[k] for k in keys]
    if any(abs(v) >= (1 << 63) for v in vals):
        raise ValueError("gram_matrix: a global cell exceeds int64 — "
                         "rescale the micro-unit (the oracle side is "
                         "HUGEINT and would need the same rescale)")
    return pa.table({
        "i": pa.array([k[0] for k in keys], pa.int64()),
        "j": pa.array([k[1] for k in keys], pa.int64()),
        "gram": pa.array(vals, pa.int64())})
