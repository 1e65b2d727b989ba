"""Similarity search over an embedding column (list<float>).

 * brute_force_topk: the exact baseline — the small query matrix is
   broadcast once via ``ray.put`` and read inside every map task
   (NOT re-shipped per batch); each batch computes a numpy matmul and
   emits only its per-batch top-k candidates, so the single groupby
   shuffles k×num_queries rows per block, not the corpus.
 * ivf_topk: the scale path — vectors are bucketed by nearest centroid
   (one groupby on bucket id); queries probe only their nearest
   ``nprobe`` buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    return np.array(batch.column(col).to_pylist(), dtype=np.float64)


def brute_force_topk(ds, query_ids: list[int], k: int = 10,
                     id_col: str = "vec_id", col: str = "embedding"):
    """Exact cosine top-k for each query vector → rows
    (query_id, neighbor_id, rank), rank 1-based, ties broken by id."""
    import ray
    import ray.data

    # small side: fetch the query vectors (tiny filtered read)
    qds = ds.filter(lambda row: row[id_col] in set(query_ids))
    qrows = qds.take_all()
    qrows.sort(key=lambda r: r[id_col])
    qmat = _normalize(np.array([r[col] for r in qrows],
                               dtype=np.float64))
    qids = [r[id_col] for r in qrows]
    handle = ray.put((qids, qmat))  # broadcast once

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, q = ray.get(handle)
        m = _normalize(_batch_matrix(batch, col))
        ids = np.array(batch.column(id_col).to_pylist())
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
    vectors by id (deterministic; swap in k-means for real corpora)."""
    import ray

    seed = ds.filter(
        lambda row: row[id_col] < n_centroids).take_all()
    seed.sort(key=lambda r: r[id_col])
    centroids = np.array([r[col] for r in seed], dtype=np.float64)
    cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    bucketed = ds.map_batches(
        IvfIndexActor, batch_format="pyarrow", concurrency=(1, cpus),
        fn_constructor_kwargs={"centroids": centroids, "col": col})

    qrows = ds.filter(lambda row: row[id_col] in set(query_ids)) \
        .take_all()
    qrows.sort(key=lambda r: r[id_col])
    qmat = _normalize(np.array([r[col] for r in qrows],
                               dtype=np.float64))
    qids = [r[id_col] for r in qrows]
    cn = _normalize(centroids)
    probes = {qid: set(np.argsort(-(cn @ qmat[i]))[:nprobe].tolist())
              for i, qid in enumerate(qids)}
    handle = ray.put((qids, qmat, probes))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, q, probe_map = ray.get(handle)
        m = _normalize(_batch_matrix(batch, col))
        ids = np.array(batch.column(id_col).to_pylist())
        buckets = np.array(batch.column("bucket").to_pylist())
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
                    col: str = "embedding"):
    """Exact cosine near-dup pairs → (id_a, id_b) with id_a < id_b and
    cosine >= threshold.

    Baseline pattern (same as brute_force_topk): the comparison matrix
    is broadcast ONCE via ``ray.put`` and read inside every map task;
    each batch does one float64 matmul against it and emits only the
    over-threshold pairs. Exact (full recall) — the corpus-side matrix
    must fit in the object store; use embed_near_dups_lsh as the scale
    path when it doesn't."""
    import ray

    all_rows = ds.select_columns([id_col, col]).take_all()
    all_rows.sort(key=lambda r: r[id_col])
    full_ids = np.array([r[id_col] for r in all_rows], dtype=np.int64)
    full_mat = _normalize(np.array([r[col] for r in all_rows],
                                   dtype=np.float64))
    handle = ray.put((full_ids, full_mat))  # broadcast once

    def pairs(batch: pa.Table) -> pa.Table:
        ids_b, mat_b = ray.get(handle)
        m = _normalize(_batch_matrix(batch, col))
        ids = np.array(batch.column(id_col).to_pylist(), dtype=np.int64)
        scores = m @ mat_b.T  # (batch, corpus)
        # emit each unordered pair once: batch id < corpus id
        bi, ci = np.nonzero(scores >= threshold)
        keep = ids[bi] < ids_b[ci]
        return pa.table({
            "id_a": pa.array(ids[bi][keep], pa.int64()),
            "id_b": pa.array(ids_b[ci][keep], pa.int64()),
        })

    return ds.map_batches(pairs, batch_format="pyarrow")


class HyperplaneLshActor:
    """Random-hyperplane signature stage: the projection matrix is
    generated once per actor from a fixed seed; per batch one matmul
    then sign-bit packing into band keys."""

    def __init__(self, dim: int, n_bits: int = 8, bands: int = 8,
                 seed: int = 42, col: str = "embedding") -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_bits * bands))
        self.n_bits = n_bits
        self.bands = bands
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.col))
        bits = (m @ self.planes) > 0  # (rows, n_bits*bands)
        ids = batch.column("vec_id").to_pylist()
        embs = batch.column(self.col).to_pylist()
        out_key, out_id, out_emb = [], [], []
        for r in range(bits.shape[0]):
            for b in range(self.bands):
                chunk = bits[r, b * self.n_bits:(b + 1) * self.n_bits]
                key = f"{b}:{int(''.join('1' if x else '0' for x in chunk), 2):04x}"
                out_key.append(key)
                out_id.append(ids[r])
                out_emb.append(embs[r])
        return pa.table({
            "band_key": pa.array(out_key, pa.string()),
            "vec_id": pa.array(out_id, pa.int64()),
            "embedding": pa.array(out_emb),
        })


def embed_near_dups_lsh(ds, threshold: float = 0.95, n_bits: int = 8,
                        bands: int = 8, id_col: str = "vec_id",
                        col: str = "embedding"):
    """Scale path: random-hyperplane LSH bands → ONE groupby on the
    band key co-locates candidates → exact cosine verification inside
    the group. Approximate (recall < 1 possible for pairs near the
    threshold); emits each surviving pair once (min band wins)."""
    import ray

    dim = len(ds.take(1)[0][col])
    cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    banded = ds.map_batches(
        HyperplaneLshActor, batch_format="pyarrow",
        concurrency=(1, cpus),
        fn_constructor_kwargs={"dim": dim, "n_bits": n_bits,
                               "bands": bands, "col": col})

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

    pairs = banded.groupby("band_key").map_groups(
        verify, batch_format="pandas")
    # a pair can surface from several bands — dedup with one groupby
    from ray.data.aggregate import Count
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
    by id.

    Returns (centroids ndarray, assignments Dataset[id_col, cluster]).
    """
    import ray

    seed_rows = ds.filter(lambda r: r[id_col] < k).take_all()
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

        parts = ds.map_batches(partials, batch_format="pyarrow") \
            .take_all()
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
