"""Deduplication operators: exact (hash-partition), MinHash+LSH,
SimHash, and n-gram Jaccard verification.

Scale notes:
 * exact_dedup: ONE shuffle (groupby on the content hash). Values are
   hashes, so keys are uniform — no skew salting needed.
 * minhash_lsh: map (signatures, vectorized numpy) → flat_map (bands)
   → ONE groupby on band key → per-bucket candidate emission. Bucket
   sizes are bounded by construction (near-dup clusters); a hot bucket
   means real duplicates, which is the signal we want.
 * All candidate verification (Jaccard) happens inside map_groups on
   the already-co-located bucket — no second shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _hash_col_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("fp", pa.array(fps, pa.string()))


def exact_dedup_groups(ds, text_col: str = "text"):
    """Group identical documents: → (fp, keeper_id, n).

    hash → groupby(fp) → min(doc_id), count. The canonical
    hash-partition + per-group-first at any scale."""
    from ray.data.aggregate import Count, Min

    with_fp = ds.map_batches(
        lambda b: _hash_col_batch(b, text_col), batch_format="pyarrow")
    agg = with_fp.groupby("fp").aggregate(
        Min("doc_id", alias_name="keeper_id"),
        Count(alias_name="n"))
    return agg


def exact_dedup(ds, text_col: str = "text"):
    """Keep one representative row per distinct text (min doc_id)."""

    def first_per_group(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, "doc_id")

    with_fp = ds.map_batches(
        lambda b: _hash_col_batch(b, text_col), batch_format="pyarrow")
    return with_fp.groupby("fp").map_groups(first_per_group,
                                            batch_format="pandas")


# -- MinHash + LSH ----------------------------------------------------------

def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i:i + k])
                    for i in range(len(words) - k + 1)]
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8)
                        .digest(), "big") for s in shingles),
        dtype=np.uint64, count=len(shingles))


class MinHashActor:
    """Signature stage: permutation params generated once per actor
    (seeded), signatures computed vectorized per document."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm,
                             dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm,
                             dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        if sh.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) universal hashing, min per row
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = [self.signature(t or "") for t in texts]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.uint64())),
        })


def minhash_lsh_buckets(ds, num_perm: int = 64, bands: int = 16,
                        shingle_k: int = 3):
    """documents → (band_key, doc_id) pairs via banding; ONE groupby on
    band_key co-locates near-dup candidates."""
    rows_per_band = num_perm // bands

    import ray
    cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    sigs = ds.map_batches(
        MinHashActor, batch_format="pyarrow", concurrency=(1, cpus),
        fn_constructor_kwargs={"num_perm": num_perm,
                               "shingle_k": shingle_k})

    def to_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sig_lists = batch.column("sig").to_pylist()
        out_keys, out_docs = [], []
        for doc_id, sig in zip(doc_ids, sig_lists):
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band:(b + 1) *
                                  rows_per_band])
                key = hashlib.blake2b(
                    (str(b) + ":" + ",".join(map(str, chunk))).encode(),
                    digest_size=8).hexdigest()
                out_keys.append(key)
                out_docs.append(doc_id)
        return pa.table({
            "band_key": pa.array(out_keys, pa.string()),
            "doc_id": pa.array(out_docs),
        })

    return sigs.map_batches(to_bands, batch_format="pyarrow")


def minhash_near_dups(ds, num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3):
    """→ (doc_id, dup_of) pairs: docs sharing an LSH bucket with a
    smaller doc_id. Approximate transitive closure: per-bucket min."""
    buckets = minhash_lsh_buckets(ds, num_perm, bands, shingle_k)

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_id": [], "dup_of": []})
        keeper = group["doc_id"].min()
        dups = group[group["doc_id"] != keeper]
        return pd.DataFrame({"doc_id": dups["doc_id"],
                             "dup_of": keeper})

    pairs = buckets.groupby("band_key").map_groups(
        emit_pairs, batch_format="pandas")
    # same pair can surface from several bands; dedup via groupby min
    from ray.data.aggregate import Min
    return pairs.groupby("doc_id").aggregate(
        Min("dup_of", alias_name="dup_of"))


# -- SimHash ----------------------------------------------------------------

def simhash_batch(batch: pa.Table, *, bits: int = 64) -> pa.Table:
    """64-bit SimHash over word features (weight = term frequency)."""
    texts = batch.column("text").to_pylist()
    out = []
    for t in texts:
        acc = np.zeros(bits, dtype=np.int64)
        for word in (t or "").split():
            h = int.from_bytes(
                hashlib.blake2b(word.encode(), digest_size=8).digest(),
                "big")
            bits_arr = np.array([(h >> i) & 1 for i in range(bits)],
                                dtype=np.int64)
            acc += bits_arr * 2 - 1
        sim = 0
        for i in range(bits):
            if acc[i] > 0:
                sim |= (1 << i)
        out.append(sim - (1 << 63))  # store as signed int64
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array(out, pa.int64()),
    })


def simhash_near_dups(ds, max_hamming: int = 3):
    """Banding on 4×16-bit chunks: docs sharing a chunk are candidates;
    verified by Hamming distance inside the co-located group."""
    hashed = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def to_chunks(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sims = batch.column("simhash").to_pylist()
        keys, docs, full = [], [], []
        for doc_id, s in zip(doc_ids, sims):
            u = s + (1 << 63)
            for c in range(4):
                chunk = (u >> (16 * c)) & 0xFFFF
                keys.append(f"{c}:{chunk:04x}")
                docs.append(doc_id)
                full.append(s)
        return pa.table({"chunk_key": pa.array(keys, pa.string()),
                         "doc_id": pa.array(docs),
                         "simhash": pa.array(full, pa.int64())})

    chunked = hashed.map_batches(to_chunks, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_id": [], "dup_of": []})
        g = group.sort_values("doc_id").reset_index(drop=True)
        sims = g["simhash"].to_list()
        ids = g["doc_id"].to_list()
        out_doc, out_dup = [], []
        for i in range(1, len(g)):
            for j in range(i):
                ham = bin((sims[i] ^ sims[j]) &
                          0xFFFFFFFFFFFFFFFF).count("1")
                if ham <= max_hamming:
                    out_doc.append(ids[i])
                    out_dup.append(ids[j])
                    break
        return pd.DataFrame({"doc_id": out_doc, "dup_of": out_dup})

    pairs = chunked.groupby("chunk_key").map_groups(
        verify, batch_format="pandas")
    from ray.data.aggregate import Min
    return pairs.groupby("doc_id").aggregate(
        Min("dup_of", alias_name="dup_of"))


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """n-gram Jaccard similarity (candidate verification kernel)."""
    a = set(map(int, _shingle_hashes(text_a, k)))
    b = set(map(int, _shingle_hashes(text_b, k)))
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a | b)
    return inter / union if union else 0.0


def ngram_jaccard_near_dups(ds, threshold: float = 0.8,
                            shingle_k: int = 3, num_perm: int = 64,
                            bands: int = 16):
    """n-gram Jaccard near-dup pairs → (doc_id, dup_of, jaccard_x100).

    Candidate generation is MinHash banding (ONE groupby co-locates
    candidates); verification is EXACT n-gram Jaccard computed inside
    the group — no second shuffle. Texts ride along with the band rows
    so verification needs no lookup join."""
    rows_per_band = num_perm // bands

    # text rides along with the signature (computed in one stage)
    # instead of being re-attached later via a join
    def sig_and_text(batch: pa.Table) -> pa.Table:
        actor = MinHashActor(num_perm=num_perm, shingle_k=shingle_k)
        sig_tbl = actor(batch)
        return sig_tbl.append_column("text", batch.column("text"))

    sigs = ds.map_batches(sig_and_text, batch_format="pyarrow")

    def to_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sig_lists = batch.column("sig").to_pylist()
        texts = batch.column("text").to_pylist()
        out_keys, out_docs, out_texts = [], [], []
        for doc_id, sig, text in zip(doc_ids, sig_lists, texts):
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band:(b + 1) *
                                  rows_per_band])
                key = hashlib.blake2b(
                    (str(b) + ":" + ",".join(map(str, chunk))).encode(),
                    digest_size=8).hexdigest()
                out_keys.append(key)
                out_docs.append(doc_id)
                out_texts.append(text)
        return pa.table({
            "band_key": pa.array(out_keys, pa.string()),
            "doc_id": pa.array(out_docs),
            "text": pa.array(out_texts, pa.string()),
        })

    banded = sigs.map_batches(to_bands, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "dup_of": pd.Series([], dtype="int64"),
            "jaccard_x100": pd.Series([], dtype="int64")})
        if len(group) < 2:
            return empty
        g = group.sort_values("doc_id").reset_index(drop=True)
        ids = g["doc_id"].to_list()
        texts = g["text"].to_list()
        shingle_sets = [set(map(int, _shingle_hashes(t or "",
                                                     shingle_k)))
                        for t in texts]
        out_doc, out_dup, out_j = [], [], []
        for i in range(1, len(g)):
            for j in range(i):
                a, b = shingle_sets[i], shingle_sets[j]
                union = len(a | b)
                jac = (len(a & b) / union) if union else 1.0
                if jac >= threshold:
                    out_doc.append(ids[i])
                    out_dup.append(ids[j])
                    out_j.append(int(round(jac * 100)))
                    break
        return pd.DataFrame({"doc_id": out_doc, "dup_of": out_dup,
                             "jaccard_x100": out_j})

    pairs = banded.groupby("band_key").map_groups(
        verify, batch_format="pandas")
    from ray.data.aggregate import Max, Min
    return pairs.groupby("doc_id").aggregate(
        Min("dup_of", alias_name="dup_of"),
        Max("jaccard_x100", alias_name="jaccard_x100"))
