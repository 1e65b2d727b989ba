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
import pyarrow as pa

from ..io import collect_table

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


def exact_dedup(ds, text_col: str = "text", join: str = "broadcast",
                num_partitions: int = 32):
    """Keep one representative row per distinct text (min doc_id).

    Scale shape — the text column NEVER enters a shuffle: a narrow
    (fp, doc_id) projection carries the ONE groupby (min doc_id +
    count per content hash), and only groups with n >= 2 — the
    duplicate clusters, a tiny fraction of the corpus — produce any
    cross-worker state. The keep decision is then made map-side over
    the original rows (recomputing fp is cheap C hashing; re-sorting
    the corpus text over the network is not).

    ``join``: "broadcast" (default) ships the duplicate fp → keeper_id
    map once via ray.put — dup-cluster-sized (~40 B per duplicate
    GROUP, independent of corpus size). "partitioned" keeps everything
    distributed for dup maps beyond driver memory: the dropped doc_ids
    come from a narrow hash join, then ONE corpus-wide left_anti hash
    join on doc_id (hash partitioning, no range-sampling sort).

    Output schema = input columns + fp (kept for compatibility with
    group-level consumers)."""
    import ray
    from ray.data.aggregate import Count, Min

    def narrow_fp(batch: pa.Table) -> pa.Table:
        t = _hash_col_batch(batch, text_col)
        return t.select(["fp", "doc_id"])
    narrow_fp.__name__ = "project_fp_doc_id"

    narrow = ds.map_batches(narrow_fp, batch_format="pyarrow")
    dup_groups = narrow.groupby("fp").aggregate(
        Min("doc_id", alias_name="keeper_id"),
        Count(alias_name="n")).filter(expr="n >= 2") \
        .select_columns(["fp", "keeper_id"])

    if join == "partitioned":
        # repartition + materialize: the aggregate's filter output can
        # carry zero-schema empty blocks that break the Arrow hash
        # join (same Ray 2.49 quirk as _components_labels_partitioned);
        # the dup-group table is dup-cluster-sized, so this is cheap.
        # A corpus with NO duplicates yields a fully EMPTY schema-less
        # right side (same join failure) — short-circuit to passthrough.
        dup_groups = dup_groups.repartition(num_partitions) \
            .materialize()
        if dup_groups.count() == 0:
            return ds.map_batches(
                lambda b: _hash_col_batch(b, text_col),
                batch_format="pyarrow")
        dropped = narrow.join(
            dup_groups, join_type="inner",
            num_partitions=num_partitions, on=("fp",)) \
            .filter(expr="doc_id != keeper_id") \
            .select_columns(["doc_id"])
        kept = ds.map_batches(
            lambda b: _hash_col_batch(b, text_col),
            batch_format="pyarrow").join(
            dropped, join_type="left_anti",
            num_partitions=num_partitions, on=("doc_id",))
        return kept

    # collect_table + to_numpy: zero-copy column pulls, no per-row
    # dict materialization (the dup-group count scales with the corpus)
    dup_tbl = collect_table(dup_groups)
    if dup_tbl.num_columns:
        fp_s = np.asarray(dup_tbl.column("fp").to_pylist())
        kp_s = dup_tbl.column("keeper_id") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        fp_s = np.array([], dtype=object)
        kp_s = np.array([], dtype=np.int64)
    order = np.argsort(fp_s)
    handle = ray.put((fp_s[order], kp_s[order]))  # broadcast once

    def keep(batch: pa.Table) -> pa.Table:
        fp_sorted, kp_sorted = ray.get(handle)
        with_fp = _hash_col_batch(batch, text_col)
        if fp_sorted.size == 0:
            return with_fp
        fps = np.asarray(with_fp.column("fp").to_pylist())
        ids = with_fp.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(fp_sorted, fps),
                         fp_sorted.size - 1)
        # keep rows whose fp is not a dup-group key, or that ARE the
        # group's keeper
        mask = (fp_sorted[pos] != fps) | (kp_sorted[pos] == ids)
        return with_fp.filter(pa.array(mask))
    keep.__name__ = "drop_non_keepers"

    return ds.map_batches(keep, batch_format="pyarrow")


# -- MinHash + LSH ----------------------------------------------------------

# position-mix multipliers for combining word hashes into shingle
# hashes (odd 64-bit constants; splitmix64 increments)
_POS_MIX = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                     0x94D049BB133111EB, 0xD6E8FEB86659FD93,
                     0xA5A5A5A5A5A5A5A5, 0xC2B2AE3D27D4EB4F,
                     0x165667B19E3779F9, 0x27D4EB2F165667C5],
                    dtype=np.uint64)


def _word_hash_array(words: list[str]) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8)
                        .digest(), "big") for w in words),
        dtype=np.uint64, count=len(words))


def _shingle_hashes(text: str, k: int = 3,
                    word_hasher=None) -> np.ndarray:
    """Hashes of word k-shingles: one blake2b per WORD (memoizable via
    ``word_hasher``), shingles formed by a vectorized position-weighted
    xor mix (k ≤ 8)."""
    words = text.split()
    if not words:
        return np.array([int.from_bytes(
            hashlib.blake2b(b"", digest_size=8).digest(), "big")],
            dtype=np.uint64)
    wh = (word_hasher or _word_hash_array)(words)
    with np.errstate(over="ignore"):
        if len(words) < k:
            acc = np.zeros(1, dtype=np.uint64)
            for j in range(len(words)):
                acc ^= wh[j:j + 1] * _POS_MIX[j % len(_POS_MIX)]
            return acc
        n = len(words) - k + 1
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            acc ^= wh[j:j + n] * _POS_MIX[j % len(_POS_MIX)]
    return acc


_EMPTY_WORD_HASH = int.from_bytes(
    hashlib.blake2b(b"", digest_size=8).digest(), "big")


class MinHashActor:
    """Signature stage: permutation params generated once per actor
    (seeded), signatures computed batch-vectorized.

    Word hashing follows the simhash pattern: ONE np.unique over the
    batch's flat word stream, blake2b only on unique words (further
    amortized by the per-worker memo), then a gather back to
    instances — the per-occurrence Python dict loop is gone."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm,
                             dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm,
                             dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        # per-worker word→hash memo: natural-language vocabulary is
        # tiny relative to token count, so the blake2b per WORD
        # amortizes to ~one per distinct word per worker
        self._word_memo: dict[str, int] = {}

    def _word_hashes(self, words) -> np.ndarray:
        memo = self._word_memo
        if len(memo) > 2_000_000:  # adversarial-vocabulary bound
            memo.clear()
        out = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            h = memo.get(w)
            if h is None:
                h = memo[w] = int.from_bytes(
                    hashlib.blake2b(w.encode(),
                                    digest_size=8).digest(), "big")
            out[i] = h
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signatures_batch([text])[0]

    def _doc_shingles(self, texts) -> list[np.ndarray]:
        """Per-doc shingle-hash arrays, word hashing batched: unique
        words once per batch, gather to instances, position-mix per
        doc (identical arithmetic to _shingle_hashes)."""
        k = self.shingle_k
        words_per_doc = [(t or "").split() for t in texts]
        lens = np.array([len(w) for w in words_per_doc],
                        dtype=np.int64)
        flat = [w for ws in words_per_doc for w in ws]
        if flat:
            uniq, inv = np.unique(np.array(flat, dtype=object),
                                  return_inverse=True)
            inst = self._word_hashes(uniq)[inv]
        else:
            inst = np.empty(0, dtype=np.uint64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        out: list[np.ndarray] = []
        with np.errstate(over="ignore"):
            for d in range(len(texts)):
                wh = inst[offs[d]:offs[d + 1]]
                n_w = wh.size
                if n_w == 0:
                    out.append(np.array([_EMPTY_WORD_HASH],
                                        dtype=np.uint64))
                    continue
                if n_w < k:
                    acc = np.zeros(1, dtype=np.uint64)
                    for j in range(n_w):
                        acc ^= wh[j:j + 1] * _POS_MIX[j % len(_POS_MIX)]
                else:
                    m = n_w - k + 1
                    acc = np.zeros(m, dtype=np.uint64)
                    for j in range(k):
                        acc ^= wh[j:j + m] * _POS_MIX[j % len(_POS_MIX)]
                out.append(acc)
        return out

    def signatures_batch(self, texts) -> np.ndarray:
        """(n_docs, num_perm) uint64 signatures. The universal-hash
        min runs over the CONCATENATED shingle stream with ONE
        minimum.reduceat per chunk (chunks bound the
        num_perm × n_shingles temporary to ~32 MB)."""
        doc_sh = self._doc_shingles(texts)
        n = len(doc_sh)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        max_sh = max(1, 4_000_000 // self.num_perm)
        start = 0
        while start < n:
            end, tot = start, 0
            while end < n and (end == start
                               or tot + doc_sh[end].size <= max_sh):
                tot += doc_sh[end].size
                end += 1
            sh = (doc_sh[start] if end == start + 1
                  else np.concatenate(doc_sh[start:end]))
            with np.errstate(over="ignore"):
                vals = (self.a[:, None] * sh[None, :]
                        + self.b[:, None]) % _MERSENNE
            seg = np.concatenate(
                [[0], np.cumsum([s.size for s in
                                 doc_sh[start:end]])[:-1]]).astype(
                np.int64)
            sigs[start:end] = np.minimum.reduceat(
                vals, seg, axis=1).T
            start = end
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = self.signatures_batch(texts)
        flat = pa.array(sigs.ravel(), pa.uint64())
        offsets = pa.array(
            np.arange(0, (len(texts) + 1) * self.num_perm,
                      self.num_perm, dtype=np.int32))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.ListArray.from_arrays(offsets, flat),
        })


_MINHASH_CACHE: dict = {}


def _minhash_task(num_perm: int, shingle_k: int):
    def fn(batch):
        key = (num_perm, shingle_k)
        actor = _MINHASH_CACHE.get(key)
        if actor is None:
            actor = _MINHASH_CACHE[key] = MinHashActor(
                num_perm=num_perm, shingle_k=shingle_k)
        return actor(batch)
    fn.__name__ = "task_minhash"
    return fn


def _band_key_matrix(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 band keys: splitmix-style fold of each
    band's signature rows with the band index mixed in. Identical
    signature chunks → identical keys (the LSH property); random
    cross-chunk collisions are 2⁻⁶⁴-scale, same as the blake2b
    hexdigest keys this replaces — but computed fully vectorized and
    shuffled as 8-byte ints instead of 16-char strings."""
    n, num_perm = sigs.shape
    rpb = num_perm // bands
    s3 = sigs.reshape(n, bands, rpb)
    with np.errstate(over="ignore"):
        h = np.full((n, bands), 0x9E3779B97F4A7C15, dtype=np.uint64)
        for j in range(rpb):
            h = (h ^ s3[:, :, j]) * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(31)
        h ^= (np.arange(bands, dtype=np.uint64)[None, :]
              * np.uint64(0x94D049BB133111EB))
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xD6E8FEB86659FD93)
        h ^= h >> np.uint64(29)
    return h.view(np.int64)


def minhash_lsh_buckets(ds, num_perm: int = 64, bands: int = 16,
                        shingle_k: int = 3):
    """documents → (band_key, doc_id) pairs via banding; ONE groupby on
    band_key co-locates near-dup candidates."""
    # task-based: MinHashActor instance cached per worker process
    # (same amortization as an actor pool, no pool upscaling stalls)
    sigs = ds.map_batches(
        _minhash_task(num_perm, shingle_k), batch_format="pyarrow")

    def to_bands(batch: pa.Table) -> pa.Table:
        col = batch.column("sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        sig_m = flat.astype(np.uint64, copy=False).reshape(-1, num_perm)
        keys = _band_key_matrix(sig_m, bands)
        idx = np.repeat(np.arange(sig_m.shape[0]), bands)
        return pa.table({
            "band_key": pa.array(keys.ravel(), pa.int64()),
            "doc_id": batch.column("doc_id").take(pa.array(idx)),
        })

    return sigs.map_batches(to_bands, batch_format="pyarrow")


def minhash_near_dups(ds, num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, join: str = "broadcast",
                      num_partitions: int = 32):
    """→ (doc_id, dup_of) pairs: docs sharing an LSH bucket with a
    smaller doc_id. Approximate transitive closure: per-bucket min.

    Scale shape: ONE C-path groupby-aggregate over the band rows
    (min doc_id + count per bucket) instead of per-bucket map_groups
    (python/pandas per group is the bottleneck at millions of tiny
    buckets). Buckets with ≥2 docs — the actual duplicate clusters, a
    tiny fraction of the corpus — then join back to the band rows.

    ``join``: "broadcast" (default) pulls the bucket→keeper map to the
    driver and ships it once via ray.put — measured 2.2 MB at 100k
    docs / 30% dup rate (~22 MB per 1M duplicate docs), the fastest
    path while the map is small. "partitioned" keeps everything
    distributed (Dataset.join hash join on the band key over
    ``num_partitions``) — use when the dup-cluster map would exceed
    driver memory (~100 MB ≈ 5M duplicate docs)."""
    import ray
    from ray.data.aggregate import Count, Min

    # materialize the (doc_id, band_key) rows: they feed BOTH the
    # bucket aggregate and the join below, and are tiny relative to
    # the corpus (two narrow columns; spillable)
    buckets = minhash_lsh_buckets(ds, num_perm, bands,
                                  shingle_k).materialize()
    agg = buckets.groupby("band_key").aggregate(
        Min("doc_id", alias_name="keeper"),
        Count(alias_name="n"))
    dup_buckets = agg.filter(expr="n >= 2")

    if join == "partitioned":
        joined = buckets.join(
            dup_buckets.select_columns(["band_key", "keeper"]),
            join_type="inner", num_partitions=num_partitions,
            on=("band_key",))

        def emit(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            keepers = batch.column("keeper")
            mask = pa.compute.not_equal(ids, keepers)
            t = batch.filter(mask)
            return pa.table({"doc_id": t.column("doc_id"),
                             "dup_of": t.column("keeper")})

        pairs = joined.map_batches(emit, batch_format="pyarrow")
    else:
        dup_tbl = collect_table(dup_buckets)
        if dup_tbl.num_columns:
            bk = dup_tbl.column("band_key") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            kp = dup_tbl.column("keeper") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            bk = kp = np.array([], dtype=np.int64)
        order = np.argsort(bk)
        handle = ray.put((bk[order], kp[order]))  # broadcast once

        def attach(batch: pa.Table) -> pa.Table:
            bk_s, kp_s = ray.get(handle)
            keys = batch.column("band_key") \
                .to_numpy(zero_copy_only=False)
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            id_type = batch.column("doc_id").type
            if bk_s.size == 0 or keys.size == 0:
                return pa.table({
                    "doc_id": pa.array([], id_type),
                    "dup_of": pa.array([], id_type)})
            pos = np.searchsorted(bk_s, keys)
            pos_c = np.minimum(pos, bk_s.size - 1)
            keeper = kp_s[pos_c]
            mask = (bk_s[pos_c] == keys) & (keeper != ids)
            return pa.table({
                "doc_id": pa.array(ids[mask], id_type),
                "dup_of": pa.array(keeper[mask], id_type)})

        pairs = buckets.map_batches(attach, batch_format="pyarrow")
    # same pair can surface from several bands; dedup via groupby min
    return pairs.groupby("doc_id").aggregate(
        Min("dup_of", alias_name="dup_of"))


# -- SimHash ----------------------------------------------------------------

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

# 64 bits split into 6 blocks (11,11,11,11,10,10). Any pair within
# Hamming distance 3 differs in at most 3 blocks, so at least 3 of the
# 6 blocks are identical — every such pair shares at least one of the
# C(6,3)=20 three-block combination keys (generalized pigeonhole,
# cf. Manku et al., WWW'07 multi-index scheme). Unlike single-block
# keys the combined keyspace is ~2^33 per combo (no fixed bucket
# ceiling): bucket count grows with the corpus and in-bucket O(n²)
# verify stays tiny because random collisions need 31-33 matching bits.
_BLOCK_SIZES = (11, 11, 11, 11, 10, 10)
_BLOCK_OFFS = tuple(int(x) for x in
                    np.concatenate([[0], np.cumsum(_BLOCK_SIZES)[:-1]]))
_COMBOS = tuple((a, b, c)
                for a in range(6) for b in range(a + 1, 6)
                for c in range(b + 1, 6))


def simhash_batch(batch: pa.Table, *, bits: int = 64) -> pa.Table:
    """64-bit SimHash over word features (weight = term frequency),
    word hash = first 8 bytes of md5 (big-endian) so the SQL oracle can
    reproduce it with substr(md5(w),1,16).

    Batch-vectorized: md5 runs once per UNIQUE word in the batch; the
    per-doc bit-majority is one (instances, 64) gather + segmented
    reduceat over doc boundaries — no per-word Python in the inner
    accumulation."""
    texts = batch.column("text").to_pylist()
    words_per_doc = [(t or "").split() for t in texts]
    lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
    out = np.full(len(texts), -(1 << 63), dtype=np.int64)
    nz = np.nonzero(lens)[0]
    if nz.size:
        flat = [w for i in nz for w in words_per_doc[i]]
        uniq, inv = np.unique(np.array(flat, dtype=object),
                              return_inverse=True)
        uhash = np.fromiter(
            (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
             for w in uniq), dtype=np.uint64, count=len(uniq))
        ubits = ((uhash[:, None] >> _BIT_SHIFTS) &
                 np.uint64(1)).astype(np.int64)  # (uniq, 64)
        inst_bits = ubits[inv]  # (instances, 64)
        lens_nz = lens[nz]
        seg = np.concatenate([[0], np.cumsum(lens_nz)[:-1]])
        ones = np.add.reduceat(inst_bits, seg, axis=0)  # (docs, 64)
        maj = (2 * ones > lens_nz[:, None])
        sims = (maj.astype(np.uint64) <<
                _BIT_SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
        # signed = unsigned − 2^63; in two's complement that's a
        # top-bit flip, so XOR + reinterpret (no overflow warnings)
        out[nz] = (sims ^ np.uint64(1 << 63)).view(np.int64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array(out, pa.int64()),
    })


def _combo_key_matrix(sims: np.ndarray) -> np.ndarray:
    """(20, n) int64 combination keys for an array of signed simhashes.
    Key layout: combo_id in the high bits, the three block values
    concatenated below (≤33 bits)."""
    u = sims.astype(np.int64).view(np.uint64) + np.uint64(1 << 63)
    n = u.size
    blocks = [((u >> np.uint64(_BLOCK_OFFS[i])) &
               np.uint64((1 << _BLOCK_SIZES[i]) - 1)).astype(np.int64)
              for i in range(6)]
    keys = np.empty((len(_COMBOS), n), dtype=np.int64)
    for ci, (a, b, c) in enumerate(_COMBOS):
        packed = (((blocks[a] << _BLOCK_SIZES[b]) | blocks[b])
                  << _BLOCK_SIZES[c]) | blocks[c]
        keys[ci] = (np.int64(ci) << np.int64(34)) | packed
    return keys


def simhash_combo_keys(batch: pa.Table) -> pa.Table:
    """(combo_key:int64, doc_id, simhash) rows — 20 three-block
    combination keys per doc, vectorized."""
    sims = batch.column("simhash").to_numpy(zero_copy_only=False)
    keys = _combo_key_matrix(sims)
    take_idx = np.tile(np.arange(sims.size), len(_COMBOS))
    return pa.table({
        "combo_key": pa.array(keys.ravel(), pa.int64()),
        "doc_id": batch.column("doc_id").take(take_idx),
        "simhash": batch.column("simhash").take(take_idx),
    })


def _hamming_matrix(sims: np.ndarray) -> np.ndarray:
    x = sims.astype(np.int64).view(np.uint64)
    xor = x[:, None] ^ x[None, :]
    return _POP8[xor.view(np.uint8).reshape(x.size, x.size, 8)] \
        .sum(axis=-1, dtype=np.int16)


def simhash_near_dups(ds, max_hamming: int = 3,
                      join: str = "broadcast",
                      num_partitions: int = 32):
    """→ (doc_id, min dup_of) over all pairs with Hamming ≤ max_hamming
    — exact (full recall) for max_hamming ≤ 3 by the 6-choose-3 block
    pigeonhole, so it carries a SQL oracle (the O(n²) bit_count join).

    Scale shape (two-phase broadcast, like minhash_near_dups but with
    ZERO verify-side shuffle): the 20 combo keys/doc are ≥31 matching
    bits, so random collisions are ~2^-31 per combo and the bucket
    universe grows with the corpus (no fixed ceiling). Phase 1 is ONE
    C-path groupby-count over the narrow combo rows; the members of
    buckets with ≥2 docs (true near-dup clusters — a tiny, bounded set,
    same driver-residency caveat as the minhash keeper map) are pulled
    once and broadcast via ray.put as combo_key → (ids, simhashes).
    Phase 2 is a single map over the hashed docs: each doc checks its
    20 keys against the broadcast map, gathers candidate partners,
    verifies with a vectorized XOR-popcount, and emits its min smaller
    partner directly — exactly once per doc, so no final groupby.

    ``join="partitioned"``: overflow path for dup-bucket member maps
    beyond driver memory — everything stays distributed: an inner hash
    join keeps only candidate narrow rows (combo_key, doc_id, simhash:
    24 B/row), ONE groupby(combo_key) co-locates each duplicate
    bucket, a vectorized pairwise XOR-popcount verifies inside the
    group, and a final groupby(doc_id).min folds per-bucket emissions
    to the per-doc min partner. Output identical to broadcast mode
    (parity-tested)."""
    import ray
    from ray.data.aggregate import Count, Min

    # materialized: feeds both the bucket count and the verify map
    hashed = ds.map_batches(simhash_batch,
                            batch_format="pyarrow").materialize()
    keyed = hashed.map_batches(simhash_combo_keys,
                               batch_format="pyarrow")
    agg = keyed.groupby("combo_key").aggregate(Count(alias_name="n"))

    if join == "partitioned":
        # repartition: aggregate output can carry zero-schema empty
        # partition blocks that break the Arrow hash join (see
        # _components_labels_partitioned); one int64 column, cheap.
        dup_key_ds = agg.filter(expr="n >= 2") \
            .select_columns(["combo_key"]).repartition(num_partitions)
        cand = keyed.join(dup_key_ds, join_type="inner",
                          num_partitions=num_partitions,
                          on=("combo_key",))

        def verify(group: pa.Table) -> pa.Table:
            """Arrow-native group kernel (no pandas block conversion):
            vectorized XOR-popcount + lower-triangle argmax — the
            first close j < i IS the min id since ids are sorted."""
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "dup_of": pa.array([], pa.int64())})
            m = group.num_rows
            if m < 2:
                return empty
            ids = group.column("doc_id") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            sims = np.ascontiguousarray(
                group.column("simhash").to_numpy(zero_copy_only=False)
                .astype(np.int64)).view(np.uint64)
            order = np.argsort(ids)
            ids, sims = ids[order], sims[order]
            xor = sims[:, None] ^ sims[None, :]
            ham = _POP8[xor.view(np.uint8).reshape(m, m, 8)] \
                .sum(axis=2, dtype=np.int16)
            close = np.tril(ham <= max_hamming, k=-1)
            hit = close.any(axis=1)
            first = close.argmax(axis=1)   # min close j per row i
            return pa.table({
                "doc_id": pa.array(ids[hit], pa.int64()),
                "dup_of": pa.array(ids[first[hit]], pa.int64())})

        pairs = cand.groupby("combo_key").map_groups(
            verify, batch_format="pyarrow")
        return pairs.groupby("doc_id").aggregate(
            Min("dup_of", alias_name="dup_of"))

    dk_tbl = collect_table(agg.filter(expr="n >= 2"))
    dup_keys = np.sort(dk_tbl.column("combo_key")
                       .to_numpy(zero_copy_only=False)
                       .astype(np.int64)) \
        if dk_tbl.num_columns else np.array([], dtype=np.int64)

    # pull only dup-bucket member rows (dup clusters, not the corpus)
    # and broadcast them as a sorted-array CSR — NOT a Python dict of
    # per-key numpy pairs: at a 10x scale run (200k docs, 394k dup
    # buckets, 1.08M member rows from mildly-mutated replicas at
    # Hamming 5-9) the dict build + its pickle broadcast dominated the
    # whole pipeline (~190 s of a 250 s wall). Flat int64 arrays build
    # vectorized and ship zero-copy.
    u_keys = np.array([], dtype=np.int64)
    starts = counts = m_doc = m_sim = np.array([], dtype=np.int64)
    if dup_keys.size:
        dk_ref = ray.put(dup_keys)

        def keep_dup_buckets(batch: pa.Table) -> pa.Table:
            keys = ray.get(dk_ref)
            col = batch.column("combo_key") \
                .to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(keys, col),
                             keys.size - 1)
            return batch.filter(pa.array(keys[pos] == col))

        cand = collect_table(keyed.map_batches(
            keep_dup_buckets, batch_format="pyarrow"))
        if cand.num_columns and cand.num_rows:
            m_key = cand.column("combo_key") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            m_doc = cand.column("doc_id") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            m_sim = cand.column("simhash") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(m_key, kind="stable")
            m_key = m_key[order]
            m_doc, m_sim = m_doc[order], m_sim[order]
            u_keys, starts = np.unique(m_key, return_index=True)
            counts = np.diff(np.append(starts, m_key.size))
    handle = ray.put((u_keys, starts.astype(np.int64),
                      counts.astype(np.int64), m_doc, m_sim))

    def emit_min_partner(batch: pa.Table) -> pa.Table:
        """Fully vectorized: every (hot combo, doc) membership expands
        to its bucket's member slice via a segment-arange flat gather,
        then ONE XOR-popcount over all candidate pairs and a bincount
        minimum fold per doc — no per-doc Python loop."""
        uk, st, cn, mdoc, msim = ray.get(handle)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sims = batch.column("simhash").to_numpy(zero_copy_only=False)
        id_type = batch.column("doc_id").type
        empty = pa.table({"doc_id": pa.array([], id_type),
                          "dup_of": pa.array([], id_type)})
        if not uk.size or not ids.size:
            return empty
        keys = _combo_key_matrix(sims)          # (20, n)
        kf = keys.reshape(-1)
        doc_of = np.tile(np.arange(ids.size, dtype=np.int64),
                         keys.shape[0])
        pos = np.minimum(np.searchsorted(uk, kf), uk.size - 1)
        hit = uk[pos] == kf
        j = pos[hit]                            # CSR slot per hit
        owner = doc_of[hit]                     # local doc idx per hit
        cnt = cn[j]
        total = int(cnt.sum())
        if not total:
            return empty
        seg0 = np.repeat(np.cumsum(cnt) - cnt, cnt)
        flat = np.repeat(st[j], cnt) + \
            (np.arange(total, dtype=np.int64) - seg0)
        own = np.repeat(owner, cnt)
        p_ids = mdoc[flat]
        keep = p_ids < ids[own]
        if not keep.any():
            return empty
        own, p_ids, flat = own[keep], p_ids[keep], flat[keep]
        xor = msim[flat].view(np.uint64) ^ sims[own] \
            .astype(np.int64).view(np.uint64)
        ham = _POP8[xor.view(np.uint8).reshape(-1, 8)] \
            .sum(axis=1, dtype=np.int16)
        close = ham <= max_hamming
        if not close.any():
            return empty
        own, p_ids = own[close], p_ids[close]
        # per-doc min partner: scatter-min into a dense local array
        best = np.full(ids.size, np.iinfo(np.int64).max,
                       dtype=np.int64)
        np.minimum.at(best, own, p_ids)
        found = best != np.iinfo(np.int64).max
        return pa.table({
            "doc_id": pa.array(ids[found], id_type),
            "dup_of": pa.array(best[found], id_type)})

    return hashed.map_batches(emit_min_partner, batch_format="pyarrow")


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """n-gram Jaccard similarity (candidate verification kernel)."""
    a = set(map(int, _shingle_hashes(text_a, k)))
    b = set(map(int, _shingle_hashes(text_b, k)))
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a | b)
    return inter / union if union else 0.0


def _jaccard_pair_stream(ds, threshold: float = 0.8,
                         shingle_k: int = 3, num_perm: int = 64,
                         bands: int = 16):
    """Raw verified pair stream (doc_id > dup_of, jaccard_x100); a pair
    may appear once per shared duplicate bucket — consumers aggregate
    or union-find over it. Two-phase scale shape:
      1. MinHash banding WITHOUT text (narrow rows) → ONE C-path
         groupby-count finds buckets with ≥2 docs; the (band_key,
         doc_id) rows of those buckets (tiny: real dup clusters only,
         the same size class as the keeper map) are broadcast once as
         a doc_id→band_keys CSR map.
      2. A second map over the corpus attaches text for member docs by
         probing the broadcast map — NO signature recompute (the first
         pass already banded every doc; re-hashing was ~half the
         stage's CPU); ONE groupby co-locates those few rows; exact
         n-gram Jaccard verifies inside the group.
    Full text is never shuffled for non-candidate documents."""
    import ray
    from ray.data.aggregate import Count

    buckets = minhash_lsh_buckets(ds, num_perm, bands,
                                  shingle_k).materialize()
    agg = buckets.groupby("band_key").aggregate(Count(alias_name="n"))
    dk_tbl = collect_table(agg.filter(expr="n >= 2"))
    dup_keys = np.sort(dk_tbl.column("band_key")
                       .to_numpy(zero_copy_only=False)
                       .astype(np.int64)) \
        if dk_tbl.num_columns else np.array([], dtype=np.int64)
    dk_ref = ray.put(dup_keys)

    def member_rows(batch: pa.Table) -> pa.Table:
        """Filter phase-1 banding rows to duplicate buckets."""
        dk = ray.get(dk_ref)
        keys = batch.column("band_key").to_numpy(zero_copy_only=False)
        if dk.size and keys.size:
            pos = np.minimum(np.searchsorted(dk, keys), dk.size - 1)
            mask = dk[pos] == keys
        else:
            mask = np.zeros(keys.size, dtype=bool)
        return batch.filter(pa.array(mask))

    cand = collect_table(
        buckets.map_batches(member_rows, batch_format="pyarrow"))
    # CSR doc_id -> band_keys over the dup-bucket MEMBER rows (one row
    # per (dup bucket, member) — dup-cluster-sized, broadcastable)
    if cand.num_columns:
        m_doc = cand.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        m_key = cand.column("band_key") \
            .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    else:
        m_doc = np.array([], dtype=np.int64)
        m_key = np.array([], dtype=np.int64)
    order = np.argsort(m_doc, kind="stable")
    m_doc, m_key = m_doc[order], m_key[order]
    u_doc, starts = np.unique(m_doc, return_index=True)
    counts = np.diff(np.append(starts, m_doc.size))
    csr_ref = ray.put((u_doc, starts.astype(np.int64),
                       counts.astype(np.int64), m_key))

    def band_candidates(batch: pa.Table) -> pa.Table:
        """Emit (band_key, doc_id, text) per dup-bucket membership of
        this batch's docs — a searchsorted probe + segment gather
        against the broadcast CSR map; no re-hashing."""
        u, starts_, counts_, keys_ = ray.get(csr_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if u.size and ids.size:
            pos = np.minimum(np.searchsorted(u, ids), u.size - 1)
            hit = u[pos] == ids
        else:
            return pa.table({
                "band_key": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string())})
        row_idx = np.flatnonzero(hit)
        j = pos[hit]                      # CSR slot per matching row
        cnt = counts_[j]
        total = int(cnt.sum())
        # segment-arange: flat gather of each doc's band_key slice
        seg0 = np.repeat(np.cumsum(cnt) - cnt, cnt)
        flat = np.repeat(starts_[j], cnt) + (np.arange(total) - seg0)
        take = pa.array(np.repeat(row_idx, cnt))
        return pa.table({
            "band_key": pa.array(keys_[flat], pa.int64()),
            "doc_id": batch.column("doc_id").take(take),
            "text": batch.column("text").take(take),
        })

    banded = ds.map_batches(band_candidates, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        """Arrow-native group kernel: pairwise Jaccard over the group
        WITHOUT per-pair Python set ops. Shingle hashes are flattened
        into one (hash, doc) array; equal-hash runs contribute +1
        intersection to every doc pair in the run (triangular-decoded
        combination enumeration, one bincount scatter). Emits EVERY
        matching pair (no early break) so the downstream Min/Max
        aggregates keep clean SQL-oracle semantics; int(jac*100)
        floors to avoid round-half tie differences vs SQL."""
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "dup_of": pa.array([], pa.int64()),
                          "jaccard_x100": pa.array([], pa.int64())})
        m = group.num_rows
        if m < 2:
            return empty
        ids = group.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        texts = group.column("text").take(pa.array(order)).to_pylist()
        sets = [np.unique(_shingle_hashes(t or "", shingle_k))
                for t in texts]
        sizes = np.array([s.size for s in sets], dtype=np.int64)
        flat = np.concatenate(sets) if sizes.sum() else \
            np.array([], dtype=np.uint64)
        docs = np.repeat(np.arange(m, dtype=np.int64), sizes)
        o = np.argsort(flat, kind="stable")
        flat, docs = flat[o], docs[o]
        starts = np.flatnonzero(np.r_[True, flat[1:] != flat[:-1]]) \
            if flat.size else np.array([], dtype=np.int64)
        runlen = np.diff(np.append(starts, flat.size)) \
            if flat.size else np.array([], dtype=np.int64)
        # all (p < q) index pairs within each equal-hash run,
        # enumerated vectorized via the triangular decode
        # t -> (q = floor((1+sqrt(1+8t))/2), p = t - q(q-1)/2)
        pr = runlen * (runlen - 1) // 2
        total = int(pr.sum())
        inter = np.zeros((m, m), dtype=np.int64)
        if total:
            seg0 = np.repeat(np.cumsum(pr) - pr, pr)
            t = np.arange(total, dtype=np.int64) - seg0
            q = ((1.0 + np.sqrt(1.0 + 8.0 * t)) // 2).astype(np.int64)
            # integer-exact correction of the float decode (off-by-one
            # possible near triangular boundaries for huge runs)
            tri = q * (q - 1) // 2
            q -= (tri > t).astype(np.int64)
            tri = q * (q - 1) // 2
            q += (t - tri >= q).astype(np.int64)
            p = t - q * (q - 1) // 2
            base = np.repeat(starts, pr)
            a = docs[base + p]
            b = docs[base + q]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            np.add.at(inter, (hi, lo), 1)
        union = sizes[:, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1),
                           1.0)
        keep = np.tril(jac >= threshold, k=-1)
        hi_i, lo_j = np.nonzero(keep)
        return pa.table({
            "doc_id": pa.array(ids[hi_i], pa.int64()),
            "dup_of": pa.array(ids[lo_j], pa.int64()),
            "jaccard_x100": pa.array(
                (jac[hi_i, lo_j] * 100).astype(np.int64), pa.int64()),
        })

    return banded.groupby("band_key").map_groups(
        verify, batch_format="pyarrow")


def ngram_jaccard_near_dups(ds, threshold: float = 0.8,
                            shingle_k: int = 3, num_perm: int = 64,
                            bands: int = 16):
    """n-gram Jaccard near-dup pairs → (doc_id, dup_of, jaccard_x100):
    per doc the min qualifying partner and max jaccard (SQL-oracle
    aggregate over the raw pair stream — see _jaccard_pair_stream for
    the scale shape)."""
    from ray.data.aggregate import Max, Min

    pairs = _jaccard_pair_stream(ds, threshold, shingle_k, num_perm,
                                 bands)
    return pairs.groupby("doc_id").aggregate(
        Min("dup_of", alias_name="dup_of"),
        Max("jaccard_x100", alias_name="jaccard_x100"))


# -- near-duplicate connected components ------------------------------------

def _components_labels_partitioned(pairs_ds, *, pair_a: str,
                                   pair_b: str,
                                   num_partitions: int = 32,
                                   max_iters: int = 50):
    """Fully-distributed connected-components labels → (node, label)
    for every node in the pair stream, label = component min doc_id.
    Iterative min-label propagation expressed entirely in Ray Data:
    each round is ONE partitioned hash join (neighbor labels onto
    edges) + ONE groupby-min; labels are monotonically non-increasing,
    so a Sum(label) fixed point detects convergence (O(cluster
    diameter) rounds — near-clique LSH dup clusters converge in 2).
    Nothing touches the driver except the per-round checksum."""
    from ray.data.aggregate import Min, Sum
    import pyarrow.compute as pc

    def both_dirs(batch: pa.Table) -> pa.Table:
        t1 = pa.table({"u": batch.column(pair_a),
                       "v": batch.column(pair_b)})
        t2 = pa.table({"u": batch.column(pair_b),
                       "v": batch.column(pair_a)})
        return pa.concat_tables([t1, t2])

    edges = pairs_ds.select_columns([pair_a, pair_b]).map_batches(
        both_dirs, batch_format="pyarrow").materialize()

    # initial label = min(self, min neighbor): one propagation folded
    # into the seeding groupby
    def seed_label(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("u"),
            "label": pc.min_element_wise(batch.column("u"),
                                         batch.column("label")),
        })

    # repartition before every materialize: hash-shuffle aggregates
    # emit empty partitions as ZERO-SCHEMA blocks, map_batches skips
    # empty blocks (so no UDF can normalize them), and a schema-less
    # block in any right-side join partition fails the Arrow hash
    # join with "No match for FieldRef". Labels are two int64
    # columns, so the extra narrow shuffle is noise next to the join.
    lab = edges.groupby("u").aggregate(
        Min("v", alias_name="label")).map_batches(
        seed_label, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    prev_sum = None
    for _ in range(max_iters):
        row = lab.aggregate(Sum("label", alias_name="s"))
        cur_sum = row["s"] if row else 0
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        # map_batches projection, NOT select_columns: Ray 2.49's
        # projection pushdown drops the right join key ("node") from
        # the shared `lab` plan when a select_columns sits directly on
        # a right_on join whose right side also feeds self_lab,
        # failing the Arrow hash join with "No match for FieldRef".
        prop = edges.join(
            lab, join_type="inner", num_partitions=num_partitions,
            on=("v",), right_on=("node",)) \
            .map_batches(lambda b: b.select(["u", "label"]),
                         batch_format="pyarrow")
        self_lab = lab.map_batches(
            lambda b: pa.table({"u": b.column("node"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        lab = prop.union(self_lab).groupby("u").aggregate(
            Min("label", alias_name="label")).map_batches(
            lambda b: pa.table({"node": b.column("u"),
                                "label": b.column("label")}),
            batch_format="pyarrow") \
            .repartition(num_partitions).materialize()
    return lab


def components_from_pairs(pairs_ds, docs_ds, *, pair_a: str,
                          pair_b: str, id_col: str,
                          out_col: str = "component",
                          join: str = "broadcast",
                          num_partitions: int = 32):
    """Generic connected components over an undirected pair graph.

    ``join="broadcast"`` (default): union-find (by min root, path
    compression) over the collected pair rows — bounded by the
    dup-cluster size class, see BASELINE.md — then ONE broadcast of
    the component map and a map-side label pass over docs_ds.

    ``join="partitioned"``: the overflow path for dup graphs beyond
    driver memory — distributed min-label propagation
    (_components_labels_partitioned) followed by ONE left_outer hash
    join of the narrow (id) corpus projection against the label
    table; null labels (singletons) fill with their own id map-side.

    Returns (id_col, out_col) for every row of docs_ds; singletons
    label themselves."""
    import ray
    import pyarrow.compute as pc

    if join == "partitioned":
        labels = _components_labels_partitioned(
            pairs_ds, pair_a=pair_a, pair_b=pair_b,
            num_partitions=num_partitions)
        joined = docs_ds.select_columns([id_col]).join(
            labels, join_type="left_outer",
            num_partitions=num_partitions,
            on=(id_col,), right_on=("node",))

        def finish(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            filled = pc.coalesce(batch.column("label"), ids)
            return pa.table({id_col: ids,
                             out_col: filled.cast(ids.type)})

        return joined.map_batches(finish, batch_format="pyarrow")

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    pair_tbl = collect_table(pairs_ds.select_columns([pair_a,
                                                      pair_b]))
    if pair_tbl.num_columns:
        a_np = pair_tbl.column(pair_a) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        b_np = pair_tbl.column(pair_b) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        a_np = b_np = np.array([], dtype=np.int64)
    for pa_, pb_ in zip(a_np.tolist(), b_np.tolist()):
        ra, rb = find(pa_), find(pb_)
        if ra != rb:  # union by MIN root → labels are component minima
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    # broadcast once (dup-cluster ids only), as sorted parallel arrays
    # so the map-side label pass is a searchsorted gather, not a
    # per-row dict probe
    lab_keys = np.sort(np.fromiter(parent.keys(), dtype=np.int64,
                                   count=len(parent)))
    lab_vals = np.array([find(int(d)) for d in lab_keys],
                        dtype=np.int64)
    handle = ray.put((lab_keys, lab_vals))

    def attach(batch: pa.Table) -> pa.Table:
        keys_sorted, vals_sorted = ray.get(handle)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        if keys_sorted.size and ids.size:
            pos = np.minimum(np.searchsorted(keys_sorted, ids),
                             keys_sorted.size - 1)
            labels = np.where(keys_sorted[pos] == ids,
                              vals_sorted[pos], ids)
        else:
            labels = ids
        return pa.table({
            id_col: batch.column(id_col),
            out_col: pa.array(labels,
                              batch.column(id_col).type),
        })

    return docs_ds.select_columns([id_col]).map_batches(
        attach, batch_format="pyarrow")


def jaccard_components(ds, threshold: float = 0.8, shingle_k: int = 3,
                       num_perm: int = 64, bands: int = 16):
    """→ (doc_id, component) for EVERY document: component = the
    smallest doc_id reachable through the undirected graph of verified
    near-dup pairs (word-k-shingle Jaccard ≥ threshold). The standard
    "cluster near-dups, keep one per cluster" primitive.

    Scale shape: the verified pair stream covers ONLY true duplicate
    pairs (the same dup-cluster size class as the minhash keeper map —
    2.2 MB at 100k docs / 30% dups, bound documented in BASELINE.md),
    so union-find over the collected pairs runs driver-side in O(pairs
    α(n)); the component map is then broadcast once via ray.put and
    every document is labeled map-side — the corpus itself is never
    shuffled. For dup graphs beyond driver memory, shard the pair list
    and union-find the spill in passes (components compose)."""
    pairs = _jaccard_pair_stream(ds, threshold, shingle_k, num_perm,
                                 bands)
    return components_from_pairs(pairs, ds, pair_a="doc_id",
                                 pair_b="dup_of", id_col="doc_id")


def snapshot_dedup(new_ds, prior_ds, text_col: str = "text",
                   join: str = "broadcast", num_partitions: int = 32):
    """Incremental (cross-snapshot) dedup: keep only the rows of
    ``new_ds`` whose content fingerprint does NOT appear in
    ``prior_ds`` — the per-crawl-increment shape (CommonCrawl-style:
    dedupe each new snapshot against everything already ingested).

    ``join="broadcast"``: the prior side reduces to its DISTINCT
    fingerprint array (np.unique per task, one driver union), shipped
    once via ray.put and probed map-side with searchsorted — the new
    snapshot never shuffles. Bound: prior DISTINCT fp count × 32 B;
    beyond driver memory use ``join="partitioned"``: ONE distributed
    left_anti hash join on fp (both sides stay narrow until the keep
    decision; text never enters the shuffle on either path).

    Output = new_ds columns + fp."""
    import ray

    def narrow(batch: pa.Table) -> pa.Table:
        return _hash_col_batch(batch, text_col).select(["fp"])
    narrow.__name__ = "prior_fp"

    if join == "partitioned":
        prior_fp = prior_ds.map_batches(narrow,
                                        batch_format="pyarrow") \
            .groupby("fp").count().select_columns(["fp"]) \
            .repartition(num_partitions)
        return new_ds.map_batches(
            lambda b: _hash_col_batch(b, text_col),
            batch_format="pyarrow").join(
            prior_fp, join_type="left_anti",
            num_partitions=num_partitions, on=("fp",))

    def fp_partial(batch: pa.Table) -> pa.Table:
        t = _hash_col_batch(batch, text_col)
        u = np.unique(np.asarray(t.column("fp").to_pylist(),
                                 dtype=object))
        return pa.table({"fp": pa.array(u, pa.string())})
    fp_partial.__name__ = "prior_fp_partial"

    parts = prior_ds.map_batches(fp_partial, batch_format="pyarrow")
    arrs = [np.asarray(b.column("fp").to_pylist(), dtype=object)
            for b in parts.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    prior = np.unique(np.concatenate(arrs)) if arrs else \
        np.empty(0, dtype=object)
    handle = ray.put(prior)

    def keep_new(batch: pa.Table) -> pa.Table:
        known = ray.get(handle)
        t = _hash_col_batch(batch, text_col)
        if known.size == 0:
            return t
        fps = np.asarray(t.column("fp").to_pylist(), dtype=object)
        pos = np.minimum(np.searchsorted(known, fps), known.size - 1)
        return t.filter(pa.array(known[pos] != fps))
    keep_new.__name__ = "drop_known_fps"

    return new_ds.map_batches(keep_new, batch_format="pyarrow")



def _para_rows(batch: pa.Table, words_per_para: int,
               text_col: str, id_col: str):
    """(doc_id, para_idx, joined-para list) for one batch: whitespace
    tokens → contiguous ``words_per_para``-word segments per doc. The
    segment layout (counts, boundaries) is fully vectorized; the only
    Python loop is one ``' '.join`` per PARAGRAPH — the same count as
    the md5 the caller takes per paragraph, so it adds no asymptotic
    cost.

    Deliberately NOT built with ``pa.ListArray.from_arrays`` +
    ``pc.binary_join``: with pyarrow 16.1 that construction, after a
    few hundred batch iterations, left a later UNRELATED
    ``utf8_split_whitespace`` call misclassifying a trailing ASCII
    space after multibyte text (deterministic per process layout,
    found by the randomized differential fuzz in
    tests/test_chunk_window_ops.py; a value-identical rebuilt array
    split correctly). The join-per-paragraph path has no Arrow buffer
    arithmetic to poison."""
    import pyarrow.compute as pc

    from .textstats import _text_array, _ws_tokens

    arr = _text_array(batch, text_col)
    offs, flat = _ws_tokens(arr)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = np.asarray(
        flat.take(pa.array(np.flatnonzero(nonempty))).to_pylist(),
        dtype=object)
    cs = np.concatenate([np.zeros(1, np.int64),
                         np.cumsum(nonempty, dtype=np.int64)])
    nw = cs[offs[1:]] - cs[offs[:-1]]            # words per doc
    n_para = -(-nw // words_per_para)            # ceil; 0 for empty
    total = int(n_para.sum())
    if total == 0:
        return (np.array([], np.int64), np.array([], np.int64), [])
    doc0 = np.concatenate([np.zeros(1, np.int64), np.cumsum(nw)])
    doc_of = np.repeat(np.arange(len(nw)), n_para)
    # start of each para in the filtered token stream: doc start +
    # in-doc ordinal * words_per_para (segment-arange)
    seg0 = np.concatenate([np.zeros(1, np.int64),
                           np.cumsum(n_para)])[:-1]
    para_idx = np.arange(total, dtype=np.int64) - seg0[doc_of]
    b0 = doc0[doc_of] + para_idx * words_per_para
    b1 = np.minimum(b0 + words_per_para, doc0[doc_of + 1])
    joined = [" ".join(toks[s:e]) for s, e in zip(b0, b1)]
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return ids[doc_of], para_idx, joined


def para_dedup(ds, *, words_per_para: int = 15,
               text_col: str = "text", id_col: str = "doc_id"):
    """Paragraph-granular exact dedup (the C4/RefinedWeb step below
    document level): split each doc into fixed ``words_per_para``-word
    segments, fingerprint each, keep only the first corpus-wide
    occurrence of every distinct segment (keeper = smallest
    (doc_id, para_idx)). → (doc_id, para_idx, keep).

    Scale shape: the corpus pass emits NARROW (fp, doc_id, para_idx)
    rows — segment text is joined + hashed map-side and
    immediately, never shuffled. ONE groupby(fp) finds duplicate
    groups; only those (dup-cluster sized — the exact_dedup keeper-map
    bound class) broadcast back for the map-side keep decision."""
    import ray
    from ray.data.aggregate import Count, Min

    _PIDX = np.int64(1 << 20)   # para_idx < 2^20 packs (doc, idx)

    def narrow(batch: pa.Table) -> pa.Table:
        d, p, joined = _para_rows(batch, words_per_para, text_col,
                                  id_col)
        fps = [hashlib.md5(s.encode()).hexdigest() for s in joined]
        return pa.table({
            "fp": pa.array(fps, pa.string()),
            "doc_id": pa.array(d, pa.int64()),
            "para_idx": pa.array(p, pa.int64()),
        })
    narrow.__name__ = "para_fps"

    keyed = ds.map_batches(narrow, batch_format="pyarrow") \
        .materialize()  # feeds the dup-group agg AND the keep pass

    def pack(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        p = b.column("para_idx").to_numpy(zero_copy_only=False)
        # fail loudly instead of silently colliding keeper ids: a doc
        # with >= 2^20 paragraphs or doc_id >= 2^43 would wrap the
        # packed key and corrupt keep decisions (ADVICE r3)
        if p.size and int(p.max()) >= _PIDX:
            raise ValueError(
                f"para_dedup: para_idx {int(p.max())} >= 2^20 — "
                f"packed (doc_id, para_idx) key would collide")
        if d.size and int(d.max()) >= (1 << 63) // _PIDX:
            raise ValueError(
                f"para_dedup: doc_id {int(d.max())} >= 2^43 — "
                f"packed key would overflow int64")
        packed = d * _PIDX + p
        return pa.table({"fp": b.column("fp"),
                         "packed": pa.array(packed, pa.int64())})

    dup_rows = collect_table(
        keyed.map_batches(pack, batch_format="pyarrow")
        .groupby("fp").aggregate(Min("packed", alias_name="kid"),
                                 Count(alias_name="n"))
        .filter(expr="n >= 2"))
    if dup_rows.num_columns:
        fp_s = np.asarray(dup_rows.column("fp").to_pylist())
        kid_s = dup_rows.column("kid").to_numpy(zero_copy_only=False)
        order = np.argsort(fp_s)
        fp_s, kid_s = fp_s[order], kid_s[order]
    else:
        fp_s = np.array([], dtype=object)
        kid_s = np.array([], dtype=np.int64)
    handle = ray.put((fp_s, kid_s))

    def decide(batch: pa.Table) -> pa.Table:
        fp_sorted, kid_sorted = ray.get(handle)
        fps = np.asarray(batch.column("fp").to_pylist())
        packed = batch.column("doc_id").to_numpy(
            zero_copy_only=False) * _PIDX \
            + batch.column("para_idx").to_numpy(zero_copy_only=False)
        if fp_sorted.size and fps.size:
            pos = np.minimum(np.searchsorted(fp_sorted, fps),
                             fp_sorted.size - 1)
            in_dup = fp_sorted[pos] == fps
            keep = ~in_dup | (kid_sorted[pos] == packed)
        else:
            keep = np.ones(fps.size, dtype=bool)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "para_idx": batch.column("para_idx"),
            "keep": pa.array(keep),
        })
    decide.__name__ = "para_keep"

    return keyed.map_batches(decide, batch_format="pyarrow")


def _edit_le1(a, b) -> bool:
    """Exact BYTE-level Levenshtein(a, b) <= 1 (equality counts),
    O(len). Byte-level — not codepoint-level — deliberately: it
    matches DuckDB's levenshtein() semantics (measured:
    levenshtein('héllo','hello') = 2, the é spans two UTF-8 bytes),
    so the SQL oracle and the engine agree on multibyte corpora.
    Accepts str (encoded here) or bytes."""
    if isinstance(a, str):
        a = a.encode("utf-8")
    if isinstance(b, str):
        b = b.encode("utf-8")
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _h63(s) -> int:
    """Stable 63-bit hash of str-or-bytes (blake2b —
    process-independent, unlike built-in hash under
    PYTHONHASHSEED)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    d = hashlib.blake2b(s, digest_size=8).digest()
    return int.from_bytes(d, "big") & ((1 << 63) - 1)


def editdist1_pairs(ds, *, col: str = "text", prefix_len: int = 12,
                    min_len: int = 4, max_run: int = 1024):
    """Edit-distance-1 near-duplicate KEY pairs via DELETION
    NEIGHBORHOODS (the SymSpell / symmetric-delete shape) — the typo
    /OCR-noise dedup class the shingle families miss: two distinct
    keys are Levenshtein-1 apart iff they share a member of each
    other's {self} ∪ {one-deletion} set (substitution pairs share
    the deletion at the mismatch position; indel pairs contain each
    other's deletion), so candidate generation is a LINEAR (1+len)×
    expansion instead of the quadratic cross join the SQL form runs.
    Distance and deletions are BYTE-level over UTF-8 (matching
    DuckDB's byte-based levenshtein(), measured: 'héllo'→'hello' is
    distance 2) — the completeness proof holds verbatim over the
    byte alphabet. Candidates sharing a variant bucket are verified with
    the exact O(len) distance-≤1 check, so hash collisions and
    distance-2 coincidences (transpositions share deletions) emit
    nothing.

    Plan: per-block DISTINCT prefix keys (substr(col, 1, prefix_len)
    over rows with ≥ min_len chars), ONE groupby finishes the global
    distinct; each key emits its deduped variant set as (vh, sh, s)
    rows (stable 63-bit blake2b hashes — nothing relies on process
    hash state); ONE sort on (vh, sh) buckets candidates, and a
    segment kernel (data/segments.py finish_sorted_runs: interior
    runs zero-shuffle, ≤2 edge runs per block re-kerneled
    driver-side) emits verified (s1 < s2) pairs per bucket. A bucket
    is keys-sharing-one-variant — data-bounded like triangle
    counting's co-membership buckets — behind a loud ``max_run``
    contract (a pathological shared variant raises in the WORKER
    before quadratic emission). The helper's driver collect is
    OUTPUT-bounded (verified pairs) + O(blocks) edge rows; the final
    dedup (one pair can surface via several shared variants —
    repeated-char indels, collision-merged buckets) is a
    drop-duplicates over that output-scale table. Returns a pa.Table
    (s1, s2), exact equality with the quadratic levenshtein join."""
    from ray.data.aggregate import Count

    from .segments import finish_sorted_runs

    def distinct_keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.schema.names:
            return pa.table({"s": pa.array([], pa.string())})
        texts = b.column(col).to_pylist()
        ks = {t[:prefix_len] for t in texts
              if t is not None and len(t) >= min_len}
        return pa.table({"s": pa.array(sorted(ks), pa.string())})
    distinct_keys.__name__ = f"editdist_keys_{col}"

    def variants(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "s" not in b.schema.names:
            e = pa.array([], pa.int64())
            return pa.table({"vh": e, "sh": e,
                             "s": pa.array([], pa.string())})
        vh, sh, out_s = [], [], []
        for s in b.column("s").to_pylist():
            h = _h63(s)
            # BYTE-level deletions (UTF-8), matching the byte-level
            # distance the verify step and the SQL oracle use — a
            # byte-dist-1 pair always shares a byte-deletion variant
            sb = s.encode("utf-8")
            vs = {sb} | {sb[:i] + sb[i + 1:] for i in range(len(sb))}
            for v in vs:
                vh.append(_h63(v))
                sh.append(h)
                out_s.append(s)
        return pa.table({"vh": pa.array(vh, pa.int64()),
                         "sh": pa.array(sh, pa.int64()),
                         "s": pa.array(out_s, pa.string())})
    variants.__name__ = "editdist_deletion_variants"

    _empty = pa.table({"s1": pa.array([], pa.string()),
                       "s2": pa.array([], pa.string())})

    def kernel(cols) -> pa.Table:
        vh, s = cols["vh"], cols["s"]
        if vh.size == 0:
            return _empty
        starts = np.flatnonzero(np.r_[True, vh[1:] != vh[:-1]])
        bounds = np.append(starts, vh.size)
        p1, p2 = [], []
        for bi, lo in enumerate(starts):
            hi = bounds[bi + 1]
            if hi - lo > max_run:
                raise ValueError(
                    f"editdist1_pairs: variant bucket size {hi - lo} "
                    f"exceeds max_run={max_run} — pathological shared "
                    "variant; raise max_run or lengthen the prefix")
            run = s[lo:hi]
            for i in range(len(run)):
                for j in range(i + 1, len(run)):
                    a, b2 = run[i], run[j]
                    if a == b2:
                        continue
                    if a > b2:
                        a, b2 = b2, a
                    if _edit_le1(a, b2):
                        p1.append(a)
                        p2.append(b2)
        return pa.table({"s1": pa.array(p1, pa.string()),
                         "s2": pa.array(p2, pa.string())})

    distinct = ds.map_batches(distinct_keys, batch_format="pyarrow") \
        .groupby("s").aggregate(Count(alias_name="_c")) \
        .map_batches(variants, batch_format="pyarrow") \
        .sort(["vh", "sh"])
    part = finish_sorted_runs(
        distinct, key_col="vh", order_cols=["sh"],
        int_cols=["vh", "sh"], str_cols=["s"], kernel=kernel,
        empty_partial=_empty)
    if part.num_rows == 0:
        return _empty
    df = part.to_pandas().drop_duplicates().sort_values(["s1", "s2"])
    return pa.table({"s1": pa.array(df["s1"], pa.string()),
                     "s2": pa.array(df["s2"], pa.string())})


def source_overlap(ds, *, key_col: str = "source",
                   col: str = "text", prefix_len: int = 24,
                   min_len: int | None = None,
                   max_sources: int = 4096):
    """Cross-source DUPLICATION AUDIT — for every pair of sources,
    how many distinct content fingerprints (here: ``prefix_len``-char
    text prefixes) they share: the mirror-site / repackaged-dump
    detector a corpus curator runs before mixing sources (two sources
    sharing most of their fingerprints are one source counted
    twice). The SQL form is a fingerprint self-join; the engine never
    joins: distinct (fp, source) pairs (per-block Arrow distinct +
    ONE groupby), then ONE sort on the fp's stable hash groups each
    fingerprint's source set contiguously and a segment kernel
    (data/segments.py finish_sorted_runs) emits per-block
    (s1 < s2, n) pair-count partials — bounded by |sources|² per
    block, with the driver summing an O(blocks × sources²) table.
    EXACT under hash collisions: the fp STRING rides along and the
    kernel sub-groups each run by it, so colliding fingerprints
    split correctly instead of over-counting. A fingerprint shared
    by more than ``max_sources`` sources raises loudly (quadratic
    emission guard; |sources| is data-model-bounded). Returns a
    pa.Table (s1, s2, n_shared)."""
    from ray.data.aggregate import Count

    from .segments import finish_sorted_runs

    def distinct_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.schema.names:
            e = pa.array([], pa.string())
            return pa.table({"fp": e, "src": e})
        texts = b.column(col).to_pylist()
        srcs = b.column(key_col).to_pylist()
        lim = prefix_len if min_len is None else min_len
        ks = {(t[:prefix_len], s) for t, s in zip(texts, srcs)
              if t is not None and len(t) >= lim}
        if not ks:
            e = pa.array([], pa.string())
            return pa.table({"fp": e, "src": e})
        fps, ss = zip(*sorted(ks))
        return pa.table({"fp": pa.array(list(fps), pa.string()),
                         "src": pa.array(list(ss), pa.string())})
    distinct_pairs.__name__ = f"overlap_{key_col}_pairs"

    def hash_keys(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "fp" not in b.schema.names:
            e = pa.array([], pa.int64())
            return pa.table({"vh": e, "sh": e,
                             "fp": pa.array([], pa.string()),
                             "src": pa.array([], pa.string())})
        fps = b.column("fp").to_pylist()
        srcs = b.column("src").to_pylist()
        return pa.table({
            "vh": pa.array([_h63(f) for f in fps], pa.int64()),
            "sh": pa.array([_h63(s) for s in srcs], pa.int64()),
            "fp": b.column("fp"),
            "src": b.column("src")})
    hash_keys.__name__ = "overlap_hash_keys"

    _empty = pa.table({"s1": pa.array([], pa.string()),
                       "s2": pa.array([], pa.string()),
                       "n": pa.array([], pa.int64())})

    def kernel(cols) -> pa.Table:
        fp, src = cols["fp"], cols["src"]
        if fp.size == 0:
            return _empty
        counts: dict = {}
        ufp, inv = np.unique(fp, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(ufp.size + 1))
        for g in range(ufp.size):
            run = np.unique(src[order[bounds[g]:bounds[g + 1]]])
            if run.size > max_sources:
                raise ValueError(
                    f"source_overlap: fingerprint shared by "
                    f"{run.size} sources exceeds max_sources="
                    f"{max_sources}")
            for i in range(run.size):
                for j in range(i + 1, run.size):
                    p = (run[i], run[j])
                    counts[p] = counts.get(p, 0) + 1
        if not counts:
            return _empty
        items = sorted(counts.items())
        return pa.table({
            "s1": pa.array([a for (a, _), _n in items], pa.string()),
            "s2": pa.array([b2 for (_, b2), _n in items],
                           pa.string()),
            "n": pa.array([n for _, n in items], pa.int64())})

    merged = ds.map_batches(distinct_pairs, batch_format="pyarrow") \
        .groupby(["fp", "src"]).aggregate(Count(alias_name="_c")) \
        .map_batches(hash_keys, batch_format="pyarrow") \
        .sort(["vh", "sh"])
    part = finish_sorted_runs(
        merged, key_col="vh", order_cols=["sh"],
        int_cols=["vh", "sh"], str_cols=["fp", "src"],
        kernel=kernel, empty_partial=_empty)
    if part.num_rows == 0:
        return pa.table({"s1": pa.array([], pa.string()),
                         "s2": pa.array([], pa.string()),
                         "n_shared": pa.array([], pa.int64())})
    df = part.to_pandas().groupby(["s1", "s2"], as_index=False) \
        .n.sum().sort_values(["s1", "s2"])
    return pa.table({
        "s1": pa.array(df["s1"], pa.string()),
        "s2": pa.array(df["s2"], pa.string()),
        "n_shared": pa.array(df["n"].astype(np.int64), pa.int64())})
