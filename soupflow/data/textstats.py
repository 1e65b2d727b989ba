"""Text analysis operators over a documents table (doc_id, text, ...).

All stages are vectorized ``map_batches`` kernels (pandas/numpy inside,
Arrow at the boundary); nothing shuffles except the explicitly-marked
aggregates. Designed for the 100 TB path: pure per-row functions,
no driver-side loops, no materialization.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\s+")
# BPE-ish subword splitter: words, numbers, punctuation runs
# (RE2-compatible — no lookarounds — so Arrow's C++ kernel can run it)
_BPEISH_PAT = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
_BPEISH_RE = re.compile(_BPEISH_PAT)


def _text_array(batch: pa.Table, col: str = "text") -> pa.Array:
    arr = pc.fill_null(batch.column(col), "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _ws_tokens(arr: pa.Array):
    """Whitespace-split once (Arrow C++ kernel, Python str.split
    semantics modulo kept empty edge tokens) → (list offsets as numpy,
    flat token Array). Segment sums over any per-token predicate are
    then one cumsum + offset gather.

    GUARDED: pyarrow 16.1's utf8_split_whitespace RARELY misclassifies
    a whitespace char after a few hundred in-process invocations
    (~1 token in 300k on multibyte+mixed-whitespace fuzz text; the
    same array splits correctly in a fresh process — kernel-state
    bug, found by the randomized differential in
    tests/test_chunk_window_ops.py). A bad split leaves whitespace
    INSIDE a token, so one vectorized RE2 pass over the flat tokens
    detects it; on detection the batch re-tokenizes via Python
    str.split (rare — the guard, not the fallback, is the steady-state
    cost)."""
    toks = pc.utf8_split_whitespace(arr)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    # RE2 \s is ASCII-only; the splitter (and the Python fallback)
    # treat Unicode whitespace too, so the corruption guard must match
    # the full class or a misclassified U+3000/U+2028 inside a token
    # would go undetected (ADVICE r3).
    bad = pc.any(pc.match_substring_regex(
        flat, r"[\s\x{001C}-\x{001F}\x{0085}\p{Z}]")).as_py()
    if bad:
        pylists = [(s or "").split() for s in arr.to_pylist()]
        offs = np.zeros(len(pylists) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in pylists], out=offs[1:])
        flat = pa.array([w for p in pylists for w in p], pa.string())
        return offs, flat
    offs = toks.offsets.to_numpy()
    return offs - offs[0], flat


def _segment_sum(hits: np.ndarray, offs: np.ndarray) -> np.ndarray:
    cs = np.concatenate([np.zeros(1, np.int64),
                         np.cumsum(hits, dtype=np.int64)])
    return cs[offs[1:]] - cs[offs[:-1]]


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace), n_subtokens (BPE-ish regex),
    n_chars_measured, n_alpha (non-space chars).

    All counts are Arrow C++ kernels (RE2 regex count, whitespace
    split, substring count) — zero per-row Python."""
    arr = _text_array(batch)
    offs, flat = _ws_tokens(arr)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_tokens = _segment_sum(nonempty, offs)
    n_subtokens = pc.count_substring_regex(arr, _BPEISH_PAT) \
        .cast(pa.int64())
    n_chars = pc.utf8_length(arr).cast(pa.int64())
    # non-space chars, matching replace(" ", "").len semantics
    n_alpha = pc.subtract(n_chars,
                          pc.count_substring(arr, " ").cast(pa.int64()))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_subtokens": n_subtokens,
        "n_chars_measured": n_chars,
        "n_alpha": n_alpha,
    })


# small English stopword set for the stopword-ratio signal (public
# knowledge; fixed so the SQL oracle can embed the same list)
STOPWORDS = ("a", "an", "and", "are", "as", "at", "be", "by", "for",
             "from", "has", "in", "is", "it", "of", "on", "or", "that",
             "the", "to", "was", "were", "with")
_PUNCT_PAT = r"[!-/:-@\[-`{-~]"
_PUNCT_RE = re.compile(_PUNCT_PAT)
_STOPWORD_ARR = None  # lazy pa.array of STOPWORDS (per process)


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality signals: token count, mean token length ×100,
    punctuation ratio ×1000 (ASCII punctuation chars / chars),
    stopword ratio ×1000 (stopword tokens / tokens), and an is_quality
    flag (length in [5, 100000] tokens, mean token len ≤ 12).

    All Arrow C++ kernels: ONE whitespace split feeds both the token
    count and the stopword membership (is_in hash lookup over the flat
    token stream + cumsum segment sum) — zero per-row Python."""
    global _STOPWORD_ARR
    if _STOPWORD_ARR is None:
        _STOPWORD_ARR = pa.array(list(STOPWORDS))
    arr = _text_array(batch)
    offs, flat = _ws_tokens(arr)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_tokens = pd.Series(_segment_sum(nonempty, offs))
    n_chars_a = pc.utf8_length(arr).cast(pa.int64())
    n_alpha = pc.subtract(
        n_chars_a, pc.count_substring(arr, " ").cast(pa.int64())) \
        .to_numpy(zero_copy_only=False)
    n_chars = n_chars_a.to_numpy(zero_copy_only=False)
    mean_len_x100 = np.where(n_tokens > 0,
                             (n_alpha * 100) // n_tokens.clip(lower=1),
                             0).astype("int64")
    n_punct = pc.count_substring_regex(arr, _PUNCT_PAT) \
        .cast(pa.int64()).to_numpy(zero_copy_only=False)
    punct_x1000 = np.where(n_chars > 0,
                           (n_punct * 1000) // np.maximum(n_chars, 1),
                           0).astype("int64")
    hits = pc.is_in(flat, value_set=_STOPWORD_ARR) \
        .to_numpy(zero_copy_only=False)
    n_stop = _segment_sum(hits, offs)
    stop_x1000 = np.where(n_tokens > 0,
                          (n_stop * 1000) // n_tokens.clip(lower=1),
                          0).astype("int64")
    is_quality = (n_tokens >= 5) & (n_tokens <= 100000) & \
        (mean_len_x100 <= 1200)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "mean_token_len_x100": pa.array(mean_len_x100, pa.int64()),
        "punct_ratio_x1000": pa.array(punct_x1000, pa.int64()),
        "stopword_ratio_x1000": pa.array(stop_x1000, pa.int64()),
        "is_quality": pa.array(is_quality, pa.bool_()),
    })


_MOD61 = (1 << 61) - 1
_BASE = 257


def _mulmod61(a: np.ndarray, b) -> np.ndarray:
    """Vectorized (a*b) mod 2^61-1 for uint64 operands < 2^61.

    Splits both operands at bit 31 and folds with 2^61 ≡ 1 (mod M):
    a·b = a1·b1·2^62 + (a1·b0 + a0·b1)·2^31 + a0·b0, where
    2^62 ≡ 2 and mid·2^31 folds via mid = m1·2^30 + m0 →
    m1·2^61 + m0·2^31 ≡ m1 + m0·2^31. Every intermediate < 2^63."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    mask31 = np.uint64((1 << 31) - 1)
    mask30 = np.uint64((1 << 30) - 1)
    a1, a0 = a >> np.uint64(31), a & mask31
    b1, b0 = b >> np.uint64(31), b & mask31
    hi = a1 * b1  # < 2^60
    mid = a1 * b0 + a0 * b1  # < 2^62
    m1, m0 = mid >> np.uint64(30), mid & mask30
    x = (np.uint64(2) * hi + m1 + (m0 << np.uint64(31)) + a0 * b0)
    x = (x & np.uint64(_MOD61)) + (x >> np.uint64(61))
    x = (x & np.uint64(_MOD61)) + (x >> np.uint64(61))
    return np.where(x >= _MOD61, x - np.uint64(_MOD61), x)


# 7 bytes pack into one base-257 limb < 257^7 < 2^57 (exact in uint64)
_PACK = 7
_P7_SMALL = np.array([_BASE ** (\
    _PACK - 1 - i) for i in range(_PACK)], dtype=np.uint64)
_B7 = pow(_BASE, _PACK, _MOD61)  # limb base 257^7 mod M
_POW_B7 = np.array([1], dtype=np.uint64)  # B7^j mod M, grown on demand


def _powers7_desc(length: int) -> np.ndarray:
    """[B7^(L-1), ..., B7^0] mod 2^61-1 (per-worker cached table,
    grown by vectorized block doubling)."""
    global _POW_B7
    while _POW_B7.size < length:
        n = _POW_B7.size
        p_n = int(_mulmod61(_POW_B7[n - 1:n], np.uint64(_B7))[0])
        _POW_B7 = np.concatenate([_POW_B7,
                                  _mulmod61(_POW_B7, np.uint64(p_n))])
    return _POW_B7[:length][::-1]


def _rolling_hash(data: bytes) -> int:
    """Polynomial hash sum(b_i * 257^(L-1-i)) mod 2^61-1 — identical to
    the byte-at-a-time Horner loop, computed vectorized: bytes are
    front-zero-padded (value-preserving) and packed 7-per-limb in base
    257 (limb < 2^57, exact in uint64), one vectorized mulmod against
    the cached descending limb-base powers, then an O(log L) 8-wise
    folding-sum reduction (8 terms < 2^61 sum without overflow)."""
    L = len(data)
    if L == 0:
        return 0
    if L < 128:  # numpy overhead beats the loop only past ~128 bytes
        h = 0
        for b in data:
            h = (h * _BASE + b) % _MOD61
        return h
    pad = (-L) % _PACK
    buf = np.zeros(L + pad, dtype=np.uint64)
    buf[pad:] = np.frombuffer(data, dtype=np.uint8)
    g = buf.reshape(-1, _PACK)
    limbs = np.einsum("ij,j->i", g, _P7_SMALL)  # < 257^7 < 2^57
    terms = _mulmod61(limbs, _powers7_desc(limbs.size))
    mod = np.uint64(_MOD61)
    while terms.size > 1:
        pad8 = (-terms.size) % 8
        if pad8:
            terms = np.concatenate(
                [terms, np.zeros(pad8, np.uint64)])
        s = terms.reshape(-1, 8).sum(axis=1)  # 8×(2^61-1) < 2^64
        s = (s & mod) + (s >> np.uint64(61))  # < 2^61 + 7
        terms = np.where(s >= mod, s - mod, s)  # < M: safe next level
    return int(terms[0]) % _MOD61


def _rolling_hash_batch(texts: list) -> np.ndarray:
    """Batch-vectorized rolling hash: every document's bytes are packed
    into one limb buffer (each doc front-zero-padded to a limb
    boundary — value-preserving), ONE mulmod pass against per-limb
    descending powers, then segmented hi/lo split sums (reduceat stays
    exact: limb < 2^61 splits at bit 32, so per-doc partial sums fit
    uint64 for docs up to 2^29 limbs ≈ 3.7 GB). Per-doc work is all
    C-path; Python touches each doc only for the initial byte copy."""
    enc = [(t or "").encode() for t in texts]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    m = (lens + _PACK - 1) // _PACK  # limbs per doc
    out = np.zeros(len(enc), dtype=np.int64)
    nz = np.nonzero(m)[0]
    if nz.size == 0:
        return out
    m_nz = m[nz]
    total = int((m_nz * _PACK).sum())
    buf = np.zeros(total, dtype=np.uint64)
    starts = np.concatenate(
        [[0], np.cumsum(m_nz * _PACK)[:-1]]).astype(np.int64)
    for k, i in enumerate(nz):
        e = enc[i]
        s = starts[k] + (m[i] * _PACK - lens[i])  # front pad
        buf[s:s + lens[i]] = np.frombuffer(e, dtype=np.uint8)
    g = buf.reshape(-1, _PACK)
    limbs = np.einsum("ij,j->i", g, _P7_SMALL)  # < 257^7 < 2^57
    ends = np.cumsum(m_nz)
    seg = np.concatenate([[0], ends[:-1]]).astype(np.int64)
    doc_of = np.repeat(np.arange(nz.size), m_nz)
    pos = np.arange(limbs.size, dtype=np.int64) - seg[doc_of]
    exp = m_nz[doc_of] - 1 - pos  # descending power per limb
    _powers7_desc(int(m_nz.max()))  # ensure table (ascending index)
    terms = _mulmod61(limbs, _POW_B7[exp])
    mask32 = np.uint64((1 << 32) - 1)
    lo = np.add.reduceat(terms & mask32, seg)  # < m·2^32, exact
    hi = np.add.reduceat(terms >> np.uint64(32), seg)  # < m·2^29
    mod = np.uint64(_MOD61)
    two32 = np.uint64((1 << 32) % _MOD61)
    h = _mulmod61(hi % mod, two32) + lo % mod  # < 2^62
    h = (h & mod) + (h >> np.uint64(61))
    h = np.where(h >= mod, h - mod, h)
    out[nz] = h.astype(np.int64)
    return out


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprints: md5 (exact-dup key) + 61-bit polynomial
    rolling hash (batch-vectorized numpy — no per-byte Python loop)."""
    texts = batch.column("text").to_pylist()
    md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    rolling = _rolling_hash_batch(texts)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fp_md5": pa.array(md5s, pa.string()),
        "fp_rolling": pa.array(rolling, pa.int64()),
    })


# Character-trigram training corpus for language ID (byte trigrams of
# UTF-8 text — distinctive for both Latin-script languages and CJK).
# Small embedded corpus; real deployments would load fasttext-style
# profiles in the actor __init__ the same way.
_LANG_TRAIN = {
    "en": (
        "the quick brown fox jumps over the lazy dog",
        "a journey of a thousand miles begins with a single step",
        "to be or not to be that is the question we ask",
        "all that glitters is not gold said the wise man",
        "actions speak louder than words in every language",
        "the pen is mightier than the sword they say",
        "practice and patience make a person perfect in the end",
        "an ice cold morning makes the hard work feel easy",
        "every person should keep trying when things get hard",
        "people often say that experience is the best teacher",
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso",
        "en un lugar de la mancha de cuyo nombre no quiero acordarme",
        "más vale pájaro en mano que ciento volando por ahí",
        "no hay mal que por bien no venga dice el refrán",
        "quien mucho abarca poco aprieta según los mayores",
        "la pluma es más poderosa que la espada dicen",
        "la práctica hace al maestro con el paso del tiempo",
        "cada persona debe seguir intentando cuando algo es difícil",
        "la experiencia es la mejor maestra de la vida",
        "una mañana fría de hielo hace el trabajo duro más fácil",
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund",
        "aller anfang ist schwer aber übung macht den meister",
        "wer zuletzt lacht lacht am besten sagt man hier",
        "morgenstund hat gold im mund und das stimmt oft",
        "was du heute kannst besorgen das verschiebe nicht auf morgen",
        "die feder ist mächtiger als das schwert heißt es",
        "übung macht den meister mit der zeit und geduld",
        "jeder mensch sollte es weiter versuchen wenn etwas schwer ist",
        "erfahrung ist die beste lehrerin im ganzen leben",
        "ein eiskalter morgen macht die harte arbeit leichter",
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux",
        "petit à petit l'oiseau fait son nid dans l'arbre",
        "il ne faut pas vendre la peau de l'ours avant de l'avoir tué",
        "qui vivra verra dit le vieux proverbe français",
        "les bons comptes font les bons amis depuis toujours",
        "la plume est plus forte que l'épée dit on",
        "c'est en forgeant que l'on devient forgeron avec le temps",
        "chaque personne doit continuer d'essayer quand c'est difficile",
        "l'expérience est la meilleure des écoles de la vie",
        "un matin glacial rend le travail dur plus facile",
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了那只懒惰的狗",
        "千里之行始于足下这是古人的智慧",
        "三人行必有我师焉择其善者而从之",
        "学而时习之不亦说乎有朋自远方来",
        "温故而知新可以为师矣知之为知之",
        "笔比剑更有力量这句话流传很广",
        "熟能生巧只要坚持练习就会进步",
        "每个人遇到困难的时候都应该继续努力",
        "经验是人生中最好的老师要珍惜",
        "寒冷的早晨让辛苦的工作变得轻松",
    ),
}

# Held-out sentences per language (disjoint from _LANG_TRAIN): the
# lang_id query synthesizes per-row text from these by the row's
# declared lang, so `pred_lang = lang` is an exact SQL oracle while the
# detector genuinely generalizes (it never saw these sentences).
_LANG_TEST = {
    "en": (
        "the early bird catches the worm every single morning",
        "practice makes perfect when you keep trying hard",
        "a picture is worth a thousand words to the reader",
        "better late than never when the road is long",
    ),
    "es": (
        "a quien madruga dios le ayuda todas las mañanas",
        "el que mucho corre pronto para en el camino",
        "una imagen vale más que mil palabras para el lector",
        "más vale tarde que nunca cuando el camino es largo",
    ),
    "de": (
        "wer anderen eine grube gräbt fällt selbst hinein",
        "die katze lässt das mausen nicht so sagt man",
        "ein bild sagt mehr als tausend worte für den leser",
        "besser spät als nie wenn der weg lang ist",
    ),
    "fr": (
        "après la pluie vient toujours le beau temps",
        "les petits ruisseaux font les grandes rivières",
        "une image vaut mille mots pour le lecteur attentif",
        "mieux vaut tard que jamais quand la route est longue",
    ),
    "zh": (
        "水滴石穿绳锯木断坚持就是胜利",
        "冰冻三尺非一日之寒事情要慢慢来",
        "一图胜千言读者自然明白其中道理",
        "亡羊补牢为时未晚遇到问题要及时改正",
    ),
}


def synth_lang_text(lang: str, doc_id: int) -> str:
    """Deterministic held-out text in `lang`, varied by doc_id (three
    test sentences chosen by mixed-radix digits of the id)."""
    pool = _LANG_TEST[lang]
    m = len(pool)
    return " ".join(pool[(doc_id // (m ** k)) % m] for k in range(3))


class LangIdActor:
    """Language-ID stage: a byte-trigram Naive-Bayes profile model
    (add-0.5 smoothing) trained once per worker from the embedded
    corpus; scoring is fully vectorized across the batch — one
    sliding-window code array over the batch's concatenated UTF-8
    bytes, one np.unique, and one bincount per language. No per-row
    Python in the hot path."""

    def __init__(self) -> None:
        from collections import Counter
        self.langs = sorted(_LANG_TRAIN)
        counters = []
        for lang in self.langs:
            c: Counter = Counter()
            for s in _LANG_TRAIN[lang]:
                bs = s.encode("utf-8")
                for i in range(len(bs) - 2):
                    c[(bs[i] << 16) | (bs[i + 1] << 8) | bs[i + 2]] += 1
            counters.append(c)
        vocab = sorted(set().union(*counters))
        self.code_index = {code: i for i, code in enumerate(vocab)}
        n_langs = len(self.langs)
        self.W = np.zeros((len(vocab), n_langs))
        self.default = np.zeros(n_langs)
        for li, c in enumerate(counters):
            denom = sum(c.values()) + 0.5 * (len(vocab) + 1)
            self.default[li] = np.log(0.5 / denom)
            self.W[:, li] = self.default[li]
            for code, n in c.items():
                self.W[self.code_index[code], li] = \
                    np.log((n + 0.5) / denom)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        enc = [(t or "").encode("utf-8") for t in texts]
        n = len(enc)
        data = b"\x00\x00".join(enc)
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        n_langs = len(self.langs)
        scores = np.zeros((n, n_langs))
        counts = np.zeros(n, dtype=np.int64)
        if arr.size >= 3:
            codes = (arr[:-2] << 16) | (arr[1:-1] << 8) | arr[2:]
            # doc index per byte position (docs separated by 2 NULs)
            lens2 = np.array([len(e) + 2 for e in enc], dtype=np.int64)
            lens2[-1] -= 2
            doc_of = np.repeat(np.arange(n), lens2)[:codes.size]
            # drop windows that touch a separator byte
            valid = (arr[:-2] != 0) & (arr[1:-1] != 0) & (arr[2:] != 0)
            codes, doc_of = codes[valid], doc_of[valid]
            uniq, inv = np.unique(codes, return_inverse=True)
            rows = np.array([self.code_index.get(int(c), -1)
                             for c in uniq], dtype=np.int64)
            w = np.where((rows >= 0)[:, None],
                         self.W[rows.clip(min=0)],
                         self.default[None, :])  # (U, n_langs)
            contrib = w[inv]  # (T, n_langs)
            for li in range(n_langs):
                scores[:, li] = np.bincount(
                    doc_of, weights=contrib[:, li], minlength=n)
            counts = np.bincount(doc_of, minlength=n)
        pred = [self.langs[int(np.argmax(scores[i]))]
                if counts[i] > 0 else "und" for i in range(n)]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(pred, pa.string()),
        })


def lang_counts(ds):
    """Aggregate: docs per (declared) lang. Pre-aggregated per block
    before the small shuffle (combiner pattern)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("lang").aggregate([("doc_id", "count")])
        return t.rename_columns(["lang", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    return partials.groupby("lang").aggregate(Sum("n", alias_name="n"))


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per doc: n_tokens (whitespace),
    n_distinct tokens, top_count (occurrences of the most frequent
    token). High top_count/n_tokens or low n_distinct/n_tokens marks
    degenerate/repetitive documents.

    Vectorized across the whole batch: ONE np.unique factorizes the
    flat token stream, a second np.unique over combined
    (doc, token-code) int64 keys yields per-doc-per-token counts, and
    segment reduces (bincount / maximum.reduceat) collapse them to doc
    level — no per-row Python."""
    arr = _text_array(batch)
    offs, flat = _ws_tokens(arr)
    n = batch.num_rows
    flat_np = np.asarray(flat.to_pandas(), dtype=object)
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    nonempty = flat_np != ""
    seg_ne = seg[nonempty]
    codes = np.unique(flat_np[nonempty], return_inverse=True)[1]
    vocab = int(codes.max()) + 1 if codes.size else 1
    pair_keys, pair_counts = np.unique(seg_ne * vocab + codes,
                                       return_counts=True)
    pair_seg = pair_keys // vocab
    n_distinct = np.bincount(pair_seg, minlength=n)
    n_tokens = np.bincount(seg_ne, minlength=n)
    top = np.zeros(n, dtype=np.int64)
    if pair_seg.size:
        starts = np.nonzero(np.r_[True, pair_seg[1:] != pair_seg[:-1]])[0]
        top[pair_seg[starts]] = np.maximum.reduceat(pair_counts, starts)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_distinct": pa.array(n_distinct.astype(np.int64), pa.int64()),
        "top_count": pa.array(top, pa.int64()),
    })


def bigram_topk(docs, k: int = 20):
    """Corpus-wide top-k word bigrams: per-batch np.unique partial
    counts (the combiner — only distinct (bigram, n) partials leave
    the task, never the token stream), ONE groupby(bigram) sum, then
    a k-row sort. Ties at the cut break by bigram text so the result
    is deterministic."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        arr = _text_array(batch)
        offs, flat = _ws_tokens(arr)
        toks = np.asarray(flat.to_pandas(), dtype=object)
        seg = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                        np.diff(offs))
        keep = toks != ""
        toks, seg = toks[keep], seg[keep]
        if toks.size < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = seg[:-1] == seg[1:]
        bigrams = toks[:-1][same] + " " + toks[1:][same]
        vals, counts = np.unique(bigrams, return_counts=True)
        return pa.table({
            "bigram": pa.array(vals, pa.string()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })
    partial.__name__ = "bigram_partial"

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n")) \
        .sort(["n", "bigram"], descending=[True, False]).limit(k)


def unigram_logprob(ds, text_col: str = "text",
                    id_col: str = "doc_id", join: str = "broadcast",
                    num_partitions: int = 16):
    """CCNet-style language-model quality score: for each doc, the
    average negative log-probability of its tokens under the CORPUS
    unigram distribution → (doc_id, n_tokens, avg_nll). Low avg_nll =
    typical-language doc; high = rare-token noise — the standard
    perplexity-bucket filter, with the corpus itself as the LM.

    Scale shape: pass 1 reduces the corpus to a narrow (term, count)
    table (np.unique partials + ONE groupby); the log-prob table is
    broadcast once (vocabulary-bounded — hash terms to uint64 or
    partition-join for open-web vocabularies). Pass 2 scores map-side
    with one searchsorted gather + segment sums; docs with zero
    tokens drop out (matching the SQL join semantics).

    ``join="partitioned"``: the overflow path for vocabularies beyond
    driver memory — the (doc, term, count) narrow stream hash-joins
    the distributed (term, count) table on term, per-token NLL is
    summed by ONE groupby(doc); only narrow rows ever shuffle (text
    never does). Summation order differs from the broadcast path, so
    results agree to fp round-off, not bit-exactly."""
    import ray
    from ray.data.aggregate import Sum

    from ..io import collect_table

    def tf_partial(batch: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(_text_array(batch, text_col))
        _, flat = _ws_tokens(arr)
        toks = flat.to_numpy(zero_copy_only=False)
        toks = toks[toks != ""]
        uniq, counts = np.unique(toks, return_counts=True)
        return pa.table({"term": pa.array(uniq, pa.string()),
                         "n": pa.array(counts.astype(np.int64),
                                       pa.int64())})
    tf_partial.__name__ = "unigram_tf_partial"

    if join == "partitioned":
        # Materialize ONCE: tf_ds feeds both the total-sum below and
        # the join — without this the corpus tokenize+groupby lineage
        # executes twice.
        tf_ds = ds.map_batches(tf_partial, batch_format="pyarrow") \
            .groupby("term").aggregate(Sum("n", alias_name="n")) \
            .repartition(num_partitions) \
            .materialize()  # non-empty blocks for join
        total = float(tf_ds.sum("n"))

        def doc_term(batch: pa.Table) -> pa.Table:
            arr = pc.utf8_lower(_text_array(batch, text_col))
            offs, flat = _ws_tokens(arr)
            toks = flat.to_numpy(zero_copy_only=False)
            doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64),
                                np.diff(offs))
            keep = toks != ""
            toks, doc_idx = toks[keep], doc_idx[keep]
            uniq, codes = np.unique(toks, return_inverse=True)
            pair = doc_idx * max(len(uniq), 1) + codes
            upair, cnt = np.unique(pair, return_counts=True)
            nu = max(len(uniq), 1)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": pa.array(ids[upair // nu], pa.int64()),
                "term": pa.array(uniq[upair % nu], pa.string()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            })
        doc_term.__name__ = "doc_term_counts"

        joined = ds.map_batches(doc_term, batch_format="pyarrow") \
            .join(tf_ds, join_type="inner",
                  num_partitions=num_partitions, on=("term",))

        def contrib(batch: pa.Table) -> pa.Table:
            cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
            n = batch.column("n").to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(cnt, pa.int64()),
                "nll": pa.array(cnt * -np.log(n / total),
                                pa.float64()),
            })

        agg = joined.map_batches(contrib, batch_format="pyarrow") \
            .groupby("doc_id").aggregate(
                Sum("n_tokens", alias_name="n_tokens"),
                Sum("nll", alias_name="nll"))

        def finish(batch: pa.Table) -> pa.Table:
            nt = batch.column("n_tokens").to_numpy(
                zero_copy_only=False)
            s = batch.column("nll").to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(nt, pa.int64()),
                "avg_nll": pa.array(s / nt, pa.float64()),
            })

        return agg.map_batches(finish, batch_format="pyarrow")

    tf_tbl = collect_table(
        ds.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("term").aggregate(Sum("n", alias_name="n")))
    if tf_tbl.num_columns:
        terms = np.asarray(tf_tbl.column("term").to_pylist())
        ns = tf_tbl.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        order = np.argsort(terms)
        terms, ns = terms[order], ns[order]
        total = float(ns.sum())
        logp = np.log(ns / total)
    else:
        terms = np.array([], dtype=object)
        logp = np.array([], dtype=np.float64)
    handle = ray.put((terms, logp))

    def score(batch: pa.Table) -> pa.Table:
        vocab, lp = ray.get(handle)
        arr = pc.utf8_lower(_text_array(batch, text_col))
        offs, flat = _ws_tokens(arr)
        toks = flat.to_numpy(zero_copy_only=False)
        nonempty = toks != ""
        toks = toks[nonempty]
        # Bounds+equality-guarded gather: an out-of-vocab token (only
        # possible when scoring a corpus the vocab wasn't built on)
        # drops out of BOTH the count and the NLL sum, matching the
        # partitioned path's inner-join semantics — never IndexError.
        if vocab.size:
            pos = np.minimum(np.searchsorted(vocab, toks),
                             vocab.size - 1)
            inv = vocab[pos] == toks
        else:
            inv = np.zeros(toks.size, dtype=bool)
        invocab_full = nonempty.copy()
        invocab_full[nonempty] = inv
        n_tok = _segment_sum(invocab_full, offs)
        tok_nll = np.zeros(toks.size, dtype=np.float64)
        if vocab.size:
            tok_nll[inv] = -lp[pos[inv]]
        nll_sum = _segment_sum_float(tok_nll, nonempty, offs)
        keep = n_tok > 0
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(n_tok[keep], pa.int64()),
            "avg_nll": pa.array(nll_sum[keep] / n_tok[keep],
                                pa.float64()),
        })
    score.__name__ = "unigram_nll"

    return ds.map_batches(score, batch_format="pyarrow")


def _segment_sum_float(vals: np.ndarray, mask: np.ndarray,
                       offs: np.ndarray) -> np.ndarray:
    """Per-doc sums of ``vals`` (defined on mask-true tokens) given
    the full token offsets: scatter back through the mask cumsum."""
    full = np.zeros(mask.size, dtype=np.float64)
    full[mask] = vals
    cs = np.concatenate([np.zeros(1, np.float64),
                         np.cumsum(full, dtype=np.float64)])
    return cs[offs[1:]] - cs[offs[:-1]]
