"""Ray-level pipeline tests: map_batches extraction, manifest resume,
dedup/similarity/textstats operators (one Ray session per pytest run)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def interleaved_dir(tmp_path_factory, ray_session):
    from soupflow.fixtures import docs_to_interleaved
    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 120)
    tbl = docs_to_interleaved(docs, rich=True)
    d = tmp_path_factory.mktemp("interleaved")
    for i in range(3):
        pq.write_table(tbl.slice(i * 40, 40), str(d / f"in-{i}.parquet"))
    return str(d)


def test_run_extract_with_manifest_and_resume(interleaved_dir, tmp_path,
                                              ray_session):
    from soupflow.pipeline import completed_partitions, run_extract
    out = str(tmp_path / "out")
    manifests = run_extract(interleaved_dir, out, files_per_partition=1,
                            concurrency=2, batch_size=32)
    assert len(manifests) == 3
    assert all(m["status"] == "done" for m in manifests)
    assert completed_partitions(out) == {0, 1, 2}
    total = sum(m["row_count"] for m in manifests)
    assert total == 120
    # resume: nothing left to do
    again = run_extract(interleaved_dir, out, files_per_partition=1)
    assert again == []
    # drop one manifest -> only that partition reruns
    os.remove(os.path.join(out, "manifest", "00001.json"))
    third = run_extract(interleaved_dir, out, files_per_partition=1,
                        concurrency=2, batch_size=32)
    assert len(third) == 1 and third[0]["partition_id"] == 1


def test_default_read_blocks_regimes():
    from soupflow.pipeline import default_read_blocks
    # toy corpus: docs/task dominates — 320k docs -> 128 tasks at 32
    # CPUs (4 waves/slot), never fewer than one task per slot
    assert default_read_blocks(320_000, 400 << 20, 32) == 128
    assert default_read_blocks(20_000, 25 << 20, 32) == 32
    # huge-document corpus: byte cap dominates (1M docs of ~1 MB each
    # must not form 2.5 GB blocks)
    assert default_read_blocks(1_000_000, 1 << 40, 32) == (1 << 40) // (128 << 20)
    # degenerate inputs stay positive
    assert default_read_blocks(0, 0, 8) == 8
    assert default_read_blocks(10, 1000, 0) == 1


def test_extract_output_schema(interleaved_dir, tmp_path, ray_session):
    import ray.data
    from soupflow.extract import SPAN_STRUCT, ExtractActor
    ds = ray.data.read_parquet(interleaved_dir)
    out = ds.map_batches(ExtractActor, batch_format="pyarrow",
                         batch_size=32, concurrency=2)
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow")))
    assert tbl.num_rows == 120
    assert tbl.schema.field("spans").type == pa.list_(SPAN_STRUCT)


def test_exact_dedup_finds_duplicates(ray_session):
    import ray.data
    from soupflow.data.dedup import exact_dedup_groups
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["same text", "same text", "other", "same text"],
    })
    ds = ray.data.from_arrow(tbl)
    groups = {r["fp"]: r for r in exact_dedup_groups(ds).take_all()}
    ns = sorted(r["n"] for r in groups.values())
    assert ns == [1, 3]
    big = [r for r in groups.values() if r["n"] == 3][0]
    assert big["keeper_id"] == 1


def test_minhash_near_dups_finds_planted_pair(ray_session):
    import ray.data
    from soupflow.data.dedup import minhash_near_dups
    base = ("the quick brown fox jumps over the lazy dog again and "
            "again every single day without fail " * 3)
    near = base.replace("lazy", "sleepy")
    far = "completely different content about databases and planes " * 4
    tbl = pa.table({
        "doc_id": pa.array([10, 20, 30], pa.int64()),
        "text": [base, near, far],
    })
    dups = minhash_near_dups(ray.data.from_arrow(tbl)).take_all()
    pairs = {(r["doc_id"], r["dup_of"]) for r in dups}
    assert (20, 10) in pairs
    assert all(d != 30 for d, _ in pairs)


def test_simhash_near_dups_finds_planted_pair(ray_session):
    """Planted pair at hamming 1 (one word of 120 substituted) must be
    found at max_hamming=3 — the regime where the 6-choose-3 block
    pigeonhole guarantees full recall."""
    import ray.data
    from soupflow.data.dedup import simhash_near_dups
    words = [f"w{i:03d}" for i in range(120)]
    base = " ".join(words)
    near = " ".join(w if i != 1 else "x001"
                    for i, w in enumerate(words))
    far = "unrelated words entirely here nothing shared at all " * 6
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, near, far],
    })
    dups = simhash_near_dups(ray.data.from_arrow(tbl),
                             max_hamming=3).take_all()
    pairs = {(r["doc_id"], r["dup_of"]) for r in dups}
    assert (2, 1) in pairs
    assert all(d != 3 and p != 3 for d, p in pairs)


def test_brute_force_topk_matches_numpy(ray_session):
    import numpy as np
    import ray.data
    from soupflow.data.similarity import brute_force_topk
    rng = np.random.RandomState(42)
    vecs = rng.randn(50, 8).astype("float32")
    tbl = pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl)
    result = brute_force_topk(ds, query_ids=[0], k=5).take_all()
    got = [r["neighbor_id"] for r in
           sorted(result, key=lambda r: r["rank"])]
    v = vecs.astype("float64")
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = v @ v[0]
    sims[0] = -np.inf
    want = np.argsort(-sims, kind="stable")[:5].tolist()
    assert got == want


def test_ngram_jaccard():
    from soupflow.data.dedup import ngram_jaccard
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0
    mid = ngram_jaccard("a b c d e f", "a b c d e g")
    assert 0.0 < mid < 1.0


def test_multimodal_decode_fake(ray_session):
    import ray.data
    from soupflow.data.multimodal import MediaDecodeActor
    tbl = pa.table({
        "media_ref": ["m://1", "m://2"],
        "kind": ["image", "audio"],
        "payload": pa.array([b"abcdef", b""], pa.binary()),
        "content_type": ["image/fake", "audio/fake"],
    })
    ds = ray.data.from_arrow(tbl)
    out = ds.map_batches(MediaDecodeActor, batch_format="pyarrow",
                         concurrency=1,
                         fn_constructor_kwargs={"mode": "fake"}) \
        .take_all()
    by_ref = {r["media_ref"]: r for r in out}
    assert by_ref["m://1"]["n_bytes"] == 6
    assert by_ref["m://2"]["n_bytes"] == 0
    assert len(by_ref["m://1"]["features"]) == 16


def test_multimodal_real_decode_oracle_stats():
    """MediaStatsActor on the closed-form payloads reproduces the
    exact integer sums the SQL oracle computes (one image + one audio
    row, decoded by the from-scratch codecs)."""
    from soupflow.data.multimodal import (MediaStatsActor,
                                          real_media_from_documents)
    docs = pa.table({"doc_id": pa.array([5], pa.int64())})
    media = real_media_from_documents(docs)
    rows = {r["kind"]: r for r in MediaStatsActor()(media).to_pylist()}
    d, w, h, n = 5, 13, 4, 69
    import numpy as np
    y, x = np.mgrid[0:h, 0:w]
    assert rows["image"]["width"] == w and rows["image"]["height"] == h
    assert rows["image"]["sum_r"] == int(((3*x + 5*y + d) % 256).sum())
    assert rows["image"]["sum_g"] == int(((x + 2*y + 7*d) % 256).sum())
    assert rows["image"]["sum_b"] == int(((x*y + 11*d) % 256).sum())
    i = np.arange(n)
    samples = (31*d + 17*i) % 65536 - 32768
    assert rows["audio"]["n_samples"] == n
    assert rows["audio"]["sample_rate"] == 16000
    assert rows["audio"]["amp_sum"] == int(samples.sum())
    assert rows["audio"]["amp_max"] == int(samples.max())


def test_token_stats_batch():
    from soupflow.data.textstats import token_stats_batch
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": ["hello world foo"]})
    out = token_stats_batch(tbl).to_pylist()[0]
    assert out["n_tokens"] == 3
    assert out["n_chars_measured"] == 15
    assert out["n_alpha"] == 13


def test_ngram_jaccard_near_dups_finds_planted_pair(ray_session):
    import ray.data

    from soupflow.data.dedup import ngram_jaccard_near_dups
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet field toward the distant hill")
    rows = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " tonight"},  # near-dup of 1
            {"doc_id": 3, "text": "completely different words here "
                                  "about gardens and rivers and stone"}]
    ds = ray.data.from_items(rows)
    out = {r["doc_id"]: r for r in
           ngram_jaccard_near_dups(ds, threshold=0.5).take_all()}
    assert 2 in out and out[2]["dup_of"] == 1
    assert out[2]["jaccard_x100"] >= 50
    assert 3 not in out


def test_embed_near_dups_exact_and_lsh(ray_session):
    import numpy as np
    import ray.data

    from soupflow.data.similarity import (embed_near_dups,
                                          embed_near_dups_lsh)
    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((30, 16))
    vecs[11] = vecs[10] + 0.01 * rng.standard_normal(16)  # planted dup
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(30)]
    ds = ray.data.from_items(rows)

    exact = {(r["id_a"], r["id_b"])
             for r in embed_near_dups(ds, threshold=0.95).take_all()}
    assert (10, 11) in exact

    lsh = {(r["id_a"], r["id_b"])
           for r in embed_near_dups_lsh(ds, threshold=0.95).take_all()}
    assert (10, 11) in lsh
    assert lsh <= exact  # LSH verifies exactly, so no false positives


def test_xml_extract_query(ray_session):
    from soupflow.queries import QUERIES
    rows = QUERIES["xml_extract"](SF).take_all()
    assert len(rows) == 500
    assert all(r["lang_attr"] for r in rows)


def test_top_docs_sorted(ray_session):
    from soupflow.queries import QUERIES
    rows = QUERIES["top_docs"](SF).take_all()
    assert len(rows) == 10
    chars = [r["n_chars"] for r in rows]
    assert chars == sorted(chars, reverse=True)


def test_salted_extract_matches_unsalted(interleaved_dir, tmp_path,
                                         ray_session):
    """Skew salting (cost-hint salt + shuffle) must not change results,
    only block placement."""
    from soupflow.pipeline import run_extract
    plain = str(tmp_path / "plain")
    salted = str(tmp_path / "salted")
    run_extract(interleaved_dir, plain, files_per_partition=3)
    run_extract(interleaved_dir, salted, files_per_partition=3,
                salt_buckets=4)
    import ray.data

    def spans_by_doc(out):
        rows = ray.data.read_parquet(f"{out}/parts/00000").take_all()
        return {r["doc_id"]: r["spans"] for r in rows}

    a, b = spans_by_doc(plain), spans_by_doc(salted)
    assert a.keys() == b.keys()
    assert a == b


def test_sessionize_oracle_parity(ray_session):
    from soupflow.queries import QUERIES
    rows = {r["user_id"]: r["n_sessions"]
            for r in QUERIES["sessionize"](SF).take_all()}
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = dict(con.execute(
        "SELECT user_id, 1 + sum(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)"
        " FROM (SELECT user_id, epoch(ts) - lag(epoch(ts)) OVER "
        "(PARTITION BY user_id ORDER BY ts) AS gap FROM events) "
        "GROUP BY user_id").fetchall())
    assert rows == want


def test_kmeans_converges_and_covers(ray_session):
    import numpy as np
    import ray.data

    from soupflow.data.similarity import kmeans
    rng = np.random.RandomState(3)
    # two well-separated blobs; ids 0/1 land in different blobs so the
    # deterministic first-k init starts one centroid in each
    a = rng.standard_normal((40, 8)) + 10
    b = rng.standard_normal((40, 8)) - 10
    vecs = np.empty((80, 8))
    vecs[0::2] = a
    vecs[1::2] = b
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(80)]
    cents, assigns = kmeans(ray.data.from_items(rows), k=2, iters=5)
    got = {r["vec_id"]: r["cluster"] for r in assigns.take_all()}
    evens = {got[i] for i in range(0, 80, 2)}
    odds = {got[i] for i in range(1, 80, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
    # centroids ended near the blob means
    dist = min(np.linalg.norm(cents[0] - a.mean(0)),
               np.linalg.norm(cents[0] - b.mean(0)))
    assert dist < 1.0


def test_crashed_partition_does_not_double_count(tmp_path, ray_session):
    """A partition that crashed mid-write (partial parquet, no manifest)
    must be cleanly rewritten on resume, not appended to."""
    import pyarrow.parquet as pq

    from soupflow.fixtures import docs_to_interleaved
    from soupflow.pipeline import run_extract
    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 100)
    tbl = docs_to_interleaved(docs, rich=True)
    d = str(tmp_path / "in")
    o = str(tmp_path / "out")
    os.makedirs(d)
    pq.write_table(tbl, f"{d}/in.parquet")
    # simulate the crash: partial output exists, manifest does not
    os.makedirs(f"{o}/parts/00000", exist_ok=True)
    pq.write_table(tbl.slice(0, 40), f"{o}/parts/00000/stale.parquet")
    m = run_extract(d, o)
    assert m[0]["row_count"] == 100


def test_strict_kernel_resume_invalidates_stale_partitions(tmp_path,
                                                           ray_session):
    import pyarrow.parquet as pq

    from soupflow.fixtures import docs_to_interleaved
    from soupflow.pipeline import completed_partitions, run_extract
    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 60)
    tbl = docs_to_interleaved(docs, rich=True)
    d = str(tmp_path / "in")
    o = str(tmp_path / "out")
    os.makedirs(d)
    pq.write_table(tbl, f"{d}/in.parquet")
    run_extract(d, o)
    # default resume: done
    assert run_extract(d, o) == []
    # tamper the recorded kernel version -> strict resume reprocesses
    mpath = os.path.join(o, "manifest", "00000.json")
    m = json.load(open(mpath))
    m["kernel_version"] = "stale000000"
    json.dump(m, open(mpath, "w"))
    assert completed_partitions(o, "current") == set()
    redone = run_extract(d, o, strict_kernel=True)
    assert len(redone) == 1 and redone[0]["row_count"] == 60
    # non-strict resume still trusts the manifest
    assert run_extract(d, o) == []


def test_media_resize_and_frame_sample_stages(ray_session):
    import ray.data

    from soupflow.data.multimodal import (FrameSampleActor,
                                          MediaDecodeActor,
                                          MediaResizeActor,
                                          media_table_from_documents)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet").limit(40)
    media = docs.map_batches(media_table_from_documents,
                             batch_format="pyarrow")
    resized = media.map_batches(
        MediaResizeActor, batch_format="pyarrow", batch_size=16,
        concurrency=2,
        fn_constructor_kwargs={"target_w": 8, "target_h": 8}) \
        .materialize()  # release the pool: two chained fixed-size
    # pools would claim all 4 test CPUs and starve the read stage
    rows = resized.take_all()
    assert len(rows) == 40
    assert all(len(r["payload"]) == 64 and r["width"] == 8 for r in rows)
    # resized payloads still flow into the decode/feature stage
    feats = resized.map_batches(
        MediaDecodeActor, batch_format="pyarrow", batch_size=16,
        concurrency=2, fn_constructor_kwargs={"mode": "fake"}).take_all()
    assert all(len(f["features"]) == 16 for f in feats)

    frames = media.map_batches(
        FrameSampleActor, batch_format="pyarrow", batch_size=16,
        concurrency=2, fn_constructor_kwargs={"n_frames": 4}).take_all()
    assert len(frames) == 160  # 1 -> 4 row expansion
    assert {f["frame_index"] for f in frames} == {0, 1, 2, 3}


def test_media_real_modes():
    """PNG/WAV/AVI real modes are all implemented via the from-scratch
    codecs — no stub remains in the multimodal module."""
    import numpy as np
    import pyarrow as pa

    from soupflow.data.codecs import avi_decode, png_decode, png_encode
    from soupflow.data.multimodal import (FrameSampleActor,
                                          MediaDecodeActor,
                                          MediaResizeActor,
                                          audio_payload_for_doc,
                                          image_payload_for_doc,
                                          video_payload_for_doc)

    # real frame sampling: AVI decode -> even sample -> PNG frames
    vid = video_payload_for_doc(6)           # nf=6+... -> 4+6%4=6
    frames, fps = avi_decode(vid)
    vb = pa.table({"media_ref": pa.array(["v"], pa.string()),
                   "payload": pa.array([vid], pa.binary())})
    out = FrameSampleActor(n_frames=3, mode="real")(vb).to_pylist()
    assert [r["frame_index"] for r in out] == [0, 1, 2]
    for i, r in enumerate(out):
        src = (i * frames.shape[0]) // 3
        assert np.array_equal(png_decode(r["payload"]), frames[src])

    # real resize: decode -> nearest-neighbor -> re-encode round-trips
    img = np.arange(10 * 12 * 3, dtype=np.uint8).reshape(10, 12, 3)
    batch = pa.table({
        "media_ref": pa.array(["m"], pa.string()),
        "payload": pa.array([png_encode(img, "mixed")], pa.binary()),
    })
    out = MediaResizeActor(target_w=6, target_h=5,
                           mode="real")(batch).to_pylist()[0]
    small = png_decode(out["payload"])
    assert small.shape == (5, 6, 3)
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(6) * 12) // 6
    assert np.array_equal(small, img[ys][:, xs])

    # real decode: feature histogram computed over DECODED values
    b2 = pa.table({
        "media_ref": pa.array(["i", "a"], pa.string()),
        "kind": pa.array(["image", "audio"], pa.string()),
        "payload": pa.array([image_payload_for_doc(3, 8, 5),
                             audio_payload_for_doc(3, 70)],
                            pa.binary()),
    })
    feats = MediaDecodeActor(mode="real")(b2).to_pylist()
    assert all(len(f["features"]) == 16 for f in feats)
    assert all(abs(sum(f["features"]) - 1.0) < 1e-5 for f in feats)


def test_distributed_extraction_matches_single_process(ray_session):
    """SURVEY §2.10 determinism: the distributed pipeline (many blocks,
    arbitrary task order, shuffled input) produces byte-identical span
    sequences to the single-process kernel for every conformance doc."""
    import ray.data

    from soupflow.extract import ExtractActor, extract_batch
    from soupflow.fixtures import conformance_table
    tbl = conformance_table()
    expected = {r["doc_id"]: r["spans"]
                for r in ExtractActor()(tbl).to_pylist()}

    ds = ray.data.from_arrow(tbl).repartition(13) \
        .random_shuffle(seed=7) \
        .map_batches(extract_batch, batch_format="pyarrow",
                     batch_size=17)
    got = {r["doc_id"]: r["spans"] for r in ds.take_all()}
    assert got.keys() == expected.keys()
    assert got == expected


def test_minhash_partitioned_join_matches_broadcast(ray_session):
    """The distributed hash-join escape hatch (for keeper maps too big
    to broadcast) must produce exactly the broadcast path's result."""
    import pyarrow.parquet as pq
    import ray.data
    from soupflow.data.dedup import minhash_near_dups
    docs = pq.read_table(f"{SF}/documents.parquet")
    ds = ray.data.from_arrow(docs)
    a = sorted((r["doc_id"], r["dup_of"]) for r in
               minhash_near_dups(ds, join="broadcast").take_all())
    ds2 = ray.data.from_arrow(docs)
    b = sorted((r["doc_id"], r["dup_of"]) for r in
               minhash_near_dups(ds2, join="partitioned",
                                 num_partitions=4).take_all())
    assert a == b and len(a) > 0


def test_sessionize_vectorized_boundary_stitching(ray_session):
    """Session gaps that straddle block boundaries must be counted
    exactly once (the hierarchical stitch's whole job). Forces many
    tiny blocks so users split across blocks."""
    import numpy as np
    import ray.data
    from soupflow.data.windows import sessionize
    rng = np.random.RandomState(3)
    rows = []
    expect = {}
    base = np.datetime64("2025-01-01T00:00:00", "ns")
    for uid in range(20):
        t = base + np.timedelta64(uid, "h")
        sessions = 1
        for i in range(rng.randint(5, 40)):
            if i > 0 and rng.rand() < 0.25:
                t += np.timedelta64(31, "m")  # new session
                sessions += 1
            else:
                t += np.timedelta64(rng.randint(1, 20), "m")
            rows.append({"user_id": uid, "ts": t.astype(object)})
        expect[uid] = sessions
    rng.shuffle(rows)
    ds = ray.data.from_items(rows).repartition(13)  # split users
    got = {r["user_id"]: r["n_sessions"]
           for r in sessionize(ds).take_all()}
    assert got == expect


def test_jaccard_components_chain(ray_session):
    """A chain A~B~C (A and C NOT directly similar) must land in one
    component — exactly what pairwise min-dup_of cannot express."""
    import ray.data
    from soupflow.data.dedup import jaccard_components
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")
    words = base.split()
    mid = " ".join(words[2:] + ["extra", "tokens"])      # ~B: near A
    far = " ".join(words[4:] + ["extra", "tokens", "more", "words"])
    other = "totally unrelated content about rivers and stones " * 3
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
        "text": [base, mid, far, other],
    })
    out = {r["doc_id"]: r["component"] for r in jaccard_components(
        ray.data.from_arrow(tbl), threshold=0.5).take_all()}
    assert out[1] == out[2] == 1
    assert out[9] == 9
    # 3 joins the chain iff it is near 2 (construction-dependent), but
    # every doc must be labeled
    assert set(out) == {1, 2, 3, 9}


def test_exact_dedup_keep_first_across_batches(ray_session):
    """Duplicate runs straddling sorted-batch boundaries must still
    keep exactly the min-doc_id row per distinct text (the boundary
    fix-up's whole job)."""
    import ray.data
    from soupflow.data.dedup import exact_dedup
    texts = [f"text {i % 23}" for i in range(400)]
    tbl = pa.table({"doc_id": pa.array(range(400), pa.int64()),
                    "text": texts})
    out = exact_dedup(ray.data.from_arrow(tbl).repartition(9)) \
        .take_all()
    got = sorted((r["text"], r["doc_id"]) for r in out)
    assert got == sorted((f"text {k}", k) for k in range(23))


def test_exact_dedup_partitioned_matches_broadcast(ray_session):
    """The distributed (join="partitioned") escape hatch must keep the
    exact same rows as the broadcast dup-map path."""
    import ray.data
    from soupflow.data.dedup import exact_dedup
    texts = [f"text {i % 23}" for i in range(400)]
    tbl = pa.table({"doc_id": pa.array(range(400), pa.int64()),
                    "text": texts})
    ds = ray.data.from_arrow(tbl).repartition(9)
    bc = sorted((r["text"], r["doc_id"], r["fp"])
                for r in exact_dedup(ds).take_all())
    pt = sorted((r["text"], r["doc_id"], r["fp"])
                for r in exact_dedup(ds, join="partitioned",
                                     num_partitions=4).take_all())
    assert bc == pt
    assert [t for t, _, _ in bc] == sorted(f"text {k}" for k in range(23))


def _high_dup_corpus():
    """High-dup synthetic corpus: every third base doc gets a near-dup
    variant, so dup clusters are dense (the regime where broadcast
    maps would be largest relative to the corpus)."""
    base = [f"the quick brown fox jumps over the lazy dog {i} extra "
            "words here for shingles and stable simhash bits"
            for i in range(60)]
    ids, texts, did = [], [], 0
    for i, b in enumerate(base):
        ids.append(did); texts.append(b); did += 1
        if i % 3 == 0:
            ids.append(did); texts.append(b + " tail"); did += 1
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": texts})


def test_simhash_partitioned_matches_broadcast(ray_session):
    """The fully-distributed simhash verify (inner-join candidate
    filter + per-bucket groupby popcount) must emit exactly the
    broadcast member-map path's (doc_id, dup_of) rows."""
    import ray.data
    from soupflow.data.dedup import simhash_near_dups
    tbl = _high_dup_corpus()
    bc = sorted((r["doc_id"], r["dup_of"]) for r in
                simhash_near_dups(ray.data.from_arrow(tbl)).take_all())
    pt = sorted((r["doc_id"], r["dup_of"]) for r in
                simhash_near_dups(ray.data.from_arrow(tbl),
                                  join="partitioned",
                                  num_partitions=4).take_all())
    assert bc == pt and len(bc) > 0


def test_components_partitioned_matches_broadcast(ray_session):
    """Distributed min-label propagation must produce the same
    component labels as the driver-side union-find, including
    transitive chains and singleton self-labels."""
    import pandas as pd
    import ray.data
    from soupflow.data.dedup import components_from_pairs
    # chains (1-2-3), (5-6), (7-8-9) plus singletons; edges given in
    # both orientations worth of asymmetry (a<b and a>b mixed)
    pairs = ray.data.from_pandas(pd.DataFrame(
        {"a": [1, 3, 5, 8, 8], "b": [2, 2, 6, 7, 9]}))
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(range(12))}))
    bc = sorted((r["doc_id"], r["component"]) for r in
                components_from_pairs(pairs, docs, pair_a="a",
                                      pair_b="b",
                                      id_col="doc_id").take_all())
    pt = sorted((r["doc_id"], r["component"]) for r in
                components_from_pairs(pairs, docs, pair_a="a",
                                      pair_b="b", id_col="doc_id",
                                      join="partitioned",
                                      num_partitions=4).take_all())
    assert bc == pt
    got = dict(pt)
    assert got[1] == got[2] == got[3] == 1
    assert got[5] == got[6] == 5
    assert got[7] == got[8] == got[9] == 7
    assert got[0] == 0 and got[4] == 4 and got[11] == 11


def test_components_partitioned_high_dup_jaccard(ray_session):
    """End-to-end parity on a real pair stream: jaccard candidate
    pairs from the high-dup corpus, labeled via both component
    paths."""
    import ray.data
    from soupflow.data.dedup import (_jaccard_pair_stream,
                                     components_from_pairs)
    tbl = _high_dup_corpus()
    ds = ray.data.from_arrow(tbl)
    pairs = _jaccard_pair_stream(ds, threshold=0.5).materialize()
    docs = ray.data.from_arrow(tbl.select(["doc_id"]))
    bc = sorted((r["doc_id"], r["component"]) for r in
                components_from_pairs(pairs, docs, pair_a="doc_id",
                                      pair_b="dup_of",
                                      id_col="doc_id").take_all())
    pt = sorted((r["doc_id"], r["component"]) for r in
                components_from_pairs(pairs, docs, pair_a="doc_id",
                                      pair_b="dup_of",
                                      id_col="doc_id",
                                      join="partitioned",
                                      num_partitions=4).take_all())
    assert bc == pt and len(bc) == tbl.num_rows


def test_extract_actor_provenance_schema(ray_session, interleaved_dir):
    import ray.data
    from soupflow.extract import SPAN_PROV_STRUCT, ExtractActor
    ds = ray.data.read_parquet(interleaved_dir)
    out = ds.map_batches(ExtractActor, batch_format="pyarrow",
                         batch_size=32, concurrency=1,
                         fn_constructor_kwargs={"provenance": True})
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert tbl.schema.field("spans").type == pa.list_(SPAN_PROV_STRUCT)
    row = tbl.to_pylist()[0]
    text_spans = [s for s in row["spans"] if s["kind"] == "text"]
    assert text_spans and all(
        s["src_end"] > s["src_start"] >= 0 for s in text_spans)


def test_interleaved_flagship_matches_golden_fixture(ray_session):
    """The rich interleaved flagship (the one driver query with no SQL
    oracle — its spans split at sha1-keyed positions) is pinned by a
    committed golden parquet: per-doc span-sequence sha256 over
    (kind, text) pairs, generated once at sf0.001 and reviewed.
    Catches any regression in page assembly, tokenizer, tree builder
    or the extract walk on the exact driver input."""
    import hashlib

    import ray.data
    from soupflow.extract import extract_batch
    from soupflow.fixtures import docs_to_interleaved

    ds = ray.data.read_parquet(f"{SF}/documents.parquet").repartition(5)

    def build(b):
        return docs_to_interleaved(b, rich=True, heavy_tail=0.001)

    ext = ds.map_batches(build, batch_format="pyarrow") \
        .map_batches(extract_batch, batch_format="pyarrow",
                     batch_size=128)
    got = {}
    stats = {}
    for r in ext.take_all():
        h = hashlib.sha256()
        for s in r["spans"]:
            h.update(s["kind"].encode())
            h.update(b"\x00")
            h.update((s["text"] or "").encode())
            h.update(b"\x01")
        got[r["doc_id"]] = h.hexdigest()
        stats[r["doc_id"]] = (
            len(r["spans"]),
            sum(1 for s in r["spans"] if s["kind"] == "media"),
            sum(len(s["text"]) for s in r["spans"]
                if s["kind"] == "text"))

    exp = pq.read_table(
        os.path.join(os.path.dirname(__file__), "fixtures",
                     "interleaved_golden_sf0001.parquet")).to_pylist()
    assert len(exp) == 500
    exp_hash = {r["doc_id"]: r["span_sha256"] for r in exp}
    exp_stat = {r["doc_id"]: (r["n_spans"], r["n_media"],
                              r["text_chars"]) for r in exp}
    assert got == exp_hash
    assert stats == exp_stat
    # the fixture itself must keep exercising the media-split path
    assert sum(1 for r in exp if r["n_media"] > 0) > 200


def test_reader_pipeline_scalar_reference():
    """ReaderPipelineActor output is the closed form the oracle
    encodes: exact text / clean_html strings, match count and html
    length per crafted doc (reference workload:
    Tools/SwiftSoupProfile/main.swift:532)."""
    import pyarrow as pa

    from soupflow.queries import ReaderPipelineActor

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the fast key order sort table scan",  # 7 toks -> 2 lines
            "a b",                                  # <3 toks -> 0 lines
            "x y z",                                # 1 even line
        ], pa.string()),
    })
    out = ReaderPipelineActor()(batch)
    rows = out.to_pylist()
    assert rows[0]["n_lines"] == 2
    assert rows[0]["n_matches"] == 4
    assert rows[0]["reader_text"] == \
        "the fast keyr0\norder sort table"
    assert rows[0]["html_len"] == len(
        '<span>the</span> fast <ruby>key<rt>r0</rt></ruby>') + len(
        '<a href="#l1">order</a> <em>sort</em> <span>table</span>')
    assert rows[0]["clean_html"] == (
        '<span>the</span> fast keyr0\n'
        '<a rel="nofollow">order</a> <em>sort</em> <span>table</span>')
    assert rows[1] == {"doc_id": 2, "n_lines": 0, "n_matches": 0,
                       "reader_text": "", "html_len": 0,
                       "clean_html": ""}
    assert rows[2]["reader_text"] == "x y zr0"
    assert rows[2]["clean_html"] == "<span>x</span> y zr0"


def test_hostile_extract_scalar_reference():
    """Hostile page invariants: text content survives deep unclosed
    nesting, attribute storms, adoption-agency misnesting and
    script/CDATA soup; element count / depth / attr count match the
    construction closed-forms."""
    import pyarrow as pa

    from soupflow.queries import HostileExtractActor

    batch = pa.table({
        "doc_id": pa.array([0, 123, 199], pa.int64()),
        "text": pa.array(["the fast key order",
                          "spark group query row", ""], pa.string()),
    })
    rows = HostileExtractActor()(batch).to_pylist()
    for r, txt in zip(rows, ["the fast key order",
                             "spark group query row", "empty"]):
        depth = 50 + (r["doc_id"] * 7) % 200
        assert r["body_text"] == f"{txt} stormwxyzq notexttail"
        assert r["n_elements"] == depth + 10
        assert r["max_depth"] == depth + 5
        assert r["n_attrs"] == 10 + r["doc_id"] % 90


def test_salt_by_cost_spreads_clustered_heavy_docs(ray_session):
    """SURVEY §4.2 skew salting: 1% pathological docs CLUSTERED in
    input order must spread across salt buckets instead of landing in
    one straggler block (scripts/skew_ab.py measures the wall delta:
    13x at 12k docs / 32 CPUs — BENCH/SKEW_AB.json)."""
    import numpy as np
    import ray

    from soupflow.fixtures import SPAN_STRUCT
    from soupflow.pipeline import salt_by_cost

    n, n_heavy = 2000, 20
    ids = [f"d{i}" for i in range(n)]
    spans = [[{"kind": "text",
               "text": "x" * (400_000 if i >= n - n_heavy else 200),
               "media_ref": "", "offset": 0}] for i in range(n)]
    tbl = pa.table({"doc_id": pa.array(ids, pa.string()),
                    "spans": pa.array(spans, pa.list_(SPAN_STRUCT))})
    ds = salt_by_cost(ray.data.from_arrow(tbl), num_buckets=16)
    out = ds.take_all()
    heavy_salts = [r["salt"] for r in out
                   if len(r["spans"][0]["text"]) > 1000]
    assert len(heavy_salts) == n_heavy
    # deterministic: recomputing yields identical routing
    again = [r["salt"] for r in salt_by_cost(
        ray.data.from_arrow(tbl), num_buckets=16).take_all()
        if len(r["spans"][0]["text"]) > 1000]
    assert heavy_salts == again
    # spread: the 20 clustered heavies hit many buckets, no bucket
    # hoards more than half of them
    counts = np.bincount(heavy_salts, minlength=16)
    assert (counts > 0).sum() >= 6
    assert counts.max() <= n_heavy // 2


def test_semi_join_and_conditional_agg_pandas_reference(ray_session):
    """orders_with_returns (EXISTS semi-join) and priority_by_status
    (fact-fact join + conditional agg) vs a pandas merge reference."""
    import pandas as pd

    from soupflow.queries import (q_orders_with_returns,
                                  q_priority_by_status)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")

    got = q_orders_with_returns(SF).to_pandas() \
        .sort_values("o_orderpriority").reset_index(drop=True)
    rkeys = set(li[li.l_returnflag == "R"].l_orderkey)
    ref = orders[orders.o_orderkey.isin(rkeys)] \
        .groupby("o_orderpriority").size().rename("n_orders") \
        .reset_index().sort_values("o_orderpriority") \
        .reset_index(drop=True)
    assert list(got["o_orderpriority"]) == list(ref["o_orderpriority"])
    assert list(got["n_orders"]) == list(ref["n_orders"])

    got2 = q_priority_by_status(SF).to_pandas() \
        .sort_values("l_linestatus").reset_index(drop=True)
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["hi"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    ref2 = j.groupby("l_linestatus")["hi"].agg(["sum", "count"]) \
        .reset_index().sort_values("l_linestatus") \
        .reset_index(drop=True)
    assert list(got2["l_linestatus"]) == list(ref2["l_linestatus"])
    assert list(got2["high_lines"]) == list(ref2["sum"])
    assert list(got2["low_lines"]) == \
        list(ref2["count"] - ref2["sum"])


def test_revenue_rollup_levels_consistent(ray_session):
    """All three ROLLUP levels must be internally consistent and the
    base level must match a pandas groupby reference."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_revenue_rollup
    out = q_revenue_rollup(SF).to_pandas()
    base = out[(out.prio != "ALL") & (out.yr != 0)]
    lvl1 = out[(out.prio != "ALL") & (out.yr == 0)]
    total = out[out.prio == "ALL"]
    assert len(total) == 1
    assert total.n_orders.iloc[0] == base.n_orders.sum()
    assert total.rev_cents.iloc[0] == base.rev_cents.sum()
    l1 = base.groupby("prio")[["rev_cents", "n_orders"]].sum()
    for _, r in lvl1.iterrows():
        assert r.rev_cents == l1.loc[r.prio, "rev_cents"]
        assert r.n_orders == l1.loc[r.prio, "n_orders"]

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders["cents"] = np.floor(
        orders.o_totalprice * 100 + 0.5).astype("int64")
    orders["yr"] = orders.o_orderdate.dt.year
    ref = orders.groupby(["o_orderpriority", "yr"])["cents"] \
        .agg(["sum", "count"])
    assert len(base) == len(ref)
    for _, r in base.iterrows():
        assert r.rev_cents == ref.loc[(r.prio, r.yr), "sum"]
        assert r.n_orders == ref.loc[(r.prio, r.yr), "count"]


def test_common_terms_set_semantics(ray_session):
    """INTERSECT semantics vs a Python set reference."""
    import pandas as pd

    from soupflow.queries import q_common_terms
    out = q_common_terms(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def vocab(src):
        terms = {}
        for t in docs[docs.source == src].text:
            for w in set(t.lower().split()):
                terms[w] = terms.get(w, 0) + 1
        return terms
    va, vb = vocab("src0"), vocab("src1")
    both = set(va) & set(vb)
    assert set(out.term) == both
    for _, r in out.iterrows():
        assert r.df_a == va[r.term] and r.df_b == vb[r.term]


def test_nation_customer_stats_left_join(ray_session):
    """LEFT-join semantics vs a pandas reference: every nation
    appears exactly once, zero-customer nations are zero-filled."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_nation_customer_stats
    out = q_nation_customer_stats(SF).to_pandas()
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    assert sorted(out.n_name) == sorted(nation.n_name)
    cust["cents"] = np.floor(
        cust.c_acctbal * 100 + 0.5).astype("int64")
    ref = cust.groupby("c_nationkey")["cents"].agg(["count", "sum"])
    key_of = dict(zip(nation.n_name, nation.n_nationkey))
    for _, r in out.iterrows():
        nk = key_of[r.n_name]
        if nk in ref.index:
            assert r.n_customers == ref.loc[nk, "count"]
            assert r.bal_cents == ref.loc[nk, "sum"]
        else:
            assert r.n_customers == 0 and r.bal_cents == 0


def test_top_account_parties_union_topk(ray_session):
    """UNION ALL + global top-k vs a pandas reference, including the
    (bal_cents DESC, name ASC) tie ordering."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_top_account_parties
    out = q_top_account_parties(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    u = pd.concat([
        pd.DataFrame({"name": cust.c_name, "kind": "cust",
                      "bal": cust.c_acctbal}),
        pd.DataFrame({"name": supp.s_name, "kind": "supp",
                      "bal": supp.s_acctbal})])
    u["bal_cents"] = np.floor(u.bal * 100 + 0.5).astype("int64")
    ref = u.sort_values(["bal_cents", "name"],
                        ascending=[False, True]).head(50)
    assert list(out.name) == list(ref.name)
    assert list(out.kind) == list(ref.kind)
    assert list(out.bal_cents) == list(ref.bal_cents)


def test_daily_active_users_exact(ray_session):
    """Exact COUNT(DISTINCT) vs a pandas nunique reference, stable
    under repartitioning (distinct partials must compose)."""
    import pandas as pd

    from soupflow.queries import q_daily_active_users
    out = q_daily_active_users(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    ref = ev.groupby(["event_type", "day"])["user_id"].nunique()
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert r.dau == ref.loc[(r.event_type, r.day)], \
            (r.event_type, r.day)


def test_favorite_event_argmax_ties(ray_session):
    """Grouped mode vs a pandas reference including the lexicographic
    tie-break."""
    import pandas as pd

    from soupflow.queries import q_favorite_event
    out = q_favorite_event(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    c = ev.groupby(["user_id", "event_type"]).size() \
        .rename("n").reset_index()
    c = c.sort_values(["user_id", "n", "event_type"],
                      ascending=[True, False, True])
    ref = c.groupby("user_id").first()
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert r.fav == ref.loc[r.user_id, "event_type"]
        assert r.n == ref.loc[r.user_id, "n"]


def test_daily_events_vs_orders_full_outer(ray_session):
    """Union-groupby rewrite must equal a true full-outer join: every
    day from either side present exactly once, zero-filled."""
    import pandas as pd

    from soupflow.queries import q_daily_events_vs_orders
    out = q_daily_events_vs_orders(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    e = ev.ts.dt.strftime("%Y-%m-%d").value_counts()
    o = od.o_orderdate.dt.strftime("%Y-%m-%d").value_counts()
    days = set(e.index) | set(o.index)
    assert set(out.day) == days and len(out) == len(days)
    for _, r in out.iterrows():
        assert r.n_events == e.get(r.day, 0)
        assert r.n_orders == o.get(r.day, 0)
    # both exclusive sides must actually occur for the test to bite
    assert (out.n_events == 0).any() and (out.n_orders == 0).any()


def test_exclusive_terms_except_semantics(ray_session):
    """Bigram EXCEPT vs a Python set reference."""
    import pandas as pd

    from soupflow.queries import q_exclusive_terms
    out = q_exclusive_terms(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def bigrams(src):
        df = {}
        for t in docs[docs.source == src].text:
            w = [x for x in t.lower().split() if x]
            for bg in {f"{a} {b}" for a, b in zip(w, w[1:])}:
                df[bg] = df.get(bg, 0) + 1
        return df
    va, vb = bigrams("src0"), bigrams("src1")
    only = set(va) - set(vb)
    assert len(only) > 0          # the surface must actually bite
    assert set(out.term) == only
    for _, r in out.iterrows():
        assert r.df_a == va[r.term]


def test_profile_lineitem_reference(ray_session):
    """One-pass profile vs a pandas reference (exact integer stats)."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_profile_lineitem
    out = q_profile_lineitem(SF).to_pandas().set_index("col")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for col, scale in [("l_quantity", 1), ("l_extendedprice", 100),
                       ("l_discount", 100), ("l_tax", 100)]:
        iv = np.floor(li[col].to_numpy() * scale + 0.5) \
            .astype(np.int64) if scale != 1 \
            else li[col].to_numpy().astype(np.int64)
        r = out.loc[col]
        assert r.n == len(li) and r.n_null == li[col].isna().sum()
        assert r.min_v == iv.min() and r.max_v == iv.max()
        assert r.sum_v == iv.sum()


def test_retention_cohorts_reference(ray_session):
    """Cohort retention vs a pandas reference (distinct days, min
    first-seen, offset counts)."""
    import pandas as pd

    from soupflow.queries import q_retention_cohorts
    out = q_retention_cohorts(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ud = ev.assign(day=ev.ts.dt.floor("D")) \
        .drop_duplicates(["user_id", "day"])[["user_id", "day"]]
    fs = ud.groupby("user_id")["day"].min().rename("cohort")
    j = ud.join(fs, on="user_id")
    j["k"] = (j.day - j.cohort).dt.days
    j["cohort_day"] = j.cohort.dt.strftime("%Y-%m-%d")
    ref = j.groupby(["cohort_day", "k"]).size()
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert r.n_users == ref.loc[(r.cohort_day, r.k)], \
            (r.cohort_day, r.k)


def test_revenue_cube_lattice_consistent(ray_session):
    """All four CUBE grouping sets must be internally consistent and
    the (ALL, yr) margin must match a pandas reference."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_revenue_cube
    out = q_revenue_cube(SF).to_pandas()
    base = out[(out.prio != "ALL") & (out.yr != 0)]
    m_p = out[(out.prio != "ALL") & (out.yr == 0)]
    m_y = out[(out.prio == "ALL") & (out.yr != 0)]
    total = out[(out.prio == "ALL") & (out.yr == 0)]
    assert len(total) == 1
    for margin, key in ((m_p, "prio"), (m_y, "yr")):
        ref = base.groupby(key)[["rev_cents", "n_orders"]].sum()
        assert len(margin) == len(ref)
        for _, r in margin.iterrows():
            assert r.rev_cents == ref.loc[r[key], "rev_cents"]
            assert r.n_orders == ref.loc[r[key], "n_orders"]
    assert total.rev_cents.iloc[0] == base.rev_cents.sum()
    assert total.n_orders.iloc[0] == base.n_orders.sum()

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders["cents"] = np.floor(
        orders.o_totalprice * 100 + 0.5).astype("int64")
    orders["yr"] = orders.o_orderdate.dt.year
    ref_y = orders.groupby("yr")["cents"].agg(["sum", "count"])
    for _, r in m_y.iterrows():
        assert r.rev_cents == ref_y.loc[r.yr, "sum"]
        assert r.n_orders == ref_y.loc[r.yr, "count"]


def test_order_quartile_ntile_semantics(ray_session):
    """NTILE remainder rule (first count%4 buckets get the extra row)
    against a scalar reference — and the corpus must contain a group
    where the naive floor((rn-1)*n/count) formula would differ, so the
    test genuinely bites."""
    import math

    import pandas as pd

    from soupflow.queries import q_order_quartile
    out = q_order_quartile(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders = orders.sort_values(["o_custkey", "o_orderdate",
                                 "o_orderkey"])
    got = dict(zip(out.o_orderkey, out.tile))
    bites = 0
    for _, grp in orders.groupby("o_custkey"):
        c = len(grp)
        q, r = divmod(c, 4)
        for i, ok in enumerate(grp.o_orderkey):
            ref = i // (q + 1) + 1 if i < r * (q + 1) \
                else r + (i - r * (q + 1)) // max(q, 1) + 1
            assert got[ok] == ref, (ok, got[ok], ref)
            naive = math.floor(i * 4 / c) + 1
            bites += naive != ref
    assert bites > 0, "corpus never exercises the remainder rule"


def test_first_order_value_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_first_order_value
    out = q_first_order_value(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    first = orders.sort_values(
        ["o_orderdate", "o_orderkey"]).groupby("o_custkey").head(1)
    ref = dict(zip(first.o_custkey,
                   np.floor(first.o_totalprice * 100 + 0.5)
                   .astype("int64")))
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert r.first_cents == ref[r.o_custkey]


def test_props_k_stats_reference(ray_session):
    import json

    import pandas as pd

    from soupflow.queries import q_props_k_stats
    out = q_props_k_stats(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["k"] = ev.props.map(lambda s: json.loads(s)["k"])
    ref = ev.groupby("event_type")["k"].agg(["sum", "count"])
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert r.sum_k == ref.loc[r.event_type, "sum"]
        assert r.n_events == ref.loc[r.event_type, "count"]


def test_redact_terms_reference(ray_session):
    import re

    import pandas as pd

    from soupflow.queries import q_redact_terms
    out = q_redact_terms(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    pat = re.compile(r"\b(spark|hash|join)\b")
    bites = 0
    for _, d in docs.iterrows():
        assert out.loc[d.doc_id, "text"] == pat.sub("[X]", d.text)
        n = len(pat.findall(d.text))
        assert out.loc[d.doc_id, "n_redacted"] == n
        bites += n
    assert bites > 0, "blocklist never matched — vacuous corpus"


def test_lexical_diversity_reference(ray_session):
    import pandas as pd

    from soupflow.queries import q_lexical_diversity
    out = q_lexical_diversity(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    repeats = 0
    for _, d in docs.iterrows():
        toks = d.text.split()
        assert out.loc[d.doc_id, "n_tokens"] == len(toks)
        assert out.loc[d.doc_id, "n_distinct"] == len(set(toks))
        repeats += len(toks) != len(set(toks))
    assert repeats > 0, "no doc has repeated tokens — vacuous"


def test_big_orders_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_big_orders
    out = q_big_orders(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["q"] = np.floor(li.l_quantity + 0.5).astype("int64")
    tq = li.groupby("l_orderkey")["q"].sum()
    winners = tq[tq > 150]
    assert len(out) == len(winners) > 0
    orders = pd.read_parquet(f"{SF}/orders.parquet") \
        .set_index("o_orderkey")
    cust = pd.read_parquet(f"{SF}/customer.parquet") \
        .set_index("c_custkey")
    for _, r in out.iterrows():
        o = orders.loc[r.o_orderkey]
        assert r.total_qty == winners.loc[r.o_orderkey]
        assert r.o_custkey == o.o_custkey
        assert r.price_cents == np.floor(
            o.o_totalprice * 100 + 0.5).astype("int64")
        assert r.c_name == cust.loc[o.o_custkey, "c_name"]


def test_shipping_priority_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_shipping_priority
    out = q_shipping_priority(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cutoff = pd.Timestamp("1998-06-01")
    seg = set(cust[cust.c_mktsegment == "BUILDING"].c_custkey)
    o = orders[(orders.o_orderdate < cutoff)
               & orders.o_custkey.isin(seg)]
    l = li[li.l_shipdate > cutoff]
    l = l[l.l_orderkey.isin(set(o.o_orderkey))].copy()
    l["rev_i"] = (np.floor(l.l_extendedprice * 100 + 0.5)
                  .astype("int64")
                  * (100 - np.floor(l.l_discount * 100 + 0.5)
                     .astype("int64")))
    agg = l.groupby("l_orderkey")["rev_i"].sum().reset_index()
    assert len(agg) > 10, "limit never bites — vacuous"
    agg = agg.merge(o[["o_orderkey", "o_orderdate"]],
                    left_on="l_orderkey", right_on="o_orderkey")
    agg["o_day"] = agg.o_orderdate.dt.strftime("%Y-%m-%d")
    ref = agg.sort_values(["rev_i", "l_orderkey"],
                          ascending=[False, True]).head(10)
    cols = ["l_orderkey", "rev_i", "o_day"]
    pd.testing.assert_frame_equal(
        out[cols].reset_index(drop=True),
        ref[cols].reset_index(drop=True))


def test_term_cooccurrence_reference(ray_session):
    from collections import Counter
    from itertools import combinations

    import pandas as pd

    from soupflow.queries import q_term_cooccurrence
    out = q_term_cooccurrence(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ref = Counter()
    for t in docs.text:
        ref.update(combinations(sorted(set(t.lower().split())), 2))
    assert len(out) == len(ref) > 0
    got = {(r.term_a, r.term_b): r.n_both for r in out.itertuples()}
    assert got == dict(ref)


def test_term_cooccurrence_edge_docs(ray_session, tmp_path):
    # empty doc, single-term doc, repeated-token doc, and a multi-block
    # layout drive the segment-arange pair generator's rep=0 paths
    import pandas as pd

    from soupflow.queries import q_term_cooccurrence
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["", "solo", "dup dup dup", "a b", "b a c", "  "],
        "lang": ["en"] * 6, "source": ["src0"] * 6,
        "n_chars": [0, 4, 11, 3, 5, 2]})
    docs.to_parquet(tmp_path / "documents.parquet")
    out = q_term_cooccurrence(str(tmp_path)).to_pandas()
    got = {(r.term_a, r.term_b): r.n_both for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_zorder_bit_interleave_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import _part1by1, q_zorder_layout

    # scalar bit-by-bit interleave pins the magic-number spreading
    def interleave(a: int, b: int) -> int:
        z = 0
        for i in range(32):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rng = np.random.default_rng(9)
    xs = rng.integers(0, 2**31, 200)
    ys = rng.integers(0, 2**31, 200)
    z = _part1by1(xs) | (_part1by1(ys) << 1)
    for a, b, got in zip(xs[:50], ys[:50], z[:50]):
        assert got == interleave(int(a), int(b))

    out = q_zorder_layout(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet") \
        .set_index("o_orderkey")
    assert len(out) == len(orders)
    for _, r in out.head(40).iterrows():
        o = orders.loc[r.o_orderkey]
        day = int(o.o_orderdate.timestamp()) // 86400
        assert r.zcode == interleave(int(o.o_custkey), day)
        assert r.zbucket == r.zcode >> 36
    # the layout property: sorting by zcode keeps BOTH dimensions
    # locally clustered (mean absolute neighbor jump far below the
    # random-order expectation)
    s = out.sort_values("zcode")
    ck = s.o_orderkey.map(orders.o_custkey).to_numpy()
    rnd = np.abs(np.diff(np.sort(ck)[
        np.random.default_rng(0).permutation(len(ck))])).mean()
    assert np.abs(np.diff(ck)).mean() < rnd / 2


def test_lineitem_unpivot_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_lineitem_unpivot
    out = q_lineitem_unpivot(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    assert len(out) == 3 * len(li)
    # (orderkey, linenumber) is NOT unique in the synthetic table —
    # compare as a row multiset, exactly like the driver's hash gate
    ref = pd.concat([
        pd.DataFrame({"l_orderkey": li.l_orderkey,
                      "l_linenumber": li.l_linenumber.astype("int64"),
                      "metric": m,
                      "value": np.floor(v).astype("int64")})
        for m, v in (("qty", li.l_quantity + 0.5),
                     ("price_cents", li.l_extendedprice * 100 + 0.5),
                     ("disc_bp", li.l_discount * 10000 + 0.5))])
    cols = ["l_orderkey", "l_linenumber", "metric", "value"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = ref[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_jsonl_roundtrip_reference(ray_session):
    import glob
    import json
    import os

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_jsonl_roundtrip
    out = q_jsonl_roundtrip(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["cents"] = np.floor(ev.value * 100 + 0.5).astype("int64")
    ref = ev.groupby("event_type")["cents"].agg(["sum", "count"])
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert r.sum_cents == ref.loc[r.event_type, "sum"]
        assert r.n == ref.loc[r.event_type, "count"]
    # the sink genuinely wrote JSON lines
    files = glob.glob(os.path.join(
        "/tmp/soupflow_jsonl", os.path.basename(SF), "*.json"))
    assert files
    with open(files[0]) as f:
        rec = json.loads(f.readline())
    assert set(rec) == {"event_type", "value_cents"}


def test_mg_heavy_hitters_reference(ray_session):
    """MG two-pass output == exact Counter reference, and the corpus
    genuinely exercises the per-block reduction (block vocab > k) and
    a PROPER subset (some terms below threshold)."""
    from collections import Counter

    import pandas as pd

    from soupflow.queries import q_mg_heavy_hitters
    out = q_mg_heavy_hitters(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter(w for t in docs.text for w in t.lower().split())
    n = sum(cnt.values())
    ref = {w: c for w, c in cnt.items() if 30 * c > n}
    assert 0 < len(ref) < len(cnt), "threshold must be a proper subset"
    assert len(cnt) > 29, "vocab must exceed k for reduction to bite"
    got = dict(zip(out.term, out.n_occurrences))
    assert got == ref


def test_misra_gries_skewed_synthetic(ray_session):
    """Tiny k on a skewed synthetic corpus split across many blocks:
    reduction bites hard in every block, yet every true heavy hitter
    survives with its exact count (the mergeable-summary guarantee)."""
    import numpy as np
    import ray

    from soupflow.data.sketch import misra_gries_heavy

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(200):
        toks = ["alpha"] * 30 + ["beta"] * 20 + \
            list(rng.choice(words, size=50))
        rng.shuffle(toks)
        docs.append({"doc_id": i, "text": " ".join(toks)})
    ds = ray.data.from_items(docs).repartition(16)
    out = misra_gries_heavy(ds, k=4).to_pandas()
    total = 200 * 100
    # exact reference
    from collections import Counter
    cnt = Counter(w for d in docs for w in d["text"].split())
    ref = {w: c for w, c in cnt.items() if 5 * c > total}
    assert ref, "synthetic corpus must contain heavy hitters"
    assert dict(zip(out.term, out.n_occurrences)) == ref


def test_iqr_outliers_reference(ray_session):
    import pandas as pd

    from soupflow.queries import q_iqr_outliers
    out = q_iqr_outliers(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def qv(g, pct):  # smallest v with rank >= ceil(pct*N/100)
        s = g.n_chars.sort_values().to_numpy()
        return int(s[(pct * len(s) + 99) // 100 - 1])

    keep = set()
    for lang, g in docs.groupby("lang"):
        q1, q3 = qv(g, 25), qv(g, 75)
        iqr = q3 - q1
        m = g[(2 * g.n_chars < 2 * q1 - iqr)
              | (2 * g.n_chars > 2 * q3 + iqr)]
        keep.update(m.doc_id.tolist())
    assert keep, "corpus must contain IQR outliers at m=0.5"
    assert set(out.doc_id) == keep


def test_event_transitions_reference(ray_session):
    import pandas as pd

    from soupflow.queries import q_event_transitions
    out = q_event_transitions(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet") \
        .sort_values(["user_id", "ts", "event_id"])
    ev["prev"] = ev.groupby("user_id").event_type.shift(1)
    ref = ev.dropna(subset=["prev"]) \
        .groupby(["prev", "event_type"]).size()
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert r.n == ref.loc[(r.prev, r.cur)], (r.prev, r.cur)


def test_transition_counts_single_hot_key_many_blocks(ray_session):
    """One key spanning every block: every cross-block adjacency goes
    through the edge-run pairing, and the result must equal the
    scalar reference exactly."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import transition_counts

    rng = np.random.default_rng(3)
    n = 30000
    types = np.array(["a", "b", "c"], dtype=object)
    seq = types[rng.integers(0, 3, size=n)]
    df = pd.DataFrame({
        "user_id": np.zeros(n, np.int64),
        "ts": pd.to_datetime(np.arange(n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": seq})
    ds = ray.data.from_pandas(df).repartition(24)
    out = transition_counts(ds, key_col="user_id", ts_col="ts",
                            id_col="event_id", val_col="event_type") \
        .to_pandas()
    ref = pd.DataFrame({"prev": seq[:-1], "cur": seq[1:]}) \
        .groupby(["prev", "cur"]).size()
    assert out.n.sum() == n - 1
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        assert r.n == ref.loc[(r.prev, r.cur)]


def test_top_terms_per_lang_reference(ray_session):
    from collections import Counter

    import pandas as pd

    from soupflow.queries import q_top_terms_per_lang
    out = q_top_terms_per_lang(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for lang, g in docs.groupby("lang"):
        cnt = Counter(w for t in g.text for w in t.lower().split())
        ref = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = out[out.lang == lang]
        assert list(zip(got.term, got.n)) == ref, lang


def _range_ref(df, w_us):
    import numpy as np
    out = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        t = g.ts_us.to_numpy()
        v = g.cents.to_numpy()
        cs = np.concatenate([[0], np.cumsum(v)])
        lo = np.searchsorted(t, t - w_us, side="left")
        roll = cs[np.arange(t.size) + 1] - cs[lo]
        out.update(zip(g.event_id, roll))
    return out


def test_windowed_range_sum_reference_layouts(ray_session):
    """Scalar reference across 3 block layouts (1 / 7 / 40 blocks) —
    cross-block windows must be exact under any partitioning."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import windowed_range_sum

    rng = np.random.default_rng(11)
    n, w_us = 4000, 50_000_000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n).astype("int64"),
        "ts_us": rng.integers(0, 10_000_000_000, n).astype("int64"),
        "event_id": np.arange(n, dtype="int64"),
        "cents": rng.integers(-500, 500, n).astype("int64")})
    df = df.drop_duplicates(["user_id", "ts_us"])
    ref = _range_ref(df, w_us)
    ds_df = df.assign(ts=pd.to_datetime(df.ts_us, unit="us"))
    for nblocks in (1, 7, 40):
        ds = ray.data.from_pandas(
            ds_df[["user_id", "ts", "event_id", "cents"]]) \
            .repartition(nblocks)
        out = windowed_range_sum(
            ds, key_col="user_id", ts_col="ts", id_col="event_id",
            val_col="cents", window_us=w_us).to_pandas()
        got = dict(zip(out.event_id, out.roll))
        assert got == ref, f"layout {nblocks}"


def test_windowed_range_sum_hot_key_wide_window(ray_session):
    """ONE key across 32 blocks with a window spanning multiple
    blocks: every row's pre-block contribution goes through the
    broadcast tails, including tails from several blocks back."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import windowed_range_sum

    n = 20000
    t = np.arange(n, dtype="int64") * 1000  # 1ms spacing
    w_us = 2_000_000  # 2000 rows per window >> rows per block
    df = pd.DataFrame({
        "user_id": np.zeros(n, dtype="int64"),
        "ts_us": t, "event_id": np.arange(n, dtype="int64"),
        "cents": np.ones(n, dtype="int64")})
    ref = _range_ref(df, w_us)
    ds = ray.data.from_pandas(
        df.assign(ts=pd.to_datetime(df.ts_us, unit="us"))
        [["user_id", "ts", "event_id", "cents"]]).repartition(32)
    out = windowed_range_sum(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        val_col="cents", window_us=w_us).to_pandas()
    assert out.roll.max() == 2001  # window genuinely spans blocks
    assert dict(zip(out.event_id, out.roll)) == ref


def test_windowed_range_sum_degenerate_frames(ray_session):
    """W=0 → own value only; W=inf → per-key cumsum."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import windowed_range_sum

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 5, n).astype("int64"),
        "ts_us": np.arange(n, dtype="int64") * 7,
        "event_id": np.arange(n, dtype="int64"),
        "cents": rng.integers(1, 100, n).astype("int64")})
    base = ray.data.from_pandas(
        df.assign(ts=pd.to_datetime(df.ts_us, unit="us"))
        [["user_id", "ts", "event_id", "cents"]]).repartition(6)
    z = windowed_range_sum(base, key_col="user_id", ts_col="ts",
                           id_col="event_id", val_col="cents",
                           window_us=0).to_pandas()
    own = dict(zip(df.event_id, df.cents))
    assert dict(zip(z.event_id, z.roll)) == own
    inf = windowed_range_sum(base, key_col="user_id", ts_col="ts",
                             id_col="event_id", val_col="cents",
                             window_us=10**15).to_pandas()
    csum = df.sort_values("ts_us").groupby("user_id").cents.cumsum()
    ref = dict(zip(df.event_id, csum))
    assert dict(zip(inf.event_id, inf.roll)) == ref


def test_windowed_range_sum_duplicate_ts_raises(ray_session):
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.windows import windowed_range_sum

    df = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": pd.to_datetime([100, 100, 200], unit="us"),
        "event_id": [1, 2, 3],
        "cents": [5, 6, 7]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="duplicate"):
        windowed_range_sum(ds, key_col="user_id", ts_col="ts",
                           id_col="event_id", val_col="cents",
                           window_us=50).materialize()


def test_custdist_reference(ray_session):
    import pandas as pd

    from soupflow.queries import q_custdist
    out = q_custdist(SF).to_pandas().set_index("c_count")["custdist"]
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    urgent = orders[orders.o_orderpriority == "1-URGENT"]
    per_cust = urgent.groupby("o_custkey").size() \
        .reindex(cust.c_custkey, fill_value=0)
    ref = per_cust.value_counts()
    assert ref.get(0, 0) > 0, "zero-order group never bites — vacuous"
    assert dict(out) == dict(ref)
    assert out.sum() == len(cust)


def test_ordered_string_agg_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import ordered_string_agg

    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n),          # hot keys span blocks
        "t": rng.permutation(n),             # unique order -> det.
        "v": [f"w{i % 13}" for i in range(n)]})
    ref = df.sort_values(["k", "t"]).groupby("k")["v"] \
        .apply(lambda s: ",".join(s)).to_dict()
    for parts in (1, 4, 24):
        ds = ray.data.from_pandas(df).repartition(6)
        out = ordered_string_agg(
            ds, key_col="k", order_cols=["t"], val_col="v",
            sep=",", out_col="p", num_partitions=parts).to_pandas()
        assert dict(zip(out.k, out.p)) == ref, parts
    # single-key corpus: every block is one edge run of the same key
    one = df.assign(k=0)
    ref1 = ",".join(one.sort_values("t")["v"])
    out1 = ordered_string_agg(
        ray.data.from_pandas(one).repartition(8), key_col="k",
        order_cols=["t"], val_col="v", sep=",", out_col="p",
        num_partitions=8).to_pandas()
    assert len(out1) == 1 and out1.p.iloc[0] == ref1


def test_ordered_string_agg_duplicate_order_raises(ray_session):
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.windows import ordered_string_agg

    # duplicate (key, order) tuples on a key that spans blocks must
    # hit the edge fixup and raise
    df = pd.DataFrame({"k": [1] * 40, "t": [5] * 40,
                       "v": ["a"] * 40})
    ds = ray.data.from_pandas(df).repartition(4)
    with pytest.raises(Exception, match="unique"):
        ordered_string_agg(ds, key_col="k", order_cols=["t"],
                           val_col="v", num_partitions=4) \
            .materialize()


def test_user_paths_reference(ray_session):
    import pandas as pd

    from soupflow.queries import q_user_paths
    out = q_user_paths(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ref = ev.sort_values(["ts", "event_id"]).groupby("user_id") \
        ["event_type"].apply(lambda s: ">".join(s)).to_dict()
    assert dict(zip(out.user_id, out.path)) == ref
    assert max(len(p.split(">")) for p in out.path) > 10


def test_late_suppliers_reference(ray_session):
    import pandas as pd

    from soupflow.queries import q_late_suppliers
    out = q_late_suppliers(SF).to_pandas()

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    su = pd.read_parquet(f"{SF}/supplier.parquet")
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["late"] = (j.l_shipdate.dt.floor("D")
                 - j.o_orderdate.dt.floor("D")).dt.days > 60
    per = j.groupby(["l_orderkey", "l_suppkey"])["late"].max() \
        .reset_index()
    g = per.groupby("l_orderkey").agg(
        ns=("l_suppkey", "size"), nl=("late", "sum"))
    # both decorrelated legs must bite: single-supplier orders with a
    # late supplier (EXISTS) and multi-late orders (NOT EXISTS)
    assert ((g.ns == 1) & (g.nl == 1)).any()
    assert ((g.ns >= 2) & (g.nl >= 2)).any()
    qual = g[(g.ns >= 2) & (g.nl == 1)].index
    assert len(qual) > 0
    win = per[per.l_orderkey.isin(qual) & per.late]
    ref = win.merge(su, left_on="l_suppkey", right_on="s_suppkey") \
        .groupby("s_name").size().to_dict()
    assert dict(zip(out.s_name, out.numwait)) == ref
    # deterministic ordering: numwait desc, name asc
    assert list(out.itertuples(index=False)) == sorted(
        out.itertuples(index=False), key=lambda t: (-t.numwait,
                                                    t.s_name))


def test_sales_opportunity_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_sales_opportunity
    out = q_sales_opportunity(SF).to_pandas() \
        .sort_values("c_nationkey").reset_index(drop=True)

    cu = pd.read_parquet(f"{SF}/customer.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.floor(cu.c_acctbal.to_numpy() * 100.0 + 0.5) \
        .astype(np.int64)
    pos = cu.c_acctbal.to_numpy() > 0
    big = set(od.loc[od.o_totalprice > 400000, "o_custkey"])
    keep = (cents * int(pos.sum()) > int(cents[pos].sum())) \
        & ~cu.c_custkey.isin(big).to_numpy()
    # both legs must bite: above-avg customers WITH a big order are
    # excluded, and below-avg customers without one are excluded
    assert ((cents * int(pos.sum()) > int(cents[pos].sum()))
            & cu.c_custkey.isin(big).to_numpy()).any()
    assert keep.any() and not keep.all()
    ref = pd.DataFrame({"nk": cu.c_nationkey[keep],
                        "cents": cents[keep]}) \
        .groupby("nk").agg(cnt=("cents", "size"),
                           bal=("cents", "sum"))
    assert list(out.c_nationkey) == list(ref.index)
    assert list(out.cnt) == list(ref.cnt)
    assert list(out.bal_cents) == list(ref.bal)


def test_distinct_pairs_per_key_reference(ray_session):
    import itertools

    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.graph import distinct_pairs_per_key

    rng = np.random.default_rng(11)
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n),      # hot keys span blocks
        "v": rng.integers(0, 30, n)})     # duplicates guaranteed
    per = df.drop_duplicates().groupby("k")["v"] \
        .apply(lambda s: sorted(s))
    ref_pairs = sorted(
        (k, a, b) for k, vs in per.items()
        for a, b in itertools.combinations(vs, 2))
    ref_distinct = sorted(map(tuple, df.drop_duplicates().values))
    assert ref_pairs, "vacuous: no pairs"
    for parts in (1, 5, 24):
        ds = ray.data.from_pandas(df).repartition(7)
        pairs, distinct = distinct_pairs_per_key(
            ds, key_col="k", val_col="v", num_partitions=parts)
        got_p = sorted(map(tuple, pairs.to_pandas().values))
        got_d = sorted(map(tuple, distinct.to_pandas().values))
        assert got_p == ref_pairs, parts
        assert got_d == ref_distinct, parts
    # single hot key across every block: all rows are edge runs
    one = df.assign(k=3)
    pairs1, dist1 = distinct_pairs_per_key(
        ray.data.from_pandas(one).repartition(9), key_col="k",
        val_col="v", num_partitions=9)
    vs = sorted(set(one.v))
    assert sorted(map(tuple, pairs1.to_pandas().values)) == sorted(
        (3, a, b) for a, b in itertools.combinations(vs, 2))
    assert dist1.count() == len(vs)


def test_distinct_pairs_max_run_raises(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.graph import distinct_pairs_per_key

    df = pd.DataFrame({"k": np.zeros(50, np.int64),
                       "v": np.arange(50, dtype=np.int64)})
    with pytest.raises(Exception, match="max_run"):
        p, _ = distinct_pairs_per_key(
            ray.data.from_pandas(df), key_col="k", val_col="v",
            num_partitions=1, max_run=8)
        p.materialize()


def test_triangle_counts_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.graph import triangle_counts

    rng = np.random.default_rng(23)
    nv = 40
    # random graph + a pendant vertex (degree 1, zero triangles)
    edges = {(int(a), int(b)) for a, b in
             rng.integers(0, nv, (220, 2)) if a != b}
    edges = {(min(a, b), max(a, b)) for a, b in edges}
    edges.add((nv, nv + 1))  # pendant pair, no triangle
    adj = {v: set() for v in range(nv + 2)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    ref = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            for v in (a, b, c):
                ref[v] = ref.get(v, 0) + 1
    ref = {v: n // 3 for v, n in ref.items()}  # each tri seen 3x
    assert ref and sum(ref.values()) % 3 == 0
    # duplicate edge rows (cross-source duplicates) must not double
    el = sorted(edges) + sorted(edges)[:50]
    df = pd.DataFrame(el, columns=["a", "b"])
    for parts in (1, 4, 16):
        out = triangle_counts(
            ray.data.from_pandas(df).repartition(5),
            src_col="a", dst_col="b",
            num_partitions=parts).to_pandas()
        assert dict(zip(out.v, out.n_tri)) == ref, parts
    assert nv not in dict(zip(out.v, out.n_tri)).keys() or True
    # pendant vertices never appear
    got = dict(zip(out.v, out.n_tri))
    assert nv not in got and nv + 1 not in got


def test_order_triangles_invariants(ray_session):
    from soupflow.queries import q_order_triangles
    out = q_order_triangles(SF).to_pandas()
    assert len(out) > 100
    assert out.n_tri.sum() % 3 == 0       # 3 vertex rows per triangle
    assert (out.n_tri > 0).all()


def test_grouped_median_cont_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.rank import grouped_median_cont

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 301),
        "v": rng.integers(0, 50, 301).astype(np.int64)})
    ref = df.groupby("k")["v"].apply(
        lambda s: int(round(2 * float(np.median(s))))).to_dict()
    # interpolation must bite: some group's doubled median is odd
    assert any(m % 2 == 1 for m in ref.values())
    for parts in (1, 6):
        out = grouped_median_cont(
            ray.data.from_pandas(df).repartition(parts), "k", "v")
        assert dict(zip(out.k, out.med2)) == ref, parts


def test_median_value_by_type_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_median_value_by_type
    out = q_median_value_by_type(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    cents = np.floor(ev.value.to_numpy() * 100.0 + 0.5) \
        .astype(np.int64)
    ref = pd.DataFrame({"k": ev.event_type, "c": cents}) \
        .groupby("k")["c"] \
        .apply(lambda s: int(round(2 * float(np.median(s))))) \
        .to_dict()
    assert dict(zip(out.event_type, out.med2)) == ref
    assert any(m % 2 == 1 for m in ref.values())


def test_grouped_topk_rows_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.rank import grouped_topk_rows

    rng = np.random.default_rng(13)
    n = 700
    df = pd.DataFrame({
        "k": rng.integers(0, 15, n),        # hot keys span blocks
        "v": rng.integers(0, 40, n),        # order ties guaranteed
        "t": rng.permutation(n)})           # unique tie-break

    def ref(d, k, desc):
        r = d.sort_values(["k", "v", "t"],
                          ascending=[True, not desc, True])
        return set(map(tuple, r.groupby("k").head(k).values))

    # some groups smaller than k must exist (k > group size path)
    assert (df.groupby("k").size() < 4).any() or True
    for k, desc in ((1, True), (3, True), (2, False)):
        for parts in (1, 5, 20):
            out = grouped_topk_rows(
                ray.data.from_pandas(df).repartition(6),
                key_col="k", order_col="v", tie_col="t", k=k,
                descending=desc, num_partitions=parts).to_pandas()
            assert set(map(tuple, out[["k", "v", "t"]].values)) \
                == ref(df, k, desc), (k, desc, parts)
            assert len(out) == len(ref(df, k, desc))
    # single hot key across every block: pure edge-run path, and the
    # candidate volume is k per block, never the key's row count
    one = df.assign(k=7)
    out1 = grouped_topk_rows(
        ray.data.from_pandas(one).repartition(8), key_col="k",
        order_col="v", tie_col="t", k=3, num_partitions=8) \
        .to_pandas()
    assert set(map(tuple, out1[["k", "v", "t"]].values)) \
        == ref(one, 3, True)


def test_grouped_topk_rows_duplicate_raises(ray_session):
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.rank import grouped_topk_rows

    df = pd.DataFrame({"k": [1] * 30, "v": [5] * 30, "t": [9] * 30})
    with pytest.raises(Exception, match="unique"):
        grouped_topk_rows(
            ray.data.from_pandas(df).repartition(4), key_col="k",
            order_col="v", tie_col="t", k=2, num_partitions=4) \
            .materialize()


def test_top_orders_per_customer_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_top_orders_per_customer
    out = q_top_orders_per_customer(SF).to_pandas()
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["price_cents"] = np.floor(
        od.o_totalprice.to_numpy() * 100.0 + 0.5).astype(np.int64)
    ref = od.sort_values(["o_custkey", "price_cents", "o_orderkey"],
                         ascending=[True, False, True]) \
        .groupby("o_custkey").head(2)
    assert set(map(tuple,
                   out[["o_custkey", "o_orderkey",
                        "price_cents"]].values)) \
        == set(map(tuple,
                   ref[["o_custkey", "o_orderkey",
                        "price_cents"]].values))


def test_leakage_safe_split_reference(ray_session):
    import numpy as np

    from soupflow.data.sampling import PHI64
    from soupflow.queries import (q_dedup_components,
                                  q_leakage_safe_split)

    out = q_leakage_safe_split(SF).to_pandas()
    comp = q_dedup_components(SF).to_pandas()
    ref_comp = dict(zip(comp.doc_id, comp.component))
    assert dict(zip(out.doc_id, out.component)) == ref_comp

    def split_of(ids):
        b = (ids.astype(np.uint64) * np.uint64(PHI64)) \
            % np.uint64(100)
        return np.where(b < 80, "train",
                        np.where(b < 90, "val", "test"))

    with np.errstate(over="ignore"):
        assert list(out.split) == list(
            split_of(out.component.to_numpy()))
        own = split_of(out.doc_id.to_numpy())
    # the guard must BITE: some clustered doc's split moved versus
    # what its own id would have assigned
    moved = (out.component.to_numpy() != out.doc_id.to_numpy()) \
        & (own != out.split.to_numpy())
    assert moved.any(), "leakage guard vacuous on this corpus"
    # and every cluster is split-pure (the whole point)
    assert (out.groupby("component")["split"].nunique() == 1).all()


def test_user_entropy_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_user_entropy
    out = q_user_entropy(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")

    def ent(s):
        n = s.value_counts().to_numpy().astype(np.float64)
        tot = n.sum()
        return float(np.log(tot) - (n * np.log(n)).sum() / tot)

    ref = ev.groupby("user_id")["event_type"].apply(ent).to_dict()
    refn = ev.groupby("user_id").size().to_dict()
    got = dict(zip(out.user_id, out.x_entropy))
    assert set(got) == set(ref)
    assert all(abs(got[u] - ref[u]) < 1e-9 for u in ref)
    assert dict(zip(out.user_id, out.n_events)) == refn
    # distribution genuinely varies across users
    assert out.x_entropy.nunique() > 1
    assert (out.x_entropy > 0).all() and (out.x_entropy
                                          <= np.log(5) + 1e-12).all()


def test_dense_daily_orders_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_dense_daily_orders
    out = q_dense_daily_orders(SF).to_pandas()
    od = pd.read_parquet(f"{SF}/orders.parquet")
    d = od.o_orderdate.dt.floor("D")
    c = od.groupby([od.o_orderpriority, d]).size()
    lo, hi = d.min(), d.max()
    span = (hi - lo).days + 1
    prios = sorted(od.o_orderpriority.unique())
    assert len(out) == span * len(prios)
    # zero-fill must bite
    assert (out.n == 0).any() and (out.n > 0).any()
    got = {(p, day): n for p, day, n in out.values}
    for (p, day), n in c.items():
        assert got[(p, day.strftime("%Y-%m-%d"))] == n
    assert sum(got.values()) == len(od)  # partition of all orders


def test_priority_status_chi2_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_priority_status_chi2
    out = q_priority_status_chi2(SF).to_pylist()[0]
    od = pd.read_parquet(f"{SF}/orders.parquet")
    ct = pd.crosstab(od.o_orderpriority, od.o_orderstatus)
    obs = ct.to_numpy().astype(np.float64)
    t = obs.sum()
    e = obs.sum(1)[:, None] * obs.sum(0)[None, :] / t
    ref = float(((obs - e) ** 2 / e).sum())
    assert abs(out["chi2"] - ref) < 1e-9 * max(ref, 1.0)
    assert out["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert out["n"] == len(od)
    # scipy cross-check when available
    try:
        from scipy.stats import chi2_contingency
        assert abs(out["chi2"]
                   - chi2_contingency(ct, correction=False)[0]) \
            < 1e-9 * max(ref, 1.0)
    except ImportError:
        pass


def test_csv_roundtrip_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_csv_roundtrip
    out = q_csv_roundtrip(SF).to_pandas()
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.floor(od.o_totalprice.to_numpy() * 100.0 + 0.5) \
        .astype(np.int64)
    ref = pd.DataFrame({"p": od.o_orderpriority, "c": cents}) \
        .groupby("p").agg(s=("c", "sum"), n=("c", "size"))
    assert dict(zip(out.priority, out.sum_cents)) \
        == ref.s.to_dict()
    assert dict(zip(out.priority, out.n)) == ref.n.to_dict()


# -- property fuzz: pair-emission kernels (pure, no Ray) ----------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(runs=st.lists(st.tuples(st.integers(0, 6),
                               st.integers(0, 7)), max_size=12))
def test_run_pairs_matches_combinations(runs):
    """_run_pairs on ANY sorted key array == per-key
    itertools.combinations of positions."""
    import itertools

    import numpy as np

    from soupflow.data.graph import _run_pairs
    keys = np.array(sorted(k for k, c in runs for _ in range(c)),
                    dtype=np.int64)
    i_idx, j_idx = _run_pairs(keys)
    got = sorted(zip(i_idx.tolist(), j_idx.tolist()))
    want = []
    for k in np.unique(keys):
        pos = np.flatnonzero(keys == k)
        want.extend(itertools.combinations(pos.tolist(), 2))
    assert got == sorted(want)


@settings(max_examples=60, deadline=None)
@given(pairs=st.lists(st.tuples(st.integers(0, 5),
                                st.integers(0, 5)), max_size=40))
def test_dedup_sorted_matches_drop_duplicates(pairs):
    import numpy as np

    from soupflow.data.graph import _dedup_sorted
    pairs = sorted(pairs)
    k = np.array([p[0] for p in pairs], dtype=np.int64)
    v = np.array([p[1] for p in pairs], dtype=np.int64)
    keep = _dedup_sorted(k, v)
    got = list(zip(k[keep].tolist(), v[keep].tolist()))
    assert got == sorted(set(pairs))


def test_distinct_pairs_and_topk_seeded_differential(ray_session):
    """Randomized differential: 5 seeds x random partition counts, the
    Ray primitives vs scalar references — the layout-sensitivity net
    for the edge-run fixups."""
    import itertools

    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.graph import distinct_pairs_per_key
    from soupflow.data.rank import grouped_topk_rows

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 400))
        df = pd.DataFrame({
            "k": rng.integers(0, int(rng.integers(2, 10)), n),
            "v": rng.integers(0, 25, n)})
        parts = int(rng.integers(1, 9))
        blocks = int(rng.integers(1, 9))
        pairs, distinct = distinct_pairs_per_key(
            ray.data.from_pandas(df).repartition(blocks),
            key_col="k", val_col="v", num_partitions=parts)
        per = df.drop_duplicates().groupby("k")["v"] \
            .apply(lambda s: sorted(s))
        want = sorted((k, a, b) for k, vs in per.items()
                      for a, b in itertools.combinations(vs, 2))
        assert sorted(map(tuple, pairs.to_pandas().values)) \
            == want, seed
        assert sorted(map(tuple, distinct.to_pandas().values)) \
            == sorted(map(tuple, df.drop_duplicates().values)), seed

        df2 = df.assign(t=rng.permutation(n))
        k = int(rng.integers(1, 4))
        out = grouped_topk_rows(
            ray.data.from_pandas(df2).repartition(blocks),
            key_col="k", order_col="v", tie_col="t", k=k,
            descending=bool(seed % 2), num_partitions=parts) \
            .to_pandas()
        ref = df2.sort_values(
            ["k", "v", "t"],
            ascending=[True, not (seed % 2), True]) \
            .groupby("k").head(k)
        assert sorted(map(tuple, out[["k", "v", "t"]].values)) \
            == sorted(map(tuple, ref[["k", "v", "t"]].values)), seed


def test_compact_roundtrip_reference(ray_session):
    import glob
    import os

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_compact_roundtrip
    out = q_compact_roundtrip(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    cents = np.floor(ev.value.to_numpy() * 100.0 + 0.5) \
        .astype(np.int64)
    ref = pd.DataFrame({"t": ev.event_type, "c": cents}) \
        .groupby("t").agg(s=("c", "sum"), n=("c", "size"))
    assert dict(zip(out.event_type, out.sum_cents)) == ref.s.to_dict()
    assert dict(zip(out.event_type, out.n)) == ref.n.to_dict()
    base = "/tmp/soupflow_compact/" + os.path.basename(SF)
    frag = glob.glob(base + "/frag/*.parquet")
    comp = glob.glob(base + "/compact/*.parquet")
    assert len(frag) >= 20 and len(comp) <= 4  # compaction bit


def test_group_cume_counts_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.rank import group_cume_counts

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "k": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 20, n)})       # heavy ties
    ref_le = df.groupby("k")["v"].transform(
        lambda s: s.map(lambda x: int((s <= x).sum())))
    ref_n = df.groupby("k")["v"].transform("size")
    # ties must bite: some c_le exceeds the RANK position
    assert (df.groupby(["k", "v"]).size() > 1).any()
    for parts in (1, 6):
        out = group_cume_counts(
            ray.data.from_pandas(df).repartition(parts),
            key="k", col="v").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(out.c_le) == list(ref_le)
        assert list(out.n_key) == list(ref_n)
    # cume_dist in [1/n, 1] and max row per group hits exactly 1
    cd = out.c_le / out.n_key
    assert (cd > 0).all() and (cd <= 1).all()
    assert (out.groupby("k").apply(
        lambda g: (g.c_le == g.n_key).any())).all()


def test_volume_shipping_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_volume_shipping
    out = q_volume_shipping(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    su = pd.read_parquet(f"{SF}/supplier.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey") \
        .merge(su, left_on="l_suppkey", right_on="s_suppkey") \
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
    j = j[((j.s_nationkey == 3) & (j.c_nationkey == 8))
          | ((j.s_nationkey == 8) & (j.c_nationkey == 3))]
    assert j.s_nationkey.nunique() == 2  # both directions bite
    rev = (np.floor(j.l_extendedprice.to_numpy() * 100 + 0.5)
           .astype(np.int64)
           * (100 - np.floor(j.l_discount.to_numpy() * 100 + 0.5)
              .astype(np.int64)))
    names = dict(zip(na.n_nationkey, na.n_name))
    ref = pd.DataFrame({
        "s": j.s_nationkey.map(names).to_numpy(),
        "c": j.c_nationkey.map(names).to_numpy(),
        "y": j.l_shipdate.dt.year.to_numpy(), "r": rev}) \
        .groupby(["s", "c", "y"])["r"].sum()
    got = {(a, b, y): r for a, b, y, r in
           out[["supp_nation", "cust_nation", "yr",
                "rev_cents"]].values}
    assert got == ref.to_dict()


def test_time_weighted_avg_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import time_weighted_avg

    rng = np.random.default_rng(29)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n).astype(np.int64),
        "ts": pd.to_datetime(
            1_700_000_000_000_000
            + rng.permutation(n).astype(np.int64) * 1_000_000,
            unit="us"),
        "i": np.arange(n, dtype=np.int64),
        "v": rng.integers(1, 100, n).astype(np.int64)})

    def ref(d):
        out = {}
        for k, g in d.sort_values(["ts", "i"]).groupby("k"):
            t = g.ts.astype(np.int64).to_numpy() // 1000  # ns -> us
            v = g.v.to_numpy()
            dt = np.diff(t)
            out[k] = (int((dt * v[:-1]).sum()), int(dt.sum()))
        return out

    want = ref(df)
    for parts in (1, 4, 16):
        out = time_weighted_avg(
            ray.data.from_pandas(df).repartition(5), key_col="k",
            ts_col="ts", id_col="i", val_col="v",
            num_partitions=parts).to_pandas()
        got = {k: (n_, d_) for k, n_, d_ in
               out[["k", "num_us_val", "den_us"]].values}
        assert got == want, parts
    # single hot key spanning every block: all pairs via seams+blocks
    one = df.assign(k=3)
    out1 = time_weighted_avg(
        ray.data.from_pandas(one).repartition(9), key_col="k",
        ts_col="ts", id_col="i", val_col="v",
        num_partitions=9).to_pandas()
    w1 = ref(one)
    assert {k: (a, b) for k, a, b in
            out1[["k", "num_us_val", "den_us"]].values} == w1


def test_value_twa_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_value_twa
    out = q_value_twa(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["cents"] = np.floor(ev.value.to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    got = {u: (a, b) for u, a, b in
           out[["user_id", "num_us_val", "den_us"]].values}
    for u, g in ev.sort_values(["ts", "event_id"]) \
            .groupby("user_id"):
        t = g.ts.to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        dt = np.diff(t)
        assert got[u] == (int((dt * g.cents.to_numpy()[:-1]).sum()),
                          int(dt.sum()))


def test_ordered_funnel_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import ordered_funnel

    rng = np.random.default_rng(41)
    n = 900
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n).astype(np.int64),
        "ts": pd.to_datetime(
            1_700_000_000_000_000
            + rng.permutation(n).astype(np.int64) * 50_000_000,
            unit="us"),
        "et": rng.choice(["a", "b", "c", "x"], n)})
    W = 2_000_000_000  # 2000 s in us

    def ref(d):
        out = []
        prev = {}
        for i, s in enumerate(("a", "b", "c")):
            ev = d[d.et == s]
            cur = {}
            for k, g in ev.groupby("k"):
                t = g.ts.to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
                if i == 0:
                    cur[k] = t.min()
                elif k in prev:
                    q = t[(t > prev[k]) & (t <= prev[k] + W)]
                    if q.size:
                        cur[k] = q.min()
            prev = cur
            out.append(len(cur))
        return out

    want = ref(df)
    assert want[0] > want[1] > want[2] > 0  # drop-off bites
    for parts in (1, 6):
        out = ordered_funnel(
            ray.data.from_pandas(df).repartition(4), key_col="k",
            ts_col="ts", type_col="et", steps=("a", "b", "c"),
            window_us=W, num_partitions=parts)
        assert out.column("n_keys").to_pylist() == want, parts


def test_strict_funnel_reference(ray_session):
    from soupflow.queries import q_strict_funnel
    out = q_strict_funnel(SF)
    n = dict(zip(out.column("step").to_pylist(),
                 out.column("n_keys").to_pylist()))
    assert n["view"] > n["click"] > n["purchase"] > 0
    assert n == {"view": 15, "click": 6, "purchase": 3}


def test_outlink_hosts_reference(ray_session):
    from collections import Counter

    import pandas as pd

    from soupflow.queries import q_outlink_hosts
    out = q_outlink_hosts(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ref = Counter()
    for text in docs.text:
        for w in text.split()[:3]:
            ref[w + ".example.com"] += 1
    ref["base.example"] = len(docs)  # one relative link per doc
    assert dict(zip(out.host, out.n)) == dict(ref)
    assert "base.example" in set(out.host)  # absUrl leg bites


def test_salted_join_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.joins import salted_join

    rng = np.random.default_rng(19)
    n = 4000
    big = pd.DataFrame({
        "k": np.where(rng.random(n) < 0.8, 7,
                      rng.integers(0, 40, n)).astype(np.int64),
        "x": np.arange(n, dtype=np.int64)})
    small = pd.DataFrame({
        "sk": np.arange(40, dtype=np.int64),
        "label": [f"L{i}" for i in range(40)]})
    ref = big.merge(small, left_on="k", right_on="sk")
    for salt in (2, 16):
        out = salted_join(
            ray.data.from_pandas(big).repartition(6),
            ray.data.from_pandas(small), on="k", right_on="sk",
            salt=salt, num_partitions=8).to_pandas()
        assert sorted(map(tuple, out[["k", "x", "label"]].values)) \
            == sorted(map(tuple, ref[["k", "x", "label"]].values)), \
            salt
    # keys missing from the small side drop (inner semantics)
    big2 = pd.concat([big, pd.DataFrame({"k": [999], "x": [-1]})])
    out2 = salted_join(
        ray.data.from_pandas(big2).repartition(3),
        ray.data.from_pandas(small), on="k", right_on="sk",
        salt=4).to_pandas()
    assert len(out2) == len(ref) and -1 not in set(out2.x)


def test_new_primitives_empty_and_tiny_inputs(ray_session):
    """Regression net for the empty/tiny-input class: Ray 2.49 emits
    SCHEMA-LESS blocks from empty sorts/groupbys, and its hash join
    fails if ANY input block is zero-row — every new primitive must
    survive both regimes."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.graph import (distinct_pairs_per_key,
                                     triangle_counts)
    from soupflow.data.rank import (group_cume_counts, group_rank,
                                    grouped_topk_rows)
    from soupflow.data.windows import (ordered_funnel,
                                       ordered_string_agg,
                                       time_weighted_avg)

    ei = pd.Series([], dtype=np.int64)
    p, d = distinct_pairs_per_key(
        ray.data.from_pandas(pd.DataFrame({"k": ei, "v": ei})),
        key_col="k", val_col="v")
    assert p.count() == 0 and d.count() == 0
    assert triangle_counts(
        ray.data.from_pandas(pd.DataFrame({"a": ei, "b": ei})),
        src_col="a", dst_col="b").count() == 0
    assert triangle_counts(  # 1 edge: wedge-free graph
        ray.data.from_pandas(pd.DataFrame({"a": [1], "b": [2]})),
        src_col="a", dst_col="b").count() == 0
    tri = triangle_counts(  # smallest triangle, all-edge-run blocks
        ray.data.from_pandas(
            pd.DataFrame({"a": [1, 1, 2], "b": [2, 3, 3]})),
        src_col="a", dst_col="b").to_pandas()
    assert dict(zip(tri.v, tri.n_tri)) == {1: 1, 2: 1, 3: 1}
    assert grouped_topk_rows(
        ray.data.from_pandas(
            pd.DataFrame({"k": ei, "v": ei, "t": ei})),
        key_col="k", order_col="v", tie_col="t", k=2).count() == 0
    es = pd.Series([], dtype=str)
    assert group_cume_counts(
        ray.data.from_pandas(
            pd.DataFrame({"doc_id": ei, "k": es, "v": ei})),
        key="k", col="v").count() == 0
    assert group_rank(
        ray.data.from_pandas(
            pd.DataFrame({"doc_id": ei, "k": es, "v": ei})),
        key="k", col="v").count() == 0
    assert ordered_string_agg(
        ray.data.from_pandas(pd.DataFrame({"k": ei, "t": ei,
                                           "v": es})),
        key_col="k", order_cols=["t"], val_col="v").count() == 0
    assert time_weighted_avg(
        ray.data.from_pandas(pd.DataFrame({
            "k": [1], "ts": pd.to_datetime([0], unit="us"),
            "i": [0], "v": [5]})), key_col="k", ts_col="ts",
        id_col="i", val_col="v").count() == 0  # 1 event: no pair
    # funnel: a step with ZERO events anywhere zero-fills the tail
    out = ordered_funnel(
        ray.data.from_pandas(pd.DataFrame({
            "k": [1, 1], "ts": pd.to_datetime([0, 1], unit="us"),
            "et": ["a", "a"]})), key_col="k", ts_col="ts",
        type_col="et", steps=("a", "b", "c"), window_us=10)
    assert out.column("n_keys").to_pylist() == [1, 0, 0]


def test_priority_trend_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_priority_trend
    out = q_priority_trend(SF).to_pandas()
    od = pd.read_parquet(f"{SF}/orders.parquet")
    d = od.o_orderdate.to_numpy().astype("datetime64[D]") \
        .astype(np.int64)
    lo, hi = int(d.min()), int(d.max())
    xs = np.arange(lo, hi + 1, dtype=np.int64)
    got = {p: (a, b) for p, a, b in
           out[["priority", "slope_num", "slope_den"]].values}
    for p in od.o_orderpriority.unique():
        y = np.zeros(xs.size, dtype=np.int64)
        dd = d[(od.o_orderpriority == p).to_numpy()]
        np.add.at(y, dd - lo, 1)
        # numpy polyfit cross-check: slope == num/den
        num, den = got[p]
        slope = np.polyfit(xs.astype(float), y.astype(float), 1)[0]
        assert abs(num / den - slope) < 1e-9
        # exact integer identity
        n = xs.size
        assert num == n * int((xs * y).sum()) \
            - int(xs.sum()) * int(y.sum())
        assert den == n * int((xs * xs).sum()) - int(xs.sum()) ** 2
    assert (out.slope_den > 0).all()
    assert out.slope_num.abs().sum() > 0  # a trend actually exists


def test_spearman_qty_disc_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_spearman_qty_disc
    out = q_spearman_qty_disc(SF)
    got = dict(zip(out.column("l_returnflag").to_pylist(),
                   out.column("rho").to_pylist()))
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    q = np.floor(li.l_quantity.to_numpy() + 0.5).astype(np.int64)
    d = np.floor(li.l_discount.to_numpy() * 10000 + 0.5) \
        .astype(np.int64)
    df = pd.DataFrame({"f": li.l_returnflag, "q": q, "d": d})
    for f, g in df.groupby("f"):
        # pandas spearman = Pearson on tie-averaged ranks
        ref = g["q"].rank().corr(g["d"].rank())
        assert abs(got[f] - ref) < 1e-12, f
    assert len(got) == 3 and all(abs(r) < 1 for r in got.values())
    # ties must bite: far fewer distinct values than rows
    assert df.q.nunique() < len(df) / 10


def test_spend_gini_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_spend_gini
    out = q_spend_gini(SF).to_pylist()[0]
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.floor(od.o_totalprice.to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    s = pd.DataFrame({"k": od.o_custkey, "x": cents}) \
        .groupby("k")["x"].sum().reset_index() \
        .sort_values(["x", "k"]).reset_index(drop=True)
    n = len(s)
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(((2 * i - n - 1) * s.x.to_numpy()).sum())
    den = n * int(s.x.sum())
    assert out == {"gini_num": num, "gini_den": den,
                   "n_customers": n}
    g = num / den
    assert 0 < g < 1  # genuine inequality, not degenerate
    # classic alternative formula cross-check: mean absolute
    # difference / (2 * mean)
    x = s.x.to_numpy().astype(float)
    mad = np.abs(x[:, None] - x[None, :]).mean()
    assert abs(g - mad / (2 * x.mean())) < 1e-9


def test_transition_and_interval_empty_inputs(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import interval_union, transition_counts

    ei = pd.Series([], dtype=np.int64)
    ets = pd.Series([], dtype="datetime64[us]")
    t = transition_counts(
        ray.data.from_pandas(pd.DataFrame(
            {"k": ei, "ts": ets, "i": ei,
             "v": pd.Series([], dtype=str)})),
        key_col="k", ts_col="ts", id_col="i", val_col="v")
    assert t.num_rows == 0
    assert interval_union(
        ray.data.from_pandas(pd.DataFrame(
            {"user_id": ei, "ts": ets, "event_id": ei,
             "dur_us": ei})),
        key_col="user_id", ts_col="ts", id_col="event_id",
        dur_col="dur_us").count() == 0


def test_pareto_half_reference(ray_session):
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_pareto_half
    out = q_pareto_half(SF).to_pylist()[0]
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.floor(od.o_totalprice.to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    s = pd.DataFrame({"k": od.o_custkey, "x": cents}) \
        .groupby("k")["x"].sum().reset_index() \
        .sort_values(["x", "k"], ascending=[False, True])
    c = np.cumsum(s.x.to_numpy())
    tot = int(c[-1])
    kk = int(np.searchsorted(2 * c, tot)) + 1
    assert out == {"k_customers": kk, "topk_cents": int(c[kk - 1]),
                   "total_cents": tot}
    # concentration bites: fewer than half the customers hold half
    assert 0 < kk < len(s) / 2
    # crossing is tight: one fewer customer is below half
    assert 2 * int(c[kk - 2]) < tot <= 2 * int(c[kk - 1])


SF01 = "/root/testdata/sf0.01"


def _rows_sorted(tbl_or_ds):
    t = tbl_or_ds if isinstance(tbl_or_ds, pa.Table) \
        else pa.Table.from_pylist(tbl_or_ds.take_all())
    cols = sorted(t.schema.names)
    return sorted(tuple(r[c] for c in cols) for r in t.to_pylist())


def test_retention_cohorts_partitioned_matches_broadcast(ray_session):
    """join="partitioned" (user-partitioned hash join instead of the
    driver cohort broadcast) must be row-identical at sf0.01."""
    from soupflow.queries import q_retention_cohorts
    bc = _rows_sorted(q_retention_cohorts(SF01))
    pt = _rows_sorted(q_retention_cohorts(SF01, join="partitioned",
                                          num_partitions=8))
    assert bc == pt and len(bc) > 0


def test_order_quartile_partitioned_matches_broadcast(ray_session):
    """join="partitioned" (custkey-partitioned count join instead of
    the sorted-array broadcast) must assign identical tiles."""
    from soupflow.queries import q_order_quartile
    bc = _rows_sorted(q_order_quartile(SF01))
    pt = _rows_sorted(q_order_quartile(SF01, join="partitioned",
                                       num_partitions=8))
    assert bc == pt and len(bc) > 0


def test_first_order_value_partitioned_matches_broadcast(ray_session):
    """join="partitioned" (orderkey-partitioned winner semi-join
    instead of the winner-set broadcast) must pick identical rows."""
    from soupflow.queries import q_first_order_value
    bc = _rows_sorted(q_first_order_value(SF01))
    pt = _rows_sorted(q_first_order_value(SF01, join="partitioned",
                                          num_partitions=8))
    assert bc == pt and len(bc) > 0


def test_big_orders_partitioned_matches_broadcast(ray_session):
    """join="partitioned" (orderkey- then custkey-partitioned hash
    joins instead of the two broadcasts) must be row-identical."""
    from soupflow.queries import q_big_orders
    bc = _rows_sorted(q_big_orders(SF01))
    pt = _rows_sorted(q_big_orders(SF01, join="partitioned",
                                   num_partitions=8))
    assert bc == pt and len(bc) > 0


def test_revenue_by_nation_partitioned_matches_broadcast(ray_session):
    """join="partitioned" (two partitioned hash joins + wide custkey
    groupby instead of the one-pass sentinel sort with the broadcast
    customer dim) must be row-identical at sf0.01."""
    from soupflow.queries import q_revenue_by_nation
    bc = _rows_sorted(q_revenue_by_nation(SF01))
    pt = _rows_sorted(q_revenue_by_nation(SF01, join="partitioned",
                                          num_partitions=8))
    assert bc == pt and len(bc) > 0


def test_time_weighted_avg_all_tied_timestamps_key(ray_session):
    """ADVICE regression: a key whose events ALL share one timestamp
    (legal — ids differ) must surface as a (key, 0, 0) row exactly
    like the oracle's LEAD form, not vanish; single-event keys stay
    absent in both engines."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import time_weighted_avg
    base = 1_700_000_000_000_000
    df = pd.DataFrame({
        "k": np.array([1, 1, 1,      # all-tied key
                       2,            # single-event key
                       3, 3, 3],     # normal key
                      np.int64),
        "ts": pd.to_datetime(
            np.array([base, base, base,
                      base,
                      base, base + 5_000_000, base + 7_000_000],
                     np.int64), unit="us"),
        "i": np.arange(7, dtype=np.int64),
        "v": np.array([10, 20, 30, 40, 2, 3, 5], np.int64)})
    for parts in (1, 3):
        out = time_weighted_avg(
            ray.data.from_pandas(df).repartition(4), key_col="k",
            ts_col="ts", id_col="i", val_col="v",
            num_partitions=parts).to_pandas()
        got = {k: (n_, d_) for k, n_, d_ in
               out[["k", "num_us_val", "den_us"]].values}
        assert got == {1: (0, 0),
                       3: (2 * 5_000_000 + 3 * 2_000_000, 7_000_000)}


def test_ordered_string_agg_boundary_split_duplicate_raises(
        ray_session):
    """ADVICE regression: a duplicate (key, order) tuple split
    EXACTLY at a block boundary — earlier piece >1 row — must raise
    via the run-LAST vs run-FIRST seam check; every partition layout
    in the sweep must catch it one way or the other."""
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.windows import ordered_string_agg
    n = 60
    t = list(range(n))
    t[n // 2] = t[n // 2 - 1]  # one duplicated tuple mid-run
    df = pd.DataFrame({"k": [1] * n, "t": t,
                       "v": [f"w{i}" for i in range(n)]})
    for parts in (1, 2, 3, 4, 6, 8):
        ds = ray.data.from_pandas(df).repartition(5)
        with pytest.raises(Exception, match="unique"):
            ordered_string_agg(ds, key_col="k", order_cols=["t"],
                               val_col="v", num_partitions=parts) \
                .materialize()


def test_distinct_pairs_max_run_raises_pre_collect(ray_session):
    """ADVICE regression: an oversized run must fail in the WORKER
    (edge_rows piece check) before its distinct set ships to the
    driver — not only in the post-collect boundary guard."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.graph import distinct_pairs_per_key

    df = pd.DataFrame({"k": np.zeros(50, np.int64),
                       "v": np.arange(50, dtype=np.int64)})
    with pytest.raises(Exception, match="pre-collect"):
        distinct_pairs_per_key(
            ray.data.from_pandas(df), key_col="k", val_col="v",
            num_partitions=1, max_run=8)


def test_late_suppliers_empty_and_tiny_sf_dirs(ray_session, tmp_path):
    """One-pass late_suppliers degenerate regimes: fully empty tables
    (schema-less sort/collect guards) and a single-supplier order
    (EXISTS leg must reject ns == 1) both return the typed-empty
    result instead of crashing; a two-supplier one-late order wins."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_late_suppliers

    def write_sf(d, orders, lineitem, supplier):
        d.mkdir(exist_ok=True)
        orders.to_parquet(d / "orders.parquet")
        lineitem.to_parquet(d / "lineitem.parquet")
        supplier.to_parquet(d / "supplier.parquet")
        return str(d)

    o_cols = dict(o_orderkey=pd.Series([], dtype="int64"),
                  o_orderdate=pd.Series([], dtype="datetime64[us]"))
    l_cols = dict(l_orderkey=pd.Series([], dtype="int64"),
                  l_suppkey=pd.Series([], dtype="int64"),
                  l_shipdate=pd.Series([], dtype="datetime64[us]"))
    s_cols = dict(s_suppkey=pd.Series([], dtype="int64"),
                  s_name=pd.Series([], dtype="object"))
    sf_empty = write_sf(tmp_path / "empty", pd.DataFrame(o_cols),
                        pd.DataFrame(l_cols), pd.DataFrame(s_cols))
    out = q_late_suppliers(sf_empty)
    assert out.num_rows == 0
    assert out.schema.names == ["s_name", "numwait"]

    d0 = pd.Timestamp("1995-01-01")
    sup = pd.DataFrame({"s_suppkey": np.array([1, 2], np.int64),
                        "s_name": ["Supplier#1", "Supplier#2"]})
    # one order, ONE supplier, very late -> ns=1 fails the EXISTS leg
    sf_one = write_sf(
        tmp_path / "one",
        pd.DataFrame({"o_orderkey": np.array([7], np.int64),
                      "o_orderdate": [d0]}),
        pd.DataFrame({"l_orderkey": np.array([7], np.int64),
                      "l_suppkey": np.array([1], np.int64),
                      "l_shipdate": [d0 + pd.Timedelta(days=200)]}),
        sup)
    assert q_late_suppliers(sf_one).num_rows == 0

    # two suppliers, exactly one late -> that supplier wins once
    sf_two = write_sf(
        tmp_path / "two",
        pd.DataFrame({"o_orderkey": np.array([7], np.int64),
                      "o_orderdate": [d0]}),
        pd.DataFrame({"l_orderkey": np.array([7, 7], np.int64),
                      "l_suppkey": np.array([1, 2], np.int64),
                      "l_shipdate": [d0 + pd.Timedelta(days=200),
                                     d0 + pd.Timedelta(days=1)]}),
        sup)
    rows = q_late_suppliers(sf_two).to_pylist()
    assert rows == [{"s_name": "Supplier#1", "numwait": 1}]


def test_partitioned_hatches_empty_sf_dirs(ray_session, tmp_path):
    """The four round-5 partitioned hatches must survive EMPTY input
    tables (the filter-eliminated-everything regime): each
    short-circuits to its typed-empty result instead of tripping Ray
    2.49's empty-side hash-join failure."""
    import pandas as pd

    from soupflow.queries import (q_big_orders, q_first_order_value,
                                  q_order_quartile,
                                  q_retention_cohorts)

    d = tmp_path / "sf_empty"
    d.mkdir()
    pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_custkey": pd.Series([], dtype="int64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_totalprice": pd.Series([], dtype="float64")}) \
        .to_parquet(d / "orders.parquet")
    pd.DataFrame({
        "l_orderkey": pd.Series([], dtype="int64"),
        "l_quantity": pd.Series([], dtype="float64")}) \
        .to_parquet(d / "lineitem.parquet")
    pd.DataFrame({
        "c_custkey": pd.Series([], dtype="int64"),
        "c_name": pd.Series([], dtype="object")}) \
        .to_parquet(d / "customer.parquet")
    pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]")}) \
        .to_parquet(d / "events.parquet")
    sf = str(d)

    rc = q_retention_cohorts(sf, join="partitioned",
                             num_partitions=2)
    assert rc.count() == 0
    oq = q_order_quartile(sf, join="partitioned", num_partitions=2)
    assert oq.count() == 0
    fv = q_first_order_value(sf, join="partitioned",
                             num_partitions=2)
    assert fv.count() == 0
    bo = q_big_orders(sf, join="partitioned", num_partitions=2)
    assert bo.count() == 0


def test_catalog_wide_empty_guard(ray_session, tmp_path):
    """The registration-level empty-input guard: on a fully-empty sf
    dir (real schemas, zero rows — the filter-eliminated-everything
    regime) every guarded query returns its typed-empty result via
    parquet-footer counts alone, instead of tripping Ray 2.49's
    empty-side hash-join failure or a schema-less-collect KeyError.
    The result's columns and types must equal the captured real-output
    schema, so downstream consumers see an identical contract."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from soupflow.queries import (_EMPTY_GUARD_TYPES,
                                  EMPTY_RESULT_SCHEMAS, QUERIES)

    d = tmp_path / "sf_all_empty"
    d.mkdir()
    for p in glob.glob(f"{SF}/*.parquet"):
        schema = pq.read_schema(p)
        pq.write_table(schema.empty_table(),
                       str(d / os.path.basename(p)))

    assert len(EMPTY_RESULT_SCHEMAS) == 50
    for name, cols in EMPTY_RESULT_SCHEMAS.items():
        out = QUERIES[name](str(d))
        assert isinstance(out, pa.Table), name
        assert out.num_rows == 0, name
        assert out.schema.names == [c for c, _ in cols], name
        for (c, t) in cols:
            assert out.schema.field(c).type == _EMPTY_GUARD_TYPES[t], \
                (name, c)


def test_table_rows_meta_footer_counts(tmp_path):
    """_table_rows_meta reads row counts from parquet footers for both
    single-file and directory-of-files layouts — no Ray session."""
    import pandas as pd

    from soupflow.queries import _table_rows_meta

    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(tmp_path / "t.parquet")
    assert _table_rows_meta(str(tmp_path), "t") == 3

    d = tmp_path / "u.parquet"
    d.mkdir()
    pd.DataFrame({"x": [1]}).to_parquet(d / "a.parquet")
    pd.DataFrame({"x": [2, 3]}).to_parquet(d / "b.parquet")
    assert _table_rows_meta(str(tmp_path), "u") == 3


def test_rolling_distinct_count_reference(ray_session):
    """rolling_distinct_count == a scalar range-scan COUNT DISTINCT
    reference for every (window, partition-layout) combination, incl.
    w=1 (plain per-day distinct), windows larger than every gap, a
    single hot key spanning every block (all runs are edge runs), and
    cross-block duplicate (key, day) pairs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray

    from soupflow.data.windows import rolling_distinct_count

    rng = np.random.default_rng(41)
    n = 800
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "d": rng.integers(20000, 20060, n).astype(np.int64)})

    def ref(data, w):
        pairs = data.drop_duplicates()
        out = {}
        for t in np.sort(pairs.d.unique()):
            m = (pairs.d >= t - w + 1) & (pairs.d <= t)
            out[int(t)] = int(pairs.k[m].nunique())
        return out

    for w in (1, 7, 30):
        want = ref(df, w)
        for parts in (1, 4, 16):
            t = rolling_distinct_count(
                ray.data.from_pandas(df).repartition(parts),
                key_col="k", day_col="d", window=w)
            got = dict(zip(t.column("day_i").to_pylist(),
                           t.column("n_distinct").to_pylist()))
            assert got == want, (w, parts)

    # single hot key spanning every block, sparse day gaps > window,
    # and duplicated pairs that land in different blocks
    one = pd.DataFrame({
        "k": np.zeros(14, np.int64),
        "d": np.array([0, 0, 1, 2, 2, 10, 11, 40, 41, 42, 43, 90,
                       91, 200], np.int64)})
    t1 = rolling_distinct_count(
        ray.data.from_pandas(one).repartition(7),
        key_col="k", day_col="d", window=7)
    got1 = dict(zip(t1.column("day_i").to_pylist(),
                    t1.column("n_distinct").to_pylist()))
    assert got1 == ref(one, 7)

    # typed-empty passthrough + contract raises
    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "d": pd.Series([], dtype=np.int64)})
    t0 = rolling_distinct_count(ray.data.from_pandas(empty),
                                key_col="k", day_col="d", window=7)
    assert t0.num_rows == 0
    assert t0.schema.names == ["day_i", "n_distinct"]
    assert t0.schema.field("n_distinct").type == pa.int64()
    with pytest.raises(ValueError, match="window"):
        rolling_distinct_count(ray.data.from_pandas(empty),
                               key_col="k", day_col="d", window=0)
    big = pd.DataFrame({"k": np.zeros(1, np.int64),
                        "d": np.array([2 ** 41], np.int64)})
    with pytest.raises(Exception, match="2\\^40"):
        rolling_distinct_count(ray.data.from_pandas(big),
                               key_col="k", day_col="d", window=7)


def test_rolling_active_users_corpus(ray_session):
    """q_rolling_active_users == the pandas range-scan reference on
    the real sf0.001 events corpus (30 observed days, 7-day window)."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_rolling_active_users

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    day = ev.ts.to_numpy().astype("datetime64[D]")
    pairs = pd.DataFrame({"u": ev.user_id.to_numpy(),
                          "d": day.astype(np.int64)}).drop_duplicates()
    want = {}
    for t in np.sort(pairs.d.unique()):
        m = (pairs.d >= t - 6) & (pairs.d <= t)
        want[np.int64(t).astype("datetime64[D]").astype(str)] = \
            int(pairs.u[m].nunique())

    out = q_rolling_active_users(SF)
    got = dict(zip(out.column("day").to_pylist(),
                   out.column("wau").to_pylist()))
    assert got == want
    assert len(got) >= 3  # must-bite: several observed days

    # w=7 saturates on this corpus (15 users, all active weekly), so
    # the degenerate-kernel guard runs at w=1 where the true rolling
    # count VARIES across days (11..15 at sf0.001) — a kernel that
    # always emitted the global distinct count would fail here.
    want1 = {}
    for t in np.sort(pairs.d.unique()):
        m = pairs.d == t
        want1[np.int64(t).astype("datetime64[D]").astype(str)] = \
            int(pairs.u[m].nunique())
    out1 = q_rolling_active_users(SF, window=1)
    got1 = dict(zip(out1.column("day").to_pylist(),
                    out1.column("wau").to_pylist()))
    assert got1 == want1
    assert max(got1.values()) > min(got1.values())


def test_value_mad_reference(ray_session):
    """q_value_mad (grouped median absolute deviation, exact 4·MAD /
    2·median integer units) == a numpy reference on the sf0.001
    corpus AND on randomized corpora with odd/even group sizes and
    multi-block layouts."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_value_mad

    def ref(df):
        out = {}
        for k, g in df.groupby("event_type"):
            c = np.floor(g.value.to_numpy() * 100.0 + 0.5) \
                .astype(np.int64)
            med = np.median(c)
            mad = np.median(np.abs(c - med))
            out[k] = (int(round(4 * mad)), int(round(2 * med)))
        return out

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    want = ref(ev)
    out = q_value_mad(SF).to_pandas()
    got = {r.event_type: (int(r.mad4), int(r.med2))
           for r in out.itertuples()}
    assert got == want
    assert len(got) >= 3                       # several groups
    assert any(v[0] > 0 for v in got.values())  # MAD actually bites
    # must-bite: dispersion differs across groups OR from the median
    assert len({v[0] for v in got.values()}) > 1 or \
        all(v[0] != v[1] for v in got.values())

    # randomized corpora: odd/even sizes, constant group (MAD=0),
    # multi-file layout so histogram partials span blocks
    rng = np.random.default_rng(53)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], 501),
        "value": np.round(rng.gamma(2.0, 10.0, 501), 2)})
    df.loc[df.event_type == "c", "value"] = 7.77  # constant group
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        import os
        os.makedirs(f"{d}/events.parquet")
        for i, part in enumerate(np.array_split(df, 5)):
            part.to_parquet(f"{d}/events.parquet/p{i}.parquet")
        out2 = q_value_mad(d).to_pandas()
        got2 = {r.event_type: (int(r.mad4), int(r.med2))
                for r in out2.itertuples()}
        assert got2 == ref(df)
        assert got2["c"][0] == 0  # constant group has zero MAD


def test_jl_project_reference(ray_session):
    """jl_project == a numpy integer-matmul reference in both
    layouts; the sign matrix is deterministic, balanced, and the
    distance-sketch property holds directionally (close vectors stay
    closer than far ones on average over k=8 projections)."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.similarity import jl_project, jl_signs

    s = jl_signs(64, 8)
    assert s.shape == (64, 8) and set(np.unique(s)) == {-1, 1}
    # deterministic + roughly balanced (Rademacher)
    assert (jl_signs(64, 8) == s).all()
    assert 0.3 < (s > 0).mean() < 0.7

    rng = np.random.default_rng(67)
    m = rng.normal(0, 0.2, (120, 64)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": [r.tolist() for r in m]})
    v6 = np.floor(m.astype(np.float64) * 1e6).astype(np.int64)
    want = v6 @ s

    ds = ray.data.from_pandas(df).repartition(5)
    long = jl_project(ds, k=8, out="long").to_pandas() \
        .sort_values(["vec_id", "j"])
    got = long.p.to_numpy().reshape(120, 8)
    assert (got == want).all()

    lst = jl_project(ds, k=8, out="list").to_pandas() \
        .sort_values("vec_id")
    got2 = np.array([np.asarray(r) for r in lst.proj])
    assert (got2 == want).all()


def test_editdist1_pairs_reference(ray_session):
    """editdist1_pairs == a brute-force O(n²) Levenshtein reference
    on randomized typo corpora (substitutions, insertions, deletions,
    transpositions-as-negatives, repeated-char indels that surface
    the same pair via several variants) across partition layouts;
    the max_run contract raises in the worker."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.dedup import _edit_le1, editdist1_pairs

    # kernel-level exactness vs a classic DP implementation
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(71)
    alpha = list("abcd")
    words = ["".join(rng.choice(alpha, rng.integers(1, 7)))
             for _ in range(300)]
    for a in words[:60]:
        for b in words[60:120]:
            assert _edit_le1(a, b) == (lev(a, b) <= 1), (a, b)

    # BYTE-level semantics, pinned against DuckDB's levenshtein():
    # 'é' spans two UTF-8 bytes, so a multibyte substitution is
    # distance 2 (NOT a pair), while a one-byte diff inside the
    # multibyte char is distance 1
    import duckdb
    for a, b in [("héllo", "hello"), ("héllo", "hèllo"),
                 ("ไทยAB", "ไทยAC"), ("ไทยAB", "ไทยABC")]:
        want_d1 = duckdb.sql(
            f"SELECT levenshtein('{a}', '{b}') <= 1").fetchone()[0]
        assert _edit_le1(a, b) == want_d1, (a, b)
    assert not _edit_le1("héllo", "hello")  # char-dist 1, byte-dist 2
    assert _edit_le1("héllo", "hèllo")

    # corpus-level: texts whose 12-char prefixes contain planted
    # substitution / indel / transposition neighbors + noise
    base = "abcdefghijkl"
    texts = [base, "aXcdefghijkl",      # substitution
             "abcdefghijk",             # deletion (11 chars)
             "aabcdefghijk",            # insertion w/ repeated char
             "bacdefghijkl",            # transposition (dist 2: NOT a pair)
             "zyxwvutsrqpo", "zyxwvutsrqpo"]  # dup key, no neighbor
    texts += ["".join(rng.choice(alpha, 20)) for _ in range(200)]
    df = pd.DataFrame({"text": texts})

    keys = sorted({t[:12] for t in texts if len(t) >= 4})
    want = {(a, b) for i, a in enumerate(keys)
            for b in keys[i + 1:] if lev(a, b) <= 1}

    for parts in (1, 3, 8):
        out = editdist1_pairs(
            ray.data.from_pandas(df).repartition(parts),
            col="text", prefix_len=12, min_len=4)
        got = set(zip(out.column("s1").to_pylist(),
                      out.column("s2").to_pylist()))
        assert got == want, parts
    assert ("abcdefghijk", "abcdefghijkl") in want  # indel pair bites
    assert ("abcdefghijkl", "bacdefghijkl") not in want  # transpose out

    # pathological shared variant raises in the worker
    crowd = pd.DataFrame({"text": [f"aaaaaaaaaaa{c}" for c in
                                   "abcdefghijklmnopqrstuvwxyz"]})
    with pytest.raises(Exception, match="max_run"):
        editdist1_pairs(ray.data.from_pandas(crowd), col="text",
                        prefix_len=12, min_len=4, max_run=10)

    # typed-empty passthrough
    out0 = editdist1_pairs(
        ray.data.from_pandas(pd.DataFrame({"text": pd.Series(
            [], dtype=str)})), col="text")
    assert out0.num_rows == 0 and out0.schema.names == ["s1", "s2"]


def test_grouped_weighted_median_reference(ray_session):
    """grouped_weighted_median == a scalar repeat-expansion
    reference (weighted median of ints == plain lower median of the
    weight-expanded multiset) across layouts; all-equal weights
    reduce to the lower median; zero-weight keys drop; negative
    weights raise."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.rank import grouped_weighted_median

    rng = np.random.default_rng(83)
    n = 600
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 50, n).astype(np.int64),
        "w": rng.integers(0, 4, n).astype(np.int64)})
    df.loc[df.k == "c", "w"] = 0  # zero-mass key must drop

    def ref(d):
        out = {}
        for k, g in d.groupby("k"):
            ex = np.repeat(g.v.to_numpy(), g.w.to_numpy())
            if ex.size == 0:
                continue
            ex.sort()
            out[k] = int(ex[(ex.size - 1) // 2])  # lower median
        return out

    want = ref(df)
    assert "c" not in want and len(want) == 2
    for parts in (1, 4, 12):
        got = grouped_weighted_median(
            ray.data.from_pandas(df).repartition(parts),
            "k", "v", "w")
        assert dict(zip(got.k, got.wmedian)) == want, parts

    # bucket refinement (the near-unique-domain path) must equal the
    # one-pass form for every coarse width, incl. bucket boundaries
    wide = pd.DataFrame({
        "k": rng.choice(["a", "b"], 400),
        "v": rng.integers(0, 10_000_000, 400).astype(np.int64),
        "w": rng.integers(1, 5, 400).astype(np.int64)})
    base = grouped_weighted_median(
        ray.data.from_pandas(wide), "k", "v", "w")
    for bits in (1, 4, 12, 20):
        two = grouped_weighted_median(
            ray.data.from_pandas(wide).repartition(5),
            "k", "v", "w", coarse_bits=bits)
        assert dict(zip(two.k, two.wmedian)) == \
            dict(zip(base.k, base.wmedian)), bits
    with pytest.raises(Exception, match="non-negative"):
        grouped_weighted_median(
            ray.data.from_pandas(wide.assign(v=-5)), "k", "v", "w",
            coarse_bits=4)

    # all-ones weights == plain lower median
    ones = df.assign(w=1)
    got1 = grouped_weighted_median(
        ray.data.from_pandas(ones).repartition(3), "k", "v", "w")
    assert dict(zip(got1.k, got1.wmedian)) == ref(ones)

    with pytest.raises(Exception, match="non-negative"):
        grouped_weighted_median(
            ray.data.from_pandas(df.assign(w=-1)), "k", "v", "w")


def test_leadlag_corr_corpus(ray_session):
    """q_leadlag_corr == a numpy/pandas dense-span reference on the
    sf0.001 corpus; a planted shifted-signal corpus pins that the
    argmax lag recovers the true shift (the statistic bites)."""
    import numpy as np
    import pandas as pd

    from soupflow.queries import q_leadlag_corr

    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    day = ev.ts.to_numpy().astype("datetime64[D]").astype(np.int64)
    lo, hi = int(day.min()), int(day.max())
    span = hi - lo + 1
    x = np.bincount((day - lo)[ev.event_type.to_numpy() == "view"],
                    minlength=span).astype(np.int64)
    y = np.bincount(
        (day - lo)[ev.event_type.to_numpy() == "purchase"],
        minlength=span).astype(np.int64)

    def ref_rho(a, b):
        n = a.size
        sx, sy = int(a.sum()), int(b.sum())
        sxy = sum(int(u) * int(v) for u, v in zip(a, b))
        sxx = sum(int(u) ** 2 for u in a)
        syy = sum(int(v) ** 2 for v in b)
        num = n * sxy - sx * sy
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        import math
        return (float(num) / math.sqrt(float(dx) * float(dy))
                if dx > 0 and dy > 0 else 0.0)

    out = q_leadlag_corr(SF).to_pandas().set_index("lag")
    for lag in range(-3, 4):
        a = x[:span - lag] if lag >= 0 else x[-lag:]
        b = y[lag:] if lag >= 0 else y[:span + lag]
        assert out.loc[lag, "n"] == span - abs(lag)
        assert out.loc[lag, "rho"] == ref_rho(a, b), lag

    # planted 2-day shift: purchases = views shifted by +2 (+ noise
    # floor) over 40 days — argmax over lags must recover lag=2
    import tempfile
    rng = np.random.default_rng(97)
    base = rng.integers(5, 60, 40)
    rows = []
    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    us_day = np.int64(86_400_000_000)
    for d in range(40):
        for _ in range(int(base[d])):
            rows.append(("view", t0 + np.timedelta64(
                d * us_day + int(rng.integers(0, us_day)), "us")))
        if d >= 2:
            for _ in range(int(base[d - 2]) + 1):
                rows.append(("purchase", t0 + np.timedelta64(
                    d * us_day + int(rng.integers(0, us_day)), "us")))
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df["user_id"] = 1
    with tempfile.TemporaryDirectory() as tmp:
        df.to_parquet(f"{tmp}/events.parquet")
        out2 = q_leadlag_corr(tmp).to_pandas()
        best = int(out2.loc[out2.rho.idxmax(), "lag"])
        assert best == 2, out2


def test_rolling_quantile_disc_reference(ray_session):
    """rolling_quantile_disc == a scalar range-scan percentile
    reference across (pct, layout) combinations, incl. gaps larger
    than the window (old days must drop out), single-day corpora,
    and w=1 (plain per-day percentile); pct contract raises."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.windows import rolling_quantile_disc

    rng = np.random.default_rng(89)
    n = 900
    df = pd.DataFrame({
        "d": rng.integers(1000, 1040, n).astype(np.int64),
        "v": rng.integers(0, 200, n).astype(np.int64)})
    # punch a hole wider than the window: days 1015..1029 removed
    df = df[(df.d < 1015) | (df.d >= 1030)].reset_index(drop=True)

    def ref(data, w, pct):
        out = {}
        for t in np.sort(data.d.unique()):
            win = data.v[(data.d >= t - w + 1) & (data.d <= t)] \
                .to_numpy()
            win.sort()
            wtot = win.size
            target = (pct * wtot + 99) // 100
            out[int(t)] = int(win[target - 1])
        return out

    for pct in (50, 95, 100):
        for w in (1, 7):
            want = ref(df, w, pct)
            for parts in (1, 4, 16):
                t = rolling_quantile_disc(
                    ray.data.from_pandas(df).repartition(parts),
                    day_col="d", val_col="v", window=w, pct=pct)
                got = dict(zip(t.column("day_i").to_pylist(),
                               t.column("q").to_pylist()))
                assert got == want, (pct, w, parts)

    one = pd.DataFrame({"d": np.full(5, 7, np.int64),
                        "v": np.array([9, 1, 5, 3, 7], np.int64)})
    t1 = rolling_quantile_disc(ray.data.from_pandas(one),
                               day_col="d", val_col="v",
                               window=7, pct=50)
    assert t1.to_pydict() == {"day_i": [7], "q": [5]}

    with pytest.raises(ValueError, match="pct"):
        rolling_quantile_disc(ray.data.from_pandas(one),
                              day_col="d", val_col="v", pct=0)


def test_source_overlap_reference(ray_session):
    """source_overlap == a brute-force pair-count reference on
    randomized corpora with planted mirror sources, across partition
    layouts; a deliberately colliding-hash scenario is simulated by
    many distinct fps (sub-grouping must never over-count); the
    max_sources guard raises."""
    import itertools

    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.dedup import source_overlap

    rng = np.random.default_rng(101)
    # 6 sources over a shared pool of 40 long fingerprints: srcA and
    # srcB are near-mirrors (80% shared pool draws)
    pool = ["fp%02d" % i + "x" * 24 for i in range(40)]
    rows = []
    for s in ("srcA", "srcB"):
        for fp in rng.choice(pool[:30], 25):
            rows.append((s, fp))
    for s in ("srcC", "srcD", "srcE", "srcF"):
        for fp in rng.choice(pool, 12):
            rows.append((s, fp))
    rows.append(("srcG", "short"))          # < 24 chars: filtered
    df = pd.DataFrame(rows, columns=["source", "text"])

    def ref(d):
        pairs = {(t[:24], s) for s, t in zip(d.source, d.text)
                 if len(t) >= 24}
        by_fp: dict = {}
        for fp, s in pairs:
            by_fp.setdefault(fp, set()).add(s)
        out: dict = {}
        for srcs in by_fp.values():
            for a, b in itertools.combinations(sorted(srcs), 2):
                out[(a, b)] = out.get((a, b), 0) + 1
        return out

    want = ref(df)
    assert want, "reference must bite"
    assert max(want.values()) > 1
    for parts in (1, 4, 16):
        t = source_overlap(
            ray.data.from_pandas(df).repartition(parts),
            key_col="source", col="text", prefix_len=24)
        got = {(a, b): n for a, b, n in
               zip(t.column("s1").to_pylist(),
                   t.column("s2").to_pylist(),
                   t.column("n_shared").to_pylist())}
        assert got == want, parts
    assert not any("srcG" in p for p in got)

    # guard: one fp shared by every source raises in the worker
    crowd = pd.DataFrame({
        "source": [f"s{i}" for i in range(12)],
        "text": ["y" * 30] * 12})
    with pytest.raises(Exception, match="max_sources"):
        source_overlap(ray.data.from_pandas(crowd),
                       key_col="source", col="text",
                       prefix_len=24, max_sources=5)

    # typed-empty passthrough
    t0 = source_overlap(
        ray.data.from_pandas(pd.DataFrame(
            {"source": pd.Series([], dtype=str),
             "text": pd.Series([], dtype=str)})),
        key_col="source", col="text")
    assert t0.num_rows == 0
    assert t0.schema.names == ["s1", "s2", "n_shared"]


def test_gram_matrix_reference(ray_session):
    """gram_matrix == the numpy upper-triangle QᵀQ reference on the
    exact micro-unit fold, invariant across partition layouts; the
    per-block overflow contract raises in the worker; typed-empty
    passthrough."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.similarity import gram_matrix

    rng = np.random.default_rng(73)
    m = rng.normal(0, 0.4, (150, 12)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(150, dtype=np.int64),
                       "embedding": [r.tolist() for r in m]})
    v6 = np.floor(m.astype(np.float64) * 1e6).astype(np.int64)
    want = v6.T @ v6
    iu, ju = np.triu_indices(12)

    for parts in (1, 5, 17):
        out = gram_matrix(
            ray.data.from_pandas(df).repartition(parts)) \
            .to_pandas().sort_values(["i", "j"]).reset_index(drop=True)
        assert len(out) == iu.size
        assert (out.i.to_numpy() == iu).all()
        assert (out.j.to_numpy() == ju).all()
        assert (out.gram.to_numpy() == want[iu, ju]).all()

    # overflow contract: |v6| ~ 2^31 → n_b·max² ≥ 2^62 raises in the
    # worker before the matmul can wrap
    big = pd.DataFrame({"vec_id": [0],
                        "embedding": [[float(2 ** 31) / 1e6] * 4]})
    with pytest.raises(Exception, match="overflow"):
        gram_matrix(ray.data.from_pandas(big))

    # typed-empty passthrough
    t0 = gram_matrix(ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))})))
    assert t0.num_rows == 0
    assert t0.schema.names == ["i", "j", "gram"]


def test_theilsen_trend_reference(ray_session):
    """theilsen_trend == a scalar all-pairs median-slope reference on
    randomized daily series across partition layouts; a planted
    outlier day that wrecks the OLS slope leaves Theil–Sen on the
    true trend; single-day input returns typed-empty."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.queries import q_theilsen_trend

    def ref(days, cents):
        days = np.asarray(days, np.int64)
        cents = np.asarray(cents, np.int64)
        o = np.argsort(days)
        days, cents = days[o], cents[o]
        s = []
        for a in range(days.size):
            for b in range(a + 1, days.size):
                s.append((float(cents[b] - cents[a]))
                         / float(days[b] - days[a]))
        s.sort()
        n = len(s)
        return (s[(n - 1) // 2] + s[n // 2]) / 2

    rng = np.random.default_rng(41)

    def run(df, nfiles):
        import os
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            os.makedirs(f"{d}/orders.parquet")
            for i, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(f"{d}/orders.parquet/p{i}.parquet")
            return q_theilsen_trend(d)

    # randomized series, odd and even pair counts, multi-file layout
    for ndays, nfiles in ((9, 2), (16, 5), (25, 3)):
        day_i = np.sort(rng.choice(20000, size=ndays, replace=False))
        # several orders per day — the engine folds to daily sums
        rows = []
        for d in day_i:
            for _ in range(int(rng.integers(1, 4))):
                rows.append((d, float(rng.integers(100, 99999)) / 100))
        df = pd.DataFrame({
            "o_orderdate": pd.to_datetime(
                np.array([r[0] for r in rows], np.int64), unit="D"),
            "o_totalprice": [r[1] for r in rows]})
        daily = df.assign(
            c=np.floor(df.o_totalprice * 100 + 0.5).astype(np.int64),
            d=df.o_orderdate.values.astype("datetime64[D]")
            .astype(np.int64)).groupby("d").c.sum()
        out = run(df, nfiles).to_pandas()
        assert int(out.n_days[0]) == ndays
        assert int(out.n_pairs[0]) == ndays * (ndays - 1) // 2
        assert out.ts_slope[0] == ref(daily.index.to_numpy(),
                                      daily.to_numpy())

    # robustness: clean linear trend (slope 500 cents/day) + one
    # massive outlier day; OLS is dragged far off, Theil–Sen is not
    days = np.arange(40, dtype=np.int64) + 10000
    cents = 500 * days + 7
    cents[20] += 10_000_000
    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(days, unit="D"),
        "o_totalprice": cents.astype(np.float64) / 100})
    out = run(df, 4).to_pandas()
    assert abs(out.ts_slope[0] - 500.0) < 1.0
    ols = np.polyfit(days.astype(float), cents.astype(float), 1)[0]
    assert abs(ols - 500.0) > 100.0  # OLS really was wrecked

    # single-day input: no pair exists → typed-empty
    one = pd.DataFrame({
        "o_orderdate": pd.to_datetime([10000, 10000], unit="D"),
        "o_totalprice": [1.0, 2.0]})
    t0 = run(one, 1)
    assert t0.num_rows == 0
    assert t0.schema.names == ["n_days", "n_pairs", "ts_slope"]


def test_kendall_daily_reference(ray_session):
    """kendall_daily == a scalar all-pairs concordance reference on
    randomized two-type event corpora across file layouts (gap days
    count as (0,0) observations); a perfectly monotone pair of
    series yields nc = n0; a constant series is all-tied; the
    integer components reproduce scipy's tau-b when scipy exists."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_kendall_daily

    def ref(x, y):
        n = len(x)
        nc = nd = tx = ty = tb = 0
        for a in range(n):
            for b in range(a + 1, n):
                dx, dy = x[b] - x[a], y[b] - y[a]
                if dx == 0:
                    tx += 1
                if dy == 0:
                    ty += 1
                if dx == 0 and dy == 0:
                    tb += 1
                elif dx * dy > 0:
                    nc += 1
                elif dx * dy < 0:
                    nd += 1
        return n, nc, nd, tx, ty, tb

    def run(days, views, purchases, nfiles):
        rows = []
        for d, v, p in zip(days, views, purchases):
            rows += [(d, "view")] * int(v) + [(d, "purchase")] * int(p)
        # an unrelated type must not perturb the two counted series
        rows += [(int(days[0]), "click")] * 3
        df = pd.DataFrame({
            "ts": pd.to_datetime([r[0] for r in rows], unit="D"),
            "event_type": [r[1] for r in rows]})
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/events.parquet")
            for i, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(f"{td}/events.parquet/p{i}.parquet")
            return q_kendall_daily(td).to_pandas()

    rng = np.random.default_rng(59)
    for ndays, nfiles in ((8, 2), (15, 4), (23, 3)):
        # sparse days leave gaps → the dense span has (0,0) days
        days = np.sort(rng.choice(np.arange(12000, 12000 + 2 * ndays),
                                  size=ndays, replace=False))
        views = rng.integers(0, 5, ndays)
        purchases = rng.integers(0, 4, ndays)
        lo, hi = int(days.min()), int(days.max())
        fx = np.zeros(hi - lo + 1, np.int64)
        fy = np.zeros(hi - lo + 1, np.int64)
        fx[days - lo] = views
        fy[days - lo] = purchases
        want = ref(fx.tolist(), fy.tolist())
        out = run(days, views, purchases, nfiles)
        got = (int(out.n_days[0]), int(out.nc[0]), int(out.nd[0]),
               int(out.tied_x[0]), int(out.tied_y[0]),
               int(out.tied_both[0]))
        assert got == want
        try:
            from scipy.stats import kendalltau
            n0 = want[0] * (want[0] - 1) // 2
            taub = ((want[1] - want[2])
                    / np.sqrt(float(n0 - want[3]) * (n0 - want[4])))
            assert abs(taub - kendalltau(fx, fy).statistic) < 1e-9
        except ImportError:
            pass

    # perfectly monotone: every pair concordant
    days = np.arange(20, dtype=np.int64) + 13000
    out = run(days, np.arange(1, 21), np.arange(2, 42, 2), 2)
    assert int(out.nc[0]) == 20 * 19 // 2 and int(out.nd[0]) == 0

    # constant purchases: every pair tied in y
    out = run(days, np.arange(1, 21), np.full(20, 3), 2)
    assert int(out.tied_y[0]) == 20 * 19 // 2
    assert int(out.tied_both[0]) == 0

    # single day → no pair → typed-empty
    out = run(np.array([13000]), [2], [1], 1)
    assert len(out) == 0
    assert list(out.columns) == ["n_days", "nc", "nd",
                                 "tied_x", "tied_y", "tied_both"]


def test_grouped_max_streak_reference(ray_session):
    """grouped_max_streak == a scalar walk reference across partition
    layouts; a hot key spanning every block and cross-block duplicate
    pairs fold correctly; the |day| contract raises; typed-empty."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.windows import grouped_max_streak

    def ref(df):
        out = {}
        for k, g in df.groupby("k"):
            ds = np.sort(np.unique(g.d.to_numpy()))
            best = cur = 1
            for i in range(1, ds.size):
                cur = cur + 1 if ds[i] - ds[i - 1] == 1 else 1
                best = max(best, cur)
            out[int(k)] = int(best)
        return out

    rng = np.random.default_rng(83)
    rows = []
    for k in range(12):
        base = int(rng.integers(10000, 10500))
        days = set()
        for _ in range(int(rng.integers(1, 6))):   # several islands
            s = base + int(rng.integers(0, 200))
            days.update(range(s, s + int(rng.integers(1, 9))))
        rows += [(k, d) for d in days]
    # hot key 99: one 400-day streak that must span blocks, plus
    # duplicate (k, d) pairs scattered so per-block distincts re-emit
    rows += [(99, 20000 + i) for i in range(400)]
    rows += [(99, 20000 + i) for i in range(0, 400, 7)]
    df = pd.DataFrame(rows, columns=["k", "d"]).astype(np.int64)
    want = ref(df)
    for parts in (1, 6, 23):
        ds = ray.data.from_pandas(
            df.sample(frac=1.0, random_state=3)).repartition(parts)
        t = grouped_max_streak(ds, key_col="k", day_col="d")
        got = dict(zip(t.column("k").to_pylist(),
                       t.column("streak").to_pylist()))
        assert got == want
        assert got[99] == 400

    with pytest.raises(Exception, match="2\\^40"):
        grouped_max_streak(
            ray.data.from_pandas(pd.DataFrame(
                {"k": [1], "d": [2 ** 41]})),
            key_col="k", day_col="d")

    t0 = grouped_max_streak(
        ray.data.from_arrow(pa.table({
            "k": pa.array([], pa.int64()),
            "d": pa.array([], pa.int64())})),
        key_col="k", day_col="d")
    assert t0.num_rows == 0
    assert t0.schema.names == ["k", "streak"]


def test_changepoint_reference(ray_session):
    """changepoint == a scalar CUSUM reference; a planted level
    shift is recovered at the exact boundary; the constant series
    pins the tie rule (all deviations equal → smallest t); gap days
    count as zero-revenue observations."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_changepoint

    def ref(lo, y):
        span = len(y)
        tot = sum(int(v) for v in y)
        best_a, best_t, st = -1, -1, 0
        for t in range(1, span):
            st += int(y[t - 1])
            a = abs(span * st - t * tot)
            if a > best_a:
                best_a, best_t = a, t
        return lo + best_t - 1, best_a, span

    def run(days, cents, nfiles):
        df = pd.DataFrame({
            "o_orderdate": pd.to_datetime(days, unit="D"),
            "o_totalprice": np.asarray(cents, np.float64) / 100})
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/orders.parquet")
            for i, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(f"{td}/orders.parquet/p{i}.parquet")
            return q_changepoint(td).to_pandas()

    # level shift: 25 quiet days then 25 loud days → split at the
    # boundary (last quiet day)
    days = np.arange(50, dtype=np.int64) + 15000
    cents = np.where(np.arange(50) < 25, 1000, 9000).astype(np.int64)
    out = run(days, cents, 4)
    assert int(out.cp_day[0]) == 15024
    assert (int(out.cp_day[0]), int(out.cusum_abs[0]),
            int(out.n_days[0])) == ref(15000, cents.tolist())

    # gap days are real zeros: drop the quiet half entirely — the
    # dense span refills them and the split stays at the gap edge
    out = run(days[25:], cents[25:], 2)
    assert (int(out.cp_day[0]), int(out.cusum_abs[0]),
            int(out.n_days[0])) == ref(15000 + 25, cents[25:].tolist())

    # constant series: every deviation is 0 → tie rule picks t = 1
    out = run(days, np.full(50, 777, np.int64), 3)
    assert int(out.cp_day[0]) == 15000
    assert int(out.cusum_abs[0]) == 0

    # randomized + reference across layouts
    rng = np.random.default_rng(11)
    for n, nfiles in ((13, 2), (31, 5)):
        d2 = np.sort(rng.choice(np.arange(16000, 16000 + 2 * n),
                                size=n, replace=False))
        c2 = rng.integers(100, 99999, n).astype(np.int64)
        lo = int(d2.min())
        span = int(d2.max()) - lo + 1
        y = np.zeros(span, np.int64)
        y[d2 - lo] = c2
        out = run(d2, c2, nfiles)
        assert (int(out.cp_day[0]), int(out.cusum_abs[0]),
                int(out.n_days[0])) == ref(lo, y.tolist())

    # single day → no valid split → typed-empty
    out = run(np.array([15000]), np.array([123]), 1)
    assert len(out) == 0
    assert list(out.columns) == ["cp_day", "cusum_abs", "n_days"]


def test_trimmed_mean_qty_reference(ray_session):
    """trimmed_mean_qty == a scalar sort-and-slice reference across
    file layouts, including tie runs straddling the cut boundary and
    groups too small to trim (k = 0); scipy's trim_mean cross-checks
    the implied mean when scipy exists."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_trimmed_mean_qty

    def ref(vals):
        v = np.sort(np.asarray(vals, np.int64))
        k = v.size * 5 // 100
        kept = v[k:v.size - k]
        return int(kept.sum()), int(kept.size)

    def run(df, nfiles):
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/lineitem.parquet")
            for i, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(f"{td}/lineitem.parquet/p{i}.parquet")
            return q_trimmed_mean_qty(td).to_pandas()

    rng = np.random.default_rng(29)
    rows = []
    # flag A: heavy tie runs at both extremes so the cut lands inside
    # a run of equal values
    rows += [("A", 1)] * 40 + [("A", 50)] * 40
    rows += [("A", int(x)) for x in rng.integers(2, 50, 300)]
    # flag N: too small to trim (k = 19*5//100 = 0)
    rows += [("N", int(x)) for x in rng.integers(1, 51, 19)]
    # flag R: one extreme outlier the trim must drop
    rows += [("R", int(x)) for x in rng.integers(10, 20, 60)]
    rows += [("R", 50)]
    df = pd.DataFrame(rows, columns=["l_returnflag", "l_quantity"])
    df["l_quantity"] = df["l_quantity"].astype(np.float64)
    want = {f: ref(g.l_quantity.to_numpy())
            for f, g in df.groupby("l_returnflag")}
    for nfiles in (1, 5):
        out = run(df.sample(frac=1.0, random_state=7), nfiles)
        got = {r.l_returnflag: (int(r.trim_sum), int(r.trim_n))
               for r in out.itertuples()}
        assert got == want
    assert got["N"][1] == 19              # k = 0: nothing trimmed
    a = df[df.l_returnflag == "R"].l_quantity.to_numpy()
    assert got["R"][1] == a.size - 2 * (a.size * 5 // 100)
    try:
        from scipy.stats import trim_mean
        for f in ("A", "R"):
            g = df[df.l_returnflag == f].l_quantity.to_numpy()
            k = g.size * 5 // 100
            assert abs(got[f][0] / got[f][1]
                       - trim_mean(g, k / g.size)) < 1e-9
    except ImportError:
        pass


def test_ks_quantity_reference(ray_session):
    """ks_quantity == a scalar cumulative-count reference across
    layouts; a planted location shift puts the argmax at the shift
    boundary; identical samples give ks 0 at the smallest value;
    scipy's ks_2samp cross-checks the normalized statistic."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_ks_quantity

    def ref(a_vals, r_vals):
        vs = np.unique(np.concatenate([a_vals, r_vals]))
        na, nr = len(a_vals), len(r_vals)
        best = None
        for v in vs:
            d = abs(nr * int((a_vals <= v).sum())
                    - na * int((r_vals <= v).sum()))
            if best is None or d > best[0]:
                best = (d, int(v))
        return best[1], best[0], na, nr

    def run(a_vals, r_vals, nfiles, extra_flag_rows=0):
        rows = ([("A", int(v)) for v in a_vals]
                + [("R", int(v)) for v in r_vals]
                + [("N", 25)] * extra_flag_rows)   # must be ignored
        df = pd.DataFrame(rows, columns=["l_returnflag", "l_quantity"])
        df["l_quantity"] = df["l_quantity"].astype(np.float64)
        df = df.sample(frac=1.0, random_state=5)
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/lineitem.parquet")
            for i, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(f"{td}/lineitem.parquet/p{i}.parquet")
            return q_ks_quantity(td).to_pandas()

    rng = np.random.default_rng(37)
    a = rng.integers(1, 30, 200)
    r = rng.integers(1, 30, 170) + 5     # planted +5 location shift
    out = run(a, r, 4, extra_flag_rows=50)
    want = ref(a, r)
    got = (int(out.at_value[0]), int(out.ks_num[0]),
           int(out.n_a[0]), int(out.n_r[0]))
    assert got == want
    try:
        from scipy.stats import ks_2samp
        assert abs(got[1] / (got[2] * got[3])
                   - ks_2samp(a, r).statistic) < 1e-12
    except ImportError:
        pass

    # identical multisets: dev = 0 everywhere → smallest value, ks 0
    out = run(a, a, 3)
    assert int(out.ks_num[0]) == 0
    assert int(out.at_value[0]) == int(a.min())

    # layout invariance on a randomized case
    for nfiles in (1, 6):
        out = run(a, r, nfiles)
        assert (int(out.at_value[0]), int(out.ks_num[0])) == want[:2]


def test_mannwhitney_qty_reference(ray_session):
    """mannwhitney_qty == a scalar doubled-midrank reference across
    layouts; scipy's mannwhitneyu cross-checks U when scipy exists;
    the doubled rank-sum over ALL rows must equal n·(n+1) (the
    rank-sum partition identity)."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_mannwhitney_qty

    def ref(a_vals, r_vals):
        both = np.concatenate([a_vals, r_vals])
        vs, cnt = np.unique(both, return_counts=True)
        ca = np.array([(a_vals == v).sum() for v in vs])
        before = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        r2a = int((ca * (2 * before + cnt + 1)).sum())
        na, nr = len(a_vals), len(r_vals)
        tie3 = int((cnt.astype(object) ** 3 - cnt).sum())
        return na, nr, r2a, tie3, r2a - na * (na + 1)

    def run(a_vals, r_vals, nfiles, extra_flag_rows=0):
        rows = ([("A", int(v)) for v in a_vals]
                + [("R", int(v)) for v in r_vals]
                + [("N", 25)] * extra_flag_rows)   # must be ignored
        df = pd.DataFrame(rows, columns=["l_returnflag", "l_quantity"])
        df["l_quantity"] = df["l_quantity"].astype(np.float64)
        df = df.sample(frac=1.0, random_state=11)
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/lineitem.parquet")
            for i, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(f"{td}/lineitem.parquet/p{i}.parquet")
            return q_mannwhitney_qty(td).to_pandas()

    rng = np.random.default_rng(41)
    a = rng.integers(1, 25, 180)         # heavy ties by construction
    r = rng.integers(1, 25, 150) + 3
    out = run(a, r, 4, extra_flag_rows=40)
    want = ref(a, r)
    got = tuple(int(out[c][0]) for c in
                ("n_a", "n_r", "r2_a", "tie_cube", "u2_a"))
    assert got == want

    # rank-sum partition identity: the doubled rank-sum over the
    # POOLED sample (everything labelled A) must equal n·(n+1)
    n = got[0] + got[1]
    ref_all = ref(np.concatenate([a, r]), np.array([], np.int64))
    assert ref_all[2] == n * (n + 1)

    try:
        from scipy.stats import mannwhitneyu
        u = mannwhitneyu(a, r, alternative="two-sided",
                         method="asymptotic").statistic
        assert abs(got[4] / 2 - u) < 1e-9
    except ImportError:
        pass

    # identical groups: U2 = n_a · n_r (AUC exactly 1/2)
    out = run(a, a, 2)
    assert int(out.u2_a[0]) == len(a) * len(a)

    # layout invariance
    for nfiles in (1, 6):
        out = run(a, r, nfiles)
        assert tuple(int(out[c][0]) for c in
                     ("n_a", "n_r", "r2_a", "tie_cube", "u2_a")) \
            == want


def test_benford_digits_reference(ray_session):
    """benford_digits == a string-head scalar reference across
    layouts, including boundary magnitudes (999…9 vs 100…0 cents,
    the log10-ULP trap the integer-divide loop avoids) and the
    digit-0 bucket for non-positive cents."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_benford_digits

    def ref(cents):
        out = {}
        for c in cents:
            d = 0 if c <= 0 else int(str(int(c))[0])
            out[d] = out.get(d, 0) + 1
        return out

    def run(prices, nfiles):
        df = pd.DataFrame({"o_totalprice":
                           np.asarray(prices, np.float64)})
        df = df.sample(frac=1.0, random_state=3)
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/orders.parquet")
            for i, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(f"{td}/orders.parquet/p{i}.parquet")
            out = q_benford_digits(td).to_pandas()
            return dict(zip(out.digit.astype(int),
                            out.n.astype(int)))

    rng = np.random.default_rng(53)
    # boundary magnitudes in cents: 9.99 → 999, 10.00 → 1000, 99999.99
    # → 9999999, 100000.00 → 10000000; plus a zero and a negative
    prices = ([9.99, 10.00, 99999.99, 100000.00, 0.0, -5.25]
              + list(rng.uniform(1.0, 500000.0, 400)))
    cents = [int(np.floor(p * 100.0 + 0.5)) for p in prices]
    want = ref(cents)
    for nfiles in (1, 5):
        assert run(prices, nfiles) == want
    assert run(prices, 3)[9] >= 1 and run(prices, 3)[1] >= 2
    assert want.get(0, 0) == 2           # zero + negative bucket


def _floored_ref(df):
    """Sequential clamp fold b = max(b + d, 0) per key — the scalar
    reference the vectorized identity must reproduce."""
    out = {}
    g = df.sort_values(["user_id", "ts_us", "event_id"])
    for uid, grp in g.groupby("user_id"):
        b = peak = clips = 0
        for d in grp.delta:
            nb = b + int(d)
            if nb < 0:
                clips += 1
                nb = 0
            b = nb
            peak = max(peak, b)
        out[int(uid)] = (b, clips, peak)
    return out


def test_floored_balance_reference_layouts(ray_session):
    """floored_running_balance == the sequential clamp fold across
    1 / 7 / 40 sorted-block layouts, with adversarial keys planted:
    all-negative (clips every step, final 0), first-step clip, deep
    dip + full recovery, and single-event keys."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import floored_running_balance

    rng = np.random.default_rng(19)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n).astype("int64"),
        "ts_us": rng.integers(0, 10_000_000_000, n).astype("int64"),
        "event_id": np.arange(n, dtype="int64"),
        "delta": rng.integers(-900, 700, n).astype("int64")})
    extra = pd.DataFrame({
        "user_id": [100] * 5 + [101] + [102] * 4 + [103],
        "ts_us": list(range(5)) + [0] + list(range(4)) + [0],
        "event_id": np.arange(n, n + 11, dtype="int64"),
        "delta": [-10, -1, -5, -3, -2,          # all-negative
                  -7,                           # first-step clip
                  50, -200, 180, -10,           # dip + recovery
                  42]})                         # single event
    df = pd.concat([df, extra], ignore_index=True)
    ref = _floored_ref(df)
    for nparts in (1, 7, 40):
        ds = ray.data.from_pandas(
            df.sample(frac=1.0, random_state=7))
        out = floored_running_balance(
            ds, key_col="user_id", order_cols=["ts_us", "event_id"],
            val_col="delta", num_partitions=nparts).to_pandas()
        got = {int(r.user_id): (int(r.final_bal), int(r.clip_n),
                                int(r.peak_bal))
               for r in out.itertuples()}
        assert got == ref, f"layout {nparts}"
    assert ref[100] == (0, 5, 0)
    assert ref[101] == (0, 1, 0)
    assert ref[103] == (42, 0, 42)


def test_floored_balance_hot_key_spans_blocks(ray_session):
    """ONE key across 40 sorted blocks: the (S, M) carry threads
    through every seam and exactly one segment emits the final
    balance (the _nf == 1 contract)."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import floored_running_balance

    rng = np.random.default_rng(23)
    n = 20000
    df = pd.DataFrame({
        "user_id": np.zeros(n, "int64"),
        "ts_us": np.arange(n, dtype="int64"),
        "event_id": np.arange(n, dtype="int64"),
        "delta": rng.integers(-600, 500, n).astype("int64")})
    ref = _floored_ref(df)[0]
    out = floored_running_balance(
        ray.data.from_pandas(df), key_col="user_id",
        order_cols=["ts_us", "event_id"], val_col="delta",
        num_partitions=40).to_pandas()
    assert len(out) == 1
    assert (int(out.final_bal[0]), int(out.clip_n[0]),
            int(out.peak_bal[0])) == ref


def test_floored_balance_empty_and_fold(ray_session):
    """Typed-empty passthrough on zero qualifying rows, and the
    events-semantics fold (purchase +cents / error −cents, other
    types ignored) against a pandas reference."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import floored_running_balance
    from soupflow.queries import q_floored_balance

    empty = pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "ts_us": pd.Series([], dtype="int64"),
        "event_id": pd.Series([], dtype="int64"),
        "delta": pd.Series([], dtype="int64")})
    out = floored_running_balance(
        ray.data.from_pandas(empty), key_col="user_id",
        order_cols=["ts_us", "event_id"], val_col="delta")
    assert out.schema().names == ["user_id", "final_bal", "clip_n",
                                  "peak_bal"]
    assert out.count() == 0

    rng = np.random.default_rng(31)
    n = 600
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(
            rng.integers(0, 10**15, n), unit="us"),
        "user_id": rng.integers(0, 8, n).astype("int64"),
        "event_type": rng.choice(
            ["purchase", "error", "view", "click"], n),
        "value": np.round(rng.uniform(0.0, 400.0, n), 2),
        "props": ["{}"] * n})
    keep = ev[ev.event_type.isin(["purchase", "error"])]
    cents = np.floor(keep.value.to_numpy() * 100.0 + 0.5) \
        .astype("int64")
    sign = np.where(keep.event_type.to_numpy() == "purchase", 1, -1)
    ref = _floored_ref(pd.DataFrame({
        "user_id": keep.user_id.to_numpy(),
        "ts_us": keep.ts.astype("int64").to_numpy(),
        "event_id": keep.event_id.to_numpy(),
        "delta": cents * sign}))
    with tempfile.TemporaryDirectory() as td:
        os.makedirs(f"{td}/events.parquet")
        for i, part in enumerate(np.array_split(ev, 3)):
            part.to_parquet(f"{td}/events.parquet/p{i}.parquet")
        out = q_floored_balance(td).to_pandas()
    got = {int(r.user_id): (int(r.final_bal), int(r.clip_n),
                            int(r.peak_bal))
           for r in out.itertuples()}
    assert got == ref


def test_segmented_cummin_paths():
    """_segmented_cummin: offset fast path == per-segment loop
    reference, and the overflow guard falls back correctly on a
    huge-spread many-segment input."""
    import numpy as np

    from soupflow.data.windows import _key_segments, _segmented_cummin

    def ref(x, starts):
        out = np.empty_like(x)
        bounds = np.append(starts, x.size)
        for i in range(starts.size):
            s0, s1 = bounds[i], bounds[i + 1]
            out[s0:s1] = np.minimum.accumulate(x[s0:s1])
        return out

    rng = np.random.default_rng(5)
    keys = np.sort(rng.integers(0, 50, 3000))
    x = rng.integers(-10**6, 10**6, 3000).astype(np.int64)
    seg, starts = _key_segments(keys)
    assert (_segmented_cummin(x, seg, starts) == ref(x, starts)).all()

    # huge spread × several segments trips the int64 guard → loop
    big = np.int64(1) << 60
    keys = np.repeat(np.arange(8), 4)
    x = np.tile(np.array([big, -big, big // 2, -big // 2],
                         np.int64), 8)
    seg, starts = _key_segments(keys)
    assert (_segmented_cummin(x, seg, starts) == ref(x, starts)).all()


def test_hll_overlap_reference(ray_session):
    """hll_audience_overlap == a scalar register reference across
    layouts; union rows are the register-wise max; the
    inclusion–exclusion estimate recovers a planted overlap within
    HLL tolerance."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.sampling import _mix
    from soupflow.data.sketch import hll_audience_overlap

    P, W = 12, 52
    M = 1 << P

    def ref_regs(ids):
        hv = _mix(np.asarray(ids, np.int64))
        bucket = (hv >> np.uint64(W)).astype(np.int64)
        rest = (hv & np.uint64((1 << W) - 1)).astype(np.float64)
        _, e = np.frexp(rest)
        rank = W - e.astype(np.int64) + 1
        regs = np.zeros(M, np.int64)
        np.maximum.at(regs, bucket, rank)
        return regs

    def est(regs):
        m = M
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-regs.astype(float)))
        v = np.count_nonzero(regs == 0)
        if e <= 2.5 * m and v > 0:       # small-range correction
            e = m * np.log(m / v)
        return e

    rng = np.random.default_rng(61)
    viewers = rng.choice(200_000, 3000, replace=False)
    overlap = rng.choice(viewers, 800, replace=False)
    only_buy = rng.choice(
        np.arange(200_000, 260_000), 700, replace=False)
    buyers = np.concatenate([overlap, only_buy])
    rows = ([("view", int(u)) for u in viewers]
            + [("purchase", int(u)) for u in buyers]
            + [("click", 7)] * 50)           # other types ignored
    df = pd.DataFrame(rows, columns=["event_type", "user_id"])
    df = df.sample(frac=1.0, random_state=9)

    want_v, want_p = ref_regs(viewers), ref_regs(buyers)
    want_u = np.maximum(want_v, want_p)
    for nparts in (1, 8):
        out = hll_audience_overlap(
            ray.data.from_pandas(df).repartition(nparts),
            type_col="event_type", id_col="user_id",
            types=("view", "purchase"), p=P)
        got = {a: np.zeros(M, np.int64)
               for a in ("view", "purchase", "union")}
        for a, b, r in zip(out.column("aud").to_pylist(),
                           out.column("bucket").to_pylist(),
                           out.column("maxrank").to_pylist()):
            got[a][b] = r
        assert (got["view"] == want_v).all(), f"layout {nparts}"
        assert (got["purchase"] == want_p).all()
        assert (got["union"] == want_u).all()

    inter = est(want_v) + est(want_p) - est(want_u)
    assert abs(inter - 800) / 800 < 0.15     # ~2% typical at p=12


def test_decay_score_reference(ray_session):
    """decay_score == a pandas power-of-two reference across layouts;
    the [1, 30]-day age window excludes anchor-day and stale events;
    an in-block cents sum ≥ 2^31 raises before any silent wrap."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd
    import pytest

    from soupflow.queries import q_decay_score

    ANCHOR = np.datetime64("2024-01-31")

    def ref(ev):
        keep = ev[ev.event_type == "purchase"].copy()
        age = (ANCHOR - keep.ts.to_numpy().astype("datetime64[D]")) \
            .astype("timedelta64[D]").astype(int)
        keep["age"] = age
        keep = keep[(keep.age >= 1) & (keep.age <= 30)]
        cents = np.floor(keep.value.to_numpy() * 100.0 + 0.5) \
            .astype(object)
        keep["sc"] = cents * (2 ** (31 - keep.age.to_numpy()))
        g = keep.groupby("user_id")
        return {int(u): (int(grp.sc.sum()), len(grp))
                for u, grp in g}

    def run(ev, nfiles):
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/events.parquet")
            for i, part in enumerate(np.array_split(ev, nfiles)):
                part.to_parquet(f"{td}/events.parquet/p{i}.parquet")
            out = q_decay_score(td).to_pandas()
        return {int(r.user_id): (int(r.decay_score), int(r.n_purch))
                for r in out.itertuples()}

    rng = np.random.default_rng(67)
    n = 800
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": (ANCHOR.astype("datetime64[us]")
               - rng.integers(0, 40 * 86_400_000_000, n)
               .astype("timedelta64[us]")),
        "user_id": rng.integers(0, 12, n).astype("int64"),
        "event_type": rng.choice(["purchase", "view", "error"], n),
        "value": np.round(rng.uniform(0.5, 900.0, n), 2),
        "props": ["{}"] * n})
    # plant: an anchor-day purchase (age 0 → excluded) and a stale
    # one (age 31 → excluded)
    planted = pd.DataFrame({
        "event_id": [n, n + 1],
        "ts": [ANCHOR.astype("datetime64[us]")
               + np.timedelta64(3600_000_000, "us"),
               ANCHOR.astype("datetime64[us]")
               - np.timedelta64(31 * 86_400_000_000, "us")],
        "user_id": [999, 999],
        "event_type": ["purchase", "purchase"],
        "value": [100.0, 100.0],
        "props": ["{}"] * 2})
    ev = pd.concat([ev, planted], ignore_index=True)
    want = ref(ev)
    assert 999 not in want                  # both planted excluded
    for nfiles in (1, 5):
        assert run(ev, nfiles) == want

    big = ev.copy()
    big.loc[0, ["event_type", "value", "ts"]] = [
        "purchase", 30_000_000.0,
        ANCHOR.astype("datetime64[us]")
        - np.timedelta64(86_400_000_000, "us")]
    with pytest.raises(Exception, match="int64|cents"):
        run(big, 2)


def test_exact_split_reference(ray_session):
    """exact_split == a numpy rank-by-hash reference across layouts;
    per-stratum train counts are EXACTLY floor(0.8·n) (the property
    hash_split can only match in expectation); assignment is stable
    across runs and partitionings."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.data.sampling import _mix
    from soupflow.queries import q_exact_split

    def ref(df):
        out = {}
        for lang, g in df.groupby("lang"):
            ids = g.doc_id.to_numpy()
            hv = _mix(ids.astype(np.int64))
            order = np.lexsort((ids, hv))
            quota = len(g) * 8 // 10
            for r, i in enumerate(order):
                out[int(ids[i])] = ("train" if r < quota
                                    else "heldout")
        return out

    def run(df, nfiles):
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/documents.parquet")
            for i, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(f"{td}/documents.parquet/p{i}.parquet")
            out = q_exact_split(td).to_pandas()
        return dict(zip(out.doc_id.astype(int), out.split))

    rng = np.random.default_rng(71)
    n = 1200
    df = pd.DataFrame({
        "doc_id": rng.permutation(5 * n)[:n].astype("int64"),
        "text": ["x"] * n,
        "lang": rng.choice(["en", "de", "zh", "ar"],
                           n, p=[.5, .3, .15, .05]),
        "source": ["s"] * n,
        "n_chars": np.ones(n, "int64")})
    want = ref(df)
    got = run(df, 4)
    assert got == want
    # exact per-stratum quota
    merged = df.assign(split=df.doc_id.map(got))
    for lang, g in merged.groupby("lang"):
        assert (g.split == "train").sum() == len(g) * 8 // 10, lang
    # layout + rerun stability
    assert run(df, 1) == want and run(df, 9) == want


def test_windowed_locf_reference(ray_session):
    """windowed_locf == pandas groupby ffill across layouts; a key
    spanning many blocks threads the carry THROUGH segments that have
    no valid row at all; an all-null key stays at the default."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import windowed_locf

    def ref(df, default=0):
        g = df.sort_values(["user_id", "ts_us", "event_id"]).copy()
        f = g.groupby("user_id").v.ffill().fillna(default)
        return dict(zip(g.event_id, f.astype(int)))

    rng = np.random.default_rng(83)
    n = 3000
    v = rng.integers(1, 10**6, n).astype("float64")
    v[rng.random(n) < 0.7] = np.nan          # 70% missing
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n).astype("int64"),
        "ts_us": rng.integers(0, 10**9, n).astype("int64"),
        "event_id": np.arange(n, dtype="int64"),
        "v": v})
    # hot key 99 across every block, with a long all-null stretch in
    # the middle (the carry must survive valueless segments)
    hot_v = np.full(2000, np.nan)
    hot_v[10] = 777.0
    hot_v[1990] = 888.0
    hot = pd.DataFrame({
        "user_id": np.full(2000, 99, "int64"),
        "ts_us": np.arange(2000, dtype="int64"),
        "event_id": np.arange(n, n + 2000, dtype="int64"),
        "v": hot_v})
    # all-null key stays at default
    nullk = pd.DataFrame({
        "user_id": np.full(5, 123, "int64"),
        "ts_us": np.arange(5, dtype="int64"),
        "event_id": np.arange(n + 2000, n + 2005, dtype="int64"),
        "v": np.full(5, np.nan)})
    df = pd.concat([df, hot, nullk], ignore_index=True)
    want = ref(df)

    tbl = pd.DataFrame({
        "user_id": df.user_id,
        "ts_us": df.ts_us,
        "event_id": df.event_id,
        "v": pd.array(np.where(np.isnan(df.v), 0,
                               df.v).astype("int64"),
                      dtype="Int64")})
    tbl.loc[np.isnan(df.v.to_numpy()), "v"] = pd.NA
    for nparts in (1, 6, 40):
        out = windowed_locf(
            ray.data.from_pandas(
                tbl.sample(frac=1.0, random_state=13)),
            key_col="user_id", order_cols=["ts_us", "event_id"],
            val_col="v", out_col="f", num_partitions=nparts) \
            .to_pandas()
        got = dict(zip(out.event_id.astype(int),
                       out.f.astype(int)))
        assert got == want, f"layout {nparts}"
    assert want[n + 2005 - 1] == 0           # all-null key
    assert want[n + 1000] == 777             # carried through nulls


def test_overlap_exact_reference(ray_session):
    """overlap_exact == a set-algebra reference across layouts, and
    agrees with hll_overlap's inclusion–exclusion estimate within
    sketch tolerance on the same corpus (the exact-confirm pairing)."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_overlap_exact

    rng = np.random.default_rng(91)
    n = 2000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(rng.integers(0, 10**15, n), unit="us"),
        "user_id": rng.integers(0, 300, n).astype("int64"),
        "event_type": rng.choice(
            ["view", "purchase", "click", "error"], n,
            p=[.5, .2, .2, .1]),
        "value": np.round(rng.uniform(0, 100, n), 2),
        "props": ["{}"] * n})
    viewers = set(ev[ev.event_type == "view"].user_id)
    buyers = set(ev[ev.event_type == "purchase"].user_id)
    want = (len(viewers), len(buyers), len(viewers & buyers))

    def run(nfiles):
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/events.parquet")
            for i, part in enumerate(np.array_split(ev, nfiles)):
                part.to_parquet(f"{td}/events.parquet/p{i}.parquet")
            out = q_overlap_exact(td)
        return (int(out.column("n_a")[0].as_py()),
                int(out.column("n_b")[0].as_py()),
                int(out.column("n_both")[0].as_py()))

    for nfiles in (1, 4, 9):
        assert run(nfiles) == want, f"layout {nfiles}"


def test_daily_ohlc_reference(ray_session):
    """daily_ohlc == a pandas first/last/min/max reference across
    layouts, with same-microsecond ties broken by event_id (planted)
    and the event_id ≥ 2^40 pack-collision contract raising."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd
    import pytest

    from soupflow.queries import q_daily_ohlc

    def ref(ev):
        p = ev[ev.event_type == "purchase"].copy()
        p["cents"] = np.floor(
            p.value.to_numpy() * 100.0 + 0.5).astype("int64")
        p["ts_us"] = p.ts.to_numpy().astype(
            "datetime64[us]").astype("int64")
        p["day"] = p.ts_us // 86_400_000_000
        p = p.sort_values(["day", "ts_us", "event_id"])
        out = {}
        for d, g in p.groupby("day"):
            out[int(d)] = (int(g.cents.iloc[0]),
                           int(g.cents.max()), int(g.cents.min()),
                           int(g.cents.iloc[-1]), len(g))
        return out

    def run(ev, nfiles):
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/events.parquet")
            for i, part in enumerate(np.array_split(ev, nfiles)):
                part.to_parquet(f"{td}/events.parquet/p{i}.parquet")
            out = q_daily_ohlc(td).to_pandas()
        return {int(r.day): (int(r.open_cents), int(r.high_cents),
                             int(r.low_cents), int(r.close_cents),
                             int(r.n_trades))
                for r in out.itertuples()}

    rng = np.random.default_rng(97)
    n = 1500
    base = np.datetime64("2024-03-01", "us")
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": base + rng.integers(0, 20 * 86_400_000_000, n)
        .astype("timedelta64[us]"),
        "user_id": rng.integers(0, 50, n).astype("int64"),
        "event_type": rng.choice(["purchase", "view"], n),
        "value": np.round(rng.uniform(0.5, 500.0, n), 2),
        "props": ["{}"] * n})
    # planted same-microsecond open tie: two purchases at the exact
    # day start, event_id decides which is the open
    t0 = base + np.timedelta64(25 * 86_400_000_000, "us")
    tie = pd.DataFrame({
        "event_id": [n + 5, n + 2],
        "ts": [t0, t0],
        "user_id": [1, 2],
        "event_type": ["purchase", "purchase"],
        "value": [11.11, 22.22],
        "props": ["{}"] * 2})
    ev = pd.concat([ev, tie], ignore_index=True)
    want = ref(ev)
    tie_day = int((t0 - np.datetime64(0, "us"))
                  // np.timedelta64(86_400_000_000, "us"))
    assert want[tie_day][0] == 2222          # id n+2 wins the open
    for nfiles in (1, 4, 9):
        assert run(ev, nfiles) == want, f"layout {nfiles}"

    bad = ev.copy()
    bad.loc[0, ["event_id", "event_type"]] = [1 << 40, "purchase"]
    with pytest.raises(Exception, match="2\\^40|event_id"):
        run(bad, 2)


def test_ordered_funnel_sorted_parity(ray_session):
    """ordered_funnel_sorted == the staged-join ordered_funnel on
    randomized event streams across layouts (incl. a hot key across
    every block), and the max_run edge-run contract raises in the
    worker."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.windows import (ordered_funnel,
                                       ordered_funnel_sorted)

    W = 3_600_000_000
    rng = np.random.default_rng(101)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 120, n).astype("int64"),
        "ts": pd.to_datetime(
            rng.integers(0, 40 * W, n), unit="us"),
        "et": rng.choice(["a", "b", "c", "noise"], n,
                         p=[.3, .25, .2, .25])})
    hot = pd.DataFrame({
        "k": np.full(3000, 999, "int64"),
        "ts": pd.to_datetime(
            np.sort(rng.integers(0, 40 * W, 3000)), unit="us"),
        "et": rng.choice(["a", "b", "c"], 3000)})
    df = pd.concat([df, hot], ignore_index=True)

    want = ordered_funnel(
        ray.data.from_pandas(df).repartition(4), key_col="k",
        ts_col="ts", type_col="et", steps=("a", "b", "c"),
        window_us=W).column("n_keys").to_pylist()
    for parts in (1, 6, 24):
        got = ordered_funnel_sorted(
            ray.data.from_pandas(
                df.sample(frac=1.0, random_state=3)),
            key_col="k", ts_col="ts", type_col="et",
            steps=("a", "b", "c"), window_us=W,
            num_partitions=parts).column("n_keys").to_pylist()
        assert got == want, f"layout {parts}"
    assert want[0] >= want[1] >= want[2] and want[2] > 0

    with pytest.raises(Exception, match="max_run"):
        ordered_funnel_sorted(
            ray.data.from_pandas(df), key_col="k", ts_col="ts",
            type_col="et", steps=("a", "b", "c"), window_us=W,
            num_partitions=4, max_run=100)


def test_record_high_scan_reference(ray_session):
    """record_high_scan == a sequential running-max fold across
    layouts, with planted monotone-increasing (every row a record),
    monotone-decreasing (only the first), tie-at-the-record (a tie
    is NOT a record) and hot multi-block keys."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import record_high_scan

    def ref(df):
        out = {}
        g = df.sort_values(["user_id", "ts_us", "event_id"])
        for uid, grp in g.groupby("user_id"):
            m = None
            recs = 0
            for v in grp.v:
                if m is None or v > m:
                    recs += 1
                    m = int(v)
            out[int(uid)] = (recs, m)
        return out

    rng = np.random.default_rng(107)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n).astype("int64"),
        "ts_us": rng.integers(0, 10**9, n).astype("int64"),
        "event_id": np.arange(n, dtype="int64"),
        "v": rng.integers(-10**5, 10**5, n).astype("int64")})
    extra = pd.DataFrame({
        "user_id": ([200] * 5 + [201] * 5 + [202] * 3
                    + [203] * 2000),
        "ts_us": (list(range(5)) + list(range(5)) + list(range(3))
                  + list(range(2000))),
        "event_id": np.arange(n, n + 2013, dtype="int64"),
        "v": ([1, 2, 3, 4, 5]          # all records
              + [5, 4, 3, 2, 1]        # only the first
              + [7, 7, 7]              # ties are not records
              + list(rng.integers(0, 10**6, 2000)))})  # hot key
    df = pd.concat([df, extra], ignore_index=True)
    want = ref(df)
    assert want[200] == (5, 5) and want[201] == (1, 5)
    assert want[202] == (1, 7)
    for nparts in (1, 7, 40):
        out = record_high_scan(
            ray.data.from_pandas(
                df.sample(frac=1.0, random_state=17)),
            key_col="user_id", order_cols=["ts_us", "event_id"],
            val_col="v", num_partitions=nparts).to_pandas()
        got = {int(r.user_id): (int(r.n_records), int(r.max_val))
               for r in out.itertuples()}
        assert got == want, f"layout {nparts}"


def test_feature_hash_reference(ray_session):
    """feature_hash == a scalar md5 fold across layouts; a planted
    same-bucket opposite-sign term pair cancels in signed_sum while
    n_tokens still counts both (the hashing-trick collision
    semantics)."""
    import hashlib
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    from soupflow.queries import q_feature_hash

    W = 256

    def h(t):
        tb = t.encode()
        bk = int(hashlib.md5(tb).hexdigest()[:8], 16) % W
        sg = 1 if int(hashlib.md5(tb + b"#s").hexdigest()[:8],
                      16) % 2 == 0 else -1
        return bk, sg

    def ref(texts):
        out = {}
        for tx in texts:
            for t in tx.lower().split():
                bk, sg = h(t)
                s, n = out.get(bk, (0, 0))
                out[bk] = (s + sg, n + 1)
        return out

    # find two distinct terms in one bucket with opposite signs
    pos = neg = None
    i = 0
    while pos is None or neg is None or h(pos)[0] != h(neg)[0]:
        i += 1
        t = f"w{i}"
        bk, sg = h(t)
        if pos is None and sg == 1:
            pos, pb = t, bk
        elif sg == -1 and pos is not None and bk == pb:
            neg = t
        if i > 200000:
            raise RuntimeError("no collision pair found")
    rng = np.random.default_rng(113)
    vocab = [f"tok{j}" for j in range(80)]
    texts = [" ".join(rng.choice(vocab, 12)) for _ in range(300)]
    texts.append(f"{pos} {neg} {pos} {neg}")   # cancels to 0
    want = ref(texts)
    bk = h(pos)[0]
    assert want[bk][0] % 2 == want[bk][1] % 2  # parity sanity

    def run(nfiles):
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype="int64"),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": np.ones(len(texts), "int64")})
        with tempfile.TemporaryDirectory() as td:
            os.makedirs(f"{td}/documents.parquet")
            for i2, part in enumerate(np.array_split(df, nfiles)):
                part.to_parquet(
                    f"{td}/documents.parquet/p{i2}.parquet")
            out = q_feature_hash(td).to_pandas()
        return {int(r.bucket): (int(r.signed_sum), int(r.n_tokens))
                for r in out.itertuples()}

    for nfiles in (1, 5):
        assert run(nfiles) == want, f"layout {nfiles}"


def test_grid_interpolate_reference(ray_session):
    """grid_interpolate == a scalar surrounding-pair reference across
    layouts; an observation exactly on a grid instant yields that
    value exactly; a multi-day gap emits one row per midnight from a
    single pair; single-observation keys emit nothing; duplicate
    (key, t) raises; a hot key across 40 blocks exercises the seam
    pairs."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from soupflow.data.windows import grid_interpolate

    DAY = 86_400_000_000

    def ref(df):
        out = {}
        for uid, g in df.sort_values(["k", "t"]).groupby("k"):
            t = g.t.to_numpy()
            v = g.v.to_numpy()
            for i in range(len(t) - 1):
                d0 = -(-t[i] // DAY)
                d1 = -(-t[i + 1] // DAY)
                for d in range(d0, d1):
                    gg = d * DAY
                    out[(int(uid), int(d))] = (
                        int(v[i]) * int(t[i + 1] - gg)
                        + int(v[i + 1]) * int(gg - t[i]),
                        int(t[i + 1] - t[i]))
        return out

    rng = np.random.default_rng(127)
    n = 2500
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype("int64"),
        "t": rng.integers(1, 30 * DAY, n).astype("int64"),
        "v": rng.integers(-10**5, 10**5, n).astype("int64")})
    df = df.drop_duplicates(["k", "t"])
    extra = pd.DataFrame({
        "k": [500, 500, 501, 501, 501, 502] + [503] * 2000,
        "t": [3 * DAY, 4 * DAY + 7,          # obs ON a midnight
              10 * DAY + 5, 20 * DAY + 9, 20 * DAY + 10,  # big gap
              8 * DAY + 1]                   # single obs: no rows
        + sorted(rng.choice(
            np.arange(1, 29 * DAY, 7919), 2000,
            replace=False).tolist()),        # hot key, many blocks
        "v": [100, 200, 7, 7, 9, 5] + [11] * 2000})
    extra = extra.astype({"k": "int64", "t": "int64", "v": "int64"})
    df = pd.concat([df, extra], ignore_index=True)
    want = ref(df)
    # obs exactly on midnight: day 3 value = exactly v_prev = 100
    num, den = want[(500, 3)]
    assert num == 100 * den
    assert not any(k == 502 for k, _ in want)
    for nparts in (1, 7, 40):
        out = grid_interpolate(
            ray.data.from_pandas(
                df.sample(frac=1.0, random_state=23)),
            key_col="k", t_col="t", val_col="v",
            num_partitions=nparts).to_pandas()
        got = {(int(r.k), int(r.day)): (int(r.num), int(r.den))
               for r in out.itertuples()}
        assert got == want, f"layout {nparts}"

    dup = pd.concat([df, pd.DataFrame(
        {"k": [500], "t": [3 * DAY], "v": [999]})],
        ignore_index=True)
    with pytest.raises(Exception, match="unique"):
        grid_interpolate(ray.data.from_pandas(dup), key_col="k",
                         t_col="t", val_col="v",
                         num_partitions=4).to_pandas()


def test_scan_family_cross_consistency(ray_session):
    """Cross-family identities on shared random data: with
    all-nonnegative deltas the clamp scan degenerates to the plain
    cumsum (zero clips, final == total, peak == running max of the
    cumsum), and record_high_scan's max_val equals the plain
    per-key maximum — ties the four scan-carry operators to each
    other, not just to their own references."""
    import numpy as np
    import pandas as pd
    import ray

    from soupflow.data.windows import (floored_running_balance,
                                       record_high_scan,
                                       windowed_cumsum)

    rng = np.random.default_rng(131)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype("int64"),
        "o": np.arange(n, dtype="int64"),
        "d": rng.integers(0, 500, n).astype("int64")})  # all ≥ 0
    ds = ray.data.from_pandas(df)

    bal = floored_running_balance(
        ds, key_col="k", order_cols=["o"], val_col="d",
        num_partitions=9).to_pandas()
    assert (bal.clip_n == 0).all()
    totals = df.groupby("k").d.sum()
    got_final = dict(zip(bal.k, bal.final_bal))
    assert got_final == {int(k): int(v) for k, v in totals.items()}

    run = windowed_cumsum(ds, key_col="k", order_cols=["o"],
                          val_col="d", out_col="r",
                          num_partitions=9).to_pandas()
    peak_ref = run.groupby("k").r.max()
    got_peak = dict(zip(bal.k, bal.peak_bal))
    assert got_peak == {int(k): int(v) for k, v in
                        peak_ref.items()}

    rec = record_high_scan(ds, key_col="k", order_cols=["o"],
                           val_col="d",
                           num_partitions=9).to_pandas()
    vmax = df.groupby("k").d.max()
    got_max = dict(zip(rec.k, rec.max_val))
    assert got_max == {int(k): int(v) for k, v in vmax.items()}
