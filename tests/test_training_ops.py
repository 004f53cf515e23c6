"""Training-data operators: dedup family, similarity search, text analysis,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qse_spark.operators import dedup, multimodal, similarity, text

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy dog today"),      # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat today"),      # near dup
    (3, "completely different content about spark engines here"),
    (4, "el gato y el perro en la casa de la abuela"),             # spanish
    (5, ""),                                                        # empty
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_exact_dedup(spark, docs):
    m = {r["doc_id"]: r["keeper_id"] for r in dedup.exact_dedup(docs).collect()}
    assert m[0] == 0 and m[1] == 0
    assert m[2] == 2 and m[3] == 3


def test_ngram_jaccard_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, tau=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_dedup_clusters(spark, docs):
    m = {r["doc_id"]: r["keeper_id"]
         for r in dedup.minhash_dedup(docs, tau=0.5).collect()}
    assert m[0] == 0 and m[1] == 0 and m[2] == 0      # near-dup cluster
    assert m[3] == 3 and m[4] == 4 and m[5] == 5      # singletons
    # idempotent keeper rule
    assert all(m[k] == m[m[k]] for k in m)


def test_simhash_properties(spark, docs):
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sig[0] == sig[1]              # identical text -> identical simhash
    assert sig[5] == 0                   # empty text
    ham = bin((sig[0] ^ sig[2]) & (2**64 - 1)).count("1")
    ham_far = bin((sig[0] ^ sig[3]) & (2**64 - 1)).count("1")
    assert ham < ham_far                 # near-dup closer than unrelated
    # hamming=10 needs blocks > 10 for the pigeonhole guarantee (now
    # asserted at entry rather than silently losing distance-5..10 pairs)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_dedup(docs, hamming=10,
                                          blocks=16).collect()}
    assert pairs.get((0, 1)) == 0


def test_text_ops(spark, docs):
    tok = {r["doc_id"]: r["n_tokens"] for r in text.token_count(docs).collect()}
    assert tok[0] == 10 and tok[5] == 0
    lang = {r["doc_id"]: r["lang_pred"]
            for r in text.language_id(docs).collect()}
    assert lang[0] == "en" and lang[4] == "es" and lang[5] == "und"
    q = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert 0 <= q[0]["score"] <= 1 and q[5]["score"] < q[0]["score"]
    fp = {r["doc_id"]: r["fp"] for r in text.fingerprint(docs).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((30, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        ["vec_id", "embedding"])
    got = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0),
                                      k=5).collect()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = unit @ unit[0]
    cos[0] = -2
    exp = list(np.argsort(-cos)[:5])
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])] == exp


def test_lsh_ann_recall_on_clustered_data(spark):
    # clustered embeddings (the near-dup use case): queries' true neighbors
    # sit in the same cluster, so hyperplane buckets preserve them
    rng = np.random.default_rng(1)
    centers = rng.standard_normal((20, 16))
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((10, 16))
                           for c in centers]).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") % 10 == 0).limit(10)
    exact = {(r["query_id"], r["vec_id"]) for r in
             similarity.brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in
              similarity.lsh_ann_topk(emb, q, dim=16, k=5,
                                      n_planes=6).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8

    # multi-probe (round-4 verdict missing #3): flipping the
    # smallest-margin planes may only ADD candidate buckets, so recall is
    # monotone in n_probe — asserted at a plane count where single-probe
    # visibly loses neighbors to boundary splits
    hard = {"exact": {(r["query_id"], r["vec_id"]) for r in
                      similarity.brute_force_topk(emb, q, k=5).collect()}}
    for n_probe in (1, 4):
        hard[n_probe] = {(r["query_id"], r["vec_id"]) for r in
                         similarity.lsh_ann_topk(
                             emb, q, dim=16, k=5, n_planes=12,
                             n_probe=n_probe).collect()}
    r1 = len(hard["exact"] & hard[1]) / len(hard["exact"])
    r4 = len(hard["exact"] & hard[4]) / len(hard["exact"])
    assert r4 >= r1
    assert r4 >= 0.8, (r1, r4)


def test_cosine_near_dup_pairs_clustered(spark):
    rng = np.random.default_rng(2)
    base = rng.standard_normal(16)
    rows = [(0, [float(x) for x in base]),
            (1, [float(x) for x in base + 0.01 * rng.standard_normal(16)]),
            (2, [float(x) for x in rng.standard_normal(16)])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["id_a"], r["id_b"]) for r in
             similarity.cosine_near_dup_pairs(emb, tau=0.95, dim=16,
                                              n_planes=4).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_cosine_near_dup_max_block_caps_and_reports(spark):
    """An over-dense LSH bucket must be dropped from the pair join (no
    O(N^2) blow-up) AND surfaced by dropped_bucket_report — never a
    silent truncation."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    # 6 near-identical vectors -> one bucket of 6 (> max_block=5)
    dense = [(i, [float(x) for x in base + 1e-3 * rng.standard_normal(16)])
             for i in range(6)]
    # plus an isolated near-dup pair in (almost surely) another bucket
    other = -base
    sparse = [(10, [float(x) for x in other]),
              (11, [float(x) for x in other + 1e-3 *
                    rng.standard_normal(16)])]
    emb = spark.createDataFrame(dense + sparse, ["vec_id", "embedding"])
    pairs = {(r["id_a"], r["id_b"]) for r in
             similarity.cosine_near_dup_pairs(
                 emb, tau=0.95, dim=16, n_planes=2, max_block=5).collect()}
    assert (10, 11) in pairs
    assert not any(a < 6 and b < 6 for a, b in pairs)
    report = similarity.dropped_bucket_report(
        emb, dim=16, n_planes=2, max_block=5).collect()
    assert len(report) == 1 and report[0]["n"] == 6
    # uncapped, the dense bucket's pairs come back
    uncapped = {(r["id_a"], r["id_b"]) for r in
                similarity.cosine_near_dup_pairs(
                    emb, tau=0.95, dim=16, n_planes=2).collect()}
    assert any(a < 6 and b < 6 for a, b in uncapped)


def test_multimodal_stub_plumbing(spark):
    rows = [(1, "image", bytearray(b"\x89PNGfake"), "image/png"),
            (2, "video", bytearray(b"RIFFfake" * 10), "video/avi"),
            (3, "audio", bytearray(b""), "audio/wav")]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    # real+strict decode of junk payloads fails loudly (in the executor)
    with pytest.raises(Exception, match="not PNG/JPEG/WAV"):
        multimodal.decode_media(media).collect()
    # strict=False falls back to the visible 'fake' format tag
    fallback = multimodal.decode_media(media, strict=False).collect()
    assert all(r["format"] == "fake" for r in fallback)
    feats = multimodal.decode_media(media, fake=True)
    got = {r["media_id"]: r for r in feats.collect()}
    assert got[1]["n_bytes"] == 8 and got[1]["n_frames"] == 1
    assert got[2]["kind"] == "video" and got[2]["n_frames"] >= 1
    # deterministic
    again = {r["media_id"]: r for r in
             multimodal.decode_media(media, fake=True).collect()}
    assert got == again
    frames = multimodal.frame_sample(feats, every_n=4).collect()
    assert all(r["frame_idx"] % 4 == 0 for r in frames)


def test_multimodal_real_header_decode(spark):
    """synth -> decode roundtrip: struct-level PNG IHDR and WAV fmt/data
    parsing recovers exactly the parameters the synth formula encoded."""
    ids = spark.range(0, 20).select(F.col("id").alias("media_id"))
    media = multimodal.synth_media(ids)
    got = {r["media_id"]: r for r in
           multimodal.decode_media(media, fake=False).collect()}
    assert len(got) == 20
    for i in range(20):
        r = got[i]
        if i % 2 == 0:
            assert r["format"] == "png" and r["kind"] == "image"
            assert r["width"] == 16 + i % 512
            assert r["height"] == 16 + (i * 7) % 512
            assert r["channels"] is None and r["sample_rate"] is None
            assert r["n_frames"] == 1
        elif i % 4 == 3:
            # SOF0 baseline and SOF2 progressive (i%8==7) both decode
            assert r["format"] == "jpeg" and r["kind"] == "image"
            assert r["width"] == 16 + (i * 3) % 512
            assert r["height"] == 16 + (i * 5) % 512
            assert r["channels"] is None and r["sample_rate"] is None
            assert r["n_frames"] == 1
        elif i % 8 == 5:
            assert r["format"] == "avi" and r["kind"] == "video"
            assert r["width"] == 16 + (i * 9) % 512
            assert r["height"] == 16 + (i * 11) % 512
            assert r["n_frames"] == 10 + i % 240
            assert r["channels"] is None and r["sample_rate"] is None
        else:
            assert r["format"] == "wav" and r["kind"] == "audio"
            assert r["channels"] == 1 + i % 2
            assert r["sample_rate"] == 8000 + (i % 5) * 1000
            assert r["n_frames"] == 100 + i % 400
            assert r["width"] is None and r["height"] is None


def test_multimodal_real_decode_matches_gold(spark):
    """Spark parse-side features == formula-side gold twin (byte counts
    and CRCs come from an independent re-synthesis in goldgen)."""
    from qse_spark.goldgen import gold_mm_real
    ids = spark.range(0, 30).select(F.col("id").alias("media_id"))
    got = (multimodal.decode_media(multimodal.synth_media(ids), fake=False)
           .orderBy("media_id").collect())
    gold = gold_mm_real(list(range(30))).to_pylist()
    assert len(got) == len(gold) == 30
    for g, x in zip(got, gold):
        assert g.asDict() == x, g["media_id"]


def test_frame_sample_on_real_avi_decode(spark):
    """frame_sample over REAL decoded AVI metadata: one row per kept
    frame index, step every_n, bounded by the avih dwTotalFrames the
    header parser read (not a fake)."""
    ids = spark.range(0, 64).select(F.col("id").alias("media_id"))
    feats = multimodal.decode_media(multimodal.synth_media(ids), fake=False)
    got = {}
    for r in multimodal.frame_sample(feats, every_n=7).collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    vids = [i for i in range(64) if i % 8 == 5]
    assert sorted(got) == vids                 # only video rows sampled
    for i in vids:
        assert sorted(got[i]) == list(range(0, 10 + i % 240, 7))


def test_fit_dims_math():
    """Aspect-fit is floor-deterministic, never upscales, never hits 0."""
    assert multimodal.fit_dims(100, 50, 256) == (100, 50)   # inside box
    assert multimodal.fit_dims(256, 256, 256) == (256, 256)  # on boundary
    assert multimodal.fit_dims(512, 256, 256) == (256, 128)
    assert multimodal.fit_dims(512, 1, 256) == (256, 1)      # clamp to 1
    assert multimodal.fit_dims(1000, 3, 256) == (256, 1)     # floor then clamp
    w, h = multimodal.fit_dims(527, 511, 256)
    assert max(w, h) == 256 and w >= h                       # aspect kept


def test_resize_media_header_surgery_roundtrips(spark):
    """resize_media rewrites the PNG IHDR (dims + recomputed CRC) and the
    JPEG SOF frame header; the REAL decoder then reads the new dims, and
    within-box / non-image payloads pass through byte-identical."""
    import zlib as _z
    ids = spark.range(0, 24).select(F.col("id").alias("media_id"))
    media = multimodal.synth_media(ids)
    rs = {r["media_id"]: r for r in
          multimodal.resize_media(media, max_side=256).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert len(rs) == 24
    for i in range(24):
        r = rs[i]
        if i % 4 == 1:        # wav: untouched, dims null
            assert r["resampled"] == "none" and r["width"] is None
            assert bytes(r["payload"]) == bytes(src[i]["payload"])
            continue
        assert max(r["width"], r["height"]) <= 256
        if (r["width"], r["height"]) == (r["src_width"], r["src_height"]):
            assert r["resampled"] == "none"
            assert bytes(r["payload"]) == bytes(src[i]["payload"])
        else:
            assert r["resampled"] == "header"
            p = bytes(r["payload"])
            if i % 2 == 0:    # resized PNG carries a VALID IHDR CRC
                assert _z.crc32(p[12:29]) == int.from_bytes(p[29:33], "big")
    # the real decoder reads the post-surgery dims
    dec = {r["media_id"]: r for r in multimodal.decode_media(
        multimodal.resize_media(media, max_side=256)
        .select("media_id", "kind", "payload", "mime"),
        fake=False).collect()}
    for i in range(24):
        if i % 4 != 1:
            assert (dec[i]["width"], dec[i]["height"]) == \
                (rs[i]["width"], rs[i]["height"])


def test_resize_decoded_matches_gold(spark):
    """decode(resize(synth)) == goldgen's independent formula twin
    (gold re-synthesizes the post-surgery bytes, including the IHDR CRC,
    without running the surgery code)."""
    from qse_spark.goldgen import gold_mm_resize_decoded
    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    got = (multimodal.decode_media(
        multimodal.resize_media(multimodal.synth_media(ids), max_side=256)
        .select("media_id", "kind", "payload", "mime"), fake=False)
        .orderBy("media_id").collect())
    gold = gold_mm_resize_decoded(list(range(40)), max_side=256).to_pylist()
    assert len(got) == len(gold) == 40
    for g, x in zip(got, gold):
        assert g.asDict() == x, g["media_id"]


def test_ivf_recall_on_clustered_data(spark):
    # same clustered corpus as the LSH recall test: with enough probes the
    # query's own cluster cell is always searched
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((20, 16))
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((10, 16))
                           for c in centers]).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"])
    q = emb.filter(F.col("vec_id") % 10 == 0).limit(10)
    exact = {(r["query_id"], r["vec_id"]) for r in
             similarity.brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in
              similarity.ivf_topk(emb, q, k=5, n_centroids=12,
                                  nprobe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8


def test_ivf_centroids_autoscale(spark):
    rng = np.random.default_rng(5)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)])
         for i in range(100)],
        ["vec_id", "embedding"])
    # None -> ceil(sqrt(100)) = 10 centroids
    assert similarity.ivf_centroids(emb, None).shape == (10, 8)


def test_winnow_local_edit_robustness(spark):
    # winnowing keeps most fingerprints under a single word edit, where the
    # whole-doc md5 fingerprint flips entirely
    from qse_spark.operators import text as T
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest until the morning light")
    edited = base.replace("quiet", "silent")
    docs = spark.createDataFrame([(0, base), (1, edited)],
                                 ["doc_id", "text"])
    fps = T.winnow_fingerprint(docs, k=8, w=4).collect()
    a = {r["fp"] for r in fps if r["doc_id"] == 0}
    b = {r["fp"] for r in fps if r["doc_id"] == 1}
    overlap = len(a & b) / len(a | b)
    assert overlap >= 0.5
    md5 = {r["doc_id"]: r["fp"] for r in T.fingerprint(docs).collect()}
    assert md5[0] != md5[1]


def test_winnow_short_and_empty_docs(spark):
    from qse_spark.operators import text as T
    docs = spark.createDataFrame(
        [(0, ""), (1, "hi"), (2, "exactly8"), (3, "a bit longer than k")],
        ["doc_id", "text"])
    rows = T.winnow_fingerprint(docs, k=8, w=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # every doc contributes exactly one fingerprint window here
    assert set(by_doc) == {0, 1, 2, 3}
    assert all(len(v) >= 1 for v in by_doc.values())


def test_redact_pii_masks_and_counts(spark):
    from qse_spark.operators import text as T
    docs = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or call +1 (555) 123-4567"),
         (2, "server at 192.168.0.1 and 8.8.8.8"),
         (3, "no pii here"),
         (4, "two mails a@b.io c@d.co one ip 1.2.3.4")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in T.redact_pii(docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "<EMAIL>" in got[1]["text_redacted"]
    assert "<PHONE>" in got[1]["text_redacted"]
    assert "bob.smith" not in got[1]["text_redacted"]
    assert got[2]["n_ipv4"] == 2
    assert got[2]["text_redacted"] == "server at <IP> and <IP>"
    assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_ipv4"]) == (0, 0, 0)
    assert got[3]["text_redacted"] == "no pii here"
    assert got[4]["n_email"] == 2 and got[4]["n_ipv4"] == 1


def test_winnow_dup_pairs_finds_near_dups(spark):
    from qse_spark.operators import text as T
    base = ("we the people of the united states in order to form a more "
            "perfect union establish justice and insure domestic tranquility")
    edited = base.replace("justice", "fairness")
    other = "completely different content with no overlap whatsoever here"
    docs = spark.createDataFrame(
        [(0, base), (1, edited), (2, other)], ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]): r["shared"]
             for r in T.winnow_dup_pairs(docs, min_shared=2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert not any(2 in p for p in pairs)


def test_winnow_dropped_fp_report_and_cap(spark):
    """A fingerprint shared by more docs than max_df must (a) be excluded
    from the pair join and (b) appear in dropped_fp_report — the same
    never-silent-drop contract the shingle/chunk/bucket/token caps keep.
    Five identical boilerplate docs + two genuine near-dups: with
    max_df=4 every boilerplate fingerprint (df=5) is dropped, so the
    boilerplate clique contributes NO pairs while the near-dup pair
    survives."""
    from qse_spark.operators import text as T
    boiler = ("standard footer text repeated verbatim on every single "
              "page of the crawl corpus")
    base = ("we the people of the united states in order to form a more "
            "perfect union establish justice and insure tranquility")
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(5)]
        + [(10, base), (11, base.replace("justice", "fairness"))],
        ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"])
             for r in T.winnow_dup_pairs(docs, min_shared=2,
                                         max_df=4).collect()}
    assert (10, 11) in pairs
    assert not any(a < 5 and b < 5 for a, b in pairs)
    report = T.dropped_fp_report(docs, max_df=4).collect()
    assert report and all(r["df"] == 5 for r in report)
    # every dropped fp really is a boilerplate fingerprint
    boiler_fps = {r["fp"] for r in T.winnow_fingerprint(
        docs.filter("doc_id = 0")).collect()}
    assert {r["fp"] for r in report} <= boiler_fps


def test_stratified_sample_caps_and_determinism(spark):
    from qse_spark.operators import text as T
    docs = spark.createDataFrame(
        [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(90)],
        ["doc_id", "text", "lang"])
    a = T.stratified_sample(docs, strata_col="lang", cap=10, seed=7)
    b = T.stratified_sample(docs.repartition(13), strata_col="lang",
                            cap=10, seed=7)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))   # partition-invariant
    per = {}
    for _, stratum, _ in rows_a:
        per[stratum] = per.get(stratum, 0) + 1
    assert all(n <= 10 for n in per.values())
    assert T.stratified_sample(docs, cap=10, seed=8).collect() != a.collect()


def test_resize_truncated_png_passes_through(spark):
    """A PNG truncated right after the IHDR dims (24 bytes — enough for
    _parse_png, too short for CRC surgery) must pass through unresized
    instead of CRC-ing the wrong range and appending past the buffer
    (review finding); a full 33-byte header still gets surgery."""
    import struct
    import zlib as _zlib

    from qse_spark.operators.multimodal import decode_media, resize_media

    sig = bytes([0x89]) + b"PNG" + bytes([0x0D, 0x0A, 0x1A, 0x0A])
    head24 = (sig + (13).to_bytes(4, "big") + b"IHDR"
              + (1000).to_bytes(4, "big") + (500).to_bytes(4, "big"))
    assert len(head24) == 24
    ihdr_data = ((1000).to_bytes(4, "big") + (500).to_bytes(4, "big")
                 + bytes([8, 6, 0, 0, 0]))
    full = (sig + (13).to_bytes(4, "big") + b"IHDR" + ihdr_data
            + struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr_data))
            + (0).to_bytes(4, "big") + b"IEND" + bytes(4))
    media = spark.createDataFrame(
        [(1, "image", bytearray(head24), "image/png"),
         (2, "image", bytearray(full), "image/png")],
        ["media_id", "kind", "payload", "mime"])
    out = {r["media_id"]: r for r in
           resize_media(media, max_side=256).collect()}
    assert out[1]["resampled"] == "none"
    assert (out[1]["width"], out[1]["height"]) == (1000, 500)
    assert bytes(out[1]["payload"]) == head24
    assert out[2]["resampled"] == "header"
    assert (out[2]["width"], out[2]["height"]) == (256, 128)
    dec = decode_media(resize_media(media, max_side=256)
                       .select("media_id", "kind", "payload", "mime"),
                       fake=False).collect()
    d = {r["media_id"]: (r["width"], r["height"]) for r in dec}
    assert d[2] == (256, 128)
