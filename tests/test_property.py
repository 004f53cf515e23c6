"""Hypothesis property tests over the twin-parity surfaces (SURVEY §5:
property-based checks). Each Spark-backed test batches one generated LIST
of inputs into a single job, so hypothesis explores structure without
paying per-example JVM round-trips.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60)

_SPARK_SETTINGS = settings(
    deadline=None, max_examples=5,
    suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(st.lists(ASCII_TEXT, min_size=1, max_size=60))
@settings(deadline=None, max_examples=200)
@example(texts=["0.:_0"])   # dropped char fusing two separator runs
def test_norm_vectorized_matches_scalar(texts):
    """The pandas extraction normalizer and the scalar textnorm twin are
    the same function on printable-ASCII surfaces."""
    from qse_spark.operators.extraction import _norm_series
    from qse_spark.textnorm import normalize_surface
    got = _norm_series(pd.Series(texts, dtype=object)).tolist()
    exp = [normalize_surface(t) for t in texts]
    assert got == exp


@given(st.lists(ASCII_TEXT, min_size=1, max_size=60))
@_SPARK_SETTINGS
@example(texts=["0.:_0"])   # dropped char fusing two separator runs
def test_norm_column_twin_matches_scalar(spark, texts):
    """The native column twin (functions.columns.normalize_surface_col)
    agrees with the scalar textnorm.normalize_surface on printable ASCII
    (one batched job per example list)."""
    from qse_spark.functions.columns import normalize_surface_col
    from qse_spark.textnorm import normalize_surface
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "s"])
    got = [r["n"] for r in
           df.select("i", normalize_surface_col(F.col("s")).alias("n"))
           .orderBy("i").collect()]
    assert got == [normalize_surface(t) for t in texts]


@given(st.lists(st.text(max_size=40), min_size=1, max_size=100))
@_SPARK_SETTINGS
def test_xxh64_twin_matches_spark_on_arbitrary_strings(spark, texts):
    """Pure-Python XXH64 == Spark xxhash64 for arbitrary unicode strings
    (the twin underpins every gold oracle that reproduces band keys,
    simhash signatures and winnow fingerprints)."""
    from qse_spark.xxh import SPARK_SEED, _signed, xxh64
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = {r["s"]: r["h"]
           for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for t in set(texts):
        assert got[t] == _signed(xxh64(t.encode("utf-8"), SPARK_SEED)), t


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
    max_size=50), min_size=1, max_size=25))
@_SPARK_SETTINGS
def test_winnow_twin_matches_spark(spark, texts):
    from qse_spark.goldgen import gold_winnow
    from qse_spark.operators.text import winnow_fingerprint
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["doc_id"], r["fp"])
           for r in winnow_fingerprint(df, k=8, w=4).collect()}
    gold = gold_winnow(docs, k=8, w=4)
    exp = set(zip(gold["doc_id"].to_pylist(), gold["fp"].to_pylist()))
    assert got == exp


@given(st.binary(max_size=200))
@settings(deadline=None, max_examples=300)
@example(payload=b"\x89PNG\r\n\x1a\n")            # signature, no IHDR
@example(payload=b"RIFF\x00\x00\x00\x00WAVE")     # WAVE, no chunks
@example(payload=b"RIFF\xff\xff\xff\xffWAVEfmt \xff\xff\xff\xff")
@example(payload=b"RIFF\x00\x00\x00\x00AVI ")     # AVI, no LIST
@example(payload=b"RIFF\xff\xff\xff\xffAVI LIST\xff\xff\xff\xffhdrl"
                 b"avih\xff\xff\xff\xff")          # lying list/chunk sizes
# lying u32 PNG width (0xFFFFFFFF) — must reject, not overflow Int32
@example(payload=b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
                 b"\xff\xff\xff\xff\x00\x00\x00\x10\x08\x06\x00\x00\x00")
# lying u32 WAV sample_rate (0x80000000) — must reject
@example(payload=b"RIFF\x28\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
                 b"\x01\x00\x01\x00\x00\x00\x00\x80\x00\x00\x01\x00"
                 b"\x02\x00\x10\x00data\x04\x00\x00\x00\x00\x00\x00\x00")
def test_media_header_parsers_never_crash(payload):
    """_parse_png/_parse_wav must return a tuple or None on ARBITRARY
    bytes — truncated chunks, lying sizes, empty input — never raise
    (they run inside an Arrow batch on whatever binary a corpus holds)."""
    from qse_spark.operators.multimodal import (_parse_avi, _parse_png,
                                                _parse_wav)
    for parse in (_parse_png, _parse_wav, _parse_avi):
        out = parse(payload)
        assert out is None or isinstance(out, tuple)
        if out is not None:
            # every header-derived feature must survive the Int32 cast:
            # lying u32 fields (sample_rate, width, height) are rejected
            # as corrupt rather than crashing the decode batch
            assert all(0 <= v < 2 ** 31 for v in out)
    wav = _parse_wav(payload)
    if wav is not None:
        # declared data size is clamped to bytes present, so the frame
        # count can never exceed the payload
        assert wav[2] <= len(payload)


@given(st.integers(min_value=0, max_value=10_000_000))
@settings(deadline=None, max_examples=200)
def test_media_synth_decode_roundtrip_scalar(i):
    """The synth byte spec and the header parsers agree for every id —
    the scalar core of the mm_decode_real oracle, fuzzed over the id
    space without a Spark job."""
    import struct as _s
    import zlib as _z

    from qse_spark.goldgen import gold_mm_real
    from qse_spark.operators.multimodal import _parse_png, _parse_wav
    gold = gold_mm_real([i]).to_pylist()[0]
    # rebuild the payload exactly like synth_media does
    if i % 2 == 0:
        w, h = 16 + i % 512, 16 + (i * 7) % 512
        ihdr = _s.pack(">II", w, h) + bytes([8, 6, 0, 0, 0])
        p = (b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR" + ihdr
             + b"\x00" * 4 + _s.pack(">I", 0) + b"IEND" + b"\x00" * 4)
        assert _parse_png(p) == (gold["width"], gold["height"])
        assert _parse_wav(p) is None
    elif i % 4 == 3:
        from qse_spark.operators.multimodal import _parse_jpeg
        w, h = 16 + (i * 3) % 512, 16 + (i * 5) % 512
        sof = 0xC2 if i % 8 == 7 else 0xC0
        app0 = (b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00"
                + bytes([1, 1, 0]) + _s.pack(">HH", 1, 1) + bytes([0, 0]))
        frame = (bytes([0xFF, sof]) + _s.pack(">H", 17) + bytes([8])
                 + _s.pack(">HH", h, w)
                 + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
        p = b"\xff\xd8" + app0 + frame + b"\xff\xd9"
        assert _parse_jpeg(p) == (gold["width"], gold["height"])
        assert _parse_png(p) is None and _parse_wav(p) is None
    elif i % 8 == 5:
        from qse_spark.operators.multimodal import _parse_avi
        w, h = 16 + (i * 9) % 512, 16 + (i * 11) % 512
        frames = 10 + i % 240
        avih = _s.pack("<IIIIIIIIII", 33367, 0, 0, 0, frames,
                       0, 1, 0, w, h) + bytes(16)
        hdrl = b"hdrl" + b"avih" + _s.pack("<I", 56) + avih
        p = (b"RIFF" + _s.pack("<I", 4 + 8 + len(hdrl) + 12) + b"AVI "
             + b"LIST" + _s.pack("<I", len(hdrl)) + hdrl
             + b"LIST" + _s.pack("<I", 4) + b"movi")
        assert _parse_avi(p) == (gold["width"], gold["height"],
                                 gold["n_frames"])
        assert _parse_png(p) is None and _parse_wav(p) is None
    else:
        ch = 1 + i % 2
        sr = 8000 + (i % 5) * 1000
        nsamp = 100 + i % 400
        align = ch * 2
        fmt = _s.pack("<HHIIHH", 1, ch, sr, sr * align, align, 16)
        data = b"\x00" * (nsamp * align)
        p = (b"RIFF" + _s.pack("<I", 36 + len(data)) + b"WAVE"
             + b"fmt " + _s.pack("<I", 16) + fmt
             + b"data" + _s.pack("<I", len(data)) + data)
        assert _parse_wav(p) == (gold["channels"], gold["sample_rate"],
                                 gold["n_frames"])
        assert _parse_png(p) is None
    assert len(p) == gold["n_bytes"] and _z.crc32(p) == gold["crc32"]


@given(w=st.integers(1, 2 ** 31 - 1), h=st.integers(1, 2 ** 31 - 1),
       ms=st.integers(1, 4096))
@settings(deadline=None, max_examples=300)
@example(w=2 ** 31 - 1, h=1, ms=1)     # extreme aspect: floor-to-0 clamp
@example(w=257, h=256, ms=256)         # just over the box
def test_resize_fit_and_png_surgery_scalar(w, h, ms):
    """fit_dims invariants on ARBITRARY dims (never upscale, max side
    lands exactly on the box when shrinking, orientation preserved,
    never 0) and the PNG IHDR surgery round-trips through the real
    parser with a valid chunk CRC."""
    import struct as _s
    import zlib as _z

    from qse_spark.operators.multimodal import (_parse_png, _resize_png,
                                                fit_dims)
    nw, nh = fit_dims(w, h, ms)
    assert 1 <= nw <= w and 1 <= nh <= h
    if max(w, h) <= ms:
        assert (nw, nh) == (w, h)
    else:
        assert max(nw, nh) == ms
    # orientation never flips (clamp-to-1 may equalize, never invert)
    assert nw >= nh if w >= h else nh >= nw
    ihdr = _s.pack(">II", w, h) + bytes([8, 6, 0, 0, 0])
    p = (b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR" + ihdr
         + b"\x00" * 4 + _s.pack(">I", 0) + b"IEND" + b"\x00" * 4)
    out = _resize_png(p, nw, nh)
    assert _parse_png(out) == (nw, nh)
    assert len(out) == len(p)
    assert _z.crc32(out[12:29]) == int.from_bytes(out[29:33], "big")


@given(w=st.integers(1, 65535), h=st.integers(1, 65535),
       ms=st.integers(1, 4096))
@settings(deadline=None, max_examples=300)
def test_resize_jpeg_sof_surgery_scalar(w, h, ms):
    """JPEG SOF locate + dim patch (the byte surgery resize_media's
    image branch performs) round-trips through _parse_jpeg for
    arbitrary u16 dims."""
    import struct as _s

    from qse_spark.operators.multimodal import (_find_jpeg_sof,
                                                _parse_jpeg, fit_dims)
    app0 = (b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + _s.pack(">HH", 1, 1) + bytes([0, 0]))
    frame = (b"\xff\xc0" + _s.pack(">H", 17) + bytes([8])
             + _s.pack(">HH", h, w)
             + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    p = b"\xff\xd8" + app0 + frame + b"\xff\xd9"
    assert _parse_jpeg(p) == (w, h)
    nw, nh = fit_dims(w, h, ms)
    pos = _find_jpeg_sof(p)
    assert pos is not None
    out = bytearray(p)
    out[pos + 5:pos + 9] = _s.pack(">HH", nh, nw)
    assert _parse_jpeg(bytes(out)) == (nw, nh)


_LITERAL = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=0x2FF),
        # raw line terminators / tabs must survive via ECHAR escaping
        st.sampled_from("\n\r\t")),
    min_size=0, max_size=30)


@given(st.lists(st.tuples(_LITERAL, st.sampled_from(
    ["string", "integer", "date", "iri", "langString"])),
    min_size=1, max_size=30))
@_SPARK_SETTINGS
def test_ntriples_roundtrip_arbitrary_literals(spark, tmp_path_factory, rows):
    """write_ntriples -> read_ntriples is the identity for arbitrary
    literal payloads (quotes, backslashes, unicode) — the r1-advice
    escaping fixes, fuzzed. langString objects need a real '@lang'
    suffix; iri objects must be non-empty tokens, so those two kinds are
    remapped onto well-formed carriers while keeping the payload."""
    from qse_spark.sources.ntriples import read_ntriples, write_ntriples
    data = []
    for i, (lit, kind) in enumerate(rows):
        if kind == "iri":
            obj = f"obj{i}"
        elif kind == "langString":
            # include digit-bearing BCP-47 tags: the round-3 review found
            # a writer/reader LANGTAG grammar mismatch dropping es-419
            tag = ["en", "es-419", "zh-Hant", "de-DE-1901"][i % 4]
            obj = lit.replace("@", "") + "@" + tag
        elif kind == "integer":
            obj = str(len(lit))
        elif kind == "date":
            obj = "2020-01-02"
        else:
            obj = lit
        data.append((f"s{i}", f"p{i % 3}", obj, kind))
    df = spark.createDataFrame(data, ["subject", "predicate", "object",
                                      "obj_kind"])
    out = str(tmp_path_factory.mktemp("ntfuzz") / "t.nt")
    write_ntriples(df, out)
    got = {tuple(r) for r in read_ntriples(spark, out).collect()}
    exp = {(f"http://ex.org/s{i}", f"http://ex.org/p{i % 3}",
            f"http://ex.org/{o}" if k == "iri" else o, k)
           for (s, p, o, k), (i, _) in zip(data, enumerate(rows))}
    assert got == exp
