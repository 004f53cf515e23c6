"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Two decode paths, both Arrow-batched through `mapInPandas`:

- REAL header decode (`decode_media(..., fake=False)`): dependency-free
  `struct`-level parsing of one common container header per media kind —
  PNG IHDR and JPEG SOFn (width/height), RIFF/WAVE fmt+data chunks
  (channels/sample rate/sample count), and RIFF/AVI avih
  (width/height/total frames) — pure public file-format knowledge,
  no codec libraries needed.
- FAKE decode (`fake=True`): a deterministic CRC-derived stand-in for
  payloads whose formats need a real codec library (pixel/entropy scan
  decode, other containers). The Spark-side plumbing — binary schema, Arrow batch
  shape, UDF signature, partitioning — is identical in both paths, so
  swapping in PIL/torchaudio/ffmpeg changes nothing structurally.

Reference parity note: QSE has no media path; this family implements the
training-data-pipeline surface (task brief) with the same oracle rigor as
the rest of the repo (goldgen.gold_mm_*)."""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),        # opaque encoded bytes
    StructField("mime", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("format", StringType()),        # png | jpeg | wav | fake
    StructField("n_bytes", IntegerType()),
    StructField("crc32", LongType()),
    StructField("width", IntegerType()),        # image formats only
    StructField("height", IntegerType()),       # image formats only
    StructField("channels", IntegerType()),     # wav only
    StructField("sample_rate", IntegerType()),  # wav only
    StructField("n_frames", IntegerType()),     # wav: sample frames
])

_COLS = [f.name for f in FEATURE_SCHEMA.fields]
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_png(p: bytes):
    """(width, height) from the IHDR chunk, or None if not a PNG. The
    IHDR is mandatory-first (PNG spec §5.6), so width/height live at
    fixed offsets 16/20 as big-endian u32. The spec caps dimensions at
    2^31-1 and forbids zero — out-of-range values mean a corrupt file,
    returned as None (not a crash in the Int32 feature cast)."""
    if len(p) >= 24 and p[:8] == _PNG_SIG and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        if 0 < w < 2 ** 31 and 0 < h < 2 ** 31:
            return w, h
    return None


_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}   # not DHT/JPG/DAC


def _find_jpeg_sof(p: bytes) -> int | None:
    """Byte offset of the first SOFn marker (the 0xFF byte) with its
    frame header fully in bounds, or None if not a JPEG. THE one marker
    walk, per the public JPEG/JFIF spec (shared by _parse_jpeg and
    resize_media's header surgery so the two can never locate the SOF
    differently — round-4 review finding): after SOI (FFD8), each
    segment is FF + marker + 2-byte BE length that includes itself;
    SOF0..SOF15 (minus DHT/JPG/DAC) carry precision(1) height(2)
    width(2). Standalone markers (TEM, RSTn) and fill FFs are skipped;
    reaching SOS/EOI without a SOF or a desynced byte returns None."""
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            return None
        marker = p[pos + 1]
        if marker == 0xFF:                       # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:   # standalone
            pos += 2
            continue
        if marker in (0xD9, 0xDA):               # EOI / SOS before SOF
            return None
        (size,) = struct.unpack(">H", p[pos + 2:pos + 4])
        if size < 2:
            return None
        if marker in _SOF_MARKERS:
            return pos if size >= 7 and pos + 9 <= len(p) else None
        pos += 2 + size
    return None


def _parse_jpeg(p: bytes):
    """(width, height) from the first SOFn frame header (via
    _find_jpeg_sof), or None if not a JPEG. Zero dimensions (spec allows
    height 0 only with a later DNL — treated as corrupt) return None,
    matching the lying-header posture of _parse_png/_parse_wav."""
    pos = _find_jpeg_sof(p)
    if pos is None:
        return None
    h, w = struct.unpack(">HH", p[pos + 5:pos + 9])
    return (w, h) if 0 < w and 0 < h else None


def _parse_wav(p: bytes):
    """(channels, sample_rate, n_sample_frames) from a RIFF/WAVE header,
    or None. Walks the chunk list (id:4 + size:4 LE + payload, word-
    aligned) for `fmt ` and `data` — sizes come from the header, the
    sample data itself is never touched. The declared data size is
    CLAMPED to the bytes actually present (crawled corpora are full of
    truncated files and lying headers; an unclamped 0xFFFFFFFE size
    would both overcount frames and overflow the int32 feature column
    downstream — round-3 review finding)."""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos, ch, sr, align, data_size = 12, None, None, None, None
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (size,) = struct.unpack("<I", p[pos + 4:pos + 8])
        if cid == b"fmt " and size >= 16 and pos + 8 + 16 <= len(p):
            _, ch, sr, _, align, _ = struct.unpack(
                "<HHIIHH", p[pos + 8:pos + 24])
        elif cid == b"data":
            data_size = min(size, max(0, len(p) - (pos + 8)))
        pos += 8 + size + (size & 1)
    if ch is None or data_size is None or not align:
        return None
    if not (0 < sr < 2 ** 31):        # u32 field; a lying rate would
        return None                   # overflow the Int32 feature cast
    return ch, sr, data_size // align


def _parse_avi(p: bytes):
    """(width, height, n_frames) from a RIFF/AVI MainAVIHeader, or None.
    Walks top-level RIFF chunks to the LIST/hdrl, then its sub-chunks to
    `avih` (public AVI/RIFF spec: avih data is 14 LE u32s — frame period,
    rates, flags, dwTotalFrames at offset 16, dwWidth/dwHeight at 32/36).
    Same lying-header posture as the other parsers: dims must be positive
    and fit Int32, the frame count non-negative and Int32-safe; word-
    aligned chunk advance; truncated lists return None, never crash."""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    pos = 12
    while pos + 8 <= len(p):
        cid = p[pos:pos + 4]
        (size,) = struct.unpack("<I", p[pos + 4:pos + 8])
        if (cid == b"LIST" and pos + 12 <= len(p)
                and p[pos + 8:pos + 12] == b"hdrl"):
            inner = pos + 12
            end = min(len(p), pos + 8 + size)
            while inner + 8 <= end:
                c2 = p[inner:inner + 4]
                (s2,) = struct.unpack("<I", p[inner + 4:inner + 8])
                if c2 == b"avih" and s2 >= 40 and inner + 48 <= len(p):
                    d = p[inner + 8:inner + 48]
                    (frames,) = struct.unpack("<I", d[16:20])
                    w, h = struct.unpack("<II", d[32:40])
                    if (0 < w < 2 ** 31 and 0 < h < 2 ** 31
                            and frames < 2 ** 31):
                        return w, h, frames
                    return None
                inner += 8 + s2 + (s2 & 1)
            return None
        pos += 8 + size + (size & 1)
    return None


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder: dimensions derived from a
    stable checksum of the payload."""
    c = zlib.crc32(payload)
    return 32 + c % 1024, 32 + (c >> 10) % 1024, 1 + (c >> 20) % 64


def decode_media(media: DataFrame, fake: bool = False,
                 strict: bool = True) -> DataFrame:
    """Binary payload -> typed feature row, Arrow-batched.

    fake=False (the real path) header-parses PNG, JPEG, WAV and AVI payloads
    with zero dependencies; an unrecognized format raises (strict=True) or
    falls back to the CRC fake tagged format='fake' (strict=False), so a
    fallback is always visible in the output, never silent. fake=True
    forces the CRC fake for every row (fixture/smoke path)."""

    def _row(mid, kind, payload):
        p = bytes(payload or b"")
        base = {"media_id": int(mid), "kind": kind, "n_bytes": len(p),
                "crc32": zlib.crc32(p), "width": None, "height": None,
                "channels": None, "sample_rate": None, "n_frames": None}
        if not fake:
            png = _parse_png(p)
            if png is not None:
                return {**base, "format": "png", "width": png[0],
                        "height": png[1], "n_frames": 1}
            jpg = _parse_jpeg(p)
            if jpg is not None:
                return {**base, "format": "jpeg", "width": jpg[0],
                        "height": jpg[1], "n_frames": 1}
            wav = _parse_wav(p)
            if wav is not None:
                return {**base, "format": "wav", "channels": wav[0],
                        "sample_rate": wav[1], "n_frames": wav[2]}
            avi = _parse_avi(p)
            if avi is not None:
                return {**base, "format": "avi", "width": avi[0],
                        "height": avi[1], "n_frames": avi[2]}
            if strict:
                raise ValueError(
                    f"media_id={mid}: payload is not PNG/JPEG/WAV/AVI; "
                    "real decode of this format needs a codec library "
                    "(pass strict=False for the CRC fake fallback)")
        w, h, nf = _fake_decode(p)
        return {**base, "format": "fake", "width": w, "height": h,
                "n_frames": nf if kind == "video" else 1}

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_row(m, k, p) for m, k, p in
                    zip(pdf["media_id"], pdf["kind"], pdf["payload"])]
            out = pd.DataFrame(rows, columns=_COLS)
            for c in ("width", "height", "channels", "sample_rate",
                      "n_frames", "n_bytes"):
                out[c] = out[c].astype("Int32")
            yield out

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def synth_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic tiny PNG/JPEG/WAV/AVI payload per id (even ids ->
    PNG, i%8==5 -> AVI video, other i%4==1 -> WAV, i%4==3 -> JPEG with
    SOF2-progressive every i%8==7) for exercising the real decode path
    without codec libraries — one real format per media kind.
    Geometry/audio parameters are pure functions of the id, so an
    independent oracle can predict every decoded feature without parsing
    (goldgen.gold_mm_real). Fixture generator — the pandas UDF here is
    synthesis, not a hot-path operator."""

    def _payload(i: int) -> bytes:
        if i % 2 == 0:
            w, h = 16 + i % 512, 16 + (i * 7) % 512
            ihdr = struct.pack(">II", w, h) + bytes([8, 6, 0, 0, 0])
            return (_PNG_SIG + struct.pack(">I", 13) + b"IHDR" + ihdr
                    + b"\x00" * 4                       # CRC not validated
                    + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4)
        if i % 4 == 3:
            w, h = 16 + (i * 3) % 512, 16 + (i * 5) % 512
            sof = 0xC2 if i % 8 == 7 else 0xC0
            app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
                    + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
                    + bytes([0, 0]))
            comps = bytes([3]) + b"".join(
                bytes([cid, 0x11, 0]) for cid in (1, 2, 3))
            frame = (bytes([0xFF, sof]) + struct.pack(">H", 8 + 9)
                     + bytes([8]) + struct.pack(">HH", h, w) + comps)
            return b"\xff\xd8" + app0 + frame + b"\xff\xd9"
        if i % 8 == 5:
            w, h = 16 + (i * 9) % 512, 16 + (i * 11) % 512
            frames = 10 + i % 240
            avih = struct.pack("<IIIIIIIIII", 33367, 0, 0, 0, frames,
                               0, 1, 0, w, h) + b"\x00" * 16
            hdrl = b"hdrl" + b"avih" + struct.pack("<I", 56) + avih
            movi = b"LIST" + struct.pack("<I", 4) + b"movi"
            body = (b"LIST" + struct.pack("<I", len(hdrl)) + hdrl + movi)
            return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
        ch = 1 + i % 2
        sr = 8000 + (i % 5) * 1000
        nsamp = 100 + i % 400
        align = ch * 2
        fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * align, align, 16)
        data = b"\x00" * (nsamp * align)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    def _mime(i: int) -> str:
        if i % 2 == 0:
            return "image/png"
        if i % 4 == 3:
            return "image/jpeg"
        return "video/x-msvideo" if i % 8 == 5 else "audio/wav"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids = [int(m) for m in pdf[id_col]]
            yield pd.DataFrame({
                "media_id": mids,
                "kind": [("video" if m % 8 == 5 else "audio")
                         if m % 4 == 1 else "image" for m in mids],
                "payload": [_payload(m) for m in mids],
                "mime": [_mime(m) for m in mids],
            })

    return ids.select(F.col(id_col).cast("long").alias(id_col)) \
              .mapInPandas(_batches, MEDIA_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("src_width", IntegerType()),
    StructField("src_height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("resampled", StringType()),   # header | none
])

_RESIZE_COLS = [f.name for f in RESIZE_SCHEMA.fields]


def fit_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving fit of (w, h) inside a max_side box, integer
    floor math (deterministic, gold-twin-reproducible), never upscaling
    and never collapsing a dimension to zero."""
    m = max(w, h)
    if m <= max_side:
        return w, h
    return max(1, w * max_side // m), max(1, h * max_side // m)


def _resize_png(p: bytes, w: int, h: int) -> bytes:
    """Rewrite the IHDR width/height fields (offsets 16/20, PNG spec
    §11.2.2) and recompute the IHDR CRC (crc32 over chunk type + data,
    spec §5.3) so the output is a structurally valid PNG header."""
    out = bytearray(p)
    out[16:24] = struct.pack(">II", w, h)
    crc = zlib.crc32(out[12:16] + out[16:29])
    out[29:33] = struct.pack(">I", crc)
    return bytes(out)


def resize_media(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving downscale of image payloads to fit a
    `max_side` box — Arrow-batched mapInPandas, same plumbing contract
    as decode_media.

    What is REAL: the target-dimension math (fit_dims) and the container
    surgery — the PNG IHDR (dims + recomputed CRC) and JPEG SOFn frame
    header are rewritten byte-level in the payload, so decode_media on
    the output reads the NEW dimensions (round-trip tested and
    driver-oracled through the mm_decode_real row). What is STUBBED,
    per the task brief's stub policy: pixel resampling of the entropy-
    coded scan data needs a codec library absent from this container —
    the scan bytes pass through untouched and the `resampled` column
    says 'header' (dims rewritten, pixels not), never silently. Swapping
    in PIL/ffmpeg changes only the per-row body, no Spark structure.

    Non-image payloads (WAV/unknown) and images already inside the box
    pass through byte-identical with resampled='none'. Reference parity:
    QSE has no media path; this is task-brief surface (decode /
    feature-extract / resize / frame-sample)."""

    def _row(mid, kind, payload, mime):
        p = bytes(payload or b"")
        base = {"media_id": int(mid), "kind": kind, "payload": p,
                "mime": mime, "src_width": None, "src_height": None,
                "width": None, "height": None, "resampled": "none"}
        png = _parse_png(p)
        if png is not None:
            w, h = png
            nw, nh = fit_dims(w, h, max_side)
            # surgery needs the WHOLE IHDR chunk incl. its CRC field
            # (33 bytes); _parse_png only guarantees 24 — on a truncated
            # header the CRC would cover the wrong range and be appended
            # past the end of the buffer (review finding). Truncated
            # PNGs pass through unresized, reported at source dims.
            if (nw, nh) != (w, h):
                if len(p) >= 33:
                    base.update(payload=_resize_png(p, nw, nh),
                                resampled="header")
                else:
                    nw, nh = w, h
            base.update(src_width=w, src_height=h, width=nw, height=nh)
            return base
        jpg = _parse_jpeg(p)
        if jpg is not None:
            w, h = jpg
            nw, nh = fit_dims(w, h, max_side)
            if (nw, nh) != (w, h):
                pos = _find_jpeg_sof(p)
                out = bytearray(p)
                out[pos + 5:pos + 9] = struct.pack(">HH", nh, nw)
                base.update(payload=bytes(out), resampled="header")
            base.update(src_width=w, src_height=h, width=nw, height=nh)
            return base
        return base

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_row(m, k, p, mm) for m, k, p, mm in
                    zip(pdf["media_id"], pdf["kind"], pdf["payload"],
                        pdf["mime"])]
            out = pd.DataFrame(rows, columns=_RESIZE_COLS)
            for c in ("src_width", "src_height", "width", "height"):
                out[c] = out[c].astype("Int32")
            yield out

    return media.mapInPandas(_batches, RESIZE_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 8) -> DataFrame:
    """Deterministic frame subsampling plan for video rows: one output row
    per kept frame index (pure Spark, no decode)."""
    return (features.filter((F.col("kind") == "video")
                            & (F.col("n_frames") >= 1))
            .withColumn("frame_idx", F.explode(F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n))))
            .select("media_id", "frame_idx"))
