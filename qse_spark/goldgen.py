"""Independent gold fixtures for the approximate training-data operators.

The driver's correctness gate needs an oracle for every query; the LSH /
simhash / ANN / multimodal operators are not expressible as portable DuckDB
SQL, so — exactly like the kg_* pipeline oracles in testdata.py — their
expected outputs are computed HERE by an independent non-Spark
implementation (numpy + the pure-Python XXH64 twin in qse_spark.xxh,
verified bit-exact against Spark's xxhash64) and written as parquet that
the oracle SQL simply `read_parquet`s. The functions in this module are
deliberately written in plain Python data structures (dicts/sets/loops),
NOT as DataFrame mirrors, so the two code paths share nothing but the spec:

  gold_minhash_dedup     shingle -> 32 minhashes -> 8x4 band keys -> block
                         cap -> candidates -> exact-Jaccard verify ->
                         union-find clusters  (dedup.minhash_dedup twin)
  gold_simhash_pairs     distinct-token xxhash64 bit votes -> 64-bit
                         signature -> all-pairs Hamming <= h (exact: the
                         operator's 4-block pigeonhole join loses nothing
                         at h < blocks)                (dedup.simhash_dedup)
  gold_lsh_ann_topk      seed-deterministic hyperplane buckets + exact
                         cosine re-rank                (similarity.lsh_ann_topk)
  gold_cosine_near_dup   same buckets, pair filter     (similarity.cosine_near_dup_pairs)
  gold_mm_features       CRC fake-decode               (multimodal.decode_media)
  gold_mm_frames         every_n frame plan            (multimodal.frame_sample)

Floating-point parity: Spark's array `aggregate` folds left-to-right in
float64, and `round` is BigDecimal HALF_UP over the shortest decimal
representation — both are replicated exactly (_fold_dot / _round_half_up).
"""

from __future__ import annotations

import json
import os
import re
import zlib
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .testdata import FIXTURE_ROOT
from .xxh import SPARK_SEED, hash_int, hash_long, spark_xxhash64, xxh64

_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java regex \s (ASCII), not Python's


def _tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text.lower()) if t]


def _shingles(tokens: list[str], k: int) -> set[str]:
    """Twin of dedup.word_shingles' transform(sequence(0, max(n-k, 0)))
    expression: docs shorter than k yield ONE short shingle."""
    n = len(tokens)
    out = {" ".join(tokens[i:i + k]) for i in range(max(n - k, 0) + 1)}
    out.discard("")
    return out


def _round_half_up(x: float, digits: int = 6) -> float:
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _fold_dot(a, b) -> float:
    """Sequential left-fold sum of products, matching F.aggregate."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _fold_norm(a) -> float:
    acc = 0.0
    for x in a:
        acc = acc + float(x) * float(x)
    return float(np.sqrt(acc))


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        r = x
        while self.parent.get(r, r) != r:
            r = self.parent[r]
        while self.parent.get(x, x) != r:
            self.parent[x], x = r, self.parent[x]
        return r

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


# ------------------------------------------------------------------- dedup

def gold_minhash_dedup(docs: list[tuple[int, str]], tau: float = 0.5,
                       k: int = 3, bands: int = 8, rows: int = 4,
                       max_block: int = 500) -> pa.Table:
    shingle_sets = {did: _shingles(_tokens(text), k) for did, text in docs}
    n_hashes = bands * rows
    hash_cache: dict[str, list[int]] = {}

    def hashes(s: str) -> list[int]:
        hs = hash_cache.get(s)
        if hs is None:
            base = xxh64(s.encode("utf-8"), SPARK_SEED)
            # F.xxhash64("shingle", F.lit(i)): the int literal folds
            # through Spark's hashInt specialization, NOT hashLong
            hs = [hash_int(i, base) for i in range(n_hashes)]
            hash_cache[s] = hs
        return hs

    # signatures (docs with zero shingles have none, like the groupBy)
    sigs: dict[int, list[int]] = {}
    for did, sset in shingle_sets.items():
        if not sset:
            continue
        mins = [None] * n_hashes
        for s in sset:
            for i, h in enumerate(hashes(s)):
                # Spark min() over signed longs
                hv = h - (1 << 64) if h >= (1 << 63) else h
                if mins[i] is None or hv < mins[i]:
                    mins[i] = hv
        sigs[did] = mins

    # band keys + block cap
    blocks: dict[tuple[int, int], list[int]] = {}
    for did, mins in sigs.items():
        for b in range(bands):
            h = SPARK_SEED
            for r in range(rows):
                h = hash_long(mins[b * rows + r], h)
            key = h - (1 << 64) if h >= (1 << 63) else h
            blocks.setdefault((b, key), []).append(did)

    cand: set[tuple[int, int]] = set()
    for members in blocks.values():
        if len(members) > max_block:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    uf = _UnionFind()
    in_pair: set[int] = set()
    for a, b in cand:
        sa, sb = shingle_sets[a], shingle_sets[b]
        inter = len(sa & sb)
        if inter == 0:
            continue
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= tau:
            uf.union(a, b)
            in_pair.add(a)
            in_pair.add(b)

    comp: dict[int, list[int]] = {}
    for did in in_pair:
        comp.setdefault(uf.find(did), []).append(did)
    keeper = {}
    for members in comp.values():
        lo = min(members)
        for m in members:
            keeper[m] = lo
    ids = sorted(did for did, _ in docs)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "keeper_id": pa.array([keeper.get(d, d) for d in ids], pa.int64()),
    })


def _simhash_sigs(docs: list[tuple[int, str]]) -> dict[int, int | None]:
    tok_cache: dict[str, int] = {}

    def tok_hash(t: str) -> int:
        h = tok_cache.get(t)
        if h is None:
            h = xxh64(t.encode("utf-8"), SPARK_SEED)
            tok_cache[t] = h
        return h

    # None marks TOKEN-LESS docs — distinct from a real doc whose votes
    # legitimately produce signature 0 (the Spark side carries n_tok for
    # the same distinction; review finding)
    sig: dict[int, int | None] = {}
    for did, text in docs:
        toks = set(_tokens(text))
        if not toks:
            sig[did] = None
            continue
        n = len(toks)
        counts = [0] * 64
        for t in toks:
            h = tok_hash(t)
            for b in range(64):
                counts[b] += (h >> b) & 1
        s = 0
        for b in range(64):
            if counts[b] * 2 > n:
                s |= 1 << b
        sig[did] = s
    return sig


def gold_simhash_pairs(docs: list[tuple[int, str]],
                       hamming: int = 3, blocks: int = 4,
                       max_block: int = 500) -> pa.Table:
    """Twin of dedup.simhash_dedup, including its scale guards: rotation
    chunks per TOKEN-BEARING doc, chunks with > max_block members
    dropped, candidate pairs = docs sharing a surviving chunk, popcount
    verify. Token-less docs never pair (the Spark side excludes them
    from the block join by n_tok; clusters group them separately); a
    token-bearing doc with a legitimately-zero signature stays in."""
    sig = _simhash_sigs(docs)
    width = 64 // blocks
    members: dict[tuple[int, int], list[int]] = {}
    for did in sorted(sig):
        s = sig[did]
        if s is None:
            continue
        for b in range(blocks):
            key = (s >> (b * width)) & ((1 << width) - 1)
            members.setdefault((b, key), []).append(did)
    cand: set[tuple[int, int]] = set()
    for mem in members.values():
        if len(mem) > max_block:   # over-dense chunks dropped, like Spark
            continue
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                cand.add((mem[i], mem[j]))
    ia, ib, hm = [], [], []
    for x, y in sorted(cand):
        d = (sig[x] ^ sig[y]).bit_count()
        if d <= hamming:
            ia.append(x)
            ib.append(y)
            hm.append(d)
    return pa.table({
        "id_a": pa.array(ia, pa.int64()),
        "id_b": pa.array(ib, pa.int64()),
        "hamming": pa.array(hm, pa.int32()),
    })


def gold_simhash_clusters(docs: list[tuple[int, str]],
                          pairs: pa.Table) -> pa.Table:
    """Twin of dedup.simhash_dedup_clusters: union-find over the pair graph
    plus ONE exact-dup group unioning all TOKEN-LESS docs (never docs
    with a legitimately-zero signature), keeper = min doc_id per
    component, singletons self-map."""
    uf = _UnionFind()
    for a, b in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()):
        uf.union(a, b)
    sig = _simhash_sigs(docs)
    zero = [d for d in sorted(sig) if sig[d] is None]
    for d in zero[1:]:
        uf.union(zero[0], d)
    keeper: dict[int, int] = {}
    for did, _ in docs:
        root = uf.find(did)
        keeper[root] = min(keeper.get(root, did), did)
    dids = sorted(d for d, _ in docs)
    return pa.table({
        "doc_id": pa.array(dids, pa.int64()),
        "keeper_id": pa.array([keeper[uf.find(d)] for d in dids],
                              pa.int64()),
    })


# --------------------------------------------------------------- similarity

def _buckets(vec_ids, embs, dim: int, n_planes: int, seed: int):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    out = {}
    for vid, e in zip(vec_ids, embs):
        b = 0
        for i in range(n_planes):
            if _fold_dot(e, planes[i]) > 0:
                b |= 1 << i
        out[vid] = b
    return out


def _probe_sets(vec_ids, embs, dim: int, n_planes: int, seed: int,
                n_probe: int):
    """Twin of similarity.lsh_probe_buckets: exact bucket + the
    (n_probe-1) Hamming-1 flips of the smallest-|margin| planes, ties by
    plane mask ascending — the same (|margin|, mask) struct order
    array_sort applies, over the identical _fold_dot margins."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    out = {}
    for vid, e in zip(vec_ids, embs):
        b, margins = 0, []
        for i in range(n_planes):
            d = _fold_dot(e, planes[i])
            if d > 0:
                b |= 1 << i
            margins.append((abs(d), 1 << i))
        margins.sort()
        out[vid] = [b] + [b ^ mask
                          for _, mask in margins[:max(0, n_probe - 1)]]
    return out


def _units(vec_ids, embs):
    out = {}
    for vid, e in zip(vec_ids, embs):
        n = _fold_norm(e)
        v = [float(x) for x in e]
        out[vid] = [x / n for x in v] if n > 0 else v
    return out


def gold_lsh_ann_topk(vec_ids, embs, dim: int = 64, k: int = 10,
                      n_planes: int = 8, seed: int = 7,
                      query_max: int = 5, n_probe: int = 1) -> pa.Table:
    buckets = _buckets(vec_ids, embs, dim, n_planes, seed)
    probes = _probe_sets(vec_ids, embs, dim, n_planes, seed, n_probe)
    units = _units(vec_ids, embs)
    queries = [v for v in vec_ids if v < query_max]
    qi, vi, rk, cs = [], [], [], []
    for q in sorted(queries):
        qprobes = set(probes[q])
        scored = []
        for v in vec_ids:
            if v == q or buckets[v] not in qprobes:
                continue
            scored.append((-_fold_dot(units[v], units[q]), v))
        scored.sort()
        for rank, (negc, v) in enumerate(scored[:k], start=1):
            qi.append(q)
            vi.append(v)
            rk.append(rank)
            cs.append(_round_half_up(-negc))
    return pa.table({
        "query_id": pa.array(qi, pa.int64()),
        "vec_id": pa.array(vi, pa.int64()),
        "rank": pa.array(rk, pa.int32()),
        "cosine": pa.array(cs, pa.float64()),
    })


def gold_cosine_near_dup(vec_ids, embs, tau: float = 0.9, dim: int = 64,
                         n_planes: int = 8, seed: int = 7,
                         dup_below: int = 25,
                         dup_offset: int = 100000,
                         max_block: int = 2000) -> pa.Table:
    """Twin of the near-dup driver query: the corpus is the embeddings table
    UNIONed with copies of vec_id < dup_below re-labelled +dup_offset, so
    the fixture provably contains near-duplicates (VERDICT r1: the original
    row was vacuous — 0 rows at the checked scale)."""
    ids = list(vec_ids)
    vecs = list(embs)
    for vid, e in zip(vec_ids, embs):
        if vid < dup_below:
            ids.append(vid + dup_offset)
            vecs.append(e)
    buckets = _buckets(ids, vecs, dim, n_planes, seed)
    units = _units(ids, vecs)
    by_bucket: dict[int, list[int]] = {}
    for vid in ids:
        by_bucket.setdefault(buckets[vid], []).append(vid)
    ia, ib, cs = [], [], []
    for members in by_bucket.values():
        if len(members) > max_block:   # over-dense buckets dropped, like
            continue                   # the operator's max_block cap
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                c = _fold_dot(units[ms[i]], units[ms[j]])
                if c >= tau:
                    ia.append(ms[i])
                    ib.append(ms[j])
                    cs.append(_round_half_up(c))
    order = sorted(range(len(ia)), key=lambda x: (ia[x], ib[x]))
    return pa.table({
        "id_a": pa.array([ia[x] for x in order], pa.int64()),
        "id_b": pa.array([ib[x] for x in order], pa.int64()),
        "cosine": pa.array([cs[x] for x in order], pa.float64()),
    })


# --------------------------------------------------------------- multimodal

_KINDS = ["image", "audio", "video"]


def gold_mm_features(docs: list[tuple[int, str]]) -> pa.Table:
    mid, kind, nb, crc, w, h, nf = [], [], [], [], [], [], []
    for did, text in docs:
        p = text.encode("utf-8")
        c = zlib.crc32(p)
        kd = _KINDS[did % 3]
        mid.append(did)
        kind.append(kd)
        nb.append(len(p))
        crc.append(c)
        w.append(32 + c % 1024)
        h.append(32 + (c >> 10) % 1024)
        nf.append(1 + (c >> 20) % 64 if kd == "video" else 1)
    n = len(mid)
    return pa.table({
        "media_id": pa.array(mid, pa.int64()),
        "kind": pa.array(kind, pa.string()),
        "format": pa.array(["fake"] * n, pa.string()),
        "n_bytes": pa.array(nb, pa.int32()),
        "crc32": pa.array(crc, pa.int64()),
        "width": pa.array(w, pa.int32()),
        "height": pa.array(h, pa.int32()),
        "channels": pa.array([None] * n, pa.int32()),
        "sample_rate": pa.array([None] * n, pa.int32()),
        "n_frames": pa.array(nf, pa.int32()),
    })


def _synth_record(i: int, fit=None) -> tuple:
    """One row of the synth_media byte spec, re-synthesized independently
    of multimodal.py: (kind, format, body, width, height, channels,
    sample_rate, n_frames) for media_id i — even id -> PNG of 16+i%512 x
    16+7i%512, i%4==3 -> JPEG of 16+3i%512 x 16+5i%512 (SOF2 when
    i%8==7), i%8==5 -> AVI video of 16+9i%512 x 16+11i%512 with 10+i%240
    frames, else WAV of 1+i%2 channels at 8000+(i%5)*1000 Hz with
    100+i%400 frames. `fit(w, h) -> (w, h)` mirrors resize_media's
    header surgery on the IMAGE formats only: PNG bodies carry the
    fitted dims plus a REAL IHDR CRC when the dims changed (surgery
    recomputes it; untouched synth headers ship a zero CRC), JPEG bodies
    carry them in the SOF frame header; AVI/WAV ignore `fit` (resize is
    image-only, byte-identical pass). The ONE byte spec shared by
    gold_mm_real and gold_mm_resize_decoded — independence is required
    between goldgen and multimodal.py, not between the two golds."""
    fit = fit or (lambda wi, hi: (wi, hi))
    if i % 2 == 0:
        wi, hi = 16 + i % 512, 16 + (i * 7) % 512
        nw, nh = fit(wi, hi)
        png_sig = bytes([0x89]) + b"PNG" + bytes([0x0D, 0x0A, 0x1A, 0x0A])
        ihdr_data = (nw.to_bytes(4, "big") + nh.to_bytes(4, "big")
                     + bytes([8, 6, 0, 0, 0]))
        ihdr_crc = (zlib.crc32(b"IHDR" + ihdr_data).to_bytes(4, "big")
                    if (nw, nh) != (wi, hi) else bytes(4))
        body = (png_sig + (13).to_bytes(4, "big") + b"IHDR"
                + ihdr_data + ihdr_crc
                + (0).to_bytes(4, "big") + b"IEND" + bytes(4))
        return ("image", "png", body, nw, nh, None, None, 1)
    if i % 4 == 3:
        wi, hi = 16 + (i * 3) % 512, 16 + (i * 5) % 512
        nw, nh = fit(wi, hi)
        sof = 0xC2 if i % 8 == 7 else 0xC0
        body = (bytes([0xFF, 0xD8, 0xFF, 0xE0]) + (16).to_bytes(2, "big")
                + b"JFIF" + bytes([0, 1, 1, 0])
                + (1).to_bytes(2, "big") + (1).to_bytes(2, "big")
                + bytes([0, 0])
                + bytes([0xFF, sof]) + (17).to_bytes(2, "big")
                + bytes([8]) + nh.to_bytes(2, "big") + nw.to_bytes(2, "big")
                + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
                + bytes([0xFF, 0xD9]))
        return ("image", "jpeg", body, nw, nh, None, None, 1)
    if i % 8 == 5:
        wi, hi = 16 + (i * 9) % 512, 16 + (i * 11) % 512
        frames = 10 + i % 240
        avih = (b"".join(v.to_bytes(4, "little") for v in
                         (33367, 0, 0, 0, frames, 0, 1, 0, wi, hi))
                + bytes(16))
        hdrl = b"hdrl" + b"avih" + (56).to_bytes(4, "little") + avih
        body = (b"RIFF" + (4 + 8 + len(hdrl) + 12).to_bytes(4, "little")
                + b"AVI " + b"LIST"
                + len(hdrl).to_bytes(4, "little") + hdrl
                + b"LIST" + (4).to_bytes(4, "little") + b"movi")
        return ("video", "avi", body, wi, hi, None, None, frames)
    c = 1 + i % 2
    rate = 8000 + (i % 5) * 1000
    frames = 100 + i % 400
    align = c * 2
    body = (b"RIFF" + (36 + frames * align).to_bytes(4, "little")
            + b"WAVE" + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + c.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * align).to_bytes(4, "little")
            + align.to_bytes(2, "little")
            + (16).to_bytes(2, "little")
            + b"data" + (frames * align).to_bytes(4, "little")
            + bytes(frames * align))
    return ("audio", "wav", body, None, None, c, rate, frames)


def _mm_decoded_table(doc_ids: list[int], fit=None) -> pa.Table:
    """Assemble the decode_media feature table from _synth_record rows."""
    mid, kind, fmt, nb, crc = [], [], [], [], []
    w, h, ch, sr, nf = [], [], [], [], []
    for i in sorted(doc_ids):
        kd, fm, body, wi, hi, c, rate, frames = _synth_record(i, fit)
        mid.append(i); kind.append(kd); fmt.append(fm)
        nb.append(len(body)); crc.append(zlib.crc32(body))
        w.append(wi); h.append(hi)
        ch.append(c); sr.append(rate); nf.append(frames)
    return pa.table({
        "media_id": pa.array(mid, pa.int64()),
        "kind": pa.array(kind, pa.string()),
        "format": pa.array(fmt, pa.string()),
        "n_bytes": pa.array(nb, pa.int32()),
        "crc32": pa.array(crc, pa.int64()),
        "width": pa.array(w, pa.int32()),
        "height": pa.array(h, pa.int32()),
        "channels": pa.array(ch, pa.int32()),
        "sample_rate": pa.array(sr, pa.int32()),
        "n_frames": pa.array(nf, pa.int32()),
    })


def gold_mm_real(doc_ids: list[int]) -> pa.Table:
    """Twin of decode_media(fake=False) over synth_media payloads: every
    decoded feature is predicted straight from the synth formula (see
    _synth_record) — no parsing, so a header mis-parse on the Spark side
    cannot be mirrored here. Byte counts / CRCs come from an independent
    re-synthesis of the same byte spec."""
    return _mm_decoded_table(doc_ids)


def gold_mm_resize_decoded(doc_ids: list[int],
                           max_side: int = 256) -> pa.Table:
    """Twin of decode_media(resize_media(synth_media(ids)), fake=False):
    the decoded features of the post-surgery payloads, predicted straight
    from the synth formula with an independent fit implementation —
    m = max(w, h); unchanged when m <= max_side, else integer-floor
    (w*max_side//m, h*max_side//m) clamped to >= 1. Resized PNG bytes are
    re-synthesized with the new dims and a REAL IHDR CRC (surgery
    recomputes it); resized JPEG bytes carry the new dims in the SOF
    frame header; WAV/AVI and within-box images are byte-identical to
    gold_mm_real's bodies."""
    def _fit(wi, hi):
        m = max(wi, hi)
        if m <= max_side:
            return wi, hi
        return max(1, wi * max_side // m), max(1, hi * max_side // m)

    return _mm_decoded_table(doc_ids, _fit)


def gold_mm_frames(features: pa.Table, every_n: int = 8) -> pa.Table:
    mid, fidx = [], []
    for did, kd, nf in zip(features["media_id"].to_pylist(),
                           features["kind"].to_pylist(),
                           features["n_frames"].to_pylist()):
        if kd != "video":
            continue
        for f in range(0, nf, every_n):
            mid.append(did)
            fidx.append(f)
    return pa.table({
        "media_id": pa.array(mid, pa.int64()),
        "frame_idx": pa.array(fidx, pa.int32()),
    })


# ------------------------------------------------------------------ IVF ANN

def gold_ivf_topk(vec_ids, embs, k: int = 10, n_centroids: int = 16,
                  nprobe: int = 4, seed: int = 7,
                  query_max: int = 5) -> pa.Table:
    """Twin of similarity.ivf_topk: centroid pick = smallest
    xxhash64(seed, vec_id) (hash_long fold, same as Spark's
    xxhash64(lit(seed) cast long, vec_id)); per-vector cell = argmax of
    `C_unit @ v` issued as the identical numpy dgemv the operator's
    pandas_udf issues; re-rank = fold-left cosine like the other ANN
    twins."""
    hs = sorted((spark_xxhash64(int(seed), int(v)), int(v)) for v in vec_ids)
    cent_ids = [v for _, v in hs[:n_centroids]]
    by_id = dict(zip(vec_ids, embs))
    cents = []
    for cid in cent_ids:
        v = np.asarray(by_id[cid], dtype=np.float64)
        n = np.sqrt(v @ v)
        cents.append(v / n if n > 0 else v)
    cent = np.asarray(cents, dtype=np.float64)

    def cells(e, probe: int) -> list[int]:
        d = cent @ np.asarray(e, dtype=np.float64)
        return np.argsort(-d, kind="stable")[:probe].tolist()

    cell_of = {v: cells(e, 1)[0] for v, e in zip(vec_ids, embs)}
    units = _units(vec_ids, embs)
    queries = [v for v in vec_ids if v < query_max]
    qi, vi, rk, cs = [], [], [], []
    for q in sorted(queries):
        probed = set(cells(by_id[q], nprobe))
        scored = []
        for v in vec_ids:
            if v == q or cell_of[v] not in probed:
                continue
            scored.append((-_fold_dot(units[v], units[q]), v))
        scored.sort()
        for rank, (negc, v) in enumerate(scored[:k], start=1):
            qi.append(q)
            vi.append(v)
            rk.append(rank)
            cs.append(_round_half_up(-negc))
    return pa.table({
        "query_id": pa.array(qi, pa.int64()),
        "vec_id": pa.array(vi, pa.int64()),
        "rank": pa.array(rk, pa.int32()),
        "cosine": pa.array(cs, pa.float64()),
    })


def gold_tfidf_pairs(docs: list[tuple[int, str]], tau: float = 0.9,
                     max_df: int = 10000,
                     min_margin: float = 1e-12) -> pa.Table:
    """Twin of linking.tfidf_cosine_pairs over a documents table:
    underscore/space tokens, w = tf * (1 + ln((N+1)/(df+1))) with N = ALL
    docs, df-capped stopword drop, L2-normalized cosine, pairs >= tau.

    Replaces the round-3 DuckDB float-SQL oracle (VERDICT r3 wrong-list
    #4): two SQL engines' SUM orders straddling tau or a ROUND midpoint
    would flake the driver row silently. Here the expected cosines are
    computed ONCE in numpy float64, and generation FAILS LOUDLY if any
    candidate pair sits within `min_margin` of tau or any kept pair
    within `min_margin` of a 6th-decimal rounding midpoint — a
    regenerated corpus that lands on a knife-edge becomes a visible
    error, never a flaky compare. (Cross-engine sum-order error is
    ~1e-15: the 1e-12 guard is 1000x above it while random cosines hit
    the guard band with probability ~2e-6 per pair.)"""
    import re as _re

    ids = sorted(d for d, _ in docs)
    text = dict(docs)
    n = len(ids)
    tf: list[dict[str, int]] = []
    df: dict[str, int] = {}
    for did in ids:
        cnt: dict[str, int] = {}
        for t in _re.split(r"[_\s]+", text[did]):
            if t:
                cnt[t] = cnt.get(t, 0) + 1
        tf.append(cnt)
        for t in cnt:
            df[t] = df.get(t, 0) + 1
    vocab = sorted(t for t, d in df.items() if d <= max_df)
    col = {t: j for j, t in enumerate(vocab)}
    idf = np.array([1.0 + np.log((n + 1.0) / (df[t] + 1.0))
                    for t in vocab])
    W = np.zeros((n, len(vocab)))
    for i, cnt in enumerate(tf):
        for t, c in cnt.items():
            if t in col:
                W[i, col[t]] = c * idf[col[t]]
    norms = np.sqrt((W * W).sum(axis=1))
    U = W / np.where(norms == 0.0, 1.0, norms)[:, None]
    ia, ib, cs = [], [], []
    block = 2048
    for s in range(0, n, block):
        C = U[s:s + block] @ U.T                      # block × n cosines
        for bi in range(C.shape[0]):
            i = s + bi
            row = C[bi]
            for j in np.nonzero(row > tau - 1e-6)[0]:  # margin audit band
                if j <= i:
                    continue
                c = float(row[j])
                if abs(c - tau) < min_margin:
                    raise ValueError(
                        f"pair ({ids[i]},{ids[int(j)]}) cosine {c!r} within "
                        f"{min_margin} of tau={tau}: fixture is flaky")
                if c < tau:
                    continue
                if abs((c * 1e6) % 1.0 - 0.5) < min_margin * 1e6:
                    raise ValueError(
                        f"pair ({ids[i]},{ids[int(j)]}) cosine {c!r} on a "
                        "round(6) midpoint: fixture is flaky")
                ia.append(ids[i])
                ib.append(ids[int(j)])
                cs.append(_round_half_up(c))
    order = sorted(range(len(ia)), key=lambda k: (ia[k], ib[k]))
    return pa.table({
        "id_a": pa.array([ia[k] for k in order], pa.int64()),
        "id_b": pa.array([ib[k] for k in order], pa.int64()),
        "cosine": pa.array([cs[k] for k in order], pa.float64()),
    })


# --------------------------------------------------------------- winnowing

def gold_winnow(docs: list[tuple[int, str]], k: int = 8,
                w: int = 4) -> pa.Table:
    """Twin of text.winnow_fingerprint: normalize (lower, ASCII-\\s runs to
    one space, trim spaces), hash every char k-gram with xxhash64 (signed,
    seed 42), keep the min of each window of w consecutive gram hashes,
    distinct per doc."""
    did_out, fp_out = [], []
    for did, text in docs:
        s = _WS.sub(" ", text.lower()).strip(" ")
        n = len(s)
        hs = [spark_xxhash64(s[i:i + k])
              for i in range(max(n - k, 0) + 1)]
        g = len(hs)
        fps = {min(hs[p:p + w]) for p in range(max(g - w, 0) + 1)}
        for fp in sorted(fps):
            did_out.append(did)
            fp_out.append(fp)
    return pa.table({
        "doc_id": pa.array(did_out, pa.int64()),
        "fp": pa.array(fp_out, pa.int64()),
    })


# ------------------------------------------------------------ orchestration

_GOLD_VERSION = 12


def ensure_training_gold(sf_dir: str) -> str:
    """Compute-if-missing the training-op gold parquet for one sf dir.

    Cache key = (mtime, size) of the input parquet files + gold version, so
    regenerated driver testdata invalidates stale gold automatically."""
    doc_p = os.path.join(sf_dir, "documents.parquet")
    emb_p = os.path.join(sf_dir, "embeddings.parquet")
    fp = [_GOLD_VERSION]
    for p in (doc_p, emb_p):
        st = os.stat(p)
        fp.append(int(st.st_mtime))
        fp.append(st.st_size)
    tag = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(FIXTURE_ROOT, f"training_gold_{tag}")
    meta_p = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_p):
        with open(meta_p) as f:
            if json.load(f).get("fp") == fp:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    dt = pq.read_table(doc_p, columns=["doc_id", "text"])
    docs = list(zip(dt["doc_id"].to_pylist(), dt["text"].to_pylist()))
    et = pq.read_table(emb_p, columns=["vec_id", "embedding"])
    vec_ids = et["vec_id"].to_pylist()
    embs = [np.asarray(e, dtype=np.float64) for e in et["embedding"].to_pylist()]

    pq.write_table(gold_minhash_dedup(docs, tau=0.5, k=3),
                   os.path.join(out_dir, "minhash_dedup.parquet"))
    sp = gold_simhash_pairs(docs, hamming=3)
    pq.write_table(sp, os.path.join(out_dir, "simhash_pairs.parquet"))
    pq.write_table(gold_simhash_clusters(docs, sp),
                   os.path.join(out_dir, "simhash_clusters.parquet"))
    pq.write_table(gold_lsh_ann_topk(vec_ids, embs, dim=64, k=10, n_planes=8),
                   os.path.join(out_dir, "lsh_ann_topk.parquet"))
    pq.write_table(gold_lsh_ann_topk(vec_ids, embs, dim=64, k=10,
                                     n_planes=8, n_probe=3),
                   os.path.join(out_dir, "lsh_mp_ann_topk.parquet"))
    pq.write_table(gold_cosine_near_dup(vec_ids, embs, tau=0.9, dim=64),
                   os.path.join(out_dir, "cosine_near_dup.parquet"))
    pq.write_table(gold_ivf_topk(vec_ids, embs, k=10, n_centroids=16,
                                 nprobe=4),
                   os.path.join(out_dir, "ivf_topk.parquet"))
    pq.write_table(gold_winnow(docs, k=8, w=4),
                   os.path.join(out_dir, "winnow.parquet"))
    pq.write_table(gold_tfidf_pairs(docs, tau=0.9),
                   os.path.join(out_dir, "tfidf_pairs.parquet"))
    feats = gold_mm_features(docs)
    pq.write_table(feats, os.path.join(out_dir, "mm_features.parquet"))
    pq.write_table(gold_mm_frames(feats, every_n=8),
                   os.path.join(out_dir, "mm_frames.parquet"))
    pq.write_table(gold_mm_real([d for d, _ in docs]),
                   os.path.join(out_dir, "mm_real.parquet"))
    pq.write_table(gold_mm_resize_decoded([d for d, _ in docs], max_side=256),
                   os.path.join(out_dir, "mm_real_resized.parquet"))
    with open(meta_p, "w") as f:
        json.dump({"fp": fp, "sf_dir": sf_dir}, f)
    return out_dir
