"""Deduplication operators over a `documents(doc_id, text, ...)` table —
the training-data-pipeline surface (exact, minhash-LSH, simhash, n-gram
Jaccard). All keep-rules are deterministic: the survivor of a duplicate
group is the minimum doc_id.

Exact + n-gram Jaccard are pure relational plans (oracle-checkable in SQL);
minhash reuses the LSH machinery pattern from linking; simhash runs in one
Arrow-vectorized pandas UDF (bit-parallel numpy, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .cc import connected_components

_TOKEN_SPLIT = r"\s+"


def _tokens(col):
    return F.filter(F.split(F.lower(col), _TOKEN_SPLIT), lambda t: t != "")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, keeper_id, text_hash): one row per document, keeper = min
    doc_id among byte-identical texts. Hash-groupBy, fully shuffled on the
    md5 key — at 100 TB this is one shuffle of (hash, id) pairs, never the
    payload text."""
    h = docs.select("doc_id", F.md5("text").alias("text_hash"))
    keep = h.groupBy("text_hash").agg(F.min("doc_id").alias("keeper_id"))
    return h.join(keep, "text_hash").select("doc_id", "keeper_id", "text_hash")


def word_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles, native expressions."""
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("t"))
    sh = toks.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(0, greatest(size(t) - {k}, 0)), "
            f"i -> array_join(slice(t, i + 1, {k}), ' '))")).alias("shingle"))
    return sh.filter(F.length("shingle") > 0).distinct()


def ngram_jaccard_pairs(docs: DataFrame, tau: float = 0.8,
                        k: int = 3) -> DataFrame:
    """All-pairs n-gram Jaccard >= tau via a shared-shingle equi-join
    (relational, oracle-checkable): (id_a, id_b, jaccard), id_a < id_b.

    The shingle join only materializes pairs that share at least one
    shingle; a hot shingle (boilerplate) can explode the join, so shingles
    occurring in more than `max_df` docs are dropped like stopwords."""
    max_df = 1000
    sh = word_shingles(docs, k)
    df_cnt = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sh = (sh.join(df_cnt, "shingle").filter(F.col("df") <= max_df)
          .select("doc_id", "shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .withColumn("jaccard", F.col("inter")
                        / (F.col("n_a") + F.col("n_b") - F.col("inter")))
            .filter(F.col("jaccard") >= tau)
            .select("id_a", "id_b", "jaccard"))


def minhash_dedup(docs: DataFrame, tau: float = 0.8, k: int = 3,
                  bands: int = 8, rows: int = 4,
                  max_block: int = 500) -> DataFrame:
    """MinHash+LSH near-dup clustering: shingle -> minhash signature ->
    band buckets -> candidate pairs -> exact Jaccard verify -> connected
    components -> (doc_id, keeper_id).

    Scale path: candidates are generated per band bucket (bounded by
    max_block), the exact verify touches only candidates, and CC runs on
    the duplicate pairs only (a tiny fraction of the corpus)."""
    sh = word_shingles(docs, k).persist()
    mins = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
            for i in range(bands * rows)]
    sig = sh.groupBy("doc_id").agg(*mins)
    band_structs = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)])
                 .alias("key"))
        for b in range(bands)])
    keys = (sig.select("doc_id", F.explode(band_structs).alias("bk"))
            .select("doc_id", F.col("bk.band").alias("band"),
                    F.col("bk.key").alias("key")))
    cnt = keys.groupBy("band", "key").agg(F.count("*").alias("bn"))
    keys = (keys.join(cnt, ["band", "key"]).filter(F.col("bn") <= max_block)
            .drop("bn"))
    a = keys.select("band", "key", F.col("doc_id").alias("id_a"))
    b = keys.select("band", "key", F.col("doc_id").alias("id_b"))
    cand = (a.join(b, ["band", "key"]).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())

    sh_arr = (sh.groupBy("doc_id")
              .agg(F.collect_set("shingle").alias("s"),
                   F.count("*").alias("n")))
    aa = sh_arr.select(F.col("doc_id").alias("id_a"),
                       F.col("s").alias("s_a"), F.col("n").alias("n_a"))
    bb = sh_arr.select(F.col("doc_id").alias("id_b"),
                       F.col("s").alias("s_b"), F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("s_a", "s_b"))
    verified = (cand.join(aa, "id_a").join(bb, "id_b")
                .withColumn("jaccard",
                            inter / (F.col("n_a") + F.col("n_b") - inter))
                .filter(F.col("jaccard") >= tau))
    edges = verified.select(F.col("id_a").cast("string").alias("src"),
                            F.col("id_b").cast("string").alias("dst"))
    comp = connected_components(edges)
    clustered = comp.select(F.col("node").cast("long").alias("doc_id"),
                            F.col("component").cast("long").alias("keeper_id"))
    # lexicographic string-min != numeric min; recompute numeric keeper
    keeper = (clustered.groupBy("keeper_id").agg(F.min("doc_id").alias("k2"))
              .select(F.col("keeper_id"), F.col("k2")))
    clustered = (clustered.join(keeper, "keeper_id")
                 .select("doc_id", F.col("k2").alias("keeper_id")))
    singletons = (docs.select("doc_id")
                  .join(clustered.select("doc_id"), "doc_id", "left_anti")
                  .withColumn("keeper_id", F.col("doc_id")))
    return clustered.unionByName(singletons)


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash int64) — 64-bit token-majority simhash over distinct
    tokens, Arrow-batched with a stable FNV-1a token hash (python's builtin
    hash is salted per process and would break determinism)."""
    from pyspark.sql.types import StructField, StructType
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("simhash", LongType())])
    return docs.select("doc_id", "text").mapInPandas(_simhash_stable, schema)


def _fnv1a_u64(tokens: np.ndarray) -> np.ndarray:
    """Stable 64-bit FNV-1a over token byte strings (vector of uint64)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(0xCBF29CE484222325)
        for ch in t.encode():
            h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def _simhash_stable(it):
    for pdf in it:
        n = len(pdf)
        out = np.zeros(n, dtype=np.uint64)
        for i, text in enumerate(pdf["text"].fillna("")):
            toks = list(dict.fromkeys(text.lower().split()))
            if not toks:
                continue
            hs = _fnv1a_u64(np.array(toks, dtype=object))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64))
                    & np.uint64(1)).astype(np.int64)
            vote = bits.sum(axis=0) * 2 - len(hs)
            sig = 0
            for bpos in np.nonzero(vote > 0)[0]:
                sig |= 1 << int(bpos)
            out[i] = sig
        yield pd.DataFrame({"doc_id": pdf["doc_id"],
                            "simhash": out.astype(np.int64)})


def simhash_dedup(docs: DataFrame, hamming: int = 3,
                  blocks: int = 4) -> DataFrame:
    """Near-dup pairs with simhash Hamming distance <= `hamming`, using the
    standard block-rotation trick: split the 64-bit signature into `blocks`
    chunks — any pair within distance `hamming` < blocks shares at least one
    exact chunk (pigeonhole) — equi-join per chunk, verify popcount."""
    sig = simhash(docs)
    width = 64 // blocks
    chunks = []
    for b in range(blocks):
        chunks.append(sig.select(
            "doc_id", "simhash", F.lit(b).alias("blk"),
            F.shiftrightunsigned("simhash", b * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("key")))
    keys = chunks[0]
    for c in chunks[1:]:
        keys = keys.unionByName(c)
    a = keys.select("blk", "key", F.col("doc_id").alias("id_a"),
                    F.col("simhash").alias("sh_a"))
    b = keys.select("blk", "key", F.col("doc_id").alias("id_b"),
                    F.col("simhash").alias("sh_b"))
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (a.join(b, ["blk", "key"]).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", dist.alias("hamming")).distinct()
            .filter(F.col("hamming") <= hamming))
