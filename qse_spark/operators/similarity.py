"""Similarity search over an embedding column (`embeddings(vec_id,
embedding array<float>, label)`).

Two paths:
  brute-force cosine top-k   exact baseline — broadcast the (small) query
                             set, JVM-side dot product via zip_with +
                             aggregate, per-query window top-k.
  LSH-bucketed ANN           scale path — random-hyperplane signatures
                             bucket the corpus; each query only scans its
                             bucket (and optionally multi-probe neighbors).

The hyperplanes are a pure function of (seed, dim) so executors regenerate
them deterministically; nothing is collected to the driver except the
final top-k."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_unit_norm(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Adds `_unit` (L2-normalized copy) — cosine becomes a plain dot.

    Everything is cast to double FIRST: float32 arithmetic would diverge
    from the (double-only) SQL oracle in the low decimals."""
    d = F.col(col).cast("array<double>")
    n = _norm(d)
    unit = F.transform(d, lambda v: v / n)
    return emb.withColumn("_unit", F.when(n > 0, unit).otherwise(d))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id") -> DataFrame:
    """(query_id, vec_id, cosine, rank<=k) — exact. The query side is
    broadcast; the corpus is scanned once (embarrassingly parallel),
    followed by one per-query top-k window."""
    e = with_unit_norm(emb).select(F.col(id_col).alias("vec_id"),
                                   F.col("_unit").alias("v"))
    q = with_unit_norm(queries).select(F.col(id_col).alias("query_id"),
                                       F.col("_unit").alias("qv"))
    scored = (e.join(F.broadcast(q), e["vec_id"] != q["query_id"])
              .withColumn("cosine", _dot(F.col("v"), F.col("qv")))
              .select("query_id", "vec_id", "cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(emb: DataFrame, dim: int, n_planes: int = 16,
                  seed: int = 7, col: str = "embedding") -> DataFrame:
    """Adds `bucket` = sign-pattern of `n_planes` random hyperplanes,
    computed as a native expression over an array literal (no UDF)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(col), plane) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << i))
    return emb.withColumn("bucket", bucket)


def lsh_ann_topk(emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                 n_planes: int = 10, seed: int = 7,
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine re-ranks within the bucket. Recall vs brute force is tested in
    tests/test_training_ops.py; raise recall by lowering n_planes or adding
    multi-probe buckets."""
    e = lsh_signature(with_unit_norm(emb), dim, n_planes, seed)
    q = lsh_signature(with_unit_norm(queries), dim, n_planes, seed)
    e = e.select(F.col(id_col).alias("vec_id"), F.col("_unit").alias("v"),
                 "bucket")
    q = q.select(F.col(id_col).alias("query_id"), F.col("_unit").alias("qv"),
                 "bucket")
    scored = (e.join(F.broadcast(q), "bucket")
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine", _dot(F.col("v"), F.col("qv")))
              .select("query_id", "vec_id", "cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def cosine_near_dup_pairs(emb: DataFrame, tau: float = 0.95, dim: int = 64,
                          n_planes: int = 8, seed: int = 7,
                          id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= tau)
    via LSH self-join — the embedding twin of dedup.minhash_dedup."""
    e = lsh_signature(with_unit_norm(emb), dim, n_planes, seed)
    e = e.select(F.col(id_col).alias("id"), F.col("_unit").alias("v"),
                 "bucket")
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", _dot(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= tau)
            .select("id_a", "id_b", "cosine").distinct())
