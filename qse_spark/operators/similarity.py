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
import pandas as pd
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
    from the (double-only) SQL oracle in the low decimals.

    The norm is BOUND as a lambda variable (transform over a 1-element
    array) so the O(dim) fold runs ONCE per row: closing over it inside
    the element transform re-evaluates the fold per element — O(dim²)
    per row, the same evaluation-count trap winnow_fingerprint documents
    (review finding; measured 66 s -> 0.4 s for 2,000 dim-1536 rows)."""
    d = F.col(col).cast("array<double>")
    unit = F.element_at(
        F.transform(F.array(_norm(d)),
                    lambda n: F.when(n > 0, F.transform(d, lambda v: v / n))
                    .otherwise(d)), 1)
    return emb.withColumn("_unit", unit)


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


def lsh_probe_buckets(emb: DataFrame, dim: int, n_planes: int = 16,
                      seed: int = 7, n_probe: int = 1,
                      col: str = "embedding") -> DataFrame:
    """Adds `probe_buckets`: the row's exact LSH bucket plus the
    (n_probe - 1) Hamming-1 neighbor buckets obtained by flipping the
    planes with the SMALLEST |margin| — classic multi-probe LSH (Lv et
    al., VLDB'07): a near-boundary plane is the one most likely to
    disagree between a query and its true neighbor, so flipping it
    recovers most of the recall that single-probe loses at high
    n_planes. Native expressions only; the n_planes dot products are
    bound once in a struct (transform-over-1-element-array binding, the
    same evaluation-count trap with_unit_norm documents) so building the
    probe list never re-evaluates a margin."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    margins = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(F.col(col), plane)
        bit = F.when(d > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << i))
        margins.append(F.struct(F.abs(d).alias("m"),
                                F.lit(1 << i).cast("long").alias("mask")))
    flips = max(0, min(n_probe - 1, n_planes))

    def _probes(s):
        near = F.slice(F.array_sort(s["ms"]), 1, flips)
        return F.concat(
            F.array(s["b"]),
            F.transform(near, lambda t: s["b"].bitwiseXOR(t["mask"])))

    pb = F.element_at(
        F.transform(F.array(F.struct(bucket.alias("b"),
                                     F.array(*margins).alias("ms"))),
                    _probes), 1)
    return emb.withColumn("probe_buckets", pb)


def lsh_ann_topk(emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                 n_planes: int = 10, seed: int = 7, n_probe: int = 1,
                 id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: candidates share one of the query's `n_probe`
    LSH probe buckets (exact bucket first, then smallest-margin Hamming-1
    flips — see lsh_probe_buckets); exact cosine re-ranks candidates.
    Recall vs brute force is tested in tests/test_training_ops.py, with
    multi-probe asserted >= single-probe; raise recall by lowering
    n_planes or raising n_probe (candidate volume grows ~linearly in
    n_probe, vs exponentially when lowering n_planes). The corpus side
    keeps its single exact bucket, so each (query, vec) candidate arises
    at most once — no post-join dedup shuffle."""
    e = lsh_signature(with_unit_norm(emb), dim, n_planes, seed)
    q = lsh_probe_buckets(with_unit_norm(queries), dim, n_planes, seed,
                          n_probe)
    e = e.select(F.col(id_col).alias("vec_id"), F.col("_unit").alias("v"),
                 "bucket")
    q = q.select(F.col(id_col).alias("query_id"), F.col("_unit").alias("qv"),
                 F.explode("probe_buckets").alias("bucket"))
    scored = (e.join(F.broadcast(q), "bucket")
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine", _dot(F.col("v"), F.col("qv")))
              .select("query_id", "vec_id", "cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def dropped_bucket_report(emb: DataFrame, dim: int = 64, n_planes: int = 8,
                          seed: int = 7, max_block: int = 2000) -> DataFrame:
    """(bucket, n) for LSH buckets the `max_block` cap removes from
    cosine_near_dup_pairs — dropped blocks must be observable, never
    silent (same contract as dedup.dropped_shingle_report /
    linking.blocking_report)."""
    e = lsh_signature(with_unit_norm(emb), dim, n_planes, seed)
    return (e.groupBy("bucket").agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_block))


def cosine_near_dup_pairs(emb: DataFrame, tau: float = 0.95, dim: int = 64,
                          n_planes: int = 8, seed: int = 7,
                          max_block: int = 2000,
                          id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= tau)
    via LSH self-join — the embedding twin of dedup.minhash_dedup.

    Scale shape: with 2^n_planes buckets, bucket population grows linearly
    with the corpus and the self-join is quadratic per bucket, so buckets
    larger than `max_block` are dropped (inspect the drops with
    dropped_bucket_report — the same cap contract as minhash_dedup's
    banded blocks). Grow n_planes ~log2(N/max_block) with the corpus so
    typical buckets stay under the cap instead of being dropped.

    The signed/normalized projection feeds three plan branches (the
    bucket-population count and both self-join sides); it is eagerly
    localCheckpoint-ed so the embedding scan + n_planes dot products run
    once instead of three times (the bucket-count dimension is
    bucket-cardinality-sized, so AQE broadcasts its join back — the cap
    costs no corpus shuffle)."""
    e = lsh_signature(with_unit_norm(emb), dim, n_planes, seed)
    e = (e.select(F.col(id_col).alias("id"), F.col("_unit").alias("v"),
                  "bucket")
         .localCheckpoint(eager=True))
    cnt = e.groupBy("bucket").agg(F.count("*").alias("bn"))
    e = e.join(cnt, "bucket").filter(F.col("bn") <= max_block).drop("bn")
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    # no distinct: each vec_id occupies exactly ONE bucket (scalar
    # withColumn, unlike minhash's multi-band explode), so the bucket
    # self-join already emits every pair at most once — a dedup here
    # would add a full extra shuffle over the output for no effect
    # (review finding)
    return (a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", _dot(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= tau)
            .select("id_a", "id_b", "cosine"))


# ----------------------------------------------------------------- IVF ANN

def ivf_centroids(emb: DataFrame, n_centroids: int | None = 16, seed: int = 7,
                  id_col: str = "vec_id", col: str = "embedding") -> np.ndarray:
    """Deterministic coarse quantizer: the `n_centroids` corpus vectors
    whose `xxhash64(seed, vec_id)` is smallest, unit-normalized (a seeded
    uniform draw both this operator and the independent gold twin
    reproduce bit-for-bit — no k-means iterations, so no RNG state to
    ship). The selection is a `TakeOrderedAndProject` (per-partition
    top-n, merged on the driver), NOT a global sort — one corpus scan,
    no shuffle, and the only driver-side collect in the operator is the
    n_centroids rows every IVF index collects by design.

    n_centroids=None auto-scales to ceil(sqrt(N)) — the standard IVF
    sizing, so the probed fraction (nprobe/n_centroids) SHRINKS as the
    corpus grows instead of staying constant. Costs one corpus count."""
    if n_centroids is None:
        n_centroids = max(1, int(np.ceil(np.sqrt(emb.count()))))
    picked = (emb.select(F.col(id_col).alias("cid"),
                         F.col(col).cast("array<double>").alias("cv"))
              .orderBy(F.xxhash64(F.lit(int(seed)).cast("long"),
                                  F.col("cid")), F.col("cid"))
              .limit(int(n_centroids))
              .collect())
    cents = []
    for r in picked:
        v = np.asarray(r["cv"], dtype=np.float64)
        n = np.sqrt(v @ v)
        cents.append(v / n if n > 0 else v)
    return np.asarray(cents, dtype=np.float64)


def _ivf_cells_udf(cent_unit: np.ndarray, probe: int):
    """pandas_udf: per row, the `probe` nearest coarse cells by dot product
    against the (broadcast-by-closure) unit centroid matrix. Vectorized
    numpy per row (`C @ v`, one dgemv per row — the twin in goldgen.py
    issues the identical call, so float64 results agree bit-for-bit);
    nearest-cell by cosine needs only the CENTROIDS normalized, because
    |v| is constant across a row's candidates."""
    @F.pandas_udf("array<int>")
    def cells(vs: pd.Series) -> pd.Series:
        out = []
        for e in vs:
            d = cent_unit @ np.asarray(e, dtype=np.float64)
            order = np.argsort(-d, kind="stable")[:probe]
            out.append(order.astype(np.int32))
        return pd.Series(out)

    # the function IS deterministic, but without this flag Catalyst inlines
    # it into the equi-join's isnotnull(cell) filter and evaluates the UDF
    # twice per corpus row (two stacked ArrowEvalPython nodes — asserted
    # single in tests/test_plans.py)
    return cells.asNondeterministic()


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int | None = None, nprobe: int = 4, seed: int = 7,
             id_col: str = "vec_id", col: str = "embedding") -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize the corpus into `n_centroids`
    cells (one cell per vector, assigned map-side by a closure-broadcast
    centroid matrix — no join, no shuffle), probe the query's `nprobe`
    nearest cells, exact-cosine re-rank inside the probed cells.

    The scale path next to lsh_ann_topk: at 100 TB the corpus pass is a
    single mapInArrow-style projection, the only shuffle is the candidate
    equi-join on `cell` (bounded by nprobe/n_centroids of the corpus per
    query), and the query side is broadcast. Recall vs brute force is
    asserted in tests/test_training_ops.py.

    n_centroids defaults to None = auto-scale to ceil(sqrt(N)) (see
    ivf_centroids); pass an explicit value to pin the cell count."""
    cent = ivf_centroids(emb, n_centroids, seed, id_col, col)
    assign = _ivf_cells_udf(cent, 1)
    probe = _ivf_cells_udf(cent, nprobe)
    e = (with_unit_norm(emb, col)
         .select(F.col(id_col).alias("vec_id"), F.col("_unit").alias("v"),
                 F.element_at(assign(F.col(col)), 1).alias("cell")))
    q = (with_unit_norm(queries, col)
         .select(F.col(id_col).alias("query_id"), F.col("_unit").alias("qv"),
                 F.explode(probe(F.col(col))).alias("cell")))
    scored = (e.join(F.broadcast(q), "cell")
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine", _dot(F.col("v"), F.col("qv")))
              .select("query_id", "vec_id", "cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
