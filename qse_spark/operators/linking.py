"""Stage 2 — blocking-key entity linking over mention surface forms.

Multi-pass blocking (standard entity-resolution practice), all in native
Spark SQL expressions — no Python in the hot path:

  pass 0  exact block: mentions sharing the same decoration-stripped core
          are trivially linked (strip_core in textnorm.py).
  pass 1  minhash/LSH: 3-gram character shingles of each distinct core ->
          H=B*R minhash values (xxhash64(shingle, seed)) -> B band keys ->
          equi-self-join on band key -> candidate core pairs.
  pass 2  token block: cores sharing a full (non-decoration) token are also
          candidates — guarantees recall for suffix-extended aliases that a
          probabilistic LSH band could miss.

Every candidate pair is then verified with the exact 3-gram Jaccard
(array_intersect over the per-core shingle arrays) and kept iff
jaccard >= tau.

Skew handling: band buckets larger than `max_block` are dropped with a
logged count (SURVEY §4 item 2 — an over-dense block means a near-stopword
surface pattern; its pairs are almost all false candidates and would square
the join). Token blocks are capped identically.

Scale note: the self-join is quadratic per block, bounded by max_block²;
blocks are hashed across the cluster by band key, so the stage parallelizes
with executor count and AQE splits residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..textnorm import STRIP_TOKENS

DEFAULT_TAU = 0.55
DEFAULT_BANDS = 12
DEFAULT_ROWS_PER_BAND = 3


def strip_core_col(col):
    """Native-SQL twin of textnorm.strip_core."""
    toks = F.split(col, "_")
    stop = F.array(*[F.lit(t) for t in sorted(STRIP_TOKENS)])
    kept = F.filter(toks, lambda t: ~F.array_contains(stop, t) & (t != F.lit("")))
    joined = F.array_join(kept, "_")
    return F.when(F.size(kept) > 0, joined).otherwise(col)


def shingles_col(col, n: int = 3):
    """Array of n-gram shingles of a string column (distinct)."""
    return F.array_distinct(F.expr(
        f"transform(sequence(0, greatest(length({col}) - {n}, 0)), "
        f"i -> substring({col}, i + 1, {n}))"))


def mention_cores(mentions: DataFrame) -> DataFrame:
    """mentions(mention_id) -> (mention_id, core)."""
    return mentions.select(
        "mention_id", strip_core_col(F.col("mention_id")).alias("core"))


def _candidate_pairs(cores: DataFrame, bands: int, rows: int,
                     max_block: int) -> DataFrame:
    """Distinct candidate (a, b) core pairs, a < b, via LSH ∪ token blocks."""
    sh = cores.select("core", shingles_col("core").alias("sh"))

    # minhash signature: per band b, key = xxhash64 of the R row-minima.
    # xxhash64(shingle, seed) gives H independent hash families JVM-side.
    exploded = sh.select("core", F.explode("sh").alias("g"))
    mins = [F.min(F.xxhash64("g", F.lit(i))).alias(f"h{i}")
            for i in range(bands * rows)]
    sig = exploded.groupBy("core").agg(*mins)
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        band_rows.append(sig.select(
            "core", F.lit(b).alias("band"), F.xxhash64(*cols).alias("key")))
    lsh_keys = band_rows[0]
    for br in band_rows[1:]:
        lsh_keys = lsh_keys.unionByName(br)

    # token blocks: every full token is a block key (band = -1 namespace).
    tok_keys = cores.select(
        F.col("core"),
        F.lit(-1).alias("band"),
        F.explode(F.split("core", "_")).alias("tok")
    ).filter(F.length("tok") > 0).select(
        "core", "band", F.xxhash64("tok").alias("key")).distinct()

    keys = lsh_keys.unionByName(tok_keys)

    # cap over-dense blocks (skew guard) — dropped blocks are observable via
    # blocking_report(); silent truncation would undercount links.
    counted = keys.withColumn(
        "blk_n", F.count("*").over(Window.partitionBy("band", "key")))
    kept = counted.filter(F.col("blk_n") <= max_block).drop("blk_n")

    a = kept.select(F.col("band"), F.col("key"), F.col("core").alias("a"))
    b = kept.select(F.col("band"), F.col("key"), F.col("core").alias("b"))
    return (a.join(b, ["band", "key"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def blocking_report(cores: DataFrame, bands: int = DEFAULT_BANDS,
                    rows: int = DEFAULT_ROWS_PER_BAND,
                    max_block: int = 2000) -> DataFrame:
    """Blocks exceeding max_block (these get dropped): (band, key, blk_n)."""
    sh = cores.select("core", shingles_col("core").alias("sh"))
    exploded = sh.select("core", F.explode("sh").alias("g"))
    mins = [F.min(F.xxhash64("g", F.lit(i))).alias(f"h{i}")
            for i in range(bands * rows)]
    sig = exploded.groupBy("core").agg(*mins)
    first_band = sig.select(
        "core", F.lit(0).alias("band"),
        F.xxhash64(*[F.col(f"h{r}") for r in range(rows)]).alias("key"))
    return (first_band.groupBy("band", "key").count()
            .filter(F.col("count") > max_block))


def link_mentions(mentions: DataFrame, tau: float = DEFAULT_TAU,
                  bands: int = DEFAULT_BANDS,
                  rows: int = DEFAULT_ROWS_PER_BAND,
                  max_block: int = 2000) -> DataFrame:
    """mentions(mention_id) -> links(src, dst, score).

    Emits the union of:
      exact edges   mention -> another mention with the identical core
                    (closed via the core node during CC, see pipeline)
      fuzzy edges   core a ~ core b with shingle-Jaccard >= tau

    Returned as symmetric-free (src < dst) edges between CORES plus the
    mention->core projection edges; the CC stage consumes both so that the
    final components group mention_ids.
    """
    cores = mention_cores(mentions)
    distinct_cores = cores.select("core").distinct()
    cand = _candidate_pairs(distinct_cores, bands, rows, max_block)

    sh_dim = distinct_cores.select(
        "core", shingles_col("core").alias("sh"),
        F.size(shingles_col("core")).alias("n"))
    a_sh = sh_dim.select(F.col("core").alias("a"), F.col("sh").alias("sh_a"),
                         F.col("n").alias("n_a"))
    b_sh = sh_dim.select(F.col("core").alias("b"), F.col("sh").alias("sh_b"),
                         F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    fuzzy = (cand.join(a_sh, "a").join(b_sh, "b")
             .withColumn("score", jac)
             .filter(F.col("score") >= tau)
             .select(F.col("a").alias("src"), F.col("b").alias("dst"),
                     "score"))
    return fuzzy


def linking_edges(mentions: DataFrame, **kw) -> DataFrame:
    """Full CC input: fuzzy core-core edges ∪ mention->core edges.

    Core node ids live in the same string space as mention ids (a core IS a
    valid normalized surface, often an actually-occurring mention), so the
    component minimum over {mentions ∪ cores} equals the minimum over
    mentions whenever every core has at least one mention with
    mention_id == core OR mention_id < core... which is NOT guaranteed —
    therefore cores are namespaced with a '\\x7f' prefix (sorts after every
    printable mention id) so the component min is always a real mention id.
    """
    cores = mention_cores(mentions)
    core_node = F.concat(F.lit("\x7f"), F.col("core"))
    proj = cores.select(F.col("mention_id").alias("src"),
                        core_node.alias("dst"),
                        F.lit(1.0).alias("score"))
    fuzzy = link_mentions(mentions, **kw).select(
        F.concat(F.lit("\x7f"), F.col("src")).alias("src"),
        F.concat(F.lit("\x7f"), F.col("dst")).alias("dst"),
        "score")
    return proj.unionByName(fuzzy)
