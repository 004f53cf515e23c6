"""QSE-Approximate mode — per-class entity sampling (A1-A6).

The reference streams triples through per-class reservoirs
(`ReservoirSamplingParser.java:86-223`, `StandardReservoirSampling.java:26-85`,
`DynamicNeighborBasedReservoirSampling.java:40-119`). A one-shot distributed
equivalent with the same marginal distribution is a per-class capped uniform
sample: rank (entity, class) pairs by a seeded hash inside each class window
and keep rank <= cap. The "neighbor-based bully" variant (A2), which biases
the reservoir toward entities with many classes, becomes ordering by
(num_classes DESC, hash) — the approximate variant is approximate by design
(SURVEY §2 A2), exact reservoir-replay is not required.

Dynamic capacity (A3): cap(c) = min(max_cap, ceil(pct/100 * class_count)),
computed in one pass from class_counts instead of growing at runtime
(`DynamicNeighborBasedReservoirSampling.java:105-119`).

Everything is window functions + joins — deterministic under any
parallelism because ordering keys are pure functions of the data + seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..constants import TYPE_PREDICATE
from ..stats import (class_counts_df, entity_constraints, entity_types_df)


def dynamic_caps(class_counts: DataFrame, max_cap: int = 1000,
                 target_pct: float = 100.0) -> DataFrame:
    """(class, cap) — A3 capacity rule."""
    return class_counts.select(
        "class",
        F.least(F.lit(max_cap),
                F.ceil(F.lit(target_pct / 100.0) * F.col("class_count"))
                .cast("long")).alias("cap"))


def sample_entity_classes(entity_types: DataFrame, caps: DataFrame,
                          seed: int = 100, bully: bool = False) -> DataFrame:
    """Sampled (entity, class) pairs: per class keep `cap` entities.

    bully=True prefers high-scope (multi-class) entities, mirroring the
    neighbor-based eviction's bias (A2, `Utils.java:106-122` min-scope).
    Seed default 100 = the reference's sampling seed
    (`ReservoirSamplingParser.java:89`).
    """
    # order key is md5(entity || '#seed') — deterministic under any
    # partitioning AND reproducible by the DuckDB oracle (md5 exists in both
    # engines; xxhash64 does not exist in DuckDB)
    okey = F.md5(F.concat(F.col("entity"), F.lit(f"#{seed}")))
    et = entity_types
    if bully:
        # scope = classes per entity, as a window over the SAME scan the
        # ranking reads (the groupBy+join-back form evaluated the
        # entity_types DAG twice — once for the scope dimension, once
        # for the join probe side)
        et = et.withColumn(
            "_scope", F.count("*").over(Window.partitionBy("entity")))
        order = [F.desc("_scope"), okey, F.col("entity")]
    else:
        order = [okey, F.col("entity")]
    w = Window.partitionBy("class").orderBy(*order)
    ranked = et.withColumn("_rn", F.row_number().over(w))
    return (ranked.join(F.broadcast(caps), "class")
            .filter(F.col("_rn") <= F.col("cap"))
            .select("entity", "class"))


def prop_counts(triples: DataFrame,
                type_predicate: str = TYPE_PREDICATE) -> DataFrame:
    """Global triple count per predicate (A5 propCount), non-type triples —
    `ReservoirSamplingParser.java:186` counts only the else-branch lines."""
    w = F.col("cnt") if "cnt" in triples.columns else F.lit(1)
    return (triples.filter(F.col("predicate") != type_predicate)
            .groupBy(F.col("predicate").alias("property"))
            .agg(F.sum(w.cast("long")).alias("prop_count")))


def sampled_prop_counts(triples: DataFrame, sampled_entities: DataFrame,
                        type_predicate: str = TYPE_PREDICATE) -> DataFrame:
    """A5 sampledPropCount: same count restricted to sampled subjects."""
    w = F.col("cnt") if "cnt" in triples.columns else F.lit(1)
    return (triples.filter(F.col("predicate") != type_predicate)
            .join(sampled_entities.select(F.col("entity").alias("subject"))
                  .distinct(), "subject", "left_semi")
            .groupBy(F.col("predicate").alias("property"))
            .agg(F.sum(w.cast("long")).alias("sampled_prop_count")))


def approx_shape_stats(triples: DataFrame, max_cap: int = 1000,
                       target_pct: float = 100.0, seed: int = 100,
                       bully: bool = True,
                       type_predicate: str = TYPE_PREDICATE) -> DataFrame:
    """Approximate stats table with sampling-adjusted confidence (A6,
    `StatsComputer.java:104-114`: denominator = reservoir size) plus the
    ratio columns relative-support pruning needs (S12 sampling branch).

    Output adds: sampled_class_count, prop_count, sampled_prop_count.
    """
    etypes = entity_types_df(triples, type_predicate)
    ccounts = class_counts_df(etypes)
    caps = dynamic_caps(ccounts, max_cap, target_pct)
    sampled = sample_entity_classes(etypes, caps, seed, bully)
    s_counts = (sampled.groupBy("class")
                .agg(F.count("*").alias("sampled_class_count")))

    constraints, _ = entity_constraints(triples, etypes)
    support = (constraints
               .join(sampled, "entity")          # (entity,class) sampled pairs
               .groupBy("class", "property", "obj_type")
               .agg(F.count("*").alias("support")))

    pc = prop_counts(triples, type_predicate)
    spc = sampled_prop_counts(triples, sampled, type_predicate)

    return (support
            .join(F.broadcast(s_counts), "class")
            .join(F.broadcast(ccounts), "class")
            .withColumn("confidence",
                        F.col("support") / F.col("sampled_class_count"))
            .join(F.broadcast(pc), "property", "left")
            .join(F.broadcast(spc), "property", "left"))


def kept_sampled(confidence: float, support: int):
    """The relative-support keep PREDICATE
    (`ShapesExtractor.java:301-312,365-376`): conf > C and supp > S *
    min(sampledPropCount/propCount, sampledClassCount/classCount);
    S == 1 keeps supp >= 1. Shared by prune_sampled and the driver's
    flag-column row so the two cannot drift."""
    if support == 1:
        return (F.col("confidence") > confidence) & (F.col("support") >= 1)
    ratio = F.least(
        F.coalesce(F.col("sampled_prop_count") / F.col("prop_count"), F.lit(1.0)),
        F.col("sampled_class_count") / F.col("class_count"))
    return ((F.col("confidence") > confidence)
            & (F.col("support") > F.lit(support) * ratio))


def prune_sampled(stats: DataFrame, confidence: float, support: int) -> DataFrame:
    """Relative-support pruning: rows satisfying kept_sampled."""
    return stats.filter(kept_sampled(confidence, support))


def negative_sampled(confidence: float, support: int):
    """QSE-Approximate sh:not complement predicate
    (`ShapesExtractor.java:386-412`, negativePruning): when sampling is
    on and S != 1, conf <= C and supp < S * min(sampledPropCount/
    propCount, sampledClassCount/classCount) — the RELATIVE complement
    rule, mirroring kept_sampled exactly as the reference's negative
    branch mirrors its positive one (a round-4 review finding: the sink
    used the absolute rule for sampled sh:not output). S == 1 stays
    absolute (supp < 1 keeps nothing observed, as in the reference)."""
    if support == 1:
        return (F.col("confidence") <= confidence) & (F.col("support") < 1)
    ratio = F.least(
        F.coalesce(F.col("sampled_prop_count") / F.col("prop_count"),
                   F.lit(1.0)),
        F.col("sampled_class_count") / F.col("class_count"))
    return ((F.col("confidence") <= confidence)
            & (F.col("support") < F.lit(support) * ratio))


def bernoulli_sample_entities(entity_types: DataFrame, pct: float,
                              seed: int = 100) -> DataFrame:
    """A4 random %-sampling (`RandomSamplingParser.java:42-83`): Bernoulli on
    the ENTITY (consistent across its classes), seeded md5, no shuffle.

    Rule: keep iff the first two hex chars of md5(entity || '#seed') are
    lexicographically below round(pct*256/100) in hex — hex strings order
    numerically, so the rate is round(pct*256/100)/256 (within 0.4% of pct)
    and the rule is reproducible verbatim in any SQL engine. Buckets >=
    256 mean keep-everything and short-circuit: formatting 256 as hex
    ('100', three chars) would otherwise turn the 2-char comparison
    lexicographic-wrong and keep only ~6.6% at pct=100 (review finding)."""
    buckets = int(round(pct * 256 / 100))
    if buckets >= 256:
        return entity_types.select("entity", "class")
    threshold = f"{buckets:02x}"
    key = F.substring(F.md5(F.concat(F.col("entity"), F.lit(f"#{seed}"))),
                      1, 2)
    return (entity_types.filter(key < F.lit(threshold))
            .select("entity", "class"))
