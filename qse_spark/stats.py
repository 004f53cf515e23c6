"""QSE statistics kernel — pure DataFrame re-expression of the reference's
shape/support/confidence computation.

Reference semantics reproduced here (file:line cites into /root/reference):

  entity_types        phase-1 type-triple map, `filebased/Parser.java:98-146`
  class_counts        `Parser.java:40,115` (classEntityCount)
  object-type tagging `Parser.java:164-195,414-429` (extractObjectType) +
                      `Parser.java:349-366` (parseIriTypeObject: IRI object
                      fans out to ALL classes of the object entity; unknown
                      object -> undefined sentinel, `Constants.java:16`)
  per-entity constraints + cardinality
                      `Parser.java:397-411`, `EntityData.java:39-55`
                      (cardinality increments once per (triple x object-class)
                      tuple — an IRI object with k known classes adds k)
  support/confidence  `StatsComputer.java:26-65`: support(c,p,ot) = #entities
                      of class c holding constraint (p,ot); confidence =
                      support / classEntityCount[c]
  maxCount=1          `StatsComputer.java:47-56`: exists-semantics — some
                      entity of c uses p with cardinality <= 1  ⇔
                      min(cnt) over (c,p) == 1
  minCount=1          `ShapesExtractor.java:470-472`: support == class_count
  pruning             `ShapesExtractor.java:358-384`: keep iff
                      confidence > C and support > S  (>= S when S == 1)

All operators are built-in Spark SQL expressions — no Python UDFs — so the
whole kernel stays inside WholeStageCodegen and Catalyst handles pushdown,
partial aggregation and AQE skew splitting. Every aggregation here is
algebraic (the reference's ParallelQbSampling.java:198-236 merge proves the
stats form a commutative monoid), so partial/final aggregation distributes
to any number of executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import (LITERAL_DATATYPES, TYPE_PREDICATE,
                        UNDEFINED_OBJECT_TYPE)

__all__ = [
    "entity_types_df", "class_counts_df", "tagged_constraint_rows",
    "entity_constraints", "shape_support", "max_count_flags", "shape_stats",
    "prune",
]


def entity_types_df(triples: DataFrame, type_predicate: str = TYPE_PREDICATE) -> DataFrame:
    """(entity, class) distinct pairs from type triples (phase-1 map)."""
    return (triples
            .filter(F.col("predicate") == type_predicate)
            .select(F.col("subject").alias("entity"),
                    F.col("object").alias("class"))
            .distinct())


def class_counts_df(entity_types: DataFrame) -> DataFrame:
    """class -> #instances. Input is distinct, so count(*) == countDistinct."""
    return (entity_types
            .groupBy("class")
            .agg(F.count("*").alias("class_count")))


def _literal_type_expr():
    expr = None
    for kind, dtype in LITERAL_DATATYPES.items():
        cond = F.col("obj_kind") == kind
        expr = F.when(cond, F.lit(dtype)) if expr is None else expr.when(cond, F.lit(dtype))
    # unknown literal kinds fall back to xsd:string (Parser.java:424-427)
    return expr.otherwise(F.lit(LITERAL_DATATYPES["string"]))


def tagged_constraint_rows(triples: DataFrame, entity_types: DataFrame) -> DataFrame:
    """One row per (triple x resolved object type): the S3 tagging + S5 join.

    IRI objects resolve to ALL classes of the object entity via a single
    equi-join (the reference's one hash lookup, Parser.java:349-366); objects
    with no known class get the undefined sentinel. Literals map to their
    datatype label. Type triples flow through unchanged (their object is an
    IRI whose classes are usually unknown -> undefined), matching phase 2's
    processing of every input line (Parser.java:158-243).

    Returns (entity, property, obj_type, weight) — NOT deduplicated; the
    weight-sum per (entity, property) is exactly the reference's cardinality
    counter. A pre-aggregated triple table may carry a `cnt` multiplicity
    column (the pipeline's canonical stage emits one); it becomes the weight,
    avoiding a re-expansion of duplicate triples at scale.
    """
    w = F.col("cnt") if "cnt" in triples.columns else F.lit(1)
    triples = triples.withColumn("_w", w.cast("long"))
    iri = triples.filter(F.col("obj_kind") == "iri")
    lit = triples.filter(F.col("obj_kind") != "iri")

    obj_classes = entity_types.select(
        F.col("entity").alias("_obj_entity"),
        F.col("class").alias("_obj_class"))

    iri_tagged = (
        iri.join(obj_classes, iri["object"] == obj_classes["_obj_entity"],
                 "left")
        .select(F.col("subject").alias("entity"),
                F.col("predicate").alias("property"),
                F.coalesce(F.col("_obj_class"),
                           F.lit(UNDEFINED_OBJECT_TYPE)).alias("obj_type"),
                F.col("_w").alias("weight")))

    lit_tagged = lit.select(
        F.col("subject").alias("entity"),
        F.col("predicate").alias("property"),
        _literal_type_expr().alias("obj_type"),
        F.col("_w").alias("weight"))

    return iri_tagged.unionByName(lit_tagged)


def entity_constraints(triples: DataFrame, entity_types: DataFrame
                       ) -> tuple[DataFrame, DataFrame]:
    """(constraints, cardinality):
    constraints  distinct (entity, property, obj_type)  [EntityData.objTypes]
    cardinality  (entity, property, cnt)                [EntityData.count]
    """
    rows = tagged_constraint_rows(triples, entity_types)
    constraints = rows.drop("weight").distinct()
    cardinality = (rows.groupBy("entity", "property")
                   .agg(F.sum("weight").alias("cnt")))
    return constraints, cardinality


def shape_support(constraints: DataFrame, entity_types: DataFrame,
                  class_counts: DataFrame) -> DataFrame:
    """support + confidence per (class, property, obj_type) — S7/S8.

    Both join inputs are distinct per entity, so count(*) equals the
    reference's per-entity increment; no countDistinct shuffle needed.
    """
    support = (constraints
               .join(entity_types, "entity")
               .groupBy("class", "property", "obj_type")
               .agg(F.count("*").alias("support")))
    return (support
            .join(F.broadcast(class_counts), "class")
            .withColumn("confidence",
                        F.col("support") / F.col("class_count")))


def max_count_flags(cardinality: DataFrame, entity_types: DataFrame) -> DataFrame:
    """(class, property, max_count=1) for pairs where SOME entity of the
    class uses the property with cardinality <= 1 (exists-semantics,
    StatsComputer.java:47-56)."""
    return (cardinality
            .join(entity_types, "entity")
            .groupBy("class", "property")
            .agg(F.min("cnt").alias("_min_cnt"))
            .select("class", "property",
                    F.when(F.col("_min_cnt") <= 1, F.lit(1))
                    .otherwise(F.lit(None).cast("int")).alias("max_count")))


def shape_stats(triples: DataFrame,
                type_predicate: str = TYPE_PREDICATE,
                cache_intermediates: bool = False) -> DataFrame:
    """The full QSE statistics table from a raw triple table:

    (class, property, obj_type, support, class_count, confidence,
     min_count, max_count)

    min_count = 1 iff support == class_count (ShapesExtractor.java:470-472);
    the shape layer additionally forces minCount for a sole undefined
    objType (`ShapesExtractor.java:502-505`) — that is shape construction,
    not statistics, and lives in shapes.py.

    Physical shape (the 100 TB concern): the input is consumed by exactly
    three scan branches — the type pass (etypes) and the iri/literal halves
    of the tagging union — matching the reference's 2-3 file passes
    (`Parser.java:78-90`). Everything downstream works on `epo`, the
    per-(entity, property, obj_type) aggregate, which is orders of
    magnitude smaller than the triple table; support and max-count both
    derive from ONE epo ⋈ etypes join, so no subtree is recomputed per
    output column. cache_intermediates=True persists etypes + epo for
    multi-action consumers (caller owns unpersist via the returned
    DataFrames' lineage).
    """
    etypes = entity_types_df(triples, type_predicate)
    if cache_intermediates:
        etypes = etypes.persist()
    ccounts = class_counts_df(etypes)
    rows = tagged_constraint_rows(triples, etypes)
    epo = (rows.groupBy("entity", "property", "obj_type")
           .agg(F.sum("weight").alias("_w_cnt")))
    if cache_intermediates:
        epo = epo.persist()
    j = epo.join(etypes, "entity")
    sup = (j.groupBy("class", "property", "obj_type")
           .agg(F.count("*").alias("support"))
           .join(F.broadcast(ccounts), "class")
           .withColumn("confidence",
                       F.col("support") / F.col("class_count")))
    # per-(class, entity, property) cardinality = sum over obj_types, then
    # exists-semantics min per (class, property) (StatsComputer.java:47-56)
    maxc = (j.groupBy("class", "entity", "property")
            .agg(F.sum("_w_cnt").alias("_cnt"))
            .groupBy("class", "property")
            .agg(F.min("_cnt").alias("_min_cnt"))
            .select("class", "property",
                    F.when(F.col("_min_cnt") <= 1, F.lit(1))
                    .otherwise(F.lit(None).cast("int")).alias("max_count")))
    return (sup
            .join(maxc, ["class", "property"], "left")
            .withColumn("min_count",
                        F.when(F.col("support") == F.col("class_count"),
                               F.lit(1)).otherwise(F.lit(None).cast("int")))
            .select("class", "property", "obj_type", "support",
                    "class_count", "confidence", "min_count", "max_count"))


def kept(confidence: float, support: int):
    """The QSE-Pruned keep PREDICATE (ShapesExtractor.java:358-384):
    confidence > C and support > S, with >= S when S == 1. THE single
    statement of the rule — prune and the driver's flag-column rows
    import it, so the two cannot drift."""
    supp_ok = (F.col("support") >= support) if support == 1 \
        else (F.col("support") > support)
    return (F.col("confidence") > confidence) & supp_ok


def prune(stats: DataFrame, confidence: float, support: int) -> DataFrame:
    """QSE-Pruned positive filter: rows satisfying kept(C, S).
    Evaluate repeatedly over a cached stats table for a threshold grid."""
    return stats.filter(kept(confidence, support))


def prune_negative(stats: DataFrame, confidence: float, support: int) -> DataFrame:
    """sh:not complement filter (ShapesExtractor.java:386-412):
    keep iff confidence <= C and support < S."""
    return stats.filter((F.col("confidence") <= confidence)
                        & (F.col("support") < support))
