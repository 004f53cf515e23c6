"""V2 — SHACL-core validation of a triple table against extracted shapes.

DataFrame re-expression of the reference's validation loop
(`/root/reference/src/main/java/cs/validation/QseSHACLValidator.java:70-134`,
which feeds Jena's ShaclValidator and parses the report into CSV) for
exactly the constraint kinds QSE emits: sh:minCount 1, sh:maxCount 1 and
the value-type constraints (sh:class / sh:datatype / sh:nodeKind, incl.
their sh:or unions). Instead of materializing a report graph, the checks
are relational:

  minCount   focus node of the target class lacking the path entirely
  maxCount   focus node using the path with cardinality > 1 where the
             shape says sh:maxCount 1 (the ∃-semantics shapes DO flag
             pairs where other entities exceed 1 — those violations are
             the interesting output of validating the extraction corpus)
  valueType  an observed (focus, path, objType) not in the shape's
             allowed objType set (arises under pruning: rare objTypes
             pruned from the sh:or union become violations)

Everything is built-in joins/aggregations over the same intermediates the
stats kernel uses, so the whole report is one SQL-oracle-able plan —
support ≤ class_count style invariants hold by construction and are
asserted in tests/test_shapes.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import TYPE_PREDICATE
from .shapes import node_shapes, property_shapes
from .stats import (entity_types_df, prune, shape_stats,
                    tagged_constraint_rows)


def validation_report(triples: DataFrame, confidence: float, support: int,
                      type_predicate: str = TYPE_PREDICATE,
                      stats: DataFrame | None = None) -> DataFrame:
    """Validate `triples` against the QSE-Pruned shapes at (confidence,
    support): (focus, target_class, property, violation, obj_type, cnt).

    violation ∈ {minCount, maxCount, valueType}; obj_type is set for
    valueType rows, cnt for maxCount rows. Classes whose node shape is
    pruned away are not validated (no shape -> no constraint), and neither
    are properties with no surviving property shape for the class —
    mirroring how the reference validates only the emitted shapes file.
    """
    etypes = entity_types_df(triples, type_predicate)
    if stats is None:
        stats = shape_stats(triples, type_predicate)

    # shapes under validation: QSE-Pruned rows + the never-pruned type rows,
    # gated on surviving node shapes (same spine as shapes.pruned_shapes)
    kept_rows = (prune(stats, confidence, support)
                 .unionByName(stats.filter(F.col("property") == type_predicate))
                 .distinct())
    ns_gate = (F.col("class_count") >= support) if support == 1 \
        else (F.col("class_count") > support)
    ns = node_shapes(stats).filter(ns_gate)
    # no persist: kept_rows is a vocabulary-sized aggregate consumed by two
    # branches of ONE returned plan — caching it here would leak executor
    # storage on every call (nothing could ever unpersist it), and Spark's
    # exchange reuse already dedupes the recompute inside one action
    kept_rows = kept_rows.join(
        F.broadcast(ns.select(F.col("target_class").alias("class"))),
        "class", "left_semi")
    ps = property_shapes(kept_rows, type_predicate)

    focus = (etypes.join(
        F.broadcast(ns.select(F.col("target_class").alias("class"))),
        "class", "left_semi"))
    tagged = tagged_constraint_rows(triples, etypes)
    # SHACL sh:maxCount counts VALUE NODES — the DISTINCT objects of the
    # path, NOT occurrences: duplicate assertions of one triple (or a cnt
    # multiplicity column) are the same value node, and the per-object-
    # class fanout of tagged_constraint_rows would inflate further (that
    # fanout is the faithful S6 semantics for the KERNEL's maxCount flag,
    # but it is wrong for a validation report)
    cardinality = (triples
                   .groupBy(F.col("subject").alias("entity"),
                            F.col("predicate").alias("property"))
                   .agg(F.countDistinct("object").alias("cnt")))

    # minCount: (class, path) shapes with sh:minCount 1 x focus nodes of
    # the class that never use the path
    ps_min = (ps.filter(F.col("min_count") == 1)
              .select(F.col("target_class").alias("class"),
                      F.col("path").alias("property")))
    v_min = (focus.join(ps_min, "class")
             .join(cardinality, ["entity", "property"], "left_anti")
             .select(F.col("entity").alias("focus"),
                     F.col("class").alias("target_class"), "property",
                     F.lit("minCount").alias("violation"),
                     F.lit(None).cast("string").alias("obj_type"),
                     F.lit(None).cast("long").alias("cnt")))

    # maxCount: sh:maxCount 1 shapes x focus nodes using the path > once
    ps_max = (ps.filter(F.col("max_count") == 1)
              .select(F.col("target_class").alias("class"),
                      F.col("path").alias("property")))
    v_max = (focus.join(ps_max, "class")
             .join(cardinality, ["entity", "property"])
             .filter(F.col("cnt") > 1)
             .select(F.col("entity").alias("focus"),
                     F.col("class").alias("target_class"), "property",
                     F.lit("maxCount").alias("violation"),
                     F.lit(None).cast("string").alias("obj_type"),
                     F.col("cnt")))

    # valueType: observed (focus, path, objType) not in the kept shape's
    # allowed set, restricted to paths that still HAVE a shape for the class
    observed = tagged.select("entity", "property", "obj_type").distinct()
    ps_paths = ps.select(F.col("target_class").alias("class"),
                         F.col("path").alias("property"))
    allowed = kept_rows.select("class", "property", "obj_type")
    v_type = (focus.join(observed, "entity")
              .join(ps_paths, ["class", "property"], "left_semi")
              .join(allowed, ["class", "property", "obj_type"], "left_anti")
              .select(F.col("entity").alias("focus"),
                      F.col("class").alias("target_class"), "property",
                      F.lit("valueType").alias("violation"), "obj_type",
                      F.lit(None).cast("long").alias("cnt")))

    return v_min.unionByName(v_max).unionByName(v_type)
