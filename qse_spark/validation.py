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

from .constants import TYPE_PREDICATE, UNDEFINED_OBJECT_TYPE
from .shapes import (kept_stat_rows, negative_shapes, node_shapes,
                     ns_support_gate, property_shapes)
from .stats import (_literal_type_expr, entity_types_df, prune_negative,
                    shape_stats)


def _checkpointed_stats(triples: DataFrame, type_predicate: str) -> DataFrame:
    """shape_stats materialized once via eager localCheckpoint: the report
    plans below consume the stats table from ~6 branches (neg/pruned rows,
    node shapes, property shapes, branch lookup), and re-deriving the
    whole kernel aggregation per branch costs ~10x the report itself
    (measured 62 s -> 14 s for validation_report at sf0.01). Unlike
    persist() this leaks nothing — checkpoint blocks are dropped by the
    ContextCleaner when the returned DataFrame becomes unreachable.
    Caveat: localCheckpoint is not fault-tolerant (a lost executor fails
    the job instead of recomputing); for long multi-thousand-executor runs
    pass a reliably-checkpointed `stats` explicitly."""
    return shape_stats(triples, type_predicate).localCheckpoint(eager=True)


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
        stats = _checkpointed_stats(triples, type_predicate)

    # shapes under validation: THE pruning spine shapes.kept_stat_rows —
    # the same rows pruned_shapes emits, so validation cannot drift from
    # the emitted shapes. No persist: vocabulary-sized, consumed by two
    # branches of ONE returned plan (exchange reuse dedupes at runtime,
    # and the stats input is already materialized above).
    ns = node_shapes(stats).filter(ns_support_gate(support))
    kept_rows = kept_stat_rows(stats, confidence, support, type_predicate)
    ps = property_shapes(kept_rows, type_predicate)

    focus = (etypes.join(
        F.broadcast(ns.select(F.col("target_class").alias("class"))),
        "class", "left_semi"))
    # SHACL sh:maxCount counts VALUE NODES — the DISTINCT objects of the
    # path, NOT occurrences: duplicate assertions of one triple (or a cnt
    # multiplicity column) are the same value node, and the per-object-
    # class fanout of tagged_constraint_rows would inflate further (that
    # fanout is the faithful S6 semantics for the KERNEL's maxCount flag,
    # but it is wrong for a validation report). Aggregating only the
    # paths that carry a cardinality constraint keeps this a
    # shape-path-sized shuffle instead of a corpus-sized one (review
    # finding; sh_not_report already used the semi-join pattern).
    card_paths = (ps.filter((F.col("min_count") == 1)
                            | (F.col("max_count") == 1))
                  .select(F.col("path").alias("predicate")).distinct())
    cardinality = (triples
                   .join(F.broadcast(card_paths), "predicate", "left_semi")
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

    # valueType: SHACL sh:or is existential PER VALUE NODE (the Jena
    # parity target, QseSHACLValidator.java:70-134, and the rule
    # sh_not_report already applies — review finding: a per-(focus,
    # objType) anti-join reported an object typed {A, B} as violating
    # when only the sh:class A branch was kept, though the value
    # conforms through A). An IRI value conforms through ANY of its
    # classes, or through a kept nodeKind-IRI (undefined-sentinel)
    # branch, which accepts every IRI; a literal conforms through its
    # datatype branch. Only values failing ALL branches are reported,
    # once per observed objType of the failing value (schema unchanged).
    ps_paths = ps.select(F.col("target_class").alias("class"),
                         F.col("path").alias("property"))
    allowed = F.broadcast(
        kept_rows.select("class", "property", "obj_type").distinct())
    undef_ok = F.broadcast(
        kept_rows.filter(F.col("obj_type") == UNDEFINED_OBJECT_TYPE)
        .select("class", "property").distinct())

    vals = (triples
            .select(F.col("subject").alias("entity"),
                    F.col("predicate").alias("property"),
                    "object", "obj_kind")
            .join(focus, "entity")
            .join(ps_paths, ["class", "property"], "left_semi"))

    iri_nodes = (vals.filter(F.col("obj_kind") == "iri")
                 .join(etypes.select(F.col("entity").alias("object"),
                                     F.col("class").alias("obj_type")),
                       "object", "left")
                 .select("entity", "class", "property", "object",
                         F.coalesce(
                             "obj_type",
                             F.lit(UNDEFINED_OBJECT_TYPE)).alias("obj_type"))
                 .distinct())
    conforming = (iri_nodes
                  .join(allowed, ["class", "property", "obj_type"],
                        "left_semi")
                  .select("entity", "class", "property", "object")
                  .distinct())
    iri_fail = (iri_nodes
                .join(conforming, ["entity", "class", "property", "object"],
                      "left_anti")
                .join(undef_ok, ["class", "property"], "left_anti"))

    lit_fail = (vals.filter(F.col("obj_kind") != "iri")
                .withColumn("obj_type", _literal_type_expr())
                .join(allowed, ["class", "property", "obj_type"],
                      "left_anti"))

    v_type = (iri_fail.select("entity", "class", "property", "obj_type")
              .unionByName(
                  lit_fail.select("entity", "class", "property", "obj_type"))
              .distinct()
              .select(F.col("entity").alias("focus"),
                      F.col("class").alias("target_class"), "property",
                      F.lit("valueType").alias("violation"), "obj_type",
                      F.lit(None).cast("long").alias("cnt")))

    return v_min.unionByName(v_max).unionByName(v_type)


def sh_not_report(triples: DataFrame, confidence: float, support: int,
                  type_predicate: str = TYPE_PREDICATE,
                  stats: DataFrame | None = None,
                  sampled: bool = False) -> DataFrame:
    """sh:not violation analysis — the NotConstraintComponent half of the
    reference's validator (`QseSHACLValidator.java:103-121` writes these
    to a separate `_NotConstraints.csv` with per-class support/confidence
    looked up from the shapes graph, `buildQuery` /
    `buildQueryForMultipleClassTypesPs`).

    SHACL semantics: a focus node VIOLATES `sh:not NS_neg` exactly when it
    CONFORMS to the negated node shape — here the `_PS_NotShape` wrapper
    around the pruned-away property shape (shapes.negative_shapes). The
    wrapper's single property shape conforms for focus f iff
      - min_count 1  -> f uses the path at least once
      - max_count 1  -> f has at most 1 distinct value on the path
      - every observed (path, objType) of f is in the negated branch set
        (vacuously true when f never uses the path).
    One output row per (focus, class, path, negated objType branch) with
    that branch's support/confidence — mirroring the reference CSV, which
    emits one line per sh:or branch for multi-class negated shapes.

    Relational plan: focus x negated-paths is a vocabulary-sized broadcast
    join fanout (|neg shapes per class| is small by construction — they
    failed the support threshold); cardinality/observed reuse the same
    corpus aggregates as validation_report.

    sampled=True selects the relative complement rule (the one sampled
    TTL artifacts are pruned with — sinks.write_reference_outputs /
    negativePruning, ShapesExtractor.java:400-404) so the report
    describes exactly the wrappers in the emitted file; requires
    `stats` to be an approx_shape_stats table (sampled_*_count
    columns).
    """
    etypes = entity_types_df(triples, type_predicate)
    if stats is None:
        stats = _checkpointed_stats(triples, type_predicate)
    # approx stats carry no cardinality columns — null-fill so the
    # wrapper property shapes render, mirroring write_reference_outputs
    for c in ("min_count", "max_count"):
        if c not in stats.columns:
            stats = stats.withColumn(c, F.lit(None).cast("int"))

    if sampled:
        from .operators.sampling import negative_sampled
        neg_rows = stats.filter(negative_sampled(confidence, support))
    else:
        neg_rows = prune_negative(stats, confidence, support)
    neg_ps = negative_shapes(stats, confidence, support, type_predicate,
                             sampled=sampled)

    # focus nodes of classes that (a) keep a surviving node shape to hang
    # sh:not off (shapes.ns_support_gate — the pruned_shapes gate) and
    # (b) have >=1 neg shape
    ns = node_shapes(stats).filter(ns_support_gate(support))
    neg_classes = (neg_ps.select(F.col("target_class"))
                   .join(ns.select("target_class"), "target_class",
                         "left_semi").distinct())
    focus = etypes.join(
        F.broadcast(neg_classes.select(F.col("target_class").alias("class"))),
        "class", "left_semi")

    shapes = F.broadcast(neg_ps.select(
        F.col("target_class").alias("class"), F.col("path").alias("property"),
        "min_count", "max_count", "not_shape"))
    neg_paths = neg_ps.select(F.col("path").alias("predicate")).distinct()
    cardinality = (triples
                   .join(F.broadcast(neg_paths), "predicate", "left_semi")
                   .groupBy(F.col("subject").alias("entity"),
                            F.col("predicate").alias("property"))
                   .agg(F.countDistinct("object").alias("cnt")))

    # every focus x negated path of its class (n = 0 when the path is
    # unused — the vacuous-conformance case)
    fp = (focus.join(shapes, "class")
          .join(cardinality, ["entity", "property"], "left")
          .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))

    # all-values condition, per VALUE NODE (SHACL sh:or is existential per
    # value: an object entity with classes {A, B} conforms to sh:or(class
    # B, ...) through ANY matching class; a literal through its datatype;
    # any IRI through a negated nodeKind-IRI (undefined-sentinel) branch)
    allowed = F.broadcast(neg_rows.select("class", "property", "obj_type"))
    undef_branch = F.broadcast(
        neg_rows.filter(F.col("obj_type") == UNDEFINED_OBJECT_TYPE)
        .select("class", "property").distinct()
        .withColumn("_undef_ok", F.lit(1)))
    vals = (triples.join(F.broadcast(neg_paths), "predicate", "left_semi")
            .join(focus.select(F.col("entity").alias("subject"), "class"),
                  "subject")
            .select(F.col("subject").alias("entity"), "class",
                    F.col("predicate").alias("property"), "object",
                    "obj_kind"))
    lit_vals = (vals.filter(F.col("obj_kind") != "iri")
                .withColumn("obj_type", _literal_type_expr())
                .join(allowed.withColumn("_hit", F.lit(1)),
                      ["class", "property", "obj_type"], "left")
                .withColumn("_ok", F.col("_hit").isNotNull())
                .select("entity", "class", "property", "object", "_ok"))
    obj_classes = etypes.select(F.col("entity").alias("object"),
                                F.col("class").alias("obj_type"))
    iri_vals = (vals.filter(F.col("obj_kind") == "iri")
                .join(obj_classes, "object", "left")
                .join(allowed.withColumn("_hit", F.lit(1)),
                      ["class", "property", "obj_type"], "left")
                .join(undef_branch, ["class", "property"], "left")
                .groupBy("entity", "class", "property", "object")
                .agg(((F.max(F.col("_hit").isNotNull().cast("int")) == 1)
                      | (F.max(F.col("_undef_ok")).isNotNull()))
                     .alias("_ok")))
    bad = (lit_vals.unionByName(iri_vals)
           .groupBy("entity", "class", "property")
           .agg(F.min(F.col("_ok").cast("int")).alias("_all_ok"))
           .filter(F.col("_all_ok") == 0)
           .select("entity", "class", "property")
           .withColumn("_bad", F.lit(1)))

    conforms = (fp.join(bad, ["entity", "class", "property"], "left")
                .filter(F.col("_bad").isNull())
                .filter((F.col("min_count").isNull()) | (F.col("cnt") >= 1))
                .filter((F.col("max_count").isNull()) | (F.col("cnt") <= 1)))

    # one row per negated objType branch, reference-CSV style
    branches = neg_rows.select("class", "property", "obj_type",
                               "support", "confidence")
    return (conforms
            .join(F.broadcast(branches), ["class", "property"])
            .select(F.col("entity").alias("focus"),
                    F.col("class").alias("target_class"),
                    "property", "not_shape", "obj_type",
                    "support", F.round("confidence", 6).alias("confidence")))
