"""SHACL shape construction, pruning, post-annotation, statistics, and P/R.

Reference parity (file:line into /root/reference):

  shape naming       `ShapesExtractor.java:259,442` — NodeShape
                     "<ns><Class>Shape", PropertyShape "<ns><prop><Class>ShapeProperty"
  constraint kinds   `ShapesExtractor.java:483-516,540-575`: one objType ->
                     direct sh:datatype (+ nodeKind Literal) for XSD/langString,
                     sh:class (+ nodeKind IRI) for known classes, bare nodeKind
                     IRI for the undefined sentinel; >1 objType -> sh:or list;
                     the instance-type property gets sh:in (the class itself),
                     `ShapesExtractor.java:452-461`
  minCount           support == class_count (`:470-472`); additionally forced
                     when the SOLE objType is the undefined sentinel
                     (`:502-505` — single-objType branch only)
  maxCount           via stats.max_count (exists-semantics, StatsComputer)
  support/confidence annotations on every (prop, objType)
                     (`annotateWithSupportAndConfidence`, Constants.java:18-19)
  pruning            stats.prune (S12) + node-shape support gate
                     (`ShapesExtractor.java:240-249`); the type property is
                     never pruned (`:297-301`)
  sh:node post-annotation  `PostConstraintsAnnotator.java:30-104` — self-join
                     of property shapes' sh:class against node-shape targets
  shape statistics   `ShapesExtractor.java:1041-1087` (COUNT/AVG/MIN/MAX grid)
  precision/recall   `PrecisionRecallComputer.java:105-141`

Everything is a transformation of the stats DataFrame — shapes are data, the
TTL file is just a rendering (written as partitioned shards, each a valid
Turtle document, via native Spark ops)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import (EXAMPLE_PRED, LITERAL_DATATYPES, SHAPES_NAMESPACE,
                        TYPE_PREDICATE, UNDEFINED_OBJECT_TYPE)
from .stats import prune, prune_negative

_LITERALS = list(LITERAL_DATATYPES.values())


def _local(col):
    """Local name of an IRI-ish label (after last / # :)."""
    return F.element_at(F.split(col, "[/#:]"), -1)


def node_shapes(stats: DataFrame) -> DataFrame:
    """(node_shape, target_class, class_count) — one per class."""
    return (stats.groupBy(F.col("class").alias("target_class"))
            .agg(F.max("class_count").alias("class_count"))
            .withColumn("node_shape",
                        F.concat(F.lit(SHAPES_NAMESPACE),
                                 _local(F.col("target_class")),
                                 F.lit("Shape")))
            .select("node_shape", "target_class", "class_count"))


def _constraint_kind(type_predicate: str):
    return (F.when(F.col("property") == type_predicate, F.lit("in"))
            .when(F.col("obj_type").isin(_LITERALS), F.lit("datatype"))
            .when(F.col("obj_type") == UNDEFINED_OBJECT_TYPE,
                  F.lit("nodeKind"))
            .otherwise(F.lit("class")))


def property_shapes(stats: DataFrame,
                    type_predicate: str = TYPE_PREDICATE) -> DataFrame:
    """One row per (class, property): the property-shape record.

    Columns: node_shape, target_class, prop_shape, path, constraints
    (sorted array of structs (obj_type, kind, support, confidence)),
    n_obj_types, min_count, max_count, uses_or.
    """
    rows = stats.withColumn("kind", _constraint_kind(type_predicate))
    grouped = (rows.groupBy("class", "property")
               .agg(F.sort_array(F.collect_list(F.struct(
                        F.col("obj_type"), F.col("kind"),
                        F.col("support"), F.col("confidence")))
                    ).alias("constraints"),
                    F.max("class_count").alias("class_count"),
                    F.max(F.when(F.col("support") == F.col("class_count"), 1)
                          ).alias("_min_by_support"),
                    F.max("max_count").alias("max_count"),
                    F.count("*").alias("n_obj_types"),
                    F.max(F.when(F.col("obj_type") == UNDEFINED_OBJECT_TYPE,
                                 1)).alias("_has_undef")))
    # forced minCount for a SOLE undefined objType (single-branch only)
    min_count = F.when(
        (F.col("_min_by_support") == 1)
        | ((F.col("n_obj_types") == 1) & (F.col("_has_undef") == 1)),
        F.lit(1)).otherwise(F.lit(None).cast("int"))
    return (grouped
            .withColumn("min_count", min_count)
            .withColumn("node_shape",
                        F.concat(F.lit(SHAPES_NAMESPACE),
                                 _local(F.col("class")), F.lit("Shape")))
            .withColumn("prop_shape",
                        F.concat(F.lit(SHAPES_NAMESPACE),
                                 _local(F.col("property")),
                                 _local(F.col("class")),
                                 F.lit("ShapeProperty")))
            .withColumn("uses_or", F.col("n_obj_types") > 1)
            .select(F.col("class").alias("target_class"), "node_shape",
                    "prop_shape", F.col("property").alias("path"),
                    "constraints", "n_obj_types", "min_count", "max_count",
                    "uses_or", "class_count"))


def ns_support_gate(support: int):
    """Node-shape survival gate: class_count > S (>= when S == 1,
    ShapesExtractor.java:297-301). THE single statement of the rule —
    pruned_shapes, both validation reports and the reference-output
    sink all import it, so the gate cannot drift between the shapes
    that are emitted and the shapes that are validated/measured."""
    return (F.col("class_count") >= support) if support == 1 \
        else (F.col("class_count") > support)


def kept_stat_rows(stats: DataFrame, confidence: float, support: int,
                   type_predicate: str = TYPE_PREDICATE,
                   sampled: bool = False) -> DataFrame:
    """The QSE-Pruned row spine: threshold-surviving rows, restricted to
    classes whose node shape survives ns_support_gate. Single source of
    truth for pruned_shapes (what is emitted), validation_report (what
    is validated) and the per-grid metric rows (what is measured).

    Instance-type rows pass through the SAME threshold as every other
    branch — the reference's positivePruning runs for the type property
    too (performPropShapePruningPositive:286-313); what "the type
    property is never pruned" means there is that the type PROPERTY
    SHAPE survives with an empty branch set (the pre-put objTypesSet),
    which pruned_shapes reconstructs explicitly. A failing type branch's
    support/confidence annotations must NOT appear in the emitted model
    (review finding; in practice a gate-surviving class's dominant type
    branch has conf 1.0 and supp == class_count > S, so it always
    passes — only minority branches of multi-typed classes drop).

    sampled=True applies the QSE-Approximate relative-support rule
    (sampling.kept_sampled) instead of the absolute stats.prune — the
    rule the reference's sampled runs prune with; requires the
    sampled_*_count columns approx_shape_stats emits (callers null-fill
    the cardinality columns approx stats do not carry — see
    sinks.write_reference_outputs)."""
    if sampled:
        from .operators.sampling import kept_sampled
        thresh = stats.filter(kept_sampled(confidence, support))
    else:
        thresh = prune(stats, confidence, support)
    ns = node_shapes(stats).filter(ns_support_gate(support))
    return thresh.join(
        F.broadcast(ns.select(F.col("target_class").alias("class"))),
        "class", "left_semi")


def pruned_shapes(stats: DataFrame, confidence: float, support: int,
                  type_predicate: str = TYPE_PREDICATE,
                  sampled: bool = False) -> tuple[DataFrame, DataFrame]:
    """(node_shapes, property_shapes) after QSE-Pruned filtering:
    node shapes gated on ns_support_gate; property rows from
    kept_stat_rows (sampled= selects its relative-support rule). The
    instance-type PROPERTY SHAPE survives even when
    every one of its branches fails the threshold (the reference
    pre-puts an empty objTypesSet for it,
    performPropShapePruningPositive:296-299, so the PS renders with
    sh:in and no annotations) — reconstructed here as an explicit
    empty-constraints row for gate-surviving classes missing a type
    PS. Single emitted-model spine: sinks.write_reference_outputs
    renders exactly this pair per grid point (round-4 review finding:
    the sink used to rebuild the pair without the type-PS
    reconstruction, so artifact and spine could disagree)."""
    ns = node_shapes(stats).filter(ns_support_gate(support))
    ps = property_shapes(kept_stat_rows(stats, confidence, support,
                                        type_predicate, sampled=sampled),
                         type_predicate)
    missing = ns.join(
        ps.filter(F.col("path") == type_predicate)
        .select("target_class"), "target_class", "left_anti")
    empty_type_ps = missing.select(
        "target_class", "node_shape",
        F.concat(F.lit(SHAPES_NAMESPACE), _local(F.lit(type_predicate)),
                 _local(F.col("target_class")),
                 F.lit("ShapeProperty")).alias("prop_shape"),
        F.lit(type_predicate).alias("path"),
        F.array().cast(
            "array<struct<obj_type:string,kind:string,"
            "support:bigint,confidence:double>>").alias("constraints"),
        F.lit(0).cast("bigint").alias("n_obj_types"),
        F.lit(None).cast("int").alias("min_count"),
        F.lit(None).cast("int").alias("max_count"),
        F.lit(False).alias("uses_or"),
        "class_count")
    return ns, ps.unionByName(empty_type_ps)


def negative_shapes(stats: DataFrame, confidence: float, support: int,
                    type_predicate: str = TYPE_PREDICATE,
                    sampled: bool = False) -> DataFrame:
    """S13 back half — sh:not negative-shape records (the complement filter
    rows built into wrapper node shapes, `ShapesExtractor.java:623-1010`,
    activated by `qse_validation_with_shNot`).

    Every (class, property) failing the thresholds gets a wrapper node
    shape `<ns><prop><Class>_PS_NotShape` (reference naming, `:822`)
    attached to the class's node shape via sh:not, containing a property
    shape built with the SAME constraint rules as the positive side.
    Restricted to classes surviving ns_support_gate — the reference
    builds sh:not wrappers only inside prepareNodeAndPropertyShapes,
    which buildAndPruneShapes (:240-249) calls only for gate-surviving
    classes (review finding: ungated rows resurrected pruned classes as
    implicit node shapes in the emitted TTL, disagreeing with
    sh_not_report's own gate). sampled=True applies the reference's
    RELATIVE complement rule (sampling.negative_sampled) as its sampled
    runs do (negativePruning:400-404).
    (Engine-wide naming note: the reference renames the instance-type
    property to "instanceType" in shape IRIs; this engine consistently uses
    the local name, as the oracle-checked positive shapes already do.)
    """
    if sampled:
        from .operators.sampling import negative_sampled
        neg = stats.filter(negative_sampled(confidence, support))
    else:
        neg = prune_negative(stats, confidence, support)
    ns = node_shapes(stats).filter(ns_support_gate(support))
    neg = neg.join(
        F.broadcast(ns.select(F.col("target_class").alias("class"))),
        "class", "left_semi")
    ps = property_shapes(neg, type_predicate)
    return (ps.withColumn(
        "not_shape",
        F.concat(F.lit(SHAPES_NAMESPACE), _local(F.col("path")),
                 _local(F.col("target_class")), F.lit("_PS_NotShape")))
        # the inner negated property shape gets its OWN IRI: reusing the
        # positive `...ShapeProperty` name would define one subject twice
        # with conflicting constraints when positive and negative shapes
        # are written into the same TTL graph
        .withColumn(
        "prop_shape",
        F.concat(F.lit(SHAPES_NAMESPACE), _local(F.col("path")),
                 _local(F.col("target_class")),
                 F.lit("NegShapeProperty"))))


def annotate_examples(nodes: DataFrame, props: DataFrame,
                      ex_nodes: DataFrame, ex_values: DataFrame
                      ) -> tuple[DataFrame, DataFrame]:
    """E4 — attach `http://example.org/example` annotations to shapes
    (`ShapesExtractor.java:573-615`, `Main.java:33-38`): example entities
    from E1 onto node shapes, example object values from E2 onto property
    shapes. Examples are rendered as a single \\x1f-joined string ordered
    by sample rank (unit separator: '|' can occur inside values) —
    deterministic (md5-seeded E1/E2) and SQL-oracle-able
    (string_agg ... chr(31) ORDER BY rnk)."""
    def _agg(df, keys, col):
        return (df.groupBy(*keys)
                .agg(F.concat_ws("\x1f", F.transform(
                    F.array_sort(F.collect_list(F.struct("rnk", col))),
                    lambda x: x[col])).alias("examples")))

    ne = (_agg(ex_nodes, ["class"], "entity")
          .withColumnRenamed("class", "target_class"))
    nodes2 = nodes.join(F.broadcast(ne), "target_class", "left")
    pe = (_agg(ex_values, ["class", "property"], "value")
          .withColumnRenamed("class", "target_class")
          .withColumnRenamed("property", "path"))
    props2 = props.join(F.broadcast(pe), ["target_class", "path"], "left")
    return nodes2, props2


def annotate_sh_node(prop_shapes: DataFrame, nodes: DataFrame) -> DataFrame:
    """S14 — for property shapes whose single constraint is sh:class X and a
    node shape targets X, add sh_node = X's node shape IRI."""
    single_cls = (prop_shapes
                  .withColumn("_c", F.element_at("constraints", 1))
                  .withColumn("_cls", F.when(
                      (F.col("n_obj_types") == 1)
                      & (F.col("_c.kind") == "class"), F.col("_c.obj_type"))))
    tgt = nodes.select(F.col("target_class").alias("_cls"),
                       F.col("node_shape").alias("sh_node"))
    return (single_cls.join(F.broadcast(tgt), "_cls", "left")
            .drop("_c", "_cls"))


def shape_metrics_df(stats: DataFrame,
                     type_predicate: str = TYPE_PREDICATE) -> DataFrame:
    """S15 as a single-row DataFrame (no driver collect) — the reference's
    COUNT/AVG/MIN/MAX statistics grid (`ShapesExtractor.java:1041-1087`)
    computed straight from the stats table, SQL-oracle-able."""
    rows = stats.withColumn("kind", _constraint_kind(type_predicate))
    pairs = (rows.groupBy("class", "property")
             .agg(F.max(F.when(F.col("support") == F.col("class_count"), 1)
                        ).alias("_min_by_support"),
                  F.max("max_count").alias("_max"),
                  F.count("*").alias("_n"),
                  F.max(F.when(F.col("obj_type") == UNDEFINED_OBJECT_TYPE, 1)
                        ).alias("_undef")))
    pair_agg = pairs.agg(
        F.count("*").alias("property_shapes"),
        F.sum(F.when((F.col("_min_by_support") == 1)
                     | ((F.col("_n") == 1) & (F.col("_undef") == 1)), 1)
              .otherwise(0)).alias("min_count_constraints"),
        F.sum(F.when(F.col("_max") == 1, 1).otherwise(0))
        .alias("max_count_constraints"),
        F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).alias("sh_or_shapes"))
    per_ns = (pairs.groupBy("class").count()
              .agg(F.count("*").alias("node_shapes"),
                   F.round(F.avg("count"), 6).alias("avg_ps_per_ns"),
                   F.min("count").alias("min_ps_per_ns"),
                   F.max("count").alias("max_ps_per_ns")))
    kind_agg = rows.agg(
        F.sum(F.when(F.col("kind") == "class", 1).otherwise(0))
        .alias("class_constraints"),
        F.sum(F.when(F.col("kind") == "datatype", 1).otherwise(0))
        .alias("literal_constraints"),
        F.sum(F.when(F.col("kind") == "nodeKind", 1).otherwise(0))
        .alias("undefined_constraints"))
    return (per_ns.crossJoin(pair_agg).crossJoin(kind_agg)
            .select("node_shapes", "property_shapes", "class_constraints",
                    "literal_constraints", "undefined_constraints",
                    "min_count_constraints", "max_count_constraints",
                    "sh_or_shapes", "avg_ps_per_ns", "min_ps_per_ns",
                    "max_ps_per_ns"))


EXPERIMENTS_GRID_COLS = [
    "COUNT_NS", "COUNT_PS", "COUNT_CC", "COUNT_LC", "COUNT_MCC",
    "AVG_PS", "AVG_CC", "AVG_LC", "AVG_MCC",
    "MIN_PS", "MIN_CC", "MIN_LC", "MIN_MCC",
    "MAX_PS", "MAX_CC", "MAX_LC", "MAX_MCC"]


def experiments_grid_df(nodes: DataFrame, props: DataFrame) -> DataFrame:
    """The reference's 17-stat experiments row (`ExperimentsUtil.java:63-99`,
    `ShapesExtractor.computeShapeStatistics`) evaluated over the SAME
    node/property-shape frames the adjacent TTL renders — each stat mirrors
    one SPARQL file under `src/main/resources/shacl_stats_queries/`:

      COUNT_NS            count/query1: ?s a sh:NodeShape
      COUNT_PS            count/query2: ?s sh:property ?p (PSs linked from
                          a surviving node shape — hence the semi-join)
      COUNT_CC / _LC      count/query3,4: sh:class / sh:datatype triples
                          DIRECTLY on the PS. In the current reference a
                          multi-objType PS holds its class/datatype
                          constraints on sh:or bnode members, which the
                          queries do not traverse, so only single-objType
                          property shapes contribute (shipped artifacts
                          like Output/wdt15/WikiData.csv predate that —
                          their AVG_CC > 1 comes from an older emitter
                          that attached sh:class directly in the sh:or
                          branch; the query files in the tree are direct-
                          only, which is what we implement).
      COUNT_MCC           count/query5: sh:minCount on the PS ("MCC" is
                          the reference's name; the query counts minCount)
      AVG/MIN/MAX_PS      avg|min|max/query1: per-NS property-shape counts
      AVG/MIN/MAX_{CC,LC,MCC}  .../query2-4: per-PS constraint counts over
                          PSs having >= 1 such constraint (SPARQL inner
                          group semantics); -999 when no PS qualifies,
                          exactly the reference's null sentinel
                          (`ShapesExtractor.java` computeShapeStatistics
                          else-branches).

    One-row DataFrame, columns EXPERIMENTS_GRID_COLS; the model is a triple
    SET, so duplicate adds collapse — a PS's direct constraint count is 0/1
    by construction, expressed below as a per-PS count then filter > 0 so
    the plan stays faithful to the grouped SPARQL, not to that accident."""
    ps = props.join(nodes.select("node_shape").distinct(),
                    "node_shape", "left_semi")
    per_ps = ps.select(
        "node_shape",
        F.when((F.col("n_obj_types") == 1)
               & (F.col("constraints")[0]["kind"] == "class"), 1)
        .otherwise(0).alias("cc"),
        F.when((F.col("n_obj_types") == 1)
               & (F.col("constraints")[0]["kind"] == "datatype"), 1)
        .otherwise(0).alias("lc"),
        F.when(F.col("min_count").isNotNull(), 1).otherwise(0).alias("mcc"))

    def _family(col):  # min/avg/max over PSs with >= 1 such constraint
        hit = F.when(F.col(col) > 0, F.col(col))
        return [F.coalesce(F.round(F.avg(hit), 6), F.lit(-999.0))
                .alias(f"AVG_{col.upper()}"),
                F.coalesce(F.min(hit), F.lit(-999)).alias(f"MIN_{col.upper()}"),
                F.coalesce(F.max(hit), F.lit(-999)).alias(f"MAX_{col.upper()}")]

    ps_agg = per_ps.agg(
        F.count("*").alias("COUNT_PS"),
        F.coalesce(F.sum("cc"), F.lit(0)).alias("COUNT_CC"),
        F.coalesce(F.sum("lc"), F.lit(0)).alias("COUNT_LC"),
        F.coalesce(F.sum("mcc"), F.lit(0)).alias("COUNT_MCC"),
        *_family("cc"), *_family("lc"), *_family("mcc"))
    per_ns = (per_ps.groupBy("node_shape").count()
              .agg(F.coalesce(F.round(F.avg("count"), 6), F.lit(-999.0))
                   .alias("AVG_PS"),
                   F.coalesce(F.min("count"), F.lit(-999)).alias("MIN_PS"),
                   F.coalesce(F.max("count"), F.lit(-999)).alias("MAX_PS")))
    ns_agg = nodes.agg(F.countDistinct("node_shape").alias("COUNT_NS"))
    return (ns_agg.crossJoin(ps_agg).crossJoin(per_ns)
            .select(*EXPERIMENTS_GRID_COLS))


def min_cardinality(stats: DataFrame, confidence: float,
                    support: int) -> DataFrame:
    """V3 — min-cardinality experiment (`MinCardinalityExperiment.java:
    182-199`): no rows are pruned; instead each (class, prop, objType)
    gets sh:minCount 1 iff support > S AND confidence > C (the default
    variant `:146-149` uses support == classInstanceCount, which is the
    regular min_count column)."""
    return stats.withColumn(
        "min_count_exp",
        F.when((F.col("support") > support)
               & (F.col("confidence") > confidence), 1).cast("int"))


def shape_metrics(nodes: DataFrame, props: DataFrame) -> dict:
    """S15 — the reference's COUNT/AVG/MIN/MAX statistics grid."""
    n_ns = nodes.count()
    agg = props.select(
        F.count("*").alias("ps"),
        F.sum(F.size(F.filter("constraints",
                              lambda c: c["kind"] == "class"))).alias("cls_c"),
        F.sum(F.size(F.filter("constraints",
                              lambda c: c["kind"] == "datatype"))).alias("lit_c"),
        F.sum(F.size(F.filter("constraints",
                              lambda c: c["kind"] == "nodeKind"))).alias("undef_c"),
        F.sum(F.when(F.col("min_count") == 1, 1).otherwise(0)).alias("min_c"),
        F.sum(F.when(F.col("max_count") == 1, 1).otherwise(0)).alias("max_c"),
        F.sum(F.when(F.col("uses_or"), 1).otherwise(0)).alias("or_c"),
    ).collect()[0]
    per_ns = (props.groupBy("node_shape").count()
              .agg(F.avg("count").alias("avg"), F.min("count").alias("min"),
                   F.max("count").alias("max")).collect()[0])
    return {
        "node_shapes": n_ns,
        "property_shapes": int(agg["ps"] or 0),
        "class_constraints": int(agg["cls_c"] or 0),
        "literal_constraints": int(agg["lit_c"] or 0),
        "undefined_constraints": int(agg["undef_c"] or 0),
        "min_count_constraints": int(agg["min_c"] or 0),
        "max_count_constraints": int(agg["max_c"] or 0),
        "sh_or_shapes": int(agg["or_c"] or 0),
        "avg_ps_per_ns": float(per_ns["avg"] or 0.0),
        "min_ps_per_ns": int(per_ns["min"] or 0),
        "max_ps_per_ns": int(per_ns["max"] or 0),
    }


# ------------------------------------------------------------------ TTL sink

_PREFIXES = (
    "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
    "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
    "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
    f"@prefix qse: <{SHAPES_NAMESPACE}> .\n\n")


# any URI scheme marks an absolute IRI — '://' alone would mangle
# authority-less schemes (urn:, mailto:, did:) into the shapes namespace
# (review finding); same grammar as sources/turtle._ABS_IRI
_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _iri(v: str) -> str:
    return f"<{v}>" if _ABS_IRI.match(v) else f"<{SHAPES_NAMESPACE}{v}>"


def _dtype_iri(label: str) -> str:
    return ("<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>"
            if label == "rdf:langString"
            else f"<http://www.w3.org/2001/XMLSchema#{label.split(':')[1]}>")


def _ttl_escape(v: str) -> str:
    return (v.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r")
            .replace("\t", "\\t"))


def _example_lines(r) -> list[str]:
    if not r.get("examples"):
        return []
    return [f'  <{EXAMPLE_PRED}> "{_ttl_escape(e)}" ;'
            for e in str(r["examples"]).split("\x1f")]


def _python_kind(obj_type: str) -> str:
    """Driver-side twin of _constraint_kind's non-type classification,
    for rendering the type property's or-members."""
    if obj_type in _LITERALS:
        return "datatype"
    if obj_type == UNDEFINED_OBJECT_TYPE:
        return "nodeKind"
    return "class"


def _annotation(c) -> str:
    return (f"<{SHAPES_NAMESPACE.rstrip('/')}/support> "
            f"{int(c['support'])} ; "
            f"<{SHAPES_NAMESPACE.rstrip('/')}/confidence> "
            f"{float(c['confidence']):.6f}")


def _member_body(c, kind: str) -> str:
    if kind == "datatype":
        return (f"sh:datatype {_dtype_iri(c['obj_type'])} ; "
                f"sh:nodeKind sh:Literal")
    if kind == "class":
        return f"sh:class {_iri(c['obj_type'])} ; sh:nodeKind sh:IRI"
    return "sh:nodeKind sh:IRI"


def _prop_block(r) -> str:
    lines = [f"<{r['prop_shape']}> a sh:PropertyShape ;",
             f"  sh:path {_iri(r['path'])} ;"]
    in_cs = [c for c in r["constraints"] if c["kind"] == "in"]
    if not list(r["constraints"]):
        # instance-type PS whose every branch failed the threshold
        # (pruned_shapes' empty-constraints row): sh:in with no
        # annotations, the reference's empty-objTypesSet rendering
        lines.append(f"  sh:in ( {_iri(r['target_class'])} ) ;")
    elif in_cs:
        # instance-type property (ShapesExtractor.java:451-461): the
        # sh:in list holds the TARGET CLASS itself — RDFCollections
        # .asRDF(List.of(subj)) — NOT the branch's obj_type (usually the
        # undefined sentinel, which no instance's rdf:type value ever
        # matches; review finding). Each objType branch annotates the
        # SAME prop shape with its support/confidence pair.
        lines.append(f"  sh:in ( {_iri(r['target_class'])} ) ;")
        for c in in_cs:
            lines.append(f"  {_annotation(c)} ;")
        if len(in_cs) > 1:
            # the reference's numberOfObjectTypes>1 branch (:517-570) has
            # no isInstanceTypeProperty guard, so a multi-objType type
            # property ALSO gets sh:or members, classified per objType
            # like any other property
            ors = " ".join(
                f"[ {_member_body(c, _python_kind(c['obj_type']))} ; "
                f"{_annotation(c)} ]" for c in in_cs)
            lines.append(f"  sh:or ( {ors} ) ;")
    else:
        members = [f"{_member_body(c, c['kind'])} ; {_annotation(c)}"
                   for c in r["constraints"]]
        if len(members) == 1:
            lines.append(f"  {members[0]} ;")
        else:
            ors = " ".join(f"[ {m} ]" for m in members)
            lines.append(f"  sh:or ( {ors} ) ;")
    if r["min_count"] is not None:
        lines.append(f"  sh:minCount {int(r['min_count'])} ;")
    if r["max_count"] is not None:
        lines.append(f"  sh:maxCount {int(r['max_count'])} ;")
    lines.extend(_example_lines(r))
    lines[-1] = lines[-1].rstrip(" ;") + " ."
    return "\n".join(lines) + "\n"


def render_ttl_rows(nodes_props) -> list[str]:
    """Pure renderer: (node_shape_rows, prop_shape_rows[, neg_prop_rows])
    -> Turtle chunks. Negative rows render as sh:not wrapper node shapes
    (`ShapesExtractor.java:805-835`); rows carrying an `examples` string
    get `<http://example.org/example>` annotations (E4)."""
    nodes, props = nodes_props[0], nodes_props[1]
    negs = nodes_props[2] if len(nodes_props) > 2 else []
    # node shape -> its property shapes via sh:property, matching the
    # reference model (ShapesExtractor.java:445 adds SHACL.PROPERTY per
    # prop shape); without the links a SHACL processor has no way to
    # attach the emitted property shapes to their node shape. write_ttl
    # pre-joins the links onto the node rows ("prop_shapes") so sharding
    # never splits a node from its props; direct callers of this renderer
    # fall back to grouping the in-call prop rows.
    by_class: dict[str, list[str]] = {}
    for r in props:
        by_class.setdefault(r["target_class"], []).append(r["prop_shape"])
    chunks = []
    for r in nodes:
        lines = [f"<{r['node_shape']}> a sh:NodeShape ;",
                 f"  sh:targetClass {_iri(r['target_class'])} ;"]
        links = r.get("prop_shapes") or by_class.get(r["target_class"], [])
        lines.extend(f"  sh:property <{ps}> ;" for ps in sorted(links))
        lines.extend(_example_lines(r))
        lines[-1] = lines[-1].rstrip(" ;") + " ."
        chunks.append("\n".join(lines) + "\n")
    for r in props:
        chunks.append(_prop_block(r))
    for r in negs:
        chunks.append(
            f"<{r['node_shape']}> sh:not <{r['not_shape']}> .\n"
            f"<{r['not_shape']}> a sh:NodeShape ;\n"
            f"  sh:property <{r['prop_shape']}> .\n")
        chunks.append(_prop_block(r))
    return chunks


def write_ttl(nodes: DataFrame, props: DataFrame, path: str,
              neg_props: DataFrame | None = None) -> None:
    """Partitioned Turtle sink: every shard is a self-contained TTL document
    (prefix header + shape blocks). Scales with partitions; for small outputs
    coalesce(1) first. `neg_props` (from negative_shapes) renders sh:not
    wrapper blocks."""
    # pre-join each node's sh:property link list onto its own row (left
    # join: a node shape may legitimately have zero surviving prop
    # shapes), so a shard always renders complete node blocks no matter
    # how rows are partitioned — both tables are vocabulary-sized
    links = (props.groupBy("target_class")
             .agg(F.collect_list("prop_shape").alias("prop_shapes")))
    nodes = nodes.join(links, "target_class", "left")
    both = (nodes.select(F.lit("N").alias("k"),
                         F.to_json(F.struct("*")).alias("j"))
            .unionByName(props.select(F.lit("P").alias("k"),
                                      F.to_json(F.struct("*")).alias("j"))))
    if neg_props is not None:
        both = both.unionByName(neg_props.select(
            F.lit("G").alias("k"), F.to_json(F.struct("*")).alias("j")))

    def _render(batches):
        import json as _json
        import pandas as _pd
        ns, ps, gs = [], [], []
        for pdf in batches:
            for k, j in zip(pdf["k"], pdf["j"]):
                d = _json.loads(j)
                d.setdefault("min_count", None)
                d.setdefault("max_count", None)
                (ns if k == "N" else ps if k == "P" else gs).append(d)
        chunks = render_ttl_rows((ns, ps, gs))
        yield _pd.DataFrame({"value": [_PREFIXES + "".join(chunks)]})

    from pyspark.sql.types import StringType, StructField, StructType
    txt = both.mapInPandas(_render, StructType([StructField("value", StringType())]))
    txt.write.mode("overwrite").text(path)


def _parse_ttl_shape_doc(doc: str) -> list[tuple[str, str, str]]:
    """(kind, shape, key) rows from one shapes TTL document. Handles both
    this engine's emitted form (full <IRI>s, standalone `a sh:PropertyShape`
    statements) and the reference's hand/RDF4J-formatted form
    (@prefix-resolved pnames, predicates in any order, inline blank-node
    `sh:property [ sh:path ... ]` groups — e.g.
    /root/reference/validation/example/example_shapes.ttl). Blank-node
    property shapes get the synthetic id `_:<enclosing shape>/<path>`
    (Turtle gives them no stable name; the key column is what P/R needs)."""
    import re as _re

    from .sources.turtle import (_PNAME, mask_string_bodies, ttl_bracket_end,
                                 ttl_prefixes,
                                 ttl_statements as _ttl_statements)

    prefixes = ttl_prefixes(doc)

    def term(tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if ":" in tok:
            p, local = tok.split(":", 1)
            if p in prefixes:
                return prefixes[p] + local
        return tok

    sh_ns = "http://www.w3.org/ns/shacl#"
    iri_or_pname = r"(<[^>]+>|" + _PNAME + r")"
    # SHACL predicates are matched through the document's OWN prefix
    # declarations (any label bound to the SHACL namespace, or the full
    # <IRI> form) — a doc binding e.g. shx: to the shacl ns parses
    # identically (round-4 review). 'sh' stays as a fallback label for
    # prefix-less test fragments.
    sh_labels = sorted({p for p, iri in prefixes.items() if iri == sh_ns}
                       | ({"sh"} if not prefixes else set()))

    def sh_pred(local: str) -> str:
        alts = [_re.escape(f"{p}:{local}") for p in sh_labels]
        alts.append(_re.escape(f"<{sh_ns}{local}>"))
        return "(?:" + "|".join(alts) + ")"

    tc_re = _re.compile(sh_pred("targetClass") + r"\s+" + iri_or_pname)
    path_re = _re.compile(sh_pred("path") + r"\s+" + iri_or_pname)
    prop_re = _re.compile(sh_pred("property") + r"\s+\[")
    rows = []
    for stmt in _ttl_statements(doc):
        if stmt.startswith("@prefix"):
            continue
        # ALL regex extraction runs over the string-MASKED statement:
        # example annotations carry raw transcript text, so a literal
        # like "user wrote: sh:path <http://evil/x>" must never inject
        # shape keys (round-4 review finding). Masking is same-length, so
        # bracket-scan indices stay valid, and every captured token is by
        # construction outside string literals (identical in both texts).
        mstmt = mask_string_bodies(stmt)
        m = _re.match(iri_or_pname, mstmt)
        if not m:
            continue
        subj = term(m.group(1))
        types = {term(t) for t in
                 _re.findall(r"\ba\s+" + iri_or_pname, mstmt)}
        if sh_ns + "NodeShape" in types:
            for t in tc_re.findall(mstmt):
                rows.append(("NS", subj, term(t)))
            # inline blank-node property shapes: [ ... sh:path X ... ]
            for pm in prop_re.finditer(mstmt):
                i = ttl_bracket_end(mstmt, pm.end())
                body = mstmt[pm.end():i - 1]
                for t in path_re.findall(body):
                    rows.append(("PS", f"_:{subj}/{term(t)}", term(t)))
        if sh_ns + "PropertyShape" in types:
            for t in path_re.findall(mstmt):
                rows.append(("PS", subj, term(t)))
    return rows


def read_ttl_shapes(spark, path: str) -> DataFrame:
    """Parse a shapes TTL (as emitted by write_ttl, or the reference's
    formatter for the same subset) back into shape-key rows:

        (kind 'NS'|'PS', shape, key)   key = sh:targetClass | sh:path IRI

    This is what PrecisionRecallComputer.java:29-141 extracts from the two
    input files via SPARQL (query_node_shapes.txt / query_property_shapes
    .txt) before computing P/R — so precision_recall(read_ttl_shapes(A),
    read_ttl_shapes(B)) compares this engine's output against a
    reference-emitted .ttl directly (prefixed names and inline blank-node
    property shapes included — see _parse_ttl_shape_doc). Parsing is
    Arrow-batched per shard (shards are whole Turtle documents; shape sets
    are vocabulary-sized)."""
    import pandas as _pd
    from pyspark.sql.types import StringType, StructField, StructType

    raw = spark.read.text(path, wholetext=True)

    def _parse(batches):
        for pdf in batches:
            rows = []
            for doc in pdf["value"]:
                rows.extend(_parse_ttl_shape_doc(doc))
            yield _pd.DataFrame(rows, columns=["kind", "shape", "key"])

    schema = StructType([StructField("kind", StringType()),
                         StructField("shape", StringType()),
                         StructField("key", StringType())])
    return raw.mapInPandas(_parse, schema).distinct()


# ----------------------------------------------------------- P/R (V1 parity)

def precision_recall(a_keys: DataFrame, b_keys: DataFrame) -> dict:
    """P/R of B against baseline A over arbitrary key DataFrames (same
    schema). Mirrors PrecisionRecallComputer.java:105-141:
    P = |A∩B|/|B|, R = |A∩B|/|A|. The key sets are consumed twice
    (intersect + count); localCheckpoint materializes them without the
    never-unpersisted cache() leak a repeated-call sweep would pile up
    (blocks are ContextCleaner-collected when unreachable)."""
    from .pins import release_df
    a = a_keys.distinct().localCheckpoint(eager=True)
    b = b_keys.distinct().localCheckpoint(eager=True)
    inter = a.intersect(b).count()
    na, nb = a.count(), b.count()
    # fully consumed above -> release the blocks before returning instead
    # of waiting on the ContextCleaner (no-orphaned-cache contract)
    release_df(a)
    release_df(b)
    return {"precision": inter / nb if nb else 1.0,
            "recall": inter / na if na else 1.0,
            "intersection": inter, "a": na, "b": nb}
