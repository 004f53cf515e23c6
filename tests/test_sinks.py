"""S17 CSV/PSV sinks — roundtrip checks against the reference formats
(Utility.writeClassFrequencyInFile / writeSupportToFile, Utils.logTime)."""

from __future__ import annotations

import csv

from pyspark.sql import functions as F

from qse_spark import sinks
from qse_spark.stats import class_counts_df, entity_types_df, shape_stats

TRIPLES = [
    ("e1", "rdf:type", "A", "iri"),
    ("e2", "rdf:type", "A", "iri"),
    ("e3", "rdf:type", "B", "iri"),
    ("e1", "p", "x", "string"),
    ("e2", "p", "y", "string"),
    ("e3", "p", "7", "integer"),
]


def _triples(spark):
    return spark.createDataFrame(
        TRIPLES, ["subject", "predicate", "object", "obj_kind"])


def test_class_frequency_csv(spark, tmp_path):
    cc = class_counts_df(entity_types_df(_triples(spark)))
    p = sinks.write_class_frequency(cc, str(tmp_path / "classFrequency.csv"))
    with open(p) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Class", "Frequency"]
    assert rows[1:] == [["A", "2"], ["B", "1"]]


def test_shape_support_psv_roundtrip(spark, tmp_path):
    st = shape_stats(_triples(spark))
    p = sinks.write_shape_support_psv(st, str(tmp_path / "props.psv"))
    with open(p) as f:
        got = [ln.rstrip("\n").split("|") for ln in f]
    exp = sorted(
        (r["class"], r["property"], r["obj_type"], str(r["support"]),
         str(r["class_count"])) for r in st.collect())
    assert [tuple(r) for r in got] == exp
    assert all(len(r) == 5 for r in got)


def test_shape_support_psv_sampled_emits_sampled_count(spark, tmp_path):
    """In sampled mode the reference's last PSV column is
    sampledEntitiesPerClass.get(...).size() (Utility.java:104) — the
    SAMPLED class size, not the full count approx_shape_stats keeps in
    class_count for confidence adjustment."""
    from qse_spark.operators.sampling import approx_shape_stats
    st = approx_shape_stats(_triples(spark), max_cap=1, target_pct=100.0)
    p = sinks.write_shape_support_psv(st, str(tmp_path / "props.psv"))
    with open(p) as f:
        got = [ln.rstrip("\n").split("|") for ln in f]
    exp = sorted(
        (r["class"], r["property"], r["obj_type"], str(r["support"]),
         str(r["sampled_class_count"] if r["sampled_class_count"]
             is not None else r["class_count"]))
        for r in st.collect())
    assert [tuple(r) for r in got] == exp
    # max_cap=1 actually bites: at least one sampled size < full count
    assert any(r["sampled_class_count"] is not None
               and r["sampled_class_count"] < r["class_count"]
               for r in st.collect())


def test_shape_metrics_csv_appends_grid(spark, tmp_path):
    from qse_spark.shapes import (experiments_grid_df, node_shapes,
                                  property_shapes)
    st = shape_stats(_triples(spark))
    m = experiments_grid_df(node_shapes(st), property_shapes(st))
    p = str(tmp_path / "dataset.csv")
    sinks.write_shape_metrics_csv(m, p, "fixture")                  # default
    sinks.write_shape_metrics_csv(m, p, "fixture", 0.25, 100)       # grid pt
    with open(p) as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("DATASET,Confidence,Support,COUNT_NS,")
    assert lines[0].endswith(",")     # the reference comma-terminates rows
    assert len(lines) == 3                        # header written only once
    assert lines[1].startswith("fixture, > 1.0%, > 1.0,")
    assert lines[2].startswith("fixture, > 25.0%, > 100,")
    assert all(ln.endswith(",") for ln in lines[1:])
    n_cols = len(lines[0].split(","))
    assert n_cols == 3 + 17 + 1       # DATASET,Conf,Supp + 17 stats + ''
    assert all(len(ln.split(",")) == n_cols for ln in lines[1:])


def test_reference_output_directory(spark, tmp_path):
    """write_reference_outputs assembles the reference's Output/ layout:
    TTLs readable back through read_ttl_shapes, the experiments CSV with
    one default + one row per grid point, classFrequency and the PSV."""
    import os

    from qse_spark.shapes import read_ttl_shapes
    st = shape_stats(_triples(spark))
    cc = class_counts_df(entity_types_df(_triples(spark)))
    paths = sinks.write_reference_outputs(
        st, cc, str(tmp_path / "Output"), "fixture", grid=[(0.5, 1)])
    assert set(paths) == {"QSE_FULL", "QSE_0.5_1", "metrics", "stacked",
                          "classFrequency", "shape_props"}
    assert all(os.path.exists(p) for p in paths.values())
    full = read_ttl_shapes(spark, paths["QSE_FULL"])
    assert full.count() > 0
    pruned = read_ttl_shapes(spark, paths["QSE_0.5_1"])
    assert 0 < pruned.count() <= full.count()
    with open(paths["metrics"]) as f:
        lines = f.read().splitlines()
    assert len(lines) == 3 and lines[2].startswith("fixture, > 50.0%, > 1,")


def test_reference_outputs_sampled_mode(spark, tmp_path):
    """sampled=True must prune with the relative-support rule over
    approx stats (sampled_*_count columns) — the absolute rule would
    throw on missing columns only at analysis time, so assert the TTL
    actually renders and carries shape rows."""
    import os

    from qse_spark.operators.sampling import approx_shape_stats
    from qse_spark.shapes import read_ttl_shapes
    st = approx_shape_stats(_triples(spark), max_cap=10, target_pct=100.0)
    cc = class_counts_df(entity_types_df(_triples(spark)))
    paths = sinks.write_reference_outputs(
        st, cc, str(tmp_path / "Out"), "fx", grid=[(0.0, 1)], sampled=True)
    assert os.path.exists(paths["QSE_0.0_1"])
    assert read_ttl_shapes(spark, paths["QSE_0.0_1"]).count() > 0


def test_precision_recall_csv(spark, tmp_path):
    """Reference-format P/R row: exact vs pruned shape sets; pruning only
    removes shapes, so precision must be 1.0 and recall <= 1.0."""
    from qse_spark.shapes import node_shapes, property_shapes, pruned_shapes
    st = shape_stats(_triples(spark))
    ns_a, ps_a = node_shapes(st), property_shapes(st)
    ns_b, ps_b = pruned_shapes(st, 0.5, 1)
    p = sinks.write_precision_recall_csv(
        str(tmp_path / "pr.csv"), "QSE_FULL", "QSE_0.5_1",
        ns_a, ps_a, ns_b, ps_b, confidence=0.5, support=1)
    with open(p) as f:
        header, row = f.read().splitlines()
    assert header.startswith("File_A, File_B, Confidence, Support, NS,")
    cells = [c.strip() for c in row.split(",")]
    assert cells[0] == "QSE_FULL" and cells[1] == "QSE_0.5_1"
    assert float(cells[8]) == 1.0 and float(cells[10]) == 1.0  # precision
    assert float(cells[9]) <= 1.0 and float(cells[11]) <= 1.0  # recall


def test_runtime_and_sampling_logs(tmp_path):
    p = str(tmp_path / "RUNTIME_LOGS.csv")
    sinks.append_runtime_log(p, "ds", "firstPhase", 130, 130, True, "/d")
    sinks.append_runtime_log(p, "ds", "secondPhase", 70, 200, True, "/d")
    with open(p) as f:
        lines = f.read().splitlines()
    assert lines == ["ds,firstPhase,130,2,130,2,True,/d",
                     "ds,secondPhase,70,1,200,3,True,/d"]
    s = str(tmp_path / "SAMPLING_LOGS.csv")
    sinks.append_sampling_log(s, "reservoir", 50, 1, 100, 1234)
    assert open(s).read() == "reservoir,50,1,100,1234\n"


def _ttl_text(path):
    """Concatenate every shard of a partitioned TTL output."""
    import os

    chunks = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.startswith((".", "_")):
                continue
            with open(os.path.join(root, f)) as fh:
                chunks.append(fh.read())
    return "\n".join(chunks)


def test_sampled_shnot_uses_relative_rule(spark, tmp_path):
    """write_reference_outputs(sampled=True, sh_not=True) prunes sh:not
    wrappers with the reference's RELATIVE complement rule
    (negativePruning, ShapesExtractor.java:400-404), not the absolute
    one (round-4 review finding: sampled= was not forwarded to
    negative_shapes). Ratios here are 0.5, so at (C=0.5, S=100) a
    conf<=C row with support 60 sits between S*ratio=50 and S=100 —
    excluded relatively, included absolutely."""
    xsd_s = "xsd:string"
    rows = [
        # positive keeper: conf .9 > .5 and 80 > 100*0.5
        ("http://ex/C", "http://ex/keep", xsd_s, 80, 0.9, 200, 100, 100, 100),
        # in sh:not under BOTH rules: 10 < 50
        ("http://ex/C", "http://ex/relonly", xsd_s, 10, 0.1, 200, 100, 100, 100),
        # the discriminator: 60 >= 50 (rel. excluded), 60 < 100 (abs. kept)
        ("http://ex/C", "http://ex/absonly", xsd_s, 60, 0.1, 200, 100, 100, 100),
    ]
    st = spark.createDataFrame(
        rows, "class string, property string, obj_type string, "
        "support long, confidence double, class_count long, "
        "sampled_class_count long, prop_count long, sampled_prop_count long")
    cc = st.select("class", "class_count").distinct()
    paths = sinks.write_reference_outputs(
        st, cc, str(tmp_path / "Out"), "fx", grid=[(0.5, 100)],
        sampled=True, sh_not=True)
    ttl = _ttl_text(paths["QSE_0.5_100"])
    assert "relonlyC_PS_NotShape" in ttl
    assert "absonlyC_PS_NotShape" not in ttl
    assert "keepCShapeProperty" in ttl


def test_grid_ttl_matches_pruned_spine_with_type_ps(spark, tmp_path):
    """Each grid TTL renders exactly the pruned_shapes spine — including
    the empty-constraints instance-type PS reconstruction (round-4
    review finding: the sink rebuilt ns/ps without it, so a class whose
    every type branch fails the confidence threshold lost its type PS
    in the artifact while keeping it in the P/R spine)."""
    from qse_spark.constants import TYPE_PREDICATE
    from qse_spark.shapes import pruned_shapes, read_ttl_shapes
    xsd_s = "xsd:string"
    rows = [
        # the class's ONLY type branch fails C=0.5 (conf 0.4)
        ("http://ex/D", TYPE_PREDICATE, "http://ex/D", 8, 0.4, 20),
        # a regular property that survives (0.9 > 0.5, 18 > 10)
        ("http://ex/D", "http://ex/q", xsd_s, 18, 0.9, 20),
    ]
    st = spark.createDataFrame(
        rows, "class string, property string, obj_type string, "
        "support long, confidence double, class_count long")
    cc = st.select("class", "class_count").distinct()
    paths = sinks.write_reference_outputs(
        st, cc, str(tmp_path / "Out"), "fx", grid=[(0.5, 10)])
    got = read_ttl_shapes(spark, paths["QSE_0.5_10"]).collect()
    got_ps = {r.key for r in got if r.kind == "PS"}
    got_ns = {r.key for r in got if r.kind == "NS"}
    st_f = (st.withColumn("min_count", F.lit(None).cast("int"))
            .withColumn("max_count", F.lit(None).cast("int")))
    ns, ps = pruned_shapes(st_f, 0.5, 10)
    assert got_ns == {r.target_class for r in ns.collect()}
    assert got_ps == {r.path for r in ps.collect()}
    # non-vacuous: the reconstructed type PS is present in BOTH
    assert TYPE_PREDICATE in got_ps
