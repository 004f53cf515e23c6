"""Approximate mode (A1-A6): cap formula, determinism under repartitioning,
bully bias, Bernoulli rate, sampling-adjusted stats invariants, relative-
support pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from qse_spark.operators.sampling import (approx_shape_stats,
                                          bernoulli_sample_entities,
                                          dynamic_caps, prune_sampled,
                                          sample_entity_classes)
from qse_spark.stats import class_counts_df, entity_types_df, shape_stats


def _etypes(spark, fixture_dir):
    gold = spark.read.parquet(f"{fixture_dir}/gold_triples.parquet")
    return entity_types_df(gold).cache()


def test_dynamic_caps_formula(spark, fixture_dir):
    cc = class_counts_df(_etypes(spark, fixture_dir))
    caps = {r["class"]: r["cap"]
            for r in dynamic_caps(cc, max_cap=10, target_pct=50).collect()}
    counts = {r["class"]: r["class_count"] for r in cc.collect()}
    import math
    for c, n in counts.items():
        assert caps[c] == min(10, math.ceil(0.5 * n))


def test_sample_respects_caps_and_is_deterministic(spark, fixture_dir):
    et = _etypes(spark, fixture_dir)
    caps = dynamic_caps(class_counts_df(et), max_cap=5, target_pct=100)
    s1 = sorted(map(tuple, sample_entity_classes(et, caps, seed=100).collect()))
    s2 = sorted(map(tuple, sample_entity_classes(
        et.repartition(13), caps, seed=100).collect()))
    assert s1 == s2                      # partition-invariant
    per_class = {}
    for _, c in s1:
        per_class[c] = per_class.get(c, 0) + 1
    assert all(v <= 5 for v in per_class.values())
    s3 = sorted(map(tuple, sample_entity_classes(et, caps, seed=7).collect()))
    assert s1 != s3                      # seed actually matters


def test_bully_prefers_multiclass(spark, fixture_dir):
    et = _etypes(spark, fixture_dir)
    caps = dynamic_caps(class_counts_df(et), max_cap=3, target_pct=100)
    scope = {r["entity"]: r["n"] for r in
             et.groupBy("entity").agg(F.count("*").alias("n")).collect()}
    bully = sample_entity_classes(et, caps, seed=100, bully=True).collect()
    plain = sample_entity_classes(et, caps, seed=100, bully=False).collect()
    avg_b = sum(scope[r["entity"]] for r in bully) / len(bully)
    avg_p = sum(scope[r["entity"]] for r in plain) / len(plain)
    assert avg_b >= avg_p                # bias toward high-scope entities


def test_bernoulli_rate_and_consistency(spark, fixture_dir):
    et = _etypes(spark, fixture_dir)
    s = bernoulli_sample_entities(et, pct=30, seed=100)
    ents_all = et.select("entity").distinct().count()
    ents_s = s.select("entity").distinct().count()
    assert 0.15 < ents_s / ents_all < 0.45
    # entity-consistent: an entity is in or out with ALL its classes
    per_ent = (s.groupBy("entity").count()
               .join(et.groupBy("entity").count()
                     .withColumnRenamed("count", "total"), "entity"))
    assert per_ent.filter("count <> total").count() == 0
    # pct=100 keeps EVERYTHING (review finding: the 256-bucket threshold
    # used to format as 3-char '100' and the 2-char hex comparison went
    # lexicographic-wrong, silently keeping ~6.6%); pct=99.9 also lands
    # in the keep-all bucket and pct=0 keeps nothing
    assert bernoulli_sample_entities(et, pct=100).count() == et.count()
    assert bernoulli_sample_entities(et, pct=99.9).count() == et.count()
    assert bernoulli_sample_entities(et, pct=0).count() == 0


def test_approx_stats_invariants_and_convergence(spark, fixture_dir):
    gold = spark.read.parquet(f"{fixture_dir}/gold_triples.parquet")
    ap = approx_shape_stats(gold, max_cap=10 ** 6, target_pct=100.0).toPandas()
    assert (ap["support"] <= ap["sampled_class_count"]).all()
    assert ((ap["confidence"] > 0) & (ap["confidence"] <= 1)).all()
    # pct=100, uncapped -> sample == population -> approx == exact
    exact = shape_stats(gold).toPandas()
    a = ap[["class", "property", "obj_type", "support"]] \
        .sort_values(["class", "property", "obj_type"]).reset_index(drop=True)
    e = exact[["class", "property", "obj_type", "support"]] \
        .sort_values(["class", "property", "obj_type"]).reset_index(drop=True)
    assert a.equals(e)


def test_relative_support_pruning(spark, fixture_dir):
    gold = spark.read.parquet(f"{fixture_dir}/gold_triples.parquet")
    ap = approx_shape_stats(gold, max_cap=5, target_pct=100.0).cache()
    full = ap.count()
    kept = prune_sampled(ap, confidence=0.0, support=100).count()
    assert 0 < kept <= full
    # S == 1 edge: everything with conf > 0 survives
    assert prune_sampled(ap, confidence=0.0, support=1).count() == full


def test_approx_vs_exact_shape_pr(spark, fixture_dir):
    """The reference's headline experiment (WikiData_PrecisionRecall.csv:
    NS P/R 1.00/1.00, PS P/R 1.00/0.94 at reservoir 1000 / pct 100):
    approximate shape sets against exact ones. Sampling can only OMIT
    constraint rows (every sampled observation is a real observation), so
    precision must be exactly 1.0; dynamic caps keep >=1 entity per class,
    so node-shape recall must be exactly 1.0; property-shape recall
    degrades gracefully with the sample (criterion mirrors the
    reference's 0.9 ballpark)."""
    gold = spark.read.parquet(f"{fixture_dir}/gold_triples.parquet").drop("cnt")
    exact = shape_stats(gold).cache()
    approx = approx_shape_stats(gold, max_cap=200, target_pct=50.0,
                                seed=100, bully=False).cache()
    exact_ns = {r["class"] for r in exact.select("class").distinct().collect()}
    approx_ns = {r["class"] for r in approx.select("class").distinct().collect()}
    assert approx_ns == exact_ns                      # NS P/R 1.00 / 1.00
    exact_ps = {(r["class"], r["property"], r["obj_type"])
                for r in exact.collect()}
    approx_ps = {(r["class"], r["property"], r["obj_type"])
                 for r in approx.collect()}
    assert approx_ps <= exact_ps                      # PS precision 1.00
    recall = len(approx_ps & exact_ps) / len(exact_ps)
    assert recall >= 0.9, recall


def test_negative_sampled_relative_rule(spark):
    """negativePruning (ShapesExtractor.java:400-404) applies the SAME
    relative-support scaling as the positive side when sampling is on:
    support < S * min(sampledPropCount/propCount, sampledClassCount/
    classCount). A branch with support 50 under S=100 and a 10% sample
    (relative threshold 10) is NOT negative — the absolute rule
    wrongly flagged it (review finding)."""
    from qse_spark.operators.sampling import negative_sampled

    rows = [
        # support 50 >= relative 10 -> kept out of the complement
        ("A", "p", "T", 50, 0.2, 1000, 100, 5000, 500),
        # support 5 < relative 10 -> negative
        ("A", "q", "T", 5, 0.2, 1000, 100, 5000, 500),
        # conf above C -> never negative regardless of support
        ("A", "r", "T", 5, 0.9, 1000, 100, 5000, 500),
    ]
    cols = ["class", "property", "obj_type", "support", "confidence",
            "prop_count", "sampled_prop_count",
            "class_count", "sampled_class_count"]
    df = spark.createDataFrame(rows, cols)
    neg = df.filter(negative_sampled(0.5, 100))
    assert [r["property"] for r in neg.collect()] == ["q"]
    # S == 1 stays absolute: support < 1 keeps nothing observed
    assert df.filter(negative_sampled(0.5, 1)).count() == 0
