"""Extraction: exact parity with the gold per-turn triples, normalization
parity between the scalar and vectorized implementations, and the
input_hint invariant (per-turn output equality under stable ordering)."""

from __future__ import annotations

import duckdb
import pandas as pd

from qse_spark.operators.extraction import (_norm_series, extract_triples,
                                            mentions_from_triples)
from qse_spark.textnorm import normalize_surface


def test_extraction_matches_gold_exactly(spark, fixture_dir):
    tr = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    got = set(map(tuple, extract_triples(tr).collect()))
    gold = set(map(tuple, duckdb.sql(
        f"SELECT * FROM read_parquet('{fixture_dir}/gold_triples_raw.parquet')"
    ).fetchall()))
    assert got == gold


def test_extraction_partition_invariant(spark, fixture_dir):
    """Same triples regardless of salting / partitioning (per-turn purity)."""
    tr = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    a = sorted(map(tuple, extract_triples(tr, salt=0).collect()))
    b = sorted(map(tuple, extract_triples(tr.repartition(7), salt=13).collect()))
    assert a == b


def test_per_turn_text_equality(spark, fixture_dir):
    """input_hint invariant: reading under stable (conv_id, turn_idx)
    ordering reproduces the exact per-turn texts."""
    tr = (spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
          .orderBy("conv_id", "turn_idx").toPandas())
    exp = duckdb.sql(
        f"SELECT conv_id, turn_idx, text FROM "
        f"read_parquet('{fixture_dir}/transcripts.parquet') "
        f"ORDER BY conv_id, turn_idx").df()
    assert list(tr["text"]) == list(exp["text"])
    assert not tr.duplicated(["conv_id", "turn_idx"]).any()


def test_norm_parity_vectorized_vs_scalar():
    samples = ["Dr Alice Smith", "ACME  Corp.", "a-b_c.d", " x  y ",
               "Plain", "foo.bar-baz", "Tool_name", "A.B. Corp"]
    vec = _norm_series(pd.Series(samples)).tolist()
    assert vec == [normalize_surface(s) for s in samples]


def test_mentions_exclude_class_labels(spark, fixture_dir):
    tr = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    m = {r["mention_id"]
         for r in mentions_from_triples(extract_triples(tr)).collect()}
    assert "Person" not in m and "Company" not in m and "Employee" not in m
    assert len(m) > 0


def test_garbage_and_empty_rows(spark):
    rows = [("c", 0, "", ), ("c", 1, None), ("c", 2, "no template at all"),
            ("c", 3, "nächste schritte — 了解 ✨")]
    tr = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    assert extract_triples(tr).count() == 0


def test_fused_extract_groups_equals_staged(spark, fixture_dir):
    from qse_spark.operators.extraction import (extract_triple_groups,
                                                extract_triples)
    from qse_spark.pipeline import group_triples
    tr = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    fused = sorted(map(tuple, extract_triple_groups(tr).collect()))
    staged = sorted(map(tuple,
                        group_triples(extract_triples(tr)).collect()))
    assert fused == staged and len(fused) > 0


def test_fused_groups_weight_repeated_texts(spark):
    """The fused path extracts once per DISTINCT text inside a batch and
    weights by multiplicity — cnt must equal the occurrence count, and
    distinct alias spellings must still collapse post-normalization."""
    from qse_spark.operators.extraction import extract_triple_groups
    rows = ([("c", i, "Ada Lovelace works at Initech.") for i in range(5)]
            + [("c", 10, "ADA LOVELACE works at Initech.")]
            + [("c", 11, "Bob is 44 years old.")])
    tr = (spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
          .coalesce(1))
    got = {(r.subject, r.predicate, r.object, r.obj_kind): r.cnt
           for r in extract_triple_groups(tr).collect()}
    assert got[("ada_lovelace", "worksAt", "initech", "iri")] == 6
    assert got[("bob", "age", "44", "integer")] == 1


def test_template_anchor_is_exact_sentence(spark):
    """The extraction grammar anchors a template to the EXACT turn text:
    RE2's `$` (unlike Python re's) does not match before a trailing
    newline, so decorated turns do not extract. Pins the mapInArrow
    rewrite's semantics: a template claims a turn iff the whole text IS
    the sentence."""
    rows = [("c", 0, "bela rivon works at acme corp."),          # exact: yes
            ("c", 1, "bela rivon works at acme corp.\n"),        # trailing \n
            ("c", 2, " bela rivon works at acme corp."),         # leading sp
            ("c", 3, "ps: bela rivon works at acme corp.")]      # prefix
    tr = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    got = extract_triples(tr).collect()
    assert {r["turn_idx"] for r in got} == {0}
    assert {(r["predicate"], r["object"]) for r in got} == {
        ("worksAt", "acme_corp"),
        ("rdf:type", "Person"),
        ("rdf:type", "Company")}


def test_needle_hit_regex_miss_does_not_consume(spark):
    """A turn containing a template's needle but failing its regex must
    stay 'alive' for later templates (the alive-mask shrink is per-MATCH,
    not per-gate): ' works at ' gates template 1, whose regex rejects the
    digits, and the turn then matches nothing — while a genuine later-
    template turn with an earlier needle substring still extracts."""
    rows = [("c", 0, "agent 7 works at 9 pm."),       # needle yes, match no
            ("c", 1, "search_web returned status 200.")]
    tr = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    got = extract_triples(tr).collect()
    assert {r["turn_idx"] for r in got} == {1}
    assert {(r["subject"], r["predicate"]) for r in got} == {
        ("search_web", "returnedStatus"),
        ("search_web", "rdf:type")}


def test_salt_spreads_giant_conversation(spark):
    """The north rule's conversation-salted repartition must actually
    SPREAD one giant conversation across partitions (the whole point of
    the salt: a hot conv_id cannot pin a single task), while salt=0
    leaves the input partitioning alone."""
    from pyspark.sql import functions as F

    from qse_spark.operators.extraction import _salted

    giant = spark.createDataFrame(
        [("conv-hot", i, "user", f"Person{i} is {20 + i % 50} years old.",
          None, None) for i in range(20_000)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    n_parts = (_salted(giant, salt=8)
               .select(F.spark_partition_id().alias("p"))
               .distinct().count())
    assert n_parts >= min(8, spark.sparkContext.defaultParallelism) // 2, \
        f"giant conversation still pinned to {n_parts} partition(s)"


def test_named_group_rewrite_is_escape_aware():
    """_named converts only REAL capturing groups: a regex-escaped
    literal `\\(` must pass through untouched, and an escaped backslash
    before a real group must not mask it (round-4 review finding: the
    blind `\\((?!\\?)` sub corrupted any template with a literal
    paren)."""
    from qse_spark.operators.extraction import _named
    assert _named(r"^(a) \((b)\)$") == r"^(?P<g1>a) \((?P<g2>b)\)$"
    assert _named(r"(x)(?:y)(z)") == "(?P<g1>x)(?:y)(?P<g2>z)"
    assert _named(r"\\(q)") == r"\\(?P<g1>q)"
    # every existing template still compiles and keeps its group count
    import re as _re

    from qse_spark.operators.extraction import TEMPLATES
    for t in TEMPLATES:
        rx = t[2]
        named = _named(rx)
        assert _re.compile(named).groups == _re.compile(rx).groups
