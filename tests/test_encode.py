"""S4 dictionary encoding (StringEncoder.java:19-28 semantics: a stable
String<->id bijection; id ORDER deliberately differs — SURVEY §2 S4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qse_spark.operators.encode import (decode_column, encode_column,
                                        string_dictionary)


def _triples(spark):
    return spark.createDataFrame(
        [("a", "rdf:type", "Person"), ("a", "name", "Alice"),
         ("b", "rdf:type", "Person"), ("b", "knows", "a")],
        ["subject", "predicate", "object"])


def test_sorted_dictionary_dense_and_deterministic(spark):
    t = _triples(spark)
    d = string_dictionary(t, "predicate", method="sorted").collect()
    assert {(r["id"], r["value"]) for r in d} == {
        (0, "knows"), (1, "name"), (2, "rdf:type")}


def test_hash_dictionary_bijective(spark):
    t = _triples(spark)
    d = string_dictionary(t, "object", method="hash")
    assert d.count() == d.select("id").distinct().count() == 3


def test_encode_decode_roundtrip(spark):
    t = _triples(spark)
    for method in ("hash", "sorted"):
        d = string_dictionary(t, "predicate", method=method)
        enc = encode_column(t, "predicate", d)
        assert dict(enc.dtypes)["predicate"] == "bigint"
        dec = decode_column(enc, "predicate", d)
        assert (sorted(map(tuple, dec.select(*t.columns).collect()))
                == sorted(map(tuple, t.collect())))


def test_encoded_kernel_matches_string_kernel(spark):
    """Encoding subject/predicate/object and decoding back is transparent
    to the stats kernel (nothing downstream depends on id order)."""
    from qse_spark.stats import shape_stats
    t = spark.createDataFrame(
        [("a", "rdf:type", "Person", "iri"), ("a", "age", "34", "integer"),
         ("b", "rdf:type", "Person", "iri"), ("b", "age", "35", "integer")],
        ["subject", "predicate", "object", "obj_kind"])
    base = sorted(map(tuple, shape_stats(t).collect()))
    d = string_dictionary(t, "subject", method="hash")
    roundtrip = decode_column(encode_column(t, "subject", d), "subject", d)
    got = sorted(map(tuple, shape_stats(roundtrip.select(*t.columns)).collect()))
    assert got == base
