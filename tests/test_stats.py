"""Stats-kernel correctness: DuckDB oracle equality + QSE invariants on a
hand-crafted micro-fixture covering every FIXTURES.md §6 edge case."""

from __future__ import annotations

import duckdb

from conftest import assert_frames_match

from qse_spark.constants import UNDEFINED_OBJECT_TYPE
from qse_spark.oracles import TPCH_TRIPLES_SQL, shape_stats_sql
from qse_spark.stats import prune, shape_stats

# micro KG: e1,e2 in class A; e2 also in B (multi-class); o1 typed C;
# o2 untyped (undefined); e1 has p twice (maxCount defeat); every A has q
# (minCount); literal kinds
MICRO = [
    ("e1", "rdf:type", "A", "iri"),
    ("e2", "rdf:type", "A", "iri"),
    ("e2", "rdf:type", "B", "iri"),
    ("o1", "rdf:type", "C", "iri"),
    ("e1", "p", "o1", "iri"),
    ("e1", "p", "o2", "iri"),          # o2 unknown -> undefined
    ("e2", "p", "o1", "iri"),
    ("e1", "q", "5", "integer"),
    ("e2", "q", "x", "string"),
    ("e2", "r", "hi@fr", "langString"),
]
COLS = ["subject", "predicate", "object", "obj_kind"]


def _micro_df(spark):
    return spark.createDataFrame(MICRO, COLS)


def test_micro_kernel_vs_duckdb(spark):
    got = shape_stats(_micro_df(spark)).toPandas()
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(MICRO, columns=COLS))
    exp = con.sql(shape_stats_sql("t")).df()
    assert_frames_match(got, exp)


def test_micro_semantics(spark):
    rows = {(r["class"], r["property"], r["obj_type"]):
            r for r in shape_stats(_micro_df(spark)).collect()}
    # support fan-out: (A, p, C) supported by e1 and e2
    assert rows[("A", "p", "C")]["support"] == 2
    # undefined sentinel for unknown object
    assert rows[("A", "p", UNDEFINED_OBJECT_TYPE)]["support"] == 1
    # multi-class fan-out: e2's constraints also count under B
    assert rows[("B", "p", "C")]["support"] == 1
    # confidence = support / class_count
    assert rows[("A", "p", "C")]["confidence"] == 1.0
    assert rows[("A", "q", "xsd:integer")]["confidence"] == 0.5
    # minCount=1 iff support == class_count
    assert rows[("A", "p", "C")]["min_count"] == 1
    assert rows[("A", "q", "xsd:integer")]["min_count"] is None
    # maxCount exists-semantics: e1 uses p 3x (2 triples, one fans to C +
    # one undefined... counts 2+... ) but e2 uses p once -> flag set
    assert rows[("A", "p", "C")]["max_count"] == 1
    # e1's q count == 1 and e2's q count == 1 -> maxCount
    assert rows[("A", "q", "xsd:integer")]["max_count"] == 1
    # langString tagging
    assert ("B", "r", "rdf:langString") in rows


def test_invariants(spark, fixture_dir):
    gold = spark.read.parquet(f"{fixture_dir}/gold_triples.parquet")
    st = shape_stats(gold).toPandas()
    assert (st["support"] > 0).all()
    assert (st["support"] <= st["class_count"]).all()
    assert ((st["confidence"] > 0) & (st["confidence"] <= 1.0)).all()
    mc = st[st["min_count"].notna()]
    assert (mc["support"] == mc["class_count"]).all()


def test_prune_threshold_edges(spark):
    st = shape_stats(_micro_df(spark))
    # S == 1 uses >=, so support==1 rows survive
    kept1 = prune(st, 0.0, 1).toPandas()
    assert (kept1["support"] >= 1).all() and len(kept1) > 0
    # S > 1 uses strictly-greater
    kept2 = prune(st, 0.0, 2).toPandas()
    assert (kept2["support"] > 2).all()
    # confidence strictly greater
    kept3 = prune(st, 1.0, 1).toPandas()
    assert len(kept3) == 0


def test_tpch_kernel_vs_duckdb(spark, duck):
    sf = "/root/testdata/sf0.001"
    for t in ["customer", "orders", "nation", "region", "lineitem"]:
        spark.read.parquet(f"{sf}/{t}.parquet").createOrReplaceTempView(t)
        duck.sql(f"CREATE OR REPLACE VIEW {t} AS "
                 f"SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    got = shape_stats(spark.sql(TPCH_TRIPLES_SQL)).toPandas()
    duck.sql(f"CREATE OR REPLACE VIEW tpch_triples AS {TPCH_TRIPLES_SQL}")
    exp = duck.sql(shape_stats_sql("tpch_triples")).df()
    assert_frames_match(got, exp)
