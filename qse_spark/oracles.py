"""ANSI-SQL oracles (DuckDB-runnable) for the QSE stats kernel and the
pipeline queries. Each template takes a `{triples}` relation —
(subject, predicate, object, obj_kind[, cnt]) — and reproduces stats.py's
semantics in pure SQL, which is the independent implementation the driver's
correctness gate compares against.

The same SQL text is also valid Spark SQL for the TPC-H-derived triple view
(tpch_triples_sql), so Spark and DuckDB construct identical inputs and only
the kernel implementations differ — exactly what we want to verify.
"""

from __future__ import annotations

from .constants import TYPE_PREDICATE, UNDEFINED_OBJECT_TYPE

# ---------------------------------------------------------------- kernel SQL

def shape_stats_sql(triples: str, type_predicate: str = TYPE_PREDICATE,
                    weighted: bool = False) -> str:
    """Full stats-kernel oracle over a triples relation (SQL text)."""
    w = "cnt" if weighted else "1"
    return f"""
WITH etypes AS (
  SELECT DISTINCT subject AS entity, object AS cls
  FROM {triples} WHERE predicate = '{type_predicate}'
), ccounts AS (
  SELECT cls, COUNT(*) AS class_count FROM etypes GROUP BY cls
), tagged AS (
  SELECT t.subject AS entity, t.predicate AS property,
         COALESCE(e.cls, '{UNDEFINED_OBJECT_TYPE}') AS obj_type,
         CAST({w} AS BIGINT) AS weight
  FROM {triples} t LEFT JOIN etypes e ON t.object = e.entity
  WHERE t.obj_kind = 'iri'
  UNION ALL
  SELECT subject, predicate,
         CASE obj_kind WHEN 'integer' THEN 'xsd:integer'
                       WHEN 'date' THEN 'xsd:date'
                       WHEN 'langString' THEN 'rdf:langString'
                       ELSE 'xsd:string' END,
         CAST({w} AS BIGINT)
  FROM {triples} WHERE obj_kind <> 'iri'
), constraints AS (
  SELECT DISTINCT entity, property, obj_type FROM tagged
), cardinality AS (
  SELECT entity, property, SUM(weight) AS cnt FROM tagged GROUP BY 1, 2
), support AS (
  SELECT e.cls, c.property, c.obj_type, COUNT(*) AS support
  FROM constraints c JOIN etypes e ON c.entity = e.entity
  GROUP BY 1, 2, 3
), maxc AS (
  SELECT e.cls, c.property,
         CASE WHEN MIN(c.cnt) <= 1 THEN 1 END AS max_count
  FROM cardinality c JOIN etypes e ON c.entity = e.entity
  GROUP BY 1, 2
)
SELECT s.cls AS class, s.property, s.obj_type,
       s.support AS support, cc.class_count AS class_count,
       CAST(s.support AS DOUBLE) / cc.class_count AS confidence,
       CAST(CASE WHEN s.support = cc.class_count THEN 1 END AS INT) AS min_count,
       CAST(m.max_count AS INT) AS max_count
FROM support s
JOIN ccounts cc ON s.cls = cc.cls
LEFT JOIN maxc m ON s.cls = m.cls AND s.property = m.property
"""


# ------------------------------------------------- TPC-H triple-view builder
# A KG derived from the driver-provided star schema: typed customers
# (multi-class via market segment), typed orders/nations, untyped regions
# (exercises the undefined sentinel), literal datatypes, and an untyped
# subject (lineitems) whose constraints exist but never reach support.
# Valid in BOTH Spark SQL and DuckDB over views named customer/orders/nation/region.

TPCH_TRIPLES_SQL = """
SELECT 'cust_' || CAST(c_custkey AS STRING) AS subject, 'rdf:type' AS predicate,
       'Customer' AS object, 'iri' AS obj_kind FROM customer
UNION ALL
SELECT 'cust_' || CAST(c_custkey AS STRING), 'rdf:type',
       'Segment_' || c_mktsegment, 'iri' FROM customer
UNION ALL
SELECT 'nat_' || CAST(n_nationkey AS STRING), 'rdf:type', 'Nation', 'iri' FROM nation
UNION ALL
SELECT 'ord_' || CAST(o_orderkey AS STRING), 'rdf:type', 'Order', 'iri' FROM orders
UNION ALL
SELECT 'cust_' || CAST(c_custkey AS STRING), 'inNation',
       'nat_' || CAST(c_nationkey AS STRING), 'iri' FROM customer
UNION ALL
SELECT 'nat_' || CAST(n_nationkey AS STRING), 'inRegion',
       'reg_' || CAST(n_regionkey AS STRING), 'iri' FROM nation
UNION ALL
SELECT 'ord_' || CAST(o_orderkey AS STRING), 'placedBy',
       'cust_' || CAST(o_custkey AS STRING), 'iri' FROM orders
UNION ALL
SELECT 'ord_' || CAST(o_orderkey AS STRING), 'orderStatus',
       o_orderstatus, 'string' FROM orders
UNION ALL
SELECT 'ord_' || CAST(o_orderkey AS STRING), 'orderDate',
       CAST(CAST(o_orderdate AS DATE) AS STRING), 'date' FROM orders
UNION ALL
SELECT 'item_' || CAST(l_orderkey AS STRING) || '_' || CAST(l_linenumber AS STRING),
       'ofOrder', 'ord_' || CAST(l_orderkey AS STRING), 'iri' FROM lineitem
"""

# DuckDB uses VARCHAR where Spark uses STRING; both accept STRING? DuckDB
# does accept STRING as an alias, so the text above runs unchanged.
