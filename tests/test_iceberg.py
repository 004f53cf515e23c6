"""Iceberg integration — the north rule's target table format.

The Iceberg runtime jar is NOT in this sandbox image (no network, no pip/
maven), so these tests self-skip with that reason; on any machine where
`iceberg-spark-runtime` is on the classpath (spark-submit --packages or
spark.jars) they run as-is and exercise the REAL branch of
sources/tables.py: partitioned Iceberg write + read-back, and the
MERGE INTO compaction equivalence the incremental path documents
(streaming/incremental.py — "an Iceberg MERGE where available").

These run in their own session (the Iceberg catalog + SQL extensions
must be set at session build), so the module manages its own
SparkSession instead of using the shared conftest fixture.
"""

from __future__ import annotations

import pytest

from qse_spark.sources import tables


@pytest.fixture(scope="module")
def ispark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    try:
        spark = tables.iceberg_session(wh, master="local[4]")
    except RuntimeError as e:
        pytest.skip(f"Iceberg runtime not on classpath in this image: {e}")
    yield spark
    spark.stop()


def test_partitioned_iceberg_roundtrip(ispark):
    """write_table -> Iceberg, partitioned by obj_kind; read_table sees
    the identical row set and the partitioning survives in metadata."""
    import qse_spark.sources.tables as t
    rows = [("s%d" % i, "p", "o%d" % (i % 3), "iri" if i % 2 else "literal",
             i) for i in range(100)]
    df = ispark.createDataFrame(
        rows, ["subject", "predicate", "object", "obj_kind", "cnt"])
    ident = "qse.db.triples"
    orig = t.FORMAT
    t.FORMAT = "iceberg"
    try:
        t.write_table(df, ident, partition_by=["obj_kind"])
        back = t.read_table(ispark, ident)
    finally:
        t.FORMAT = orig
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    parts = ispark.sql(f"SELECT * FROM {ident}.partitions").collect()
    assert {r["partition"]["obj_kind"] for r in parts} == {"iri", "literal"}


def test_merge_into_equals_compact_groups(ispark, tmp_path):
    """merge_into_groups (Iceberg MERGE INTO upsert) over per-batch delta
    aggregates must equal streaming.incremental.compact_groups over the
    same deltas — the row-level replacement for compact_to_base's
    rewrite-and-rename publish."""
    from qse_spark.operators.extraction import extract_triple_groups
    from qse_spark.streaming.incremental import compact_groups
    from qse_spark.testdata import ensure_fixture

    fx = ensure_fixture(seed=13, n_turns=400)
    turns = ispark.read.parquet(f"{fx}/transcripts.parquet")
    batches = [turns.filter(turns.turn_idx % 2 == i) for i in (0, 1)]

    ident = "qse.db.groups"
    ispark.sql(f"DROP TABLE IF EXISTS {ident}")
    keys = ["subject", "predicate", "object", "obj_kind"]
    wd = str(tmp_path / "store")
    for i, b in enumerate(batches):
        g = extract_triple_groups(b)
        if i == 0:
            g.writeTo(ident).partitionedBy("obj_kind").create()
        else:
            tables.merge_into_groups(ispark, ident, g, keys)
        g.write.mode("overwrite").parquet(f"{wd}/delta/batch={i}")

    got = sorted(map(tuple, ispark.read.table(ident).collect()))
    exp = sorted(map(tuple, compact_groups(ispark, wd).collect()))
    assert got == exp
