"""Physical-plan audit helpers — the "did Catalyst do what we declared"
checks used by tests and bench: pushed filters reach the parquet scan,
broadcast joins stay broadcast, whole-stage codegen covers the kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def plan_summary(df: DataFrame) -> dict:
    """Unique-node counts from the formatted plan's detail section —
    naive substring counting double-counts (tree + details, and
    InMemoryRelation blocks embed their whole cached child plan)."""
    import re

    def nodes(s, name):
        return len(re.findall(rf"^\(\d+\) {name}", s, re.M))

    s = explain_str(df)
    return {
        "scans": nodes(s, "Scan parquet"),
        "inmemory_scans": nodes(s, "InMemoryTableScan"),
        "exchanges": nodes(s, "Exchange"),
        "broadcast_joins": nodes(s, "BroadcastHashJoin"),
        "sortmerge_joins": nodes(s, "SortMergeJoin"),
        "shuffledhash_joins": nodes(s, "ShuffledHashJoin"),
        "pushed_filters": "PushedFilters: [" in s
                          and "PushedFilters: []" not in s,
    }


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Assert a predicate fragment reached the scan's PushedFilters."""
    s = explain_str(df)
    for line in s.splitlines():
        if "PushedFilters" in line and fragment in line:
            return
    raise AssertionError(
        f"filter '{fragment}' not pushed to scan; plan:\n{s}")


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Assert every scan's ReadSchema is limited to `columns` (column
    pruning reached the file source — a scan reading all columns for a
    narrow projection is a 100x read amplification at 100 TB)."""
    import re
    s = explain_str(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", s)
    if not schemas:
        raise AssertionError(f"no parquet scan in plan:\n{s}")
    for schema in schemas:
        got = {c.split(":")[0].strip() for c in schema.split(",") if c}
        extra = got - columns
        if extra:
            raise AssertionError(
                f"scan reads unexpected columns {extra}; plan:\n{s}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    s = explain_str(df)
    n = s.count("BroadcastHashJoin")
    if n < min_count:
        raise AssertionError(
            f"expected >= {min_count} BroadcastHashJoin, got {n}; plan:\n{s}")


def executed_plan_str(df: DataFrame) -> str:
    """Final AQE plan (after an action): runtime join strategy choices and
    codegen markers only exist post-execution under AQE. collect() (not
    count()) so THIS queryExecution is the one that runs."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def executed_summary(df: DataFrame) -> dict:
    import re
    s = executed_plan_str(df)
    return {
        "final": "isFinalPlan=true" in s,
        "exchanges": s.count("Exchange"),
        "broadcast_joins": s.count("BroadcastHashJoin"),
        "sortmerge_joins": s.count("SortMergeJoin"),
        # codegen stages print as "*(n)" prefixes in the final plan
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", s))),
    }
