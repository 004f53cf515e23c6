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
    s = explain_str(df)
    return {
        "scans": s.count("Scan parquet"),
        "exchanges": s.count("Exchange"),
        "broadcast_joins": s.count("BroadcastHashJoin"),
        "sortmerge_joins": s.count("SortMergeJoin"),
        "codegen_spans": s.count("WholeStageCodegen"),
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
