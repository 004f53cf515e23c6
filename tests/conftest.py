from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from qse_spark.session import get_spark  # noqa: E402
from qse_spark.testdata import ensure_fixture  # noqa: E402

TESTDATA = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="qse-tests",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir():
    return ensure_fixture(seed=42, n_turns=2000)


@pytest.fixture(scope="session")
def duck():
    return duckdb.connect()


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, stringly-typed compare frame."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True))


def assert_frames_match(got: pd.DataFrame, exp: pd.DataFrame):
    got, exp = norm_frame(got), norm_frame(exp)
    assert list(got.columns) == list(exp.columns), \
        f"schema {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"rows {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=False, atol=1e-9, rtol=0)
