"""Every declared query hash-matches its DuckDB oracle (SURVEY.md §5.2.2).

This is a local mirror of the driver's t2 correctness gate, run at
sf0.001 for speed (the driver runs sf0.01).
"""

from __future__ import annotations

import os

import pytest

from citibike_analysis_spark.plans import all_queries
from tests.oracle import compare, run_oracle

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

SPECS = {n: s for n, s in all_queries().items() if s.oracle is not None}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    cols, rows = run_oracle(spec.oracle, SF_DIR)
    problems = compare(df, cols, rows)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(all_queries()) - set(SPECS)))
def test_rows_only_queries_run(spark, name):
    spec = all_queries()[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns
