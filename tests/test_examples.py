"""Golden example smoke tests (SURVEY.md §5): every runnable example in
examples/ executes in-process against the shared test SparkSession (each
script's own asserts carry its published golden output — 247 loans,
20901884461056 GDP sum, ...)."""

from __future__ import annotations

import os
import runpy

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")

EXAMPLES = [
    "pai_version.py",
    "single_dataframe_example.py",
    "with_multiple_dataframes.py",
    "with_privacy_enforced.py",
    "from_csv.py",
    "from_csv_vertexai.py",
    "from_excel.py",
    "from_dataframe.py",
    "from_dataframe_azure.py",
    "save_chart.py",
    "show_chart.py",
    "operators_on_testdata.py",
    "llm_data_pipeline.py",
]


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs_green(script, spark, capsys):
    # examples call get_spark() themselves; it resolves to the active
    # session, so no extra JVM is spawned
    runpy.run_path(os.path.join(EXAMPLES_DIR, script), run_name="__main__")


def test_loans_fixture_golden_count():
    import sys

    sys.path.insert(0, EXAMPLES_DIR)
    try:
        from data.loans import rows
    finally:
        sys.path.pop(0)
    r = rows()
    assert len(r) == 500
    assert sum(1 for x in r if x[1] == "PAIDOFF" and x[10] == "male") == 247
