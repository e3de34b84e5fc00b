"""Prompt templates for the NL -> PySpark code generator.

Parity with the reference's prompt set (reference
prompts/generate_python_code.py:21-33, prompts/multiple_dataframes.py:10-36,
prompts/correct_error_prompt.py:26-48, prompts/generate_response.py:14-22),
re-worded for Spark: the generated code must use the DataFrame API
(pyspark.sql.functions as F), never collect unboundedly, and end with an
expression carrying the answer.
"""

from __future__ import annotations


class Prompt:
    """A str.format template; subclasses set ``text``.

    Constructor kwargs are interpolated eagerly; later ``str(prompt)``
    returns the rendered text (mirrors the reference prompts/base.py:8-27).
    """

    text: str = ""

    def __init__(self, **kwargs):
        self._args = kwargs

    def override(self, text: str) -> "Prompt":
        self.text = text
        return self

    def __str__(self) -> str:
        return self.text.format(**self._args)


CODE_RULES = """When asked about the data, in the form of a question about dataframe `{df_name}`, return the python code (do not import anything) using the PySpark DataFrame API (the variables `spark`, `F` for pyspark.sql.functions, `W` for pyspark.sql.Window are in scope) and prefix the requested python code with <startCode> exactly + '\\n' and suffix the code with <endCode> exactly + '\\n'.
Rules:
- Operate on the provided dataframe variable(s); never re-read data from disk.
- Never call .collect() on more than 100 rows; prefer returning a DataFrame or using .limit(n).
- Do not call spark.stop(), any .write / .save method, or input().
- Make the LAST LINE of the code an expression whose value answers the question (a DataFrame, a scalar, or a string)."""


class GeneratePySparkCodePrompt(Prompt):
    """Single-dataframe code generation prompt."""

    text = (
        """
Today is {today_date}.
You are provided with a PySpark dataframe (df) with {num_rows} rows and {num_columns} columns.
This is the metadata of the dataframe `df` (first rows shown):
{df_head}.

"""
        + CODE_RULES.replace("{df_name}", "df")
        + """

Question: {prompt}

Code:
"""
    )


class MultipleDataFramesPrompt(Prompt):
    """Multi-dataframe code generation prompt: ``dataframes`` is a list of
    rendered per-frame descriptions (df1..dfN)."""

    text = (
        """
Today is {today_date}.
You are provided with the following PySpark dataframes:
{dataframes}

"""
        + CODE_RULES.replace("{df_name}", "df1..dfN")
        + """

Question: {prompt}

Code:
"""
    )


class CorrectErrorPrompt(Prompt):
    """Error-correction prompt (retry loop)."""

    text = """
Today is {today_date}.
You are provided with a PySpark dataframe (df) with {num_rows} rows and {num_columns} columns.
This is the metadata of the dataframe `df`:
{df_head}.

The user asked the following question:
{question}

You generated this python code:
{code}

It fails with the following error:
{error_returned}

Correct the python code (same rules: PySpark DataFrame API, variables `spark`, `F`, `W` in scope, no imports, no writes, last line is the answer expression) and return a new python code that fixes the error, prefixed with <startCode> and suffixed with <endCode>.
"""


class CorrectMultipleDataFramesErrorPrompt(Prompt):
    """Error-correction prompt, multi-dataframe variant."""

    text = """
Today is {today_date}.
You are provided with the following PySpark dataframes:
{dataframes}

The user asked the following question:
{question}

You generated this python code:
{code}

It fails with the following error:
{error_returned}

Correct the python code (same rules as before) and return a new python code that fixes the error, prefixed with <startCode> and suffixed with <endCode>.
"""


class GenerateResponsePrompt(Prompt):
    """Rewrite a raw result as a conversational answer (reference
    prompts/generate_response.py:14-22)."""

    text = """
Question: {question}
Answer: {answer}

Rewrite the answer to the question in a conversational way.
"""
