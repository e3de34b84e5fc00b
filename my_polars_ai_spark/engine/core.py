"""SparkAI — the conversational analytics engine.

The reference's orchestration pipeline (reference
polarsai/__init__.py:214-341 run(), 490-582 run_code()) rebuilt for
Spark: NL question + DataFrame(s) -> prompt with schema/sample metadata
-> LLM generates PySpark code -> AST-sanitized -> exec'd in a restricted
namespace (with an LLM error-correction retry loop) -> the value of the
last expression is the answer, optionally rewritten conversationally.

100 TB discipline (SURVEY.md §7 hard part #4): prompt metadata uses
``df.limit(5)`` for the sample and NEVER calls ``df.count()`` unless
``count_rows=True`` — a row count is a full-table action on Spark.
"""

from __future__ import annotations

import ast
import io
import logging
import re
import time
import uuid
from contextlib import redirect_stdout
from datetime import date

from pyspark.sql import DataFrame, SparkSession

from my_polars_ai_spark.engine.cache import Cache
from my_polars_ai_spark.engine.charts import add_save_chart
from my_polars_ai_spark.engine.exceptions import LLMNotFoundError
from my_polars_ai_spark.engine.llm import LLM
from my_polars_ai_spark.engine.prompts import (
    CorrectErrorPrompt,
    CorrectMultipleDataFramesErrorPrompt,
    GeneratePySparkCodePrompt,
    GenerateResponsePrompt,
    MultipleDataFramesPrompt,
    Prompt,
)
from my_polars_ai_spark.engine.sandbox import build_environment, clean_code
from my_polars_ai_spark.engine.shortcuts import Shortcuts

_LOGGER = logging.getLogger("my_polars_ai_spark")


class SparkAI(Shortcuts):
    """NL -> PySpark analytics over one or more DataFrames."""

    _max_retries = 3

    def __init__(
        self,
        llm: LLM | None = None,
        conversational: bool = False,
        verbose: bool = False,
        save_charts: bool = False,
        enforce_privacy: bool = False,
        enable_cache: bool = True,
        cache_path: str = "cache/sparkai",
        count_rows: bool = False,
        custom_whitelisted_dependencies: tuple[str, ...] = (),
        non_default_prompts: dict[str, Prompt] | None = None,
    ):
        self._llm = llm
        self._is_conversational_answer = conversational
        self._verbose = verbose
        self._save_charts = save_charts
        self._enforce_privacy = enforce_privacy
        self._cache = Cache(cache_path) if enable_cache else None
        self._count_rows = count_rows
        self._extra_whitelist = tuple(custom_whitelisted_dependencies)
        self._prompt_overrides = non_default_prompts or {}
        self._logs: list[str] = []
        self.last_prompt_id: str | None = None
        self.last_code_generated: str | None = None
        self.last_code_executed: str | None = None
        self.last_run_time: float | None = None
        if verbose:
            logging.basicConfig(level=logging.INFO)

    # -- metadata -----------------------------------------------------------

    def _frame_metadata(self, df: DataFrame) -> tuple[str, str, str]:
        """(head_text, num_rows, num_columns) without full-table actions
        unless count_rows=True.

        With enforce_privacy=True no cell values leave the cluster: the
        LLM sees only column names and types. (The reference accepted an
        anonymize_df flag but never used it — polarsai/__init__.py:220;
        implemented for real here.)
        """
        if self._enforce_privacy:
            head = "Columns (values withheld for privacy):\n" + "\n".join(
                f"  {f.name}: {f.dataType.simpleString()}" for f in df.schema.fields
            )
        else:
            head = df.limit(5).toPandas().to_string(index=False)
        num_rows = str(df.count()) if self._count_rows else "an unknown number of"
        return head, num_rows, str(len(df.columns))

    @staticmethod
    def _schema_fingerprint(dfs: list[DataFrame]) -> str:
        return "|".join(d.schema.simpleString() for d in dfs)

    def _render_frames(self, dfs: list[DataFrame]) -> str:
        parts = []
        for i, df in enumerate(dfs, start=1):
            head, num_rows, num_cols = self._frame_metadata(df)
            parts.append(f"Dataframe df{i}, with {num_rows} rows and {num_cols} columns.\nMetadata (first rows):\n{head}")
        return "\n\n".join(parts)

    # -- public API ----------------------------------------------------------

    def log(self, message: str) -> None:
        self._logs.append(message)
        if self._verbose:
            _LOGGER.info(message)

    @property
    def logs(self) -> list[str]:
        return list(self._logs)

    def clear_cache(self) -> None:
        if self._cache:
            self._cache.clear()

    def conversational_answer(self, question: str, answer: object) -> str:
        """Second LLM call rewriting the raw answer as prose (reference
        polarsai/__init__.py:197-212).

        With enforce_privacy=True the computed answer itself is a derived
        cell value and must not leave the cluster either — the LLM sees
        only its shape/type, never the value."""
        if self._enforce_privacy:
            answer = f"<a {type(answer).__name__} value, withheld for privacy>"
        prompt = self._prompt_overrides.get(
            "generate_response", GenerateResponsePrompt(question=question, answer=answer)
        )
        return self._llm.predict(str(prompt))

    def run(
        self,
        data_frame: DataFrame | list[DataFrame],
        prompt: str,
        is_conversational_answer: bool | None = None,
        show_code: bool = False,
        use_error_correction_framework: bool = True,
    ):
        """The main NL -> answer pipeline."""
        if self._llm is None:
            raise LLMNotFoundError("SparkAI requires an llm; pass llm=... to the constructor")
        start = time.time()
        self.last_prompt_id = str(uuid.uuid4())
        dfs = data_frame if isinstance(data_frame, list) else [data_frame]
        self.log(f'Running SparkAI with {self._llm.type} LLM: "{prompt}"')

        try:
            fingerprint = self._schema_fingerprint(dfs)
            code = self._cache.get(prompt, fingerprint) if self._cache else None
            if code is None:
                if len(dfs) == 1:
                    head, num_rows, num_cols = self._frame_metadata(dfs[0])
                    instruction = self._prompt_overrides.get(
                        "generate_python_code",
                        GeneratePySparkCodePrompt(
                            prompt=prompt,
                            df_head=head,
                            num_rows=num_rows,
                            num_columns=num_cols,
                            today_date=date.today(),
                        ),
                    )
                else:
                    instruction = self._prompt_overrides.get(
                        "multiple_dataframes",
                        MultipleDataFramesPrompt(
                            prompt=prompt,
                            dataframes=self._render_frames(dfs),
                            today_date=date.today(),
                        ),
                    )
                code = self._llm.generate_code(instruction, prompt)
                if self._cache:
                    self._cache.set(prompt, code, fingerprint)
            self.last_code_generated = code
            self.log(f"Code generated:\n{code}")
            if show_code:
                from my_polars_ai_spark.engine.notebook import show_code_in_new_cell

                if not show_code_in_new_cell(code):
                    print(code)

            answer = self.run_code(
                code,
                data_frame,
                use_error_correction_framework=use_error_correction_framework,
                prompt=prompt,
            )
            self.log(f"Answer: {answer}")
            if isinstance(answer, DataFrame):
                from my_polars_ai_spark.plans.guardrails import lint_plan

                for warning in lint_plan(answer):
                    self.log(f"Plan warning: {warning}")

            conversational = (
                self._is_conversational_answer
                if is_conversational_answer is None
                else is_conversational_answer
            )
            if conversational and not isinstance(answer, DataFrame):
                answer = self.conversational_answer(prompt, answer)
                self.log(f"Conversational answer: {answer}")
            self.last_run_time = time.time() - start
            self.log(f"Executed in: {self.last_run_time}s")
            return answer
        except Exception as exc:  # reference catch-all (polarsai/__init__.py:334-341)
            self.last_run_time = time.time() - start
            return (
                "Unfortunately, I was not able to answer your question, "
                f"because of the following error:\n\n{exc}\n"
            )

    # -- execution -----------------------------------------------------------

    def run_code(
        self,
        code: str,
        data_frame: DataFrame | list[DataFrame],
        use_error_correction_framework: bool = True,
        prompt: str = "",
    ):
        """Execute (possibly generated) PySpark code in the sandbox and
        extract the result; on failure, ask the LLM to correct the code,
        up to _max_retries times.

        Exceptions from the *result-extraction eval* are retried too —
        on Spark, execution errors surface at action time, not exec time
        (SURVEY.md §7 hard part #2).
        """
        dfs = data_frame if isinstance(data_frame, list) else [data_frame]
        spark = dfs[0].sparkSession if dfs else SparkSession.getActiveSession()

        if self._save_charts and self.last_prompt_id:
            code = add_save_chart(code, self.last_prompt_id)

        bindings: dict[str, object] = {"df": dfs[0]}
        for i, d in enumerate(dfs, start=1):
            bindings[f"df{i}"] = d

        count = 0
        while True:
            try:
                cleaned = clean_code(code, self._extra_whitelist)
                self.last_code_executed = cleaned
                self.log(f"Code running:\n{cleaned}")
                env = build_environment(spark, bindings, self._extra_whitelist)
                return self._execute_and_extract(cleaned, env)
            except Exception as exc:
                count += 1
                if not use_error_correction_framework or count >= self._max_retries:
                    raise
                code = self._retry_run_code(code, prompt, dfs, exc)

    _MAX_ERROR_CHARS = 4000

    def _format_error(self, exc: Exception) -> str:
        """The error text embedded in correction prompts. Spark exception
        messages can quote cell values (ANSI cast errors, UDF tracebacks),
        so with enforce_privacy=True only the exception class name is sent;
        otherwise the message is truncated to keep prompts bounded."""
        if self._enforce_privacy:
            return f"{type(exc).__name__} (message withheld for privacy)"
        text = str(exc)
        if len(text) > self._MAX_ERROR_CHARS:
            text = text[: self._MAX_ERROR_CHARS] + " ... [truncated]"
        return text

    def _retry_run_code(self, code: str, question: str, dfs: list[DataFrame], exc: Exception) -> str:
        """Build the error-correction prompt and regenerate (reference
        polarsai/__init__.py:452-488)."""
        self.log(f"Failed with error: {type(exc).__name__}. Retrying")
        err = self._format_error(exc)
        if len(dfs) == 1:
            head, num_rows, num_cols = self._frame_metadata(dfs[0])
            instruction = self._prompt_overrides.get(
                "correct_error",
                CorrectErrorPrompt(
                    code=code,
                    error_returned=err,
                    question=question,
                    df_head=head,
                    num_rows=num_rows,
                    num_columns=num_cols,
                    today_date=date.today(),
                ),
            )
        else:
            instruction = self._prompt_overrides.get(
                "correct_multiple_dataframes_error",
                CorrectMultipleDataFramesErrorPrompt(
                    code=code,
                    error_returned=err,
                    question=question,
                    dataframes=self._render_frames(dfs),
                    today_date=date.today(),
                ),
            )
        return self._llm.generate_code(instruction, "")

    @staticmethod
    def _execute_and_extract(code: str, env: dict):
        """Run the code; return captured stdout when the code prints
        repeatedly, else the value of the last expression (print-unwrapped).
        Mirrors the reference's extraction rules (polarsai/__init__.py:556-582)
        except a DataFrame result stays a DataFrame object."""
        tree = ast.parse(code)
        multiple_prints = len(re.findall(r"\bprint\s*\(", code)) > 1

        captured = io.StringIO()
        if multiple_prints or not tree.body:
            with redirect_stdout(captured):
                exec(compile(tree, "<sparkai>", "exec"), env)
            return captured.getvalue().strip()

        last = tree.body[-1]
        head_tree = ast.Module(body=tree.body[:-1], type_ignores=[])
        with redirect_stdout(captured):
            exec(compile(head_tree, "<sparkai>", "exec"), env)
            if isinstance(last, ast.Expr):
                value = last.value
                # unwrap a trailing print(...) to its argument
                if (
                    isinstance(value, ast.Call)
                    and isinstance(value.func, ast.Name)
                    and value.func.id == "print"
                    and len(value.args) == 1
                ):
                    value = value.args[0]
                result = eval(compile(ast.Expression(body=value), "<sparkai>", "eval"), env)
            else:
                exec(compile(ast.Module(body=[last], type_ignores=[]), "<sparkai>", "exec"), env)
                result = None
        if result is None:
            out = captured.getvalue().strip()
            return out if out else None
        if isinstance(result, tuple):
            return ", ".join(str(x) for x in result)
        return result
