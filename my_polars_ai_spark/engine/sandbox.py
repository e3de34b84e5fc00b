"""Generated-code sandbox: AST sanitation + restricted exec namespace.

Parity with the reference's security passes (reference
polarsai/__init__.py:351-450: import whitelist, df-overwrite stripping,
restricted builtins), extended for Spark: ``spark``/``F``/``W`` bindings
are protected, and calls that stop the session, write data, or block on
stdin are rejected outright.

This is sanitation of *LLM-generated* code (a cooperating-but-fallible
author), not a hostile-code jail — same threat model as the reference.
"""

from __future__ import annotations

import ast
import re

from my_polars_ai_spark.engine.exceptions import BadImportError

# Libraries generated code may import (reference helpers/constants.py:69-83,
# minus polars, plus pyspark).
WHITELISTED_LIBRARIES = (
    "pyspark",
    "sklearn",
    "statsmodels",
    "seaborn",
    "plotly",
    "ggplot",
    "matplotlib",
    "numpy",
    "pandas",
    "datetime",
    "json",
    "base64",
)

WHITELISTED_BUILTINS = (
    "abs", "all", "any", "ascii", "bin", "bool", "bytearray", "bytes",
    "callable", "chr", "classmethod", "complex", "dict", "divmod",
    "enumerate", "filter", "float", "format", "frozenset", "getattr",
    "hasattr", "hash", "hex", "id", "int", "isinstance", "issubclass",
    "iter", "len", "list", "map", "max", "min", "next", "object", "oct",
    "ord", "pow", "print", "range", "repr", "reversed", "round", "set",
    "slice", "sorted", "staticmethod", "str", "sum", "tuple", "type",
    "zip", "__build_class__", "__name__",
)

# Attribute calls that must never run inside the sandbox.
_FORBIDDEN_CALLS = frozenset(
    {"stop", "saveAsTable", "save", "foreach", "foreachBatch"}
)
# Property-style accessors that open a write path (df.write.parquet(...)
# reaches .write as an Attribute access, not a Call).
_FORBIDDEN_ATTRS = frozenset({"write", "writeTo", "writeStream"})
_FORBIDDEN_NAMES = frozenset({"input", "exec", "eval", "compile", "open", "__import__", "exit", "quit"})

# Protected variable names the generated code may read but not rebind.
_PROTECTED_RE = re.compile(r"^(df\d{0,2}|spark|F|W)$")


def check_imports(node: ast.Import | ast.ImportFrom, extra_whitelist: tuple[str, ...] = ()) -> None:
    """Raise BadImportError for any import outside the whitelist (pyspark
    is always allowed — the reference's equivalent always-allow was
    polars, polarsai/__init__.py:369-370)."""
    if isinstance(node, ast.ImportFrom):
        roots = [node.module.split(".")[0] if node.module else ""]
    else:
        roots = [alias.name.split(".")[0] for alias in node.names]
    allowed = set(WHITELISTED_LIBRARIES) | set(extra_whitelist)
    for root in roots:
        if root not in allowed:
            raise BadImportError(root)


def _is_protected_overwrite(node: ast.stmt) -> bool:
    """True for ``df = ...`` / ``spark = ...`` style rebinds of protected
    names (any assignment target, not just the first — the reference only
    checked targets[0], a gap we close)."""
    targets: list[ast.expr] = []
    if isinstance(node, ast.Assign):
        targets = node.targets
    elif isinstance(node, (ast.AugAssign, ast.AnnAssign)):
        targets = [node.target]
    for t in targets:
        for leaf in ast.walk(t):
            if isinstance(leaf, ast.Name) and _PROTECTED_RE.match(leaf.id):
                return True
    return False


def _check_forbidden(tree: ast.AST) -> None:
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            fn = node.func
            if isinstance(fn, ast.Attribute) and fn.attr in _FORBIDDEN_CALLS:
                raise ValueError(f"forbidden call in generated code: .{fn.attr}()")
            if isinstance(fn, ast.Name) and fn.id in _FORBIDDEN_NAMES:
                raise ValueError(f"forbidden call in generated code: {fn.id}()")
        if isinstance(node, ast.Attribute):
            if node.attr in _FORBIDDEN_ATTRS:
                raise ValueError(f"forbidden attribute in generated code: .{node.attr}")
            if node.attr.startswith("__"):
                raise ValueError("dunder attribute access is not allowed in generated code")


def clean_code(code: str, extra_whitelist: tuple[str, ...] = ()) -> str:
    """Sanitize generated code: validate imports then drop them (the exec
    environment provides whitelisted modules), drop protected-name
    rebinds, reject forbidden calls; re-emit source.

    Mirrors the reference _clean_code AST pass (polarsai/__init__.py:403-430)
    with ast.unparse instead of astor.
    """
    tree = ast.parse(code)
    _check_forbidden(tree)
    body: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            check_imports(node, extra_whitelist)
            continue
        if _is_protected_overwrite(node):
            continue
        body.append(node)
    return ast.unparse(ast.Module(body=body, type_ignores=[]))


def build_environment(spark, dfs: dict[str, object], extra_whitelist: tuple[str, ...] = ()) -> dict:
    """The exec namespace: spark session, bound dataframes, F/W aliases,
    whitelisted library modules, restricted builtins (reference
    _get_environment, polarsai/__init__.py:432-450)."""
    import builtins
    import importlib

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    env: dict = {"spark": spark, "F": F, "W": Window, "Window": Window}
    env.update(dfs)
    for lib in set(WHITELISTED_LIBRARIES) | set(extra_whitelist):
        if lib == "pyspark":
            continue
        try:
            env[lib] = importlib.import_module(lib)
        except ImportError:
            continue  # optional library absent in this environment
    env["__builtins__"] = {name: getattr(builtins, name) for name in WHITELISTED_BUILTINS if hasattr(builtins, name)}
    return env
