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


def _direct_target_names(t: ast.expr):
    """Names actually (re)bound by an assignment target, including tuple/
    list unpacking and starred elements. Attribute/Subscript targets
    mutate a container, not the protected binding, so an assignment like
    ``results[df.columns[0]] = x`` merely *mentions* df and is kept."""
    if isinstance(t, ast.Name):
        yield t.id
    elif isinstance(t, (ast.Tuple, ast.List)):
        for e in t.elts:
            yield from _direct_target_names(e)
    elif isinstance(t, ast.Starred):
        yield from _direct_target_names(t.value)


def _is_protected_overwrite(node: ast.stmt) -> bool:
    """True for ``df = ...`` / ``spark = ...`` style rebinds of protected
    names via direct (possibly unpacked) assignment targets — any target,
    not just the first (the reference only checked targets[0])."""
    if isinstance(node, ast.Assign):
        targets: list[ast.expr] = node.targets
    elif isinstance(node, (ast.AugAssign, ast.AnnAssign)):
        targets = [node.target]
    else:
        return False
    return any(
        _PROTECTED_RE.match(name) for t in targets for name in _direct_target_names(t)
    )


def _check_protected_loop_rebinds(tree: ast.AST) -> None:
    """``for df in ...:`` / ``with ... as spark:`` rebind a protected name
    in the enclosing scope but can't be stripped statement-wise without
    corrupting the block — reject them instead. (Comprehension targets are
    scoped to the comprehension in Python 3 and never leak, so they pass.)
    """
    for node in ast.walk(tree):
        if isinstance(node, (ast.For, ast.AsyncFor)):
            candidates = list(_direct_target_names(node.target))
        elif isinstance(node, ast.withitem) and node.optional_vars is not None:
            candidates = list(_direct_target_names(node.optional_vars))
        else:
            continue
        for name in candidates:
            if _PROTECTED_RE.match(name):
                raise ValueError(
                    f"generated code rebinds protected name {name!r} in a for/with target"
                )


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
    _check_protected_loop_rebinds(tree)
    body: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            check_imports(node, extra_whitelist)
            continue
        if _is_protected_overwrite(node):
            continue
        body.append(node)
    return ast.unparse(ast.Module(body=body, type_ignores=[]))


def _safe_getattr(obj, name, *default):
    """Sandbox replacement for the getattr builtin: refuses the attribute
    names the AST pass rejects (write paths, session stop, dunders) so
    ``getattr(df, 'write')`` / ``getattr(spark, 'stop')()`` cannot evade
    the static checks."""
    if isinstance(name, str) and (
        name.startswith("__") or name in _FORBIDDEN_ATTRS or name in _FORBIDDEN_CALLS
    ):
        raise AttributeError(f"attribute {name!r} is not allowed in generated code")
    return getattr(obj, name, *default)


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
    env["__builtins__"]["getattr"] = _safe_getattr
    return env
