"""Prompt -> generated-code cache.

Like the reference's shelve cache (reference helpers/cache.py:8-70) but
keyed on hash(prompt + schema fingerprint) — the reference keyed on the
raw prompt alone, which serves stale code after the data's schema changes
(flagged in SURVEY.md §2a as a hazard to fix).
"""

from __future__ import annotations

import hashlib
import os
import shelve


class Cache:
    def __init__(self, path: str = "cache/sparkai"):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._path = path

    @staticmethod
    def key(prompt: str, schema_fingerprint: str = "") -> str:
        return hashlib.sha256(f"{prompt}\x00{schema_fingerprint}".encode()).hexdigest()

    def get(self, prompt: str, schema_fingerprint: str = "") -> str | None:
        with shelve.open(self._path) as db:
            return db.get(self.key(prompt, schema_fingerprint))

    def set(self, prompt: str, code: str, schema_fingerprint: str = "") -> None:
        with shelve.open(self._path) as db:
            db[self.key(prompt, schema_fingerprint)] = code

    def clear(self) -> None:
        with shelve.open(self._path) as db:
            for k in list(db.keys()):
                del db[k]

    def destroy(self) -> None:
        for suffix in ("", ".db", ".dat", ".bak", ".dir"):
            p = self._path + suffix
            if os.path.exists(p):
                os.remove(p)
