"""Conversational engine (placeholder — filled in during this round)."""


class SparkAI:  # pragma: no cover - replaced by the full implementation
    pass
