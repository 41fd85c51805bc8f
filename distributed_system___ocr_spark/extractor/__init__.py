"""Pure-Python payload extractors (no Spark imports here).

These are deterministic pure functions of the payload bytes only — no
clock, no randomness, no partition state — so extracted text is
byte-identical per url across runs and parallelism levels (the
correctness contract, SURVEY.md §2c-1).
"""

from .core import ExtractResult, extract_payload

__all__ = ["ExtractResult", "extract_payload"]
