"""Query registry: DataFrame builders paired with ANSI-SQL oracles."""

from .queries import REGISTRY, oracle_sql, queries
from . import extractops, mediaops, relops2, streamops, textops, vectorops  # noqa: F401

__all__ = ["REGISTRY", "queries", "oracle_sql"]
