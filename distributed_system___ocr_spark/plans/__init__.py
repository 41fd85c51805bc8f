"""Query registry: DataFrame builders paired with ANSI-SQL oracles."""

from .queries import REGISTRY, oracle_sql, queries
from . import textops  # noqa: F401  (registers text operators)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
