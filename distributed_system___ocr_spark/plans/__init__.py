"""Query registry: DataFrame builders paired with ANSI-SQL oracles."""

from .queries import REGISTRY, oracle_sql, queries
from . import (  # noqa: F401
    curationops,
    extractops,
    mediaops,
    relops2,
    streamops,
    textops,
    textops2,
    textops3,
    vectorops,
)

__all__ = ["REGISTRY", "queries", "oracle_sql"]
