"""Local mirror of the driver's DuckDB-oracle comparison: row count +
schema-insensitive, order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb


def duck_con(sf_dir: str):
    from distributed_system___ocr_spark.plans.queries import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date; strip tz (spark UTC)
        if hasattr(v, "tzinfo"):  # datetime only — date has no tz
            return v.replace(tzinfo=None).isoformat()
        return v.isoformat()
    if hasattr(v, "asDict"):  # Row
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.asDict().items()))
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    # repr-keyed sort: None-tolerant, deterministic, equal rows sort equal
    return sorted(normed, key=repr)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_cols = sorted(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"column mismatch: spark={s_cols} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    a = _norm_rows(spark_df.columns, s_rows)
    b = _norm_rows(d_cols, d_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
