"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as composition of built-in ops (preference order (a) from
the task brief): tag-union both sides, one window pass per key carries
the most recent right-side row forward, then filter back to left rows.
This is ONE shuffle on the key and stays entirely JVM-side — it beats
the per-group ``pd.merge_asof`` applyInPandas form (which pays Arrow
transfer + Python) and is the shape that survives 10^12 rows.

Semantics matched to DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND
l.ts >= r.ts``: for each left row, the right row with the greatest
ts <= left.ts; exact-ts matches count; ties on right ts broken by the
largest order column value (documented, deterministic).

Row atomicity: the matched right row is carried as ONE struct through
every window/aggregate and coalesced once before unpacking, so all
``{prefix}{col}`` outputs come from the SAME right row even when some
right columns are legitimately NULL (a per-column
``last(ignorenulls)`` would let a NULL field skip back to an OLDER
row's value — the round-3 advice finding; pinned by
tests/test_scale_properties.py's nullable-column fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ROW = "_asof_row"


def _right_struct(ts: str, right_cols: list[str], prefix: str):
    """The carried right row as one struct (null on the left side)."""
    return F.struct(
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        F.col(ts).alias(f"{prefix}{ts}"),
    )


def _unpack(struct_col, ts: str, right_cols: list[str], prefix: str):
    carried = [f"{prefix}{c}" for c in right_cols] + [f"{prefix}{ts}"]
    return [struct_col.getField(c).alias(c) for c in carried]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row (by ts)
    with right.ts <= left.ts, per key. right_cols are carried over as
    ``{prefix}{col}``; left columns pass through unchanged."""
    lcols = left.columns
    tagged_l = left.withColumn("_side", F.lit(1))
    tagged_r = right.select(
        F.col(key), F.col(ts), _right_struct(ts, right_cols, prefix).alias(_ROW)
    ).withColumn("_side", F.lit(0))
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (exact matches count)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        F.last(F.col(_ROW), ignorenulls=True).over(w).alias(_ROW),
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *_unpack(F.col(_ROW), ts, right_cols, prefix)
    )


_DAY_US = 24 * 3600 * 1_000_000


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
    bucket_us: int = _DAY_US,
) -> DataFrame:
    """Skew-hardened as-of join: identical semantics to
    :func:`asof_join`, different physical shape. The plain form windows
    over ``key``, so one hot key serializes into a single task; here
    the expensive window runs over (key, time-bucket) and a BUCKET-
    level fix-up (rows = distinct (key, bucket) — tiny) carries the
    latest right row across bucket boundaries:

    1. local pass: the union-window trick within (key, bucket) — each
       left row gets the latest right row <= its ts INSIDE its bucket;
    2. bucket summaries: per (key, bucket), the right side's latest row
       (``max_by`` over ts — same tie exposure as the plain form's
       window order);
    3. carry-forward: a per-key window over bucket summaries (left
       bucket markers sort BEFORE right summaries of the same bucket,
       so a left bucket only ever sees strictly-earlier buckets);
    4. fix-up join on (key, bucket): local match wins, else the carry —
       decided ONCE on the whole carried struct, never per column.

    Exact for any bucket size: buckets partition time, so an in-bucket
    match always postdates every earlier-bucket candidate. Hot-key
    fixture equality vs asof_join is pinned in
    tests/test_scale_properties.py."""
    lcols = left.columns

    def bucket(col: str):
        return F.floor(
            F.unix_micros(F.col(col).cast("timestamp")) / F.lit(bucket_us)
        )

    tagged_l = left.withColumn("_b", bucket(ts)).withColumn(
        "_side", F.lit(1)
    )
    tagged_r = (
        right.select(
            F.col(key),
            F.col(ts),
            _right_struct(ts, right_cols, prefix).alias(_ROW),
        )
        .withColumn("_b", bucket(ts))
        .withColumn("_side", F.lit(0))
    )
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key, "_b")
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = unioned.select(
        *lcols,
        "_b",
        "_side",
        F.last(F.col(_ROW), ignorenulls=True).over(w).alias(_ROW),
    ).filter(F.col("_side") == 1).drop("_side")

    summ = tagged_r.groupBy(key, "_b").agg(
        F.max_by(F.col(_ROW), F.col(ts)).alias(_ROW)
    )
    left_buckets = (
        local.select(key, "_b").distinct().withColumn("_bs", F.lit(0))
    )
    bucket_union = left_buckets.unionByName(
        summ.withColumn("_bs", F.lit(1)), allowMissingColumns=True
    )
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("_b").asc(), F.col("_bs").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = (
        bucket_union.select(
            key,
            "_b",
            "_bs",
            F.last(F.col(_ROW), ignorenulls=True).over(wb).alias("_carry"),
        )
        .filter(F.col("_bs") == 0)
        .drop("_bs")
    )
    matched = F.coalesce(F.col(_ROW), F.col("_carry"))
    return local.join(carry, [key, "_b"], "left").select(
        *lcols, *_unpack(matched, ts, right_cols, prefix)
    )
