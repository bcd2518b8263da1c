"""As-of (most-recent-match) join — an operator Spark lacks natively.

asof_join(left, right): for each left row, attach the right row with
the greatest right_time <= left_time within the same key group.

Implemented as the union-sort-window construction rather than the
naive range join: tag both sides, union them, and take last(right
value, ignorenulls) over a window partitioned by key and ordered by
(time, tag) — right rows sort before left rows at equal timestamps, so
the match is inclusive (<=), matching DuckDB's ASOF JOIN semantics.

Scale: exactly one shuffle (the window's hash partition on key) over
rows_left + rows_right — no range-join explosion, no per-key skew
beyond the key distribution itself. This is the standard distributed
as-of construction used for e.g. trade/quote joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + the latest right_cols values.

    right_cols defaults to every right column except its key/time.
    Right-side ties on (key, time) resolve to the row whose packed
    value-struct sorts last (lexicographic by field) — deterministic.

    tolerance (pandas merge_asof parity): maximum allowed gap between
    left time and the matched right time — SECONDS for timestamp
    columns, native units for numeric ones. A match older than the
    tolerance is nulled out (the left row still survives, unmatched).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (right_on, right_by)]
    if not right_cols:
        # Nothing to attach: the left as-of join degenerates to left itself.
        return left

    # All right payload columns travel as ONE struct so last(..., ignorenulls)
    # picks whole rows, never stitches columns from different right rows
    # (a matched right row holding NULL in one column must yield that NULL,
    # not an older row's value — DuckDB ASOF row-level semantics).
    from pyspark.sql import types as T

    # the matched right row's own time travels inside the struct (first
    # field) so tolerance can compare against it after the fill
    r_struct_type = T.StructType(
        [T.StructField("__rt", right.schema[right_on].dataType, True)]
        + [T.StructField(c, right.schema[c].dataType, True) for c in right_cols]
    )
    lt = [c for c in left.columns]
    l_tag = left.select(
        *lt,
        F.col(left_by).alias("__key"),
        F.col(left_on).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lt],
        F.col(right_by).alias("__key"),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(right_on).alias("__rt"), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), F.col("__tag"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lt,
        "__tag",
        "__t",
        F.last("__r", ignorenulls=True).over(w).alias("__f"),
    )
    if tolerance is not None:
        t_type = left.schema[left_on].dataType
        if isinstance(t_type, T.TimestampNTZType):
            # NTZ carries no zone: the gap is the WALL-CLOCK difference,
            # computed with timestampdiff directly on the NTZ values so
            # it is independent of spark.sql.session.timeZone. (Casting
            # to session-zone timestamp and differencing unix_micros is
            # wrong for pairs straddling a DST transition in a non-UTC
            # session — off by the offset change; verified.)
            gap = F.expr("timestampdiff(MICROSECOND, __f.__rt, __t)")
            max_gap = F.lit(int(tolerance * 1_000_000))
        elif isinstance(t_type, T.TimestampType):
            gap = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__f.__rt"))
            max_gap = F.lit(int(tolerance * 1_000_000))
        elif isinstance(t_type, T.DateType):
            gap = F.datediff(F.col("__t"), F.col("__f.__rt"))
            max_gap = F.lit(tolerance)
        else:
            gap = F.col("__t") - F.col("__f.__rt")
            max_gap = F.lit(tolerance)
        filled = filled.withColumn(
            "__f", F.when(gap <= max_gap, F.col("__f"))
        )
    return filled.filter(F.col("__tag") == 1).select(
        *lt, *[F.col("__f").getField(c).alias(c) for c in right_cols]
    )
