"""As-of (nearest-match) join — an operator Spark lacks natively.

asof_join(left, right): for each left row, attach the matching right
row within the same key group — backward (greatest right_time <=
left_time, the default), forward (smallest right_time >= left_time),
or nearest (pandas merge_asof's third direction; exact ties resolve
backward).

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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: all left columns + the matched right_cols values.

    right_cols defaults to every right column except its key/time.
    Right-side ties on (key, time) resolve deterministically (backward:
    the row whose packed value-struct sorts last; forward: first).

    direction (pandas merge_asof parity):
      "backward" (default) — greatest right_time <= left_time;
      "forward"            — smallest right_time >= left_time;
      "nearest"            — whichever of the two is closer in time
                             (exact ties resolve backward, like pandas).
    All three run in the SAME single key-shuffle: nearest adds a second
    window ordering over the already-partitioned union, not a second
    shuffle.

    tolerance (pandas merge_asof parity): maximum allowed gap between
    left time and the matched right time — SECONDS for timestamp
    columns, native units for numeric ones. A match outside the
    tolerance is nulled out (the left row still survives, unmatched).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
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
    # backward: right rows sort BEFORE left at equal time (inclusive <=),
    # take last-known over the preceding frame. forward: right rows sort
    # AFTER left at equal time (inclusive >=), take first over the
    # following frame. Both orderings share one hash partition on key.
    w_back = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), F.col("__tag"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), F.col("__tag").desc(), F.col("__r"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last("__r", ignorenulls=True).over(w_back).alias("__fb"))
    if direction in ("forward", "nearest"):
        fills.append(F.first("__r", ignorenulls=True).over(w_fwd).alias("__ff"))
    filled = unioned.select(*lt, "__tag", "__t", *fills)

    from pyspark.sql import types as T2

    def _gap(right_time):
        """Non-negative time gap |__t - right_time| in tolerance units."""
        t_type = left.schema[left_on].dataType
        if isinstance(t_type, T2.TimestampNTZType):
            g = F.abs(F.expr(f"timestampdiff(MICROSECOND, {right_time}, __t)"))
            return g, lambda tol: F.lit(int(tol * 1_000_000))
        if isinstance(t_type, T2.TimestampType):
            g = F.abs(F.unix_micros(F.col("__t")) - F.unix_micros(F.col(right_time)))
            return g, lambda tol: F.lit(int(tol * 1_000_000))
        if isinstance(t_type, T2.DateType):
            return F.abs(F.datediff(F.col("__t"), F.col(right_time))), F.lit
        return F.abs(F.col("__t") - F.col(right_time)), F.lit

    if direction == "backward":
        filled = filled.withColumn("__f", F.col("__fb"))
    elif direction == "forward":
        filled = filled.withColumn("__f", F.col("__ff"))
    else:
        gb, _ = _gap("__fb.__rt")
        gf, _ = _gap("__ff.__rt")
        filled = filled.withColumn(
            "__f",
            F.when(F.col("__fb").isNull(), F.col("__ff"))
            .when(F.col("__ff").isNull(), F.col("__fb"))
            # exact tie -> backward, matching pandas merge_asof
            .when(gb <= gf, F.col("__fb"))
            .otherwise(F.col("__ff")),
        )
    if tolerance is not None:
        # NTZ note: the gap is the WALL-CLOCK difference computed with
        # timestampdiff directly on the NTZ values so it is independent
        # of spark.sql.session.timeZone (casting to session-zone
        # timestamps and differencing unix_micros is wrong for pairs
        # straddling a DST transition in a non-UTC session; verified).
        # abs() makes the same expression serve all three directions.
        gap, mk = _gap("__f.__rt")
        max_gap = mk(tolerance)
        filled = filled.withColumn(
            "__f", F.when(gap <= max_gap, F.col("__f"))
        )
    return filled.filter(F.col("__tag") == 1).select(
        *lt, *[F.col("__f").getField(c).alias(c) for c in right_cols]
    )
