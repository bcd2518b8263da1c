"""Z-order (Morton) clustering for multi-column data skipping.

Range clustering (Engine.write cluster_by) gives perfect file pruning
on ONE column and none on the others. Z-ordering interleaves the bits
of several columns' bucket ranks into a single Morton value and
clusters files by it, so every participating column's per-file min/max
range is narrow — point/range filters on ANY of the z-columns skip most
files via parquet footer stats. The lakehouse standard for
multi-dimension pruning (Delta/Iceberg OPTIMIZE ZORDER BY).

Scale shape: one `approxQuantile` pass per column collects 2^bits
boundary values to the driver (constant-size, ~256 doubles — same
discipline as IVF centroids, SCALE.md driver rules), the bucket id +
bit interleave are pure JVM column expressions, and the final layout is
one repartitionByRange exchange on the z-value + a partition-local
sort. Quantile (not equi-width) buckets make the z-curve robust to
skewed column distributions.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__z"


def _bucket_id(col: str, boundaries: list[float]) -> Column:
    """Quantile-bucket rank of `col`: the number of interior boundaries
    <= value, via a JVM higher-order filter over the boundary-array
    literal (O(2^bits) comparisons per row, all codegen — no UDF).
    NULLs sort to bucket 0 (z-curve start) so they cluster together."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    c = F.col(col).cast("double")
    return F.when(c.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(arr, lambda b: c >= b))
    )


def _interleave(bucket_cols: Sequence[Column], bits: int) -> Column:
    """Morton-interleave the low `bits` bits of each bucket id:
    bit i of column j lands at position i * n_cols + j."""
    n = len(bucket_cols)
    terms = [
        F.shiftleft(
            F.shiftright(bc.cast("long"), i).bitwiseAND(F.lit(1)),
            i * n + j,
        )
        for i in range(bits)
        for j, bc in enumerate(bucket_cols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def z_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    rel_err: float = 0.001,
) -> Column:
    """The Morton value column for `cols` over `df`'s distribution
    (boundaries sampled from df itself via approxQuantile)."""
    buckets = []
    for c in cols:
        qs = [i / (1 << bits) for i in range(1, 1 << bits)]
        boundaries = df.stat.approxQuantile(c, qs, rel_err)
        buckets.append(_bucket_id(c, boundaries))
    return _interleave(buckets, bits)


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    bits: int = 8,
    rel_err: float = 0.001,
) -> DataFrame:
    """Cluster `df` into `n_files` write partitions along the z-curve
    of `cols`: repartitionByRange on the Morton value + a
    partition-local sort, then the helper column is dropped — write the
    result directly (`.write.parquet(...)`) and every z-column's
    footer min/max is narrow in every file."""
    with_z = df.withColumn(Z_COL, z_value(df, cols, bits, rel_err))
    return (
        with_z.repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
    )
