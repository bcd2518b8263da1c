"""Z-order clustering: multi-column file pruning via Morton layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chapterhousedb_spark.operators.zorder import z_value, zorder_cluster

N_FILES = 16


@pytest.fixture(scope="module")
def grid(spark):
    """Two independent uniform dimensions (a 200x200 shuffled grid) —
    the worst case for single-column range clustering."""
    return (
        spark.range(0, 40_000)
        .select(
            F.col("id"),
            (F.col("id") % 200).alias("u"),
            ((F.col("id") * 7919) % 200).alias("v"),
        )
    )


def _file_ranges(spark, path, col):
    """Per-file (min, max) of `col` for every parquet part file."""
    df = spark.read.parquet(path)
    rows = (
        df.groupBy(F.input_file_name().alias("f"))
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    return [(r["lo"], r["hi"]) for r in rows]


def _mean_span(ranges, full):
    return sum(hi - lo for lo, hi in ranges) / len(ranges) / full


def test_zorder_narrows_both_columns(spark, grid, tmp_path_factory):
    """Z-order: BOTH u and v per-file spans shrink to ~1/sqrt(n_files)
    of the domain; range clustering narrows only its leading column and
    leaves the other at ~full span."""
    root = tmp_path_factory.mktemp("zorder")
    zp, rp = str(root / "z"), str(root / "r")
    zorder_cluster(grid, ["u", "v"], n_files=N_FILES).write.parquet(zp)
    (
        grid.repartitionByRange(N_FILES, "u")
        .sortWithinPartitions("u")
        .write.parquet(rp)
    )

    z_u = _mean_span(_file_ranges(spark, zp, "u"), 199)
    z_v = _mean_span(_file_ranges(spark, zp, "v"), 199)
    r_u = _mean_span(_file_ranges(spark, rp, "u"), 199)
    r_v = _mean_span(_file_ranges(spark, rp, "v"), 199)

    # range layout: leading column near-perfect, other column near-useless
    # (v = (id*7919)%200 retains slight structure within u-ranges, so
    # the mean v-span lands just under the full domain, ~0.87 here)
    assert r_u < 0.15
    assert r_v > 0.7
    # z-order: both columns well under half the domain per file
    # (ideal for 16 files is ~1/4 of each dimension)
    assert z_u < 0.5 and z_v < 0.5, (z_u, z_v)
    # and the layout must actually beat range clustering on the
    # non-leading column by a wide margin
    assert z_v < r_v / 2


def test_zorder_files_prune_on_either_predicate(spark, grid, tmp_path_factory):
    """The operational claim: a point-range predicate on EITHER column
    touches a strict minority of z-ordered files."""
    root = tmp_path_factory.mktemp("zorder_prune")
    zp = str(root / "z")
    zorder_cluster(grid, ["u", "v"], n_files=N_FILES).write.parquet(zp)
    for col in ("u", "v"):
        ranges = _file_ranges(spark, zp, col)
        # files whose [min,max] intersects the query range [10, 20)
        touched = sum(1 for lo, hi in ranges if hi >= 10 and lo < 20)
        assert touched <= len(ranges) // 2, (col, touched, len(ranges))


def test_zorder_preserves_rows(spark, grid, tmp_path_factory):
    root = tmp_path_factory.mktemp("zorder_rows")
    zp = str(root / "z")
    zorder_cluster(grid, ["u", "v"], n_files=N_FILES).write.parquet(zp)
    back = spark.read.parquet(zp)
    assert back.count() == grid.count()
    assert back.columns == grid.columns  # helper z column dropped
    assert (
        back.agg(F.sum("id")).collect()[0][0]
        == grid.agg(F.sum("id")).collect()[0][0]
    )


def test_z_value_nulls_cluster_at_curve_start(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 3.0, None), (3, 3.0, 5.0)], ["id", "x", "y"]
    )
    vals = {r["id"]: r["z"] for r in df.withColumn("z", z_value(df, ["x", "y"], bits=4)).collect()}
    # null coordinates take bucket 0 => their z is <= the non-null row's
    assert vals[1] <= vals[3] and vals[2] <= vals[3]


def test_engine_write_zorder_requires_file_budget(spark, tmp_path_factory):
    from chapterhousedb_spark.config import ConnectionRegistry, FsConnection
    from chapterhousedb_spark.engine import Engine

    root = tmp_path_factory.mktemp("zorder_engine")
    eng = Engine.__new__(Engine)
    eng.spark = spark
    eng.connections = ConnectionRegistry(
        {"out": FsConnection(name="out", base_path=str(root))}
    )
    from chapterhousedb_spark.sqlfront import default_table_function_registry

    eng.table_functions = default_table_function_registry()
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("u"), (F.col("id") % 7).alias("v")
    ).createOrReplaceTempView("zsrc")
    with pytest.raises(ValueError, match="cluster_files"):
        eng.write(
            "select * from zsrc", "t1", connection="out",
            cluster_by=["u", "v"], cluster_mode="zorder",
        )
    path = eng.write(
        "select * from zsrc", "t2", connection="out",
        cluster_by=["u", "v"], cluster_mode="zorder", cluster_files=4,
    )
    assert spark.read.parquet(path).count() == 100


def test_engine_write_zorder_requires_cluster_by(spark, tmp_path_factory):
    """cluster_mode='zorder' with no cluster_by must raise, not fall
    through to a silent unclustered write (ADVICE r6)."""
    from chapterhousedb_spark.config import ConnectionRegistry, FsConnection
    from chapterhousedb_spark.engine import Engine
    from chapterhousedb_spark.sqlfront import default_table_function_registry

    root = tmp_path_factory.mktemp("zorder_nocols")
    eng = Engine.__new__(Engine)
    eng.spark = spark
    eng.connections = ConnectionRegistry(
        {"out": FsConnection(name="out", base_path=str(root))}
    )
    eng.table_functions = default_table_function_registry()
    spark.range(0, 10).createOrReplaceTempView("zsrc_nocols")
    with pytest.raises(ValueError, match="cluster_by"):
        eng.write(
            "SELECT * FROM zsrc_nocols",
            "out.parquet",
            connection="out",
            cluster_mode="zorder",
            cluster_files=2,
        )
