"""Z-order clustered writes (sources/layout.py): Morton key arithmetic,
and the layout claim itself — per-file min/max spans stay narrow on
EVERY clustered dimension, where a linear sort packs only one."""

from __future__ import annotations

from pyspark.sql import functions as F

from nomenklatura_spark.sources.layout import (
    interleave_bits,
    quantize_minmax,
    write_zordered,
)


def test_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["k"]
        for r in df.select(
            "x", "y",
            interleave_bits([F.col("x"), F.col("y")], bits=2).alias("k"),
        ).collect()
    }
    # bit layout (bits=2, 2 cols): x1 y1 x0 y0
    assert got[(3, 0)] == 0b1010
    assert got[(0, 3)] == 0b0101
    assert got[(3, 3)] == 0b1111
    assert got[(2, 1)] == 0b1001


def test_quantize_minmax_bounds(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
    q = {
        r["v"]: r["_q_v"]
        for r in quantize_minmax(df, ["v"], bits=8).collect()
    }
    assert q[0.0] == 0 and q[100.0] == 255 and q[50.0] == 128


def _spans(spark, path, cols):
    """Per-file (max-min) span of each column, averaged over files,
    normalized by the global span."""
    df = spark.read.parquet(path).withColumn(
        "_f", F.input_file_name()
    )
    per_file = df.groupBy("_f").agg(
        *[
            (F.max(c) - F.min(c)).alias(f"span_{c}")
            for c in cols
        ]
    )
    row = per_file.agg(
        *[F.avg(f"span_{c}").alias(c) for c in cols]
    ).first()
    bounds = df.agg(
        *[(F.max(c) - F.min(c)).alias(c) for c in cols]
    ).first()
    return {c: row[c] / bounds[c] for c in cols}


def test_zorder_bounds_every_dimension(spark, tmp_path):
    # 64x64 uniform grid
    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(grid, zpath, ["x", "y"], n_files=16)
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(lpath)
    )
    z = _spans(spark, zpath, ["x", "y"])
    lin = _spans(spark, lpath, ["x", "y"])
    # 16 files over a square: z-order keeps BOTH dims near sqrt(1/16);
    # the linear sort packs x but leaves y spanning the whole range
    assert z["x"] <= 0.5 and z["y"] <= 0.5, z
    assert lin["y"] > 0.9, lin
    # identical content either way
    assert (
        spark.read.parquet(zpath).orderBy("x", "y").collect()
        == grid.orderBy("x", "y").collect()
    )
