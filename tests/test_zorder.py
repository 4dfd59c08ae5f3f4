"""Z-order layout gates: the Morton interleave must match the
bit-twiddling reference, and aligned z-ranges must be spatial TILES —
the property that gives every z-ordered file tight min/max stats on
every interleaved dimension (operators/zorder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators.zorder import (
    cluster_by_zorder,
    zorder_key,
)


def _morton_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 100, 255) for y in (0, 3, 77, 255)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=8).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_py(x, y), f"({x},{y}): {z} != {_morton_py(x, y)}"


def test_aligned_zranges_are_tiles(spark):
    """Every aligned run of 4096 consecutive z-values over a 256×256
    grid is exactly a 64×64 tile: max−min ≤ 63 in BOTH dimensions.
    That bounded per-range span is what a writer turns into tight
    per-file column stats for every z-dimension."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    spans = (
        grid.withColumn("z", zorder_key(["x", "y"], bits=8))
        .groupBy(F.shiftright("z", 12).alias("tile"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    bad = spans.filter((F.col("dx") > 63) | (F.col("dy") > 63) | (F.col("n") != 4096))
    assert bad.count() == 0
    assert spans.count() == 16


def test_cluster_by_zorder_sorts_and_drops_key(spark):
    df = spark.range(1000).select(
        (F.col("id") * 37 % 256).alias("x"), (F.col("id") * 91 % 256).alias("y")
    )
    out = cluster_by_zorder(df, ["x", "y"], bits=8)
    assert out.columns == ["x", "y"]
    # the layout is z-sorted within every partition. (the morton ref is
    # inlined: worker processes can't import the test module by name)
    def check(it):
        def morton(x, y):
            z = 0
            for i in range(8):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        prev = -1
        for pdf in it:
            for x, y in zip(pdf["x"], pdf["y"]):
                z = morton(int(x), int(y))
                assert z >= prev
                prev = z
            yield pdf

    out.mapInPandas(check, schema=out.schema).count()


def test_zorder_write_gives_prunable_file_stats(spark, tmp_path):
    """Write the same 256×256 grid once row-major and once z-ordered
    (8 files each). A point predicate on EITHER dimension must overlap
    few z-ordered files (their per-file min/max boxes are tiles) while
    the row-major layout prunes only its sort dimension. This is the
    row-group-skip mechanism measured from the actual parquet footers."""
    import pyarrow.parquet as pq
    import glob

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    row_major = str(tmp_path / "row_major")
    zordered = str(tmp_path / "zordered")
    grid.repartitionByRange(8, "y").sortWithinPartitions("y").write.parquet(row_major)
    cluster_by_zorder(grid, ["x", "y"], bits=8).write.parquet(zordered)

    def overlap_count(path, col, val):
        n = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st.min <= val <= st.max:
                    n += 1
                    break
        return n

    # x-filter: row-major (sorted by y) cannot prune x at all
    assert overlap_count(row_major, "x", 7) == 8
    # z-order prunes BOTH dimensions to a minority of files
    assert overlap_count(zordered, "x", 7) <= 4
    assert overlap_count(zordered, "y", 7) <= 4
