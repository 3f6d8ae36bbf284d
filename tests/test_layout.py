"""zorder_interleave vs a Python reference, and the clustering property
that justifies the layout claim."""

from pyspark.sql import functions as F

from d_sparq_spark.operators.layout import zorder_interleave


def _ref_z(x: int, y: int, bits: int = 21) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference(spark):
    vals = [(0, 0), (1, 0), (0, 1), (1, 1), (5, 9), (1023, 1), (2**20, 2**20 - 1)]
    df = spark.createDataFrame(vals, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_interleave(F.col("x"), F.col("y")).alias("z")).collect()
    }
    assert got == {(x, y): _ref_z(x, y) for x, y in vals}


def test_z_sort_bounds_both_keys(spark):
    # 32x32 grid, z-sorted, cut into 16 chunks of 64: every chunk must
    # cover a small rectangle in BOTH keys (the data-skipping property);
    # an x-sorted layout gives full-range y spans in every chunk.
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    zs = sorted(
        (r.z, r.x, r.y)
        for r in df.select("x", "y", zorder_interleave(F.col("x"), F.col("y"), 5).alias("z")).collect()
    )
    for c in range(16):
        chunk = zs[c * 64 : (c + 1) * 64]
        xs = [t[1] for t in chunk]
        ys = [t[2] for t in chunk]
        # a 64-cell Morton block is an 8x8 rectangle
        assert max(xs) - min(xs) <= 7
        assert max(ys) - min(ys) <= 7
