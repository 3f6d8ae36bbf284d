"""Physical-layout operators: z-order (Morton) clustering for
multi-column data skipping.

At 100 TB, min/max file statistics only prune scans when row order
correlates with the filter columns; a single-column sort gives perfect
pruning on one key and none on the second. Interleaving the bits of both
keys (Morton order) and range-partitioning on that value gives every
file a narrow rectangle in (x, y) space — both filters prune. This is
the layout trick behind Delta/Iceberg Z-ORDER table maintenance,
expressed here as plain deterministic column arithmetic (no UDF, no
sampling), so the bucket profile is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_interleave(x: Column, y: Column, bits: int = 21) -> Column:
    """Morton value of two non-negative integer keys: bit i of x lands at
    position 2i, bit i of y at 2i+1. bits=21 per key -> 42-bit z fits a
    LONG. Pure shift/and/or expression tree — whole-stage-codegen'd, and
    identical arithmetic is generated for the DuckDB oracle."""
    z = F.lit(0).cast("long")
    xl = x.cast("long")
    yl = y.cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def sql_zorder_interleave(x: str, y: str, bits: int = 21) -> str:
    """The same Morton interleave as a DuckDB SQL expression string."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
