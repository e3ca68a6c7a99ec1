"""Data-layout operators: space-filling-curve keys and compaction
planning for scan locality at 100 TB.

Big tables are pruned, not scanned: Parquet/Iceberg keep per-file
min/max column stats, and a WHERE clause skips files whose range
cannot match.  Sorting by ONE column makes that column's ranges tight
and every other column's ranges full-width; interleaving the bits of
two columns (Morton / Z-order) makes BOTH dimensions' per-file ranges
narrow — a point predicate on either dimension then hits ~sqrt(F) of
F files instead of all of them.  This is the layout strategy behind
Iceberg's ``rewrite_data_files(strategy => 'sort', sort_order =>
zorder(...))``; here it is implemented as pure integer column
expressions (shift/mask/add, whole-stage codegen, zero shuffles to
COMPUTE the key — the one shuffle is the range-partitioning write that
uses it).

Everything is exact integer arithmetic shared bit-for-bit with the
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton interleave of two ``bits``-wide non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1.  Terms touch
    disjoint bits, so they combine with ``+`` (identical to OR, and
    the same expression the SQL oracle spells out).  Callers must
    pre-bound inputs to [0, 2^bits) — use pmod / least, not silent
    truncation."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_sql(x: str, y: str, bits: int = 10) -> str:
    """The identical Morton interleave as a DuckDB SQL expression."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
