"""Engine-portable integer math primitives shared across operators.

These exist because the repo's oracle gate (CLAUDE.md float
discipline) forbids engine-ordered float arithmetic in checked
outputs: every log/ratio that reaches an oracle is computed with
integer constructions both Spark and DuckDB evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fl2(col: Column) -> Column:
    """``floor(log2(n))`` for positive integer columns, as binary-
    string length minus one — the one integer log every engine
    agrees on bit-for-bit (DuckDB twin: ``length(bin(n)) - 1``).
    Used by the surprisal family, DSIR, the HLL rank rule and BM25
    idf."""
    return (F.length(F.bin(col)) - 1).cast("long")
