"""The portable cross-engine md5-prefix hash family — ONE home.

Several operators need a hash whose value is bit-identical between
Spark and the DuckDB oracle (xxhash64 has no DuckDB twin). The family
is: take the first ``n_hex`` hex chars of md5 and parse them as an
integer. Spark: ``conv(substring(md5(x), 1, n), 16, 10)`` cast to
long; DuckDB: ``('0x' || substr(md5(x), 1, n))::BIGINT``. Both parse
the same hex digits of the same digest, so the values agree exactly.

Keeping the Spark-side expression in one helper stops the contract
from living in N diverging copies (r14 review finding): a change to
the family must happen here and in every oracle's SQL together, and
the oracle-parity gates catch any desync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_prefix_int"]


def md5_prefix_int(col: Column, n_hex: int) -> Column:
    """First ``n_hex`` hex chars of md5(col) as a non-negative long.

    ``n_hex`` is capped at 15 (60 bits) so the parse always fits a
    signed 64-bit integer without wrapping. 4 hex chars give the
    16-bit bucket family; 15 give the 60-bit fingerprint family.
    """
    if not 1 <= n_hex <= 15:
        raise ValueError(f"n_hex must be in [1, 15], got {n_hex}")
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")
