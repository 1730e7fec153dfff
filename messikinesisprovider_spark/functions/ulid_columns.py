"""Column-level ULID helpers.

The ULID's structure (48-bit millis | 80-bit randomness) makes its pieces
extractable with pure JVM arithmetic — no UDF for the hot paths:

- `ulid_timestamp_ms(msb)`  — the embedded wall-clock time. This is what
  enables time-range partition pruning on ULID-keyed tables (the batch analog
  of the AT_ULID iterator rewrite, KinesisStreamingBuffer.java:271-275).
- `ulid_time_bounds_filter` — the ±tolerance pushdown predicate itself.
- `ulid_text(msb, lsb)`     — canonical 26-char Crockford rendering; an
  Arrow-vectorized UDF (table-driven base32; no per-row Python arithmetic in
  the 128-bit domain is exposed by Spark builtins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_CROCKFORD = np.frombuffer(b"0123456789ABCDEFGHJKMNPQRSTVWXYZ", dtype="S1")


def ulid_timestamp_ms(msb: Column) -> Column:
    """Embedded epoch-millis from the high 64 bits (top 48 bits of the ULID).

    `shiftrightunsigned` keeps the value correct even when the sign bit of
    the stored long is set (timestamps past 2527 or adversarial input).
    """
    return F.shiftrightunsigned(msb, 16)


def ulid_timestamp(msb: Column) -> Column:
    """Embedded time as a TimestampType column."""
    return F.timestamp_millis(ulid_timestamp_ms(msb))


def ulid_time_bounds_filter(msb: Column, lo_ms: int, hi_ms: int) -> Column:
    """Pushdown predicate: ULID time within [lo_ms, hi_ms). Plain long
    comparisons → reaches Parquet row-group pruning on the msb column."""
    return (ulid_timestamp_ms(msb) >= F.lit(lo_ms)) & (ulid_timestamp_ms(msb) < F.lit(hi_ms))


def ulid_text(msb: Column, lsb: Column) -> Column:
    """Canonical 26-char form from the two int64 halves (vectorized)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def render(msb_s: pd.Series, lsb_s: pd.Series) -> pd.Series:
        m = msb_s.to_numpy().astype(np.uint64)
        l = lsb_s.to_numpy().astype(np.uint64)
        n = len(m)
        # 26 base32 digits over the 128-bit value, most-significant first.
        out = np.empty((n, 26), dtype="S1")
        # low 13 digits come from (lsb | low bits), high 13 from shifted msb;
        # do it in pure python-int space per row is slow — instead peel 5 bits
        # at a time across the 128-bit value using uint64 ops:
        hi, lo = m.copy(), l.copy()
        for pos in range(25, -1, -1):
            digit = (lo & np.uint64(0x1F)).astype(np.int64)
            out[:, pos] = _CROCKFORD[digit]
            # 128-bit right shift by 5: lo = (lo >> 5) | (hi << 59); hi >>= 5
            lo = (lo >> np.uint64(5)) | ((hi & np.uint64(0x1F)) << np.uint64(59))
            hi = hi >> np.uint64(5)
        return pd.Series(out.view("S26").ravel().astype(str))

    return render(msb, lsb)
