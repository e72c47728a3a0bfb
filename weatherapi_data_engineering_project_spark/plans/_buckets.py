"""Shared bucket-boundary probe for the two-phase prefix-scan rewrite.

The q150 pattern (used by q155, q159, and the other bucketed
cumulation queries): sample ~31 quantile boundaries of the scan key,
bucket the frame on them, cumsum WITHIN buckets in parallel, and
stitch global offsets through a broadcast triangular join over the
<=33-row per-bucket totals — no unpartitioned window anywhere.

``approxQuantile`` is an eager driver probe by design (the boundary
list must be a plan literal so the bucket assignment is a codegen'd
array scan, not a join); its cost is one pass over the already-
aggregated frame. ADVICE r06: on an EMPTY frame approxQuantile
returns [], and an empty literal array degrades to an opaque edge —
guard it by falling back to a single bucket, which keeps the plan
shape valid (every row lands in _bkt 0 and the triangular stitch is
a no-op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_bounds(
    df: DataFrame, col: str, n: int = 32, rel: float = 0.01
) -> list[float]:
    """Sorted distinct ~(n-1) quantile boundaries of ``df[col]``;
    ``[0.0]`` (single bucket) when the frame is empty."""
    bnds = sorted(set(df.approxQuantile(col, [i / n for i in range(1, n)], rel)))
    return bnds or [0.0]


def bucket_of(col: str, bnds: list[float]) -> Column:
    """Bucket index of ``col`` against plan-literal boundaries: the
    count of boundaries strictly below the value (codegen'd array
    filter — no join, no shuffle)."""
    return F.size(
        F.filter(F.lit(bnds).cast("array<double>"), lambda b: b < F.col(col))
    )
