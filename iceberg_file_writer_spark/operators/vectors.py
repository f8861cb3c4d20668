"""Vector primitives for similarity search over ``array<float>`` columns.

All arithmetic is done in DOUBLE after an explicit element-wise cast —
float→double widening is exact, so Spark and the DuckDB oracle multiply
and accumulate identical doubles in identical (left-to-right) order.
Similarities are rounded to 6 decimals *before* ranking so top-k
membership can never depend on sub-1e-6 cross-engine float noise.

Everything is built-in higher-order functions (zip_with/aggregate) —
JVM-side, codegen'd, no UDF in the scoring loop. For the 100 TB scale
path see the LSH-bucketed variant in queries/similarity.py: candidates
are restricted to matching sign-random-projection buckets, turning the
all-pairs O(N·Q) scan into a bucket-local join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COSINE_DECIMALS = 6

# Sign-random-projection LSH: bucket bit i = sign(v · h_i) where hyperplane
# h_i's component j is +1 iff md5('<i>:<j>') starts with nibble >= 8.
# Hyperplanes are precomputed driver-side with hashlib (the same md5) and
# embedded as literal arrays in BOTH the Spark plan and the oracle SQL —
# zero per-row hashing, trivially identical across engines.
SRP_BITS = 8
SRP_DIMS = 64


def srp_hyperplanes(bits: int = SRP_BITS, dims: int = SRP_DIMS) -> list[list[float]]:
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) >= 8 else -1.0
            for j in range(dims)
        ]
        for i in range(bits)
    ]


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dims: int = SRP_DIMS) -> Column:
    """Left-to-right double-precision dot product of two double arrays.

    Expanded as a flat 64-term expression (not zip_with/aggregate): flat
    arithmetic stays inside whole-stage codegen — the higher-order-function
    formulation drops to interpreted evaluation and is ~20× slower on the
    pairwise hot path. The left-associated chain adds in the same
    sequential order as the oracle's list_sum, so values match bitwise.
    """
    out = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dims + 1):
        out = out + F.element_at(a, i) * F.element_at(b, i)
    return out


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity rounded to COSINE_DECIMALS for rank stability."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), COSINE_DECIMALS)


def plane_dot(vec: Column, plane: list[float]) -> Column:
    """Dot of a vector column against a literal ±1 hyperplane — flat chain."""
    out = F.element_at(vec, 1) * F.lit(plane[0])
    for i in range(1, len(plane)):
        out = out + F.element_at(vec, i + 1) * F.lit(plane[i])
    return out


def srp_bucket(vec: Column, bits: int = SRP_BITS, dims: int = SRP_DIMS) -> Column:
    """Sign-random-projection bucket id as a ``bits``-char '0'/'1' string.

    ``vec`` must already be a double array of length ``dims``.
    """
    planes = srp_hyperplanes(bits, dims)
    bit = lambda hp: F.when(plane_dot(vec, hp) > 0, F.lit("1")).otherwise(  # noqa: E731
        F.lit("0")
    )
    return F.concat(*[bit(hp) for hp in planes])
