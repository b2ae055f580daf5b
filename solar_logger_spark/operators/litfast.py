"""One-py4j-round-trip double-array literals.

``F.array(*[F.lit(x) for x in row])`` costs one py4j round trip per
element; the codebook/centroid/plane literals in the deterministic
ANN trainers reach 1–2k elements and were profiled at 2–7 ms PER
round trip under session GC pressure — 14 s of a 38 s
``topk_ivfpq_deterministic`` DataFrame build was ``F.lit`` calls
alone. Rendering the same nested array as ONE Spark SQL expression
string (``array(array(0.25D, ...), ...)``) moves construction to a
single round trip parsed JVM-side (measured 6 ms for 1024 elements,
~200x faster).

Bit-exactness: ``repr(float)`` emits the shortest decimal that
round-trips under IEEE-754 double semantics, and Catalyst parses a
D-suffixed literal with ``Double.parseDouble``, which is correctly
rounded — so the parsed literal carries the identical 64 bits as
``F.lit(x)`` for every FINITE double (verified including -0.0 and
subnormals). Non-finite values and empty arrays (whose SQL literal
would type as array<void>) fall back to the per-element builder.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


class _Fallback(Exception):
    pass


def _render(vals) -> str:
    if isinstance(vals, (list, tuple)):
        if not vals:
            raise _Fallback  # array() types as array<void>
        return "array(" + ",".join(_render(v) for v in vals) + ")"
    x = float(vals)
    if x != x or x in (float("inf"), float("-inf")):
        raise _Fallback
    return repr(x) + "D"


def _slow(vals) -> Column:
    if isinstance(vals, (list, tuple)):
        return F.array(*[_slow(v) for v in vals])
    return F.lit(float(vals))


def dlit(vals) -> Column:
    """A double / arbitrarily-nested double-array literal Column,
    value-identical (bit-for-bit) to the per-element
    ``F.array``/``F.lit`` construction, built in one py4j round
    trip."""
    try:
        sql = _render(vals)
    except _Fallback:
        return _slow(vals)
    return F.expr(sql)
