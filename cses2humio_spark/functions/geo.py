"""Geo functions for the SIEM surface (LogScale worldMap dashboards):
geohash encoding as PURE CODEGEN integer arithmetic — no UDF, no
library, and bit-for-bit replayable in a SQL oracle.

Geohash: latitude and longitude are binary-bisected, the bits
interleaved (longitude first), and each 5-bit group mapped through the
standard base-32 alphabet. For precision p chars there are ceil(5p/2)
longitude bits and floor(5p/2) latitude bits; the bisection path equals
the integer ``floor((x - lo) / span * 2^bits)`` (clamped at the top
edge), so the whole encode is two quantizations + a fixed bit
interleave — expressible as an unrolled shift/mask sum inside
whole-stage codegen, identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lng: Column, precision: int = 8) -> Column:
    """Standard geohash of (lat, lng) at ``precision`` characters
    (1..12). NULL-safe: a NULL coordinate yields NULL. Out-of-range
    coordinates are the caller's bug — values are clamped only at the
    exact top edge (lat=90, lng=180 belong to the last cell)."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be 1..12, got {precision}")
    total_bits = 5 * precision
    lng_bits = (total_bits + 1) // 2  # longitude first -> gets the extra bit
    lat_bits = total_bits // 2

    def quant(x: Column, lo: float, span: float, bits: int) -> Column:
        idx = F.floor(
            (x.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(1 << bits))
        ).cast("bigint")
        # top edge inclusive — via CASE, not least(): least() IGNORES
        # nulls (both engines), which would turn a NULL coordinate into
        # the max cell instead of a NULL hash
        top = F.lit((1 << bits) - 1)
        return F.when(idx > top, top).otherwise(idx)

    lat_idx = quant(lat, -90.0, 180.0, lat_bits)
    lng_idx = quant(lng, -180.0, 360.0, lng_bits)
    # interleave: geohash bit j (0 = most significant of total_bits) is a
    # longitude bit for even j, latitude for odd j — build the combined
    # integer as an unrolled sum of shift/mask terms (codegen-friendly)
    combined = F.lit(0).cast("bigint")
    for j in range(total_bits):
        if j % 2 == 0:  # longitude bit
            src, src_bit = lng_idx, lng_bits - 1 - (j // 2)
        else:  # latitude bit
            src, src_bit = lat_idx, lat_bits - 1 - (j // 2)
        bit = F.shiftright(src, src_bit).bitwiseAND(F.lit(1))
        combined = combined + (bit * F.lit(1 << (total_bits - 1 - j)))
    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (
                F.shiftright(combined, 5 * (precision - 1 - c))
                .bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_encode_sql_parts(
    lat: str, lng: str, precision: int = 8
) -> tuple[str, str, str, str]:
    """The DuckDB spelling of the IDENTICAL computation, as four CTE
    stage expressions — kept next to the Spark builder so the two
    cannot drift independently. Returns ``(lat_idx, lng_idx, combined,
    chars)``: stage 2 references ``__lat``/``__lng``, stage 3
    references ``__gh``."""
    total_bits = 5 * precision
    lng_bits = (total_bits + 1) // 2
    lat_bits = total_bits // 2
    def clamp(expr: str, top: int) -> str:
        # CASE, not LEAST: LEAST ignores NULLs in both engines
        return (
            f"CASE WHEN ({expr}) > {top} THEN {top} ELSE ({expr}) END"
        )

    lat_idx = clamp(
        f"CAST(FLOOR((CAST({lat} AS DOUBLE) - (-90.0)) / 180.0 * "
        f"{float(1 << lat_bits)!r}) AS BIGINT)",
        (1 << lat_bits) - 1,
    )
    lng_idx = clamp(
        f"CAST(FLOOR((CAST({lng} AS DOUBLE) - (-180.0)) / 360.0 * "
        f"{float(1 << lng_bits)!r}) AS BIGINT)",
        (1 << lng_bits) - 1,
    )
    terms = []
    for j in range(total_bits):
        if j % 2 == 0:
            src, src_bit = "__lng", lng_bits - 1 - (j // 2)
        else:
            src, src_bit = "__lat", lat_bits - 1 - (j // 2)
        terms.append(
            f"(({src} >> {src_bit}) & 1) * {1 << (total_bits - 1 - j)}"
        )
    combined = " + ".join(terms)
    chars = " || ".join(
        f"substring('{GEOHASH_ALPHABET}', "
        f"CAST(((__gh >> {5 * (precision - 1 - c)}) & 31) + 1 AS INT), 1)"
        for c in range(precision)
    )
    return lat_idx, lng_idx, combined, chars
