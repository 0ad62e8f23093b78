"""Network-address column functions (Humio ``cidr()`` analog —
README.md:5-8 delegates subnet filtering of Falcon events to Humio;
we internalize it).

Pure built-in column expressions: dotted-quad → uint32 via split + base-256
fold, CIDR membership via a prefix-aligned shiftright compare. Stays inside
whole-stage codegen — no UDF, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ip_to_long(col: Column | str) -> Column:
    """IPv4 dotted-quad string → uint32 as bigint (big-endian fold)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"\.")
    return (
        F.element_at(parts, 1).cast("bigint") * F.lit(16777216)
        + F.element_at(parts, 2).cast("bigint") * F.lit(65536)
        + F.element_at(parts, 3).cast("bigint") * F.lit(256)
        + F.element_at(parts, 4).cast("bigint")
    )


def cidr_match(col: Column | str, cidr: str) -> Column:
    """True iff the IPv4 address is inside ``cidr`` ("a.b.c.d/p").

    The network constant folds at plan time (Python parses the literal);
    only ``shiftright(ip_to_long(col), 32-p) == net >> (32-p)`` reaches the
    executors. /0 matches everything; /32 is exact equality.
    """
    net_s, _, plen_s = cidr.partition("/")
    plen = int(plen_s) if plen_s else 32
    if not 0 <= plen <= 32:
        raise ValueError(f"bad prefix length in {cidr!r}")
    octets = [int(x) for x in net_s.split(".")]
    if len(octets) != 4 or any(not 0 <= o <= 255 for o in octets):
        raise ValueError(f"bad IPv4 network in {cidr!r}")
    net = (octets[0] << 24) | (octets[1] << 16) | (octets[2] << 8) | octets[3]
    if plen == 0:
        return F.lit(True)
    shift = 32 - plen
    return F.shiftright(ip_to_long(col), shift) == F.lit(net >> shift)
