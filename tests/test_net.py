"""Edge-case contracts for the CIDR column functions (functions/net.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cses2humio_spark.functions.net import cidr_match, ip_to_long


def _eval(spark, ip: str, cidr: str) -> bool:
    df = spark.range(1).select(
        cidr_match(F.lit(ip), cidr).alias("m")
    )
    return df.collect()[0]["m"]


def test_ip_to_long_fold(spark):
    rows = (
        spark.createDataFrame(
            [("0.0.0.0",), ("255.255.255.255",), ("10.0.0.1",), ("192.168.1.20",)],
            "ip string",
        )
        .select(ip_to_long("ip").alias("v"))
        .collect()
    )
    assert [r["v"] for r in rows] == [0, 4294967295, 167772161, 3232235796]


@pytest.mark.parametrize(
    "ip,cidr,expect",
    [
        ("10.0.0.1", "10.0.0.0/8", True),
        ("11.0.0.1", "10.0.0.0/8", False),
        # boundary: last address inside vs first address outside
        ("10.63.255.255", "10.0.0.0/10", True),
        ("10.64.0.0", "10.0.0.0/10", False),
        ("10.64.0.0", "10.64.0.0/10", True),
        # /32 is exact match
        ("192.168.1.20", "192.168.1.20/32", True),
        ("192.168.1.21", "192.168.1.20/32", False),
        # /0 matches everything
        ("255.255.255.255", "0.0.0.0/0", True),
        # bare address means /32
        ("192.168.1.20", "192.168.1.20", True),
        ("192.168.1.21", "192.168.1.20", False),
    ],
)
def test_cidr_membership(spark, ip, cidr, expect):
    assert _eval(spark, ip, cidr) is expect


def test_cidr_rejects_bad_inputs():
    with pytest.raises(ValueError):
        cidr_match(F.lit("1.2.3.4"), "10.0.0.0/33")
    with pytest.raises(ValueError):
        cidr_match(F.lit("1.2.3.4"), "10.0.256.0/8")
    with pytest.raises(ValueError):
        cidr_match(F.lit("1.2.3.4"), "10.0.0/8")
