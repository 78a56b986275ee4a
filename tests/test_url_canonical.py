"""canonicalize_url: each normalization rule individually, plus the
idempotence and variant-collapse properties the q_url_dedup_rate gate
relies on."""

from __future__ import annotations

import pytest

import flink_estimator_spark.plans  # noqa: F401  (finish registry init first)
from pyspark.sql import functions as F

from flink_estimator_spark.operators.cleaning import canonicalize_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c"))
        .collect()
    ]


CASES = [
    # fragment stripped
    ("https://a.com/x#frag", "https://a.com/x"),
    # scheme + host lowercased, path case PRESERVED
    ("HTTPS://A.Com/Path", "https://a.com/Path"),
    # leading www. dropped
    ("https://www.a.com/x", "https://a.com/x"),
    # default ports dropped; non-default kept
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # trailing slash(es) stripped
    ("https://a.com/x/", "https://a.com/x"),
    ("https://a.com/x///", "https://a.com/x"),
    # tracking params dropped, survivors sorted
    ("https://a.com/x?utm_source=f&id=1", "https://a.com/x?id=1"),
    ("https://a.com/x?b=2&a=1", "https://a.com/x?a=1&b=2"),
    ("https://a.com/x?gclid=g&fbclid=f&ref=r", "https://a.com/x"),
    # all together
    (
        "HTTPS://WWW.A.com:443/p/?utm_campaign=x&id=9&ref=h#sec",
        "https://a.com/p?id=9",
    ),
    # utm-prefix params of any name are tracking; 'refresh' is NOT 'ref'
    ("https://a.com/x?utm_x=1&refresh=2", "https://a.com/x?refresh=2"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_rules(spark, raw, expected):
    assert _canon(spark, [raw]) == [expected]


def test_idempotent(spark):
    once = _canon(spark, [r for r, _ in CASES])
    assert _canon(spark, once) == once


def test_variant_collapse(spark):
    """The gate's four spelling variants of one page collapse to one
    canonical URL."""
    variants = [
        "https://www.src3.Example.COM/page/2?utm_source=a&id=2",
        "https://src3.example.com/page/2?id=2&utm_campaign=x",
        "HTTPS://src3.example.com:443/page/2?id=2",
        "https://src3.example.com/page/2/?id=2#frag",
    ]
    assert len(set(_canon(spark, variants))) == 1
