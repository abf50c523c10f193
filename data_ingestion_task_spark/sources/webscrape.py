"""Web-scrape source (SURVEY §2.1, `code/python/webscrapping.py:1-31`):
fetch a page, extract address-like elements, land them in a DataFrame.

Driver-side by design — one page fetch feeding a small dimension
table, not a distributed crawl. The fetcher is INJECTABLE so tests
(and air-gapped environments like this container) run against a fake;
the default uses stdlib urllib, no third-party HTTP/HTML deps (the
reference's BeautifulSoup class-selector becomes a class-anchored
regex + tag strip, which covers its exact usage)."""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def default_fetcher(url: str, timeout_s: float = 10.0) -> str:
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout_s) as r:  # noqa: S310
        return r.read().decode("utf-8", errors="replace")


def extract_by_class(html: str, css_class: str) -> list[str]:
    """All text contents of elements carrying ``css_class``
    (the soup.find_all(class_=...) pattern), tags stripped,
    whitespace collapsed. Handles double- or single-quoted class
    attributes. Known limit of regex extraction: an element nesting a
    child of the SAME tag truncates at the child's close tag — the
    reference's flat address listings don't do that; bring a real
    parser for arbitrary HTML."""
    cls = re.escape(css_class)
    pat = re.compile(
        rf"<(\w+)[^>]*\bclass=(?:\"[^\"]*\b{cls}\b[^\"]*\"|'[^']*\b{cls}\b[^']*')[^>]*>(.*?)</\1>",
        re.S,
    )
    out = []
    for _tag, body in pat.findall(html):
        text = re.sub(r"<[^>]+>", " ", body)
        text = re.sub(r"\s+", " ", text).strip()
        text = re.sub(r"\s+([,.;:])", r"\1", text)  # no space before punctuation
        if text:
            out.append(text)
    return out


def scrape_addresses(
    spark: SparkSession,
    url: str,
    css_class: str = "address-class",
    fetcher: Callable[[str], str] | None = None,
) -> DataFrame:
    """webscrapping.py's scrape → address DataFrame, one row per
    matched element (column ``address``)."""
    html = (fetcher or default_fetcher)(url)
    rows = [(a,) for a in extract_by_class(html, css_class)]
    return spark.createDataFrame(rows, "address string")
