"""Vectorized outlink-extraction stage: pages → (url, outlinks, n_links).

Same Arrow-batched mapInPandas shape as operators/extract.py (one
JVM↔Python crossing per batch), same narrow-operation contract (preserves
input partitioning, no shuffle). The per-document logic is
extractor/links.extract_outlinks — deterministic pure Python.

Downstream: explode(outlinks) + host aggregation builds the host link
graph (the pr1 input shape); at 10^12 pages the edge list shuffles once
on the dst-host key and everything upstream of it is this narrow stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from greenocr_spark.extractor.links import extract_anchors, extract_outlinks

LINKS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("outlinks", ArrayType(StringType())),
        StructField("n_links", IntegerType()),
    ]
)


def extract_links(df: DataFrame) -> DataFrame:
    """Input requires (url:string, html:binary); output one row per page
    with its unique resolved http(s) outlinks in first-seen order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            urls = pdf["url"].tolist()
            links = [
                extract_outlinks(raw, base_url=u)
                for u, raw in zip(urls, pdf["html"].tolist())
            ]
            yield pd.DataFrame(
                {
                    "url": urls,
                    "outlinks": links,
                    "n_links": [len(x) for x in links],
                }
            )

    return df.select("url", "html").mapInPandas(run, schema=LINKS_SCHEMA)


ANCHORS_SCHEMA = StructType(
    [
        StructField("src", StringType()),
        StructField("seq", IntegerType()),
        StructField("dst", StringType()),
        StructField("anchor", StringType()),
    ]
)


def extract_anchors_df(df: DataFrame) -> DataFrame:
    """Anchor-text harvest: one output row per <a href>…</a> ELEMENT of
    every page — (src page url, seq = position within the page's anchor
    list, dst target url, anchor text). Duplicates are kept (the whole
    point of anchor-text aggregation is multiplicity) and `seq` makes each
    row unique, so order-insensitive xor-hash oracles can't self-cancel on
    repeated (src, dst, anchor) triples.

    Same narrow Arrow-batched mapInPandas shape as extract_links; the
    per-document logic is extractor/links.extract_anchors (pure Python,
    href resolution shared with the outlink spec). At 10^12 pages the
    anchor table shuffles once on whatever key the consumer aggregates by
    (dst host for anchor-term indexing) and everything upstream is this
    embarrassingly parallel stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            src: list[str] = []
            seq: list[int] = []
            dst: list[str] = []
            anchor: list[str] = []
            for u, raw in zip(pdf["url"].tolist(), pdf["html"].tolist()):
                for i, (d, a) in enumerate(extract_anchors(raw, base_url=u)):
                    src.append(u)
                    seq.append(i)
                    dst.append(d)
                    anchor.append(a)
            yield pd.DataFrame(
                {"src": src, "seq": seq, "dst": dst, "anchor": anchor}
            )

    return df.select("url", "html").mapInPandas(run, schema=ANCHORS_SCHEMA)
