"""The vectorized extraction stage: DataFrame → DataFrame via mapInPandas.

This is UD1+UD3+UD5+UD6 of SURVEY.md §2.9 fused into one Arrow-batched
stage (one JVM↔Python boundary crossing per batch, never per row). The
per-document math is greenocr_spark.extractor.core — the byte-identity
spec — called unmodified, so Spark output ≡ reference extractor output.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from greenocr_spark.extractor.core import DEFAULT_CONFIG, ExtractorConfig, extract_document

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("block_idx", IntegerType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("cls", StringType()),
        ]
    )
)

EXTRACT_FIELDS = [
    StructField("url", StringType()),
    StructField("text", StringType()),
    StructField("spans", SPAN_TYPE),
    StructField("n_blocks", IntegerType()),
    StructField("n_content", IntegerType()),
    StructField("n_boilerplate", IntegerType()),
    StructField("bytes_in", LongType()),
    StructField("bytes_out", LongType()),
    StructField("kind", StringType()),
]


LINK_FIELDS = [
    StructField("outlinks", ArrayType(StringType())),
    StructField("n_links", IntegerType()),
]

ANCHOR_FIELDS = [
    StructField(
        "anchors",
        ArrayType(
            StructType(
                [
                    StructField("dst", StringType()),
                    StructField("anchor", StringType()),
                ]
            )
        ),
    ),
    StructField("n_anchors", IntegerType()),
]


def extract_schema(
    passthrough: list | None = None,
    input_schema: StructType | None = None,
    with_links: bool = False,
    with_anchors: bool = False,
) -> StructType:
    fields = list(EXTRACT_FIELDS)
    if with_links:
        fields += LINK_FIELDS
    if with_anchors:
        fields += ANCHOR_FIELDS
    if passthrough:
        by_name = {f.name: f for f in (input_schema.fields if input_schema else [])}
        for name in passthrough:
            fields.append(by_name[name])
    return StructType(fields)


def extract_pages(
    df: DataFrame,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    passthrough: tuple = (),
    with_links: bool = False,
    with_anchors: bool = False,
) -> DataFrame:
    """Run main-content extraction over a pages DataFrame.

    Input requires columns (url:string, html:binary); `passthrough` columns
    are carried to the output unchanged (e.g. part_id). Narrow operation —
    preserves the input's partitioning, no shuffle.

    with_links=True additionally harvests each page's outlinks
    (extractor/links spec) in the SAME batch loop — at 10^12 pages the
    payload scan dominates both faces, so fusing them halves the I/O vs
    running operators/links.extract_links as a second pass. Default off:
    the text-only schema and every frozen byte-identity surface are
    untouched. (The link pass re-decodes the payload — a bounded C-speed
    .decode(); sharing the decoded string would couple the frozen text
    path to the link spec for ~nothing.)

    with_anchors=True likewise fuses the anchor-text harvest
    (extractor/links.extract_anchors — (dst, anchor) per closed <a>
    element, duplicates kept) into the same batch loop, for the same
    one-payload-scan reason; composes freely with with_links."""
    schema = extract_schema(list(passthrough), df.schema, with_links, with_anchors)
    keep = ["url", "html", *passthrough]
    if with_links:
        from greenocr_spark.extractor.links import extract_outlinks
    if with_anchors:
        from greenocr_spark.extractor.links import extract_anchors

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            out = {
                "url": pdf["url"].tolist(),
                "text": [None] * n,
                "spans": [None] * n,
                "n_blocks": [0] * n,
                "n_content": [0] * n,
                "n_boilerplate": [0] * n,
                "bytes_in": [0] * n,
                "bytes_out": [0] * n,
                "kind": [""] * n,
            }
            if with_links:
                out["outlinks"] = [None] * n
                out["n_links"] = [0] * n
            if with_anchors:
                out["anchors"] = [None] * n
                out["n_anchors"] = [0] * n
            for i, raw in enumerate(pdf["html"].tolist()):
                r = extract_document(raw, cfg)
                out["text"][i] = r["text"]
                # core emits spans as (block_idx, start, end, cls) tuples;
                # Arrow accepts tuples positionally for struct arrays, so
                # they pass through with zero per-span re-boxing
                out["spans"][i] = r["spans"]
                out["n_blocks"][i] = r["n_blocks"]
                out["n_content"][i] = r["n_content"]
                out["n_boilerplate"][i] = r["n_boilerplate"]
                out["bytes_in"][i] = len(raw) if raw is not None else 0
                out["bytes_out"][i] = len(r["text"].encode("utf-8"))
                out["kind"][i] = r["kind"]
                links = None
                if with_links:
                    links = extract_outlinks(raw, base_url=out["url"][i])
                    out["outlinks"][i] = links
                    out["n_links"][i] = len(links)
                if with_anchors:
                    # (dst, anchor) tuples pass positionally to the Arrow
                    # struct array, same zero-re-boxing path as spans;
                    # the already-computed outlink list feeds the anchor
                    # face's subset gate so it doesn't re-scan the payload
                    anchors = extract_anchors(
                        raw, base_url=out["url"][i], valid=links
                    )
                    out["anchors"][i] = anchors
                    out["n_anchors"][i] = len(anchors)
            res = pd.DataFrame(out)
            for name in passthrough:
                res[name] = pdf[name].values
            yield res

    return df.select(*keep).mapInPandas(run, schema=schema)
