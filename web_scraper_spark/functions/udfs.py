"""Vectorized (Arrow-batched) extraction UDFs.

One struct-returning pandas UDF carries a whole HTML batch across the
JVM↔Python boundary exactly once and returns every extraction product
(cleaned html, extracted text, markdown body, OpenGraph map, image
records, title) in a single struct — downstream consumers select
fields, so Catalyst prunes unreferenced products at the Arrow writer.

Per-row semantics delegate to :mod:`web_scraper_spark.html` (the
deterministic extraction core); nothing else in the pipeline runs
Python per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..html.clean import clean_dom, extract_og_metadata, images_from_doc, links_from_doc
from ..html.dom import parse_html
from ..html.markdown import html_to_markdown

IMAGE_STRUCT = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("alt", T.StringType()),
        T.StructField("width", T.StringType()),
        T.StructField("height", T.StringType()),
    ]
)

EXTRACTED_STRUCT = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("clean_html", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("og_title", T.StringType()),
        T.StructField("og_description", T.StringType()),
        T.StructField("og_image", T.StringType()),
        T.StructField("images", T.ArrayType(IMAGE_STRUCT)),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


def extract_page_record(html: str, url: str) -> dict:
    """Pure per-row extraction (driver-free, clock-free): D1 clean →
    serialize → D2 markdown on the serialized clean html — the same
    dataflow the reference's per-URL pipeline runs
    (contxt/cli.py:44-118 sequence; extraction contract per
    SURVEY.md caveat 1). One parse of the raw HTML serves OG/image/
    link extraction and the destructive clean (the reference also
    reads metadata and images from the pre-clean tree)."""
    doc = parse_html(html)
    og = extract_og_metadata(doc)
    images = images_from_doc(doc, url)
    links = links_from_doc(doc, url)
    clean_dom(doc)
    cleaned = doc.to_html()
    title_el = doc.find("title")
    title = title_el.get_text(strip=True) if title_el is not None else ""
    return {
        "title": title or og.get("og_title") or url,
        "clean_html": cleaned,
        "text": doc.get_text(strip=True, separator=" "),
        "markdown": html_to_markdown(cleaned),
        "og_title": og.get("og_title"),
        "og_description": og.get("og_description"),
        "og_image": og.get("og_image"),
        "images": images,
        "links": links,
    }


@pandas_udf(EXTRACTED_STRUCT)
def extract_page_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    rows = []
    for h, u in zip(html, url):
        if h is None:
            rows.append(
                {f.name: ([] if f.name == "images" else None) for f in EXTRACTED_STRUCT.fields}
            )
            continue
        if isinstance(h, (bytes, bytearray)):
            h = bytes(h).decode("utf-8", errors="replace")
        rows.append(extract_page_record(h, u or ""))
    return pd.DataFrame(rows, columns=[f.name for f in EXTRACTED_STRUCT.fields])


def extract_pages(df: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """pages → extracted: one Arrow round-trip, then JVM-side products.

    token_count is computed from clean_html with the reference's
    fallback estimator (len // 4, contxt/scraper.py:423-426) as a pure
    Column expression so it stays inside codegen.
    """
    ex = extract_page_udf(F.col(html_col), F.col(url_col))
    out = df.withColumn("_ex", ex)
    for field in EXTRACTED_STRUCT.fields:
        out = out.withColumn(field.name, F.col(f"_ex.{field.name}"))
    out = out.drop("_ex", html_col)
    out = out.withColumn("token_count", (F.length("clean_html") / 4).cast("int"))
    out = out.withColumn("n_images", F.size("images"))
    return out
