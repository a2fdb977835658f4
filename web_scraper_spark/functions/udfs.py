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
from pyspark.sql import DataFrame
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


ALL_PRODUCTS = tuple(f.name for f in EXTRACTED_STRUCT.fields)


def make_extract_udf(products: tuple[str, ...] = ALL_PRODUCTS):
    """Build a struct-returning extraction UDF restricted to the
    requested products — column pruning *through* the Arrow boundary.

    Catalyst cannot prune inside an opaque UDF, so the caller declares
    which extraction products it needs and the Arrow return stream
    carries only those columns (markdown/clean_html dominate the
    return volume; a counts-only consumer ships ~50x fewer bytes).
    ``token_count``/``n_images`` consumers need ``clean_html``/
    ``images`` respectively (added automatically by extract_pages).
    """
    fields = [f for f in EXTRACTED_STRUCT.fields if f.name in set(products)]
    schema = T.StructType(fields)
    names = [f.name for f in fields]

    @pandas_udf(schema)
    def extract_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
        rows = []
        for h, u in zip(html, url):
            if h is None:
                rows.append({n: ([] if n in ("images", "links") else None) for n in names})
                continue
            if isinstance(h, (bytes, bytearray)):
                h = bytes(h).decode("utf-8", errors="replace")
            rec = extract_page_record(h, u or "")
            rows.append({n: rec[n] for n in names})
        return pd.DataFrame(rows, columns=names)

    return extract_udf


extract_page_udf = make_extract_udf()


def extract_pages(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    products: tuple[str, ...] | None = None,
) -> DataFrame:
    """pages → extracted: one Arrow round-trip, then JVM-side products.

    ``products`` limits which extraction outputs cross the Arrow
    boundary (None = all). token_count is computed from clean_html
    with the reference's fallback estimator (len // 4,
    contxt/scraper.py:423-426) as a pure Column expression so it stays
    inside codegen; requesting it implies clean_html.
    """
    want_tokens = products is None or "token_count" in products
    want_nimages = products is None or "n_images" in products
    if products is None:
        prods = ALL_PRODUCTS
    else:
        prods = tuple(
            dict.fromkeys(
                [p for p in products if p in ALL_PRODUCTS]
                + (["clean_html"] if want_tokens else [])
                + (["images"] if want_nimages else [])
            )
        )
    udf = extract_page_udf if prods == ALL_PRODUCTS else make_extract_udf(prods)
    ex = udf(F.col(html_col), F.col(url_col))
    out = df.withColumn("_ex", ex)
    for name in prods:
        out = out.withColumn(name, F.col(f"_ex.{name}"))
    out = out.drop("_ex", html_col)
    if want_tokens:
        # A4 via the tokenizer seam: the char4 fallback matches the
        # reference's tiktoken-absent branch (contxt/scraper.py:423-426)
        # and compiles to a JVM expression; a real cluster swaps the
        # encoder without touching this call site.
        from .tokenizer import Char4Encoder, token_count_column

        out = out.withColumn(
            "token_count", token_count_column(F.col("clean_html"), Char4Encoder())
        )
    if want_nimages:
        out = out.withColumn("n_images", F.size("images"))
    return out
