"""Per-row byte-identical parity: Spark extraction vs the pure-Python
oracle (the north-rule invariant — BASELINE.json input_hint)."""

from web_scraper_spark.functions.udfs import extract_page_record, extract_pages
from web_scraper_spark.sources.pages import gen_page_html, pages_df, url_for


def test_spark_extraction_matches_oracle_byte_identical(spark):
    n = 64
    df = pages_df(spark, n)
    out = extract_pages(df).select(
        "url", "title", "clean_html", "text", "markdown",
        "og_title", "og_description", "og_image", "images", "token_count",
    )
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == n

    for rid in range(n):
        url = url_for(rid)
        html = gen_page_html(rid, universe=n)
        want = extract_page_record(html, url)
        got = rows[url]
        assert got["title"] == want["title"], url
        assert got["clean_html"] == want["clean_html"], url
        assert got["text"] == want["text"], url
        assert got["markdown"] == want["markdown"], url
        assert got["og_title"] == want["og_title"]
        assert got["og_description"] == want["og_description"]
        assert got["og_image"] == want["og_image"]
        got_imgs = [
            {"url": i["url"], "alt": i["alt"], "width": i["width"], "height": i["height"]}
            for i in got["images"]
        ]
        assert got_imgs == want["images"], url
        assert got["token_count"] == len(want["clean_html"]) // 4


def test_pages_generator_deterministic(spark):
    a = pages_df(spark, 32).select("url", "html").collect()
    b = pages_df(spark, 32).select("url", "html").collect()
    assert sorted((r["url"], bytes(r["html"])) for r in a) == sorted(
        (r["url"], bytes(r["html"])) for r in b
    )


def test_pruned_products_in_udf_counts_match_full_path(spark):
    """extract_pages without the carrier columns: token_count/n_images
    are computed inside the UDF (only ints cross Arrow) and must equal
    the JVM-derived values of the full-product path; clean_html/images
    must not appear in the pruned output at all. Null html rows keep
    the full path's semantics (0 images, NULL token count)."""
    from pyspark.sql import functions as F

    n = 48
    df = pages_df(spark, n)
    full = {
        r["url"]: r
        for r in extract_pages(df)
        .select("url", "title", "text", "token_count", "n_images")
        .collect()
    }
    pruned_df = extract_pages(
        df, products=("title", "text", "token_count", "n_images", "links")
    )
    assert "clean_html" not in pruned_df.columns
    assert "images" not in pruned_df.columns
    pruned = {
        r["url"]: r
        for r in pruned_df.select(
            "url", "title", "text", "token_count", "n_images"
        ).collect()
    }
    assert set(pruned) == set(full)
    for url, want in full.items():
        got = pruned[url]
        assert (got["title"], got["text"], got["token_count"], got["n_images"]) == (
            want["title"], want["text"], want["token_count"], want["n_images"]
        ), url

    nullrow = spark.createDataFrame(
        [("https://x.example/", None)], "url string, html binary"
    )
    for prods in [None, ("token_count", "n_images")]:
        r = extract_pages(nullrow, products=prods).select(
            "token_count", "n_images"
        ).collect()[0]
        assert r["token_count"] is None and r["n_images"] == 0, prods
