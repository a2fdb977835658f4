"""WARC source: Content-Length framing, gzip members, HTTP split,
pages adapter. Reference analog: none (the reference fetches live
pages); this is the Common-Crawl-archive ingest seam."""

import gzip

from pyspark.sql import Row
from pyspark.sql import functions as F

from web_scraper_spark.sources.warc import (
    _http_split,
    _iter_warc_records,
    pages_from_warc,
    parse_warc_records,
)


def _record(rtype: bytes, payload: bytes, extra: bytes = b"") -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype + b"\r\n" + extra +
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )


def _response(url: bytes, body: bytes, status: bytes = b"200 OK") -> bytes:
    payload = (
        b"HTTP/1.1 " + status + b"\r\nContent-Type: text/html\r\n\r\n" + body
    )
    return _record(
        b"response",
        payload,
        b"WARC-Target-URI: " + url + b"\r\n"
        b"WARC-Date: 2024-05-04T12:00:07Z\r\n",
    )


def test_content_length_framing_payload_contains_warc_header():
    # the payload embeds a complete fake record — delimiter splitting
    # would yield 3 records; Content-Length framing yields 2
    trap = b"<pre>WARC/1.0\r\nContent-Length: 4\r\n\r\nboom\r\n\r\n</pre>"
    blob = _response(b"https://a.example/1", trap) + _response(
        b"https://a.example/2", b"<p>ok</p>"
    )
    recs = list(_iter_warc_records(blob))
    assert len(recs) == 2
    assert recs[0][1][b"warc-target-uri"] == b"https://a.example/1"
    assert recs[0][2].endswith(trap)
    # offsets are record starts in the blob
    assert recs[0][0] == 0 and recs[1][0] > len(trap)


def test_gzip_blob_and_truncated_tail():
    good = _response(b"https://a.example/1", b"<p>hi</p>")
    # truncated tail: header claims more bytes than remain
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    recs = list(_iter_warc_records(gzip.compress(good + bad)))
    assert len(recs) == 1  # complete record survives, truncation stops


def test_http_split_status_and_non_http_payloads():
    assert _http_split(b"HTTP/1.1 404 Not Found\r\nX: y\r\n\r\nbody") == (
        404,
        b"body",
    )
    assert _http_split(b"GET / HTTP/1.1\r\n\r\n") == (None, None)
    assert _http_split(b"software: test\r\n") == (None, None)
    assert _http_split(b"HTTP/1.1 weird\r\n\r\nx") == (None, None)


def test_parse_warc_records_and_pages_adapter(spark):
    info = _record(b"warcinfo", b"software: test\r\n")
    req = _record(
        b"request",
        b"GET /1 HTTP/1.1\r\nHost: a.example\r\n\r\n",
        b"WARC-Target-URI: https://a.example/1\r\n",
    )
    blob_a = (
        info
        + _response(b"https://a.example/1", b"<p>one</p>")
        + req
        + _response(b"https://a.example/2", b"<p>two</p>", b"404 Not Found")
    )
    blob_b = gzip.compress(_response(b"https://b.example/9", b"<p>nine</p>"))
    df = spark.createDataFrame(
        [Row(src=1, content=bytearray(blob_a)), Row(src=2, content=bytearray(blob_b))]
    )
    recs = parse_warc_records(df, content_col="content", id_col="src").persist()
    rows = {(r.src_id, r.rec_offset): r for r in recs.collect()}
    assert len(rows) == 5
    types = sorted(r.warc_type for r in rows.values())
    assert types == ["request", "response", "response", "response", "warcinfo"]
    statuses = sorted(
        r.http_status for r in rows.values() if r.http_status is not None
    )
    assert statuses == [200, 200, 404]

    pages = pages_from_warc(recs).orderBy("url")
    got = pages.select(
        "url", F.decode("html", "utf-8").alias("body"), "warc_ts"
    ).collect()
    recs.unpersist()
    assert [(r.url, r.body) for r in got] == [
        ("https://a.example/1", "<p>one</p>"),
        ("https://a.example/2", "<p>two</p>"),
        ("https://b.example/9", "<p>nine</p>"),
    ]
    assert all(r.warc_ts is not None for r in got)


def test_surt_url_edge_cases(spark):
    from web_scraper_spark.functions.columns import surt_url

    cases = [
        # (input, expected)
        ("https://www.Example.COM/Path/", "com,example)/path"),
        ("http://example.com:80/", "com,example)/"),
        ("https://example.com:8443/a", "com,example:8443)/a"),
        ("https://example.com/a?b=2&a=1&utm_source=x#frag",
         "com,example)/a?a=1&b=2"),
        ("https://sub.www.example.com", "com,example,www,sub)/"),
        ("https://example.com/a?utm_only=1", "com,example)/a"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = {r.url: r.surt for r in df.select("url", surt_url(F.col("url")).alias("surt")).collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_cdx_from_records_seek_triple(spark):
    from web_scraper_spark.sources.warc import cdx_from_records

    info = _record(b"warcinfo", b"software: test\r\n")
    r1 = _response(b"https://www.a.example/x?b=2&a=1", b"<p>one</p>")
    blob = info + r1 + _response(b"https://a.example/y", b"<p>two</p>", b"404 Not Found")
    df = spark.createDataFrame([Row(src=7, content=bytearray(blob))])
    cdx = cdx_from_records(
        parse_warc_records(df, content_col="content", id_col="src")
    ).orderBy("rec_offset")
    rows = cdx.collect()
    assert [r.surt for r in rows] == [
        "example,a)/x?a=1&b=2",
        "example,a)/y",
    ]
    assert rows[0].ts14 == "20240504120007"
    assert [r.http_status for r in rows] == [200, 404]
    # the seek triple: offset of record 2 = len(info) + len(record 1)
    assert rows[0].rec_offset == len(info)
    assert rows[1].rec_offset == len(info) + len(r1)
    assert rows[0].src_id == 7
    # rec_len is the full HTTP payload (status line + headers + body)
    assert rows[0].rec_len == len(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>one</p>"
    )


def test_crawl_over_warc_corpus(spark, tmp_path):
    """Replay-crawl composition: a parsed WARC archive IS a crawlable
    corpus — pages_from_warc feeds run_crawl's fetch join directly,
    the 100-TB training-pipeline path (crawl Common Crawl instead of
    the live web). Link discovery, depth, and the seen set must work
    identically to a synthetic corpus."""
    from web_scraper_spark.crawl.rounds import CrawlConfig, run_crawl
    from web_scraper_spark.sources.warc import pages_from_warc, parse_warc_records

    def page(url: str, links: list[str]) -> bytes:
        body = (
            "<html><body><main><h1>t</h1><p>hello world</p>"
            + "".join(f'<a href="{l}">l</a>' for l in links)
            + "</main></body></html>"
        )
        return _response(url.encode(), body.encode())

    blob = (
        page("https://a.example/", ["https://a.example/1", "https://b.example/"])
        + page("https://a.example/1", ["https://a.example/2"])
        + page("https://a.example/2", [])
        + page("https://b.example/", [])
    )
    df = spark.createDataFrame([Row(src=1, content=bytearray(blob))])
    pages = pages_from_warc(
        parse_warc_records(df, content_col="content", id_col="src")
    )
    cfg = CrawlConfig(
        ckpt_dir=str(tmp_path / "ck"), quota_per_host=8, max_depth=2, n_shards=4
    )
    stats = run_crawl(
        spark, cfg, pages, robots=None,
        seed_urls=["https://a.example/"], n_rounds=3,
    )
    assert stats[0]["scheduled"] == 1
    assert stats[1]["scheduled"] == 2  # both discovered links fetch
    assert stats[2]["scheduled"] == 1  # depth-2 tail


def test_read_warc_dir_binary_file_source(spark, tmp_path):
    """One task per segment file via the binaryFile source; gzip and
    plain segments in one directory; src_id keys back to files."""
    from web_scraper_spark.sources.warc import read_warc_dir

    seg1 = _response(b"https://a.example/1", b"<p>one</p>") + _response(
        b"https://a.example/2", b"<p>two</p>"
    )
    seg2 = gzip.compress(_response(b"https://b.example/9", b"<p>nine</p>"))
    (tmp_path / "seg-00001.warc").write_bytes(seg1)
    (tmp_path / "seg-00002.warc.gz").write_bytes(seg2)
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")
    recs = read_warc_dir(spark, str(tmp_path)).persist()
    assert recs.count() == 3
    assert recs.select("src_id").distinct().count() == 2
    urls = sorted(r.target_uri for r in recs.select("target_uri").collect())
    recs.unpersist()
    assert urls == [
        "https://a.example/1",
        "https://a.example/2",
        "https://b.example/9",
    ]


def test_merge_cdx_snapshots_revisit_collapse(spark):
    from web_scraper_spark.sources.warc import cdx_from_records, merge_cdx_snapshots

    def crawl(ts: bytes, body2: bytes) -> bytes:
        r1 = _record(
            b"response",
            b"HTTP/1.1 200 OK\r\n\r\n<p>same</p>",
            b"WARC-Target-URI: https://a.example/x\r\nWARC-Date: " + ts + b"\r\n",
        )
        r2 = _record(
            b"response",
            b"HTTP/1.1 200 OK\r\n\r\n" + body2,
            b"WARC-Target-URI: https://a.example/y\r\nWARC-Date: " + ts + b"\r\n",
        )
        return r1 + r2

    df = spark.createDataFrame(
        [
            Row(src=1, content=bytearray(crawl(b"2024-05-04T12:00:00Z", b"<p>v1</p>"))),
            Row(src=2, content=bytearray(crawl(b"2024-06-04T12:00:00Z", b"<p>v2</p>"))),
        ]
    )
    cdx = cdx_from_records(
        parse_warc_records(df, content_col="content", id_col="src")
    )
    merged = merge_cdx_snapshots(cdx).orderBy("surt", "ts14").collect()
    # /x unchanged: one row, earliest ts, 2 captures, seek into src 1
    # /y changed: both rows survive with 1 capture each
    assert [(r.surt, r.ts14[:6], r.n_captures, r.src_id) for r in merged] == [
        ("example,a)/x", "202405", 2, 1),
        ("example,a)/y", "202405", 1, 1),
        ("example,a)/y", "202406", 1, 2),
    ]


def test_archive_self_contained_crawl(spark, tmp_path):
    """The whole north-star loop from ONE archive: the snapshot
    supplies its own robots bodies (robots_from_pages), the robots
    directives name the sitemap, the corpus fetch supplies the sitemap
    XML (sitemap_seeds_from_robots), the parsed entries seed the
    frontier, and the same robots rules block disallowed discoveries —
    no live fetch, no side inputs."""
    from web_scraper_spark.crawl.robots import parse_robots, robots_from_pages
    from web_scraper_spark.crawl.rounds import CrawlConfig, run_crawl
    from web_scraper_spark.crawl.sitemaps import sitemap_seeds_from_robots
    from web_scraper_spark.sources.warc import pages_from_warc, parse_warc_records

    robots_body = (
        b"User-agent: *\r\n"  # \r\n survives the line split + trim
        b"Disallow: /private\n"
        b"Sitemap: https://a.example/sitemap.xml\n"
    )
    sitemap_body = (
        b'<?xml version="1.0"?><urlset>'
        b"<url><loc>https://a.example/page1</loc></url>"
        b"<url><loc>https://a.example/page2</loc></url>"
        b"</urlset>"
    )
    page1 = (
        b"<html><body><main><p>one</p>"
        b'<a href="https://a.example/private/secret">s</a>'
        b'<a href="https://a.example/page3">n</a></main></body></html>'
    )
    blob = (
        _response(b"https://a.example/robots.txt", robots_body)
        + _response(b"https://a.example/sitemap.xml", sitemap_body)
        + _response(b"https://a.example/page1", page1)
        + _response(b"https://a.example/page2", b"<html><body><p>two</p></body></html>")
        + _response(b"https://a.example/page3", b"<html><body><p>three</p></body></html>")
        + _response(b"https://a.example/private/secret", b"<html><body><p>x</p></body></html>")
    )
    df = spark.createDataFrame([Row(src=1, content=bytearray(blob))])
    pages = pages_from_warc(
        parse_warc_records(df, content_col="content", id_col="src")
    ).persist()

    robots_raw = robots_from_pages(pages)
    rules = parse_robots(robots_raw)
    seed_sitemaps = sitemap_seeds_from_robots(robots_raw, pages)

    cfg = CrawlConfig(
        ckpt_dir=str(tmp_path / "ck"), quota_per_host=8, max_depth=2, n_shards=4
    )
    stats = run_crawl(
        spark, cfg, pages, robots=rules, seed_urls=None,
        n_rounds=3, seed_sitemaps=seed_sitemaps,
    )
    pages.unpersist()
    assert stats[0]["scheduled"] == 2          # the two sitemap leaves
    assert stats[1]["scheduled"] == 1          # page3 only: /private blocked
    fetched = {
        r.url
        for r in spark.read.parquet(
            *[f"{tmp_path}/ck/round={i}/fetch_log" for i in (0, 1)]
        ).collect()
    }
    assert fetched == {
        "https://a.example/page1",
        "https://a.example/page2",
        "https://a.example/page3",
    }


def test_gzip_member_per_record_layout():
    """Common Crawl stores segments as CONCATENATED gzip members, one
    per record — one decompress call must yield the whole stream."""
    r1 = _response(b"https://a.example/1", b"<p>one</p>")
    r2 = _response(b"https://a.example/2", b"<p>two</p>")
    blob = gzip.compress(r1) + gzip.compress(r2)  # two members
    recs = list(_iter_warc_records(blob))
    assert [r[1][b"warc-target-uri"] for r in recs] == [
        b"https://a.example/1",
        b"https://a.example/2",
    ]


def test_write_warc_dir_round_trips_bodies(spark, tmp_path):
    """Curated-subset export: pages → WARC segments (one gzip member
    per record) → read back → byte-identical bodies per url."""
    from web_scraper_spark.sources.warc import (
        pages_from_warc,
        read_warc_dir,
        write_warc_dir,
    )

    src = spark.createDataFrame(
        [
            ("https://a.example/1", "2024-05-04 12:00:00", b"<p>one \xe2\x9c\x93</p>"),
            ("https://a.example/2", "2024-05-04 12:00:01", b"<p>two</p>"),
            ("https://b.example/9", None, b"<p>nine</p>"),
        ],
        "url string, ts string, html binary",
    ).select("url", F.to_timestamp("ts").alias("warc_ts"), "html")
    out = str(tmp_path / "export")
    manifest = write_warc_dir(src.repartition(2, "url"), out).collect()
    assert sum(m.n_records for m in manifest) == 3
    assert all(m.path.endswith(".warc.gz") for m in manifest)

    back = pages_from_warc(read_warc_dir(spark, out))
    got = {
        r.url: bytes(r.html)
        for r in back.select("url", "html").collect()
    }
    assert got == {
        "https://a.example/1": b"<p>one \xe2\x9c\x93</p>",
        "https://a.example/2": b"<p>two</p>",
        "https://b.example/9": b"<p>nine</p>",
    }
    # null warc_ts exported with the epoch sentinel, parses back
    ts = {r.url: r.warc_ts for r in back.collect()}
    assert ts["https://b.example/9"] is not None


def test_wet_round_trip_and_conversion_records(spark, tmp_path):
    """WET derivation + export: wet_from_pages extracts text; the
    written segments are WARC-Type: conversion records whose payloads
    round-trip byte-exactly through the same Content-Length parser
    that reads response segments."""
    import os

    from web_scraper_spark.sources.warc import (
        read_warc_dir,
        wet_from_pages,
        write_wet_dir,
    )

    pages = spark.createDataFrame(
        [
            (f"https://h{i}.example/p{i}",
             f"<html><head><title>t{i}</title></head>"
             f"<body><p>body {i} text</p></body></html>")
            for i in range(8)
        ],
        "url string, html string",
    )
    wet = wet_from_pages(pages)
    rows = {r["url"]: r for r in wet.collect()}
    assert rows["https://h3.example/p3"]["text"] == "t3 body 3 text"
    for r in rows.values():
        assert r["text_chars"] == len(r["text"])

    out = str(tmp_path / "wet")
    manifest = write_wet_dir(wet.repartition(2, "url"), out).collect()
    assert sum(m["n_records"] for m in manifest) == 8
    back = read_warc_dir(spark, out, glob="*.wet.gz")
    got = {
        r["target_uri"]: bytes(r["payload"]).decode("utf-8")
        for r in back.filter(back.warc_type == "conversion").collect()
    }
    assert got == {u: r["text"] for u, r in rows.items()}


def test_wat_links_resolution(spark):
    """WAT metadata: relative hrefs absolutize against the page url,
    document order is preserved, counts match."""
    from web_scraper_spark.sources.warc import wat_from_pages

    pages = spark.createDataFrame(
        [
            ("https://a.example/dir/page",
             '<html><head><title>T</title></head><body>'
             '<a href="/abs">1</a><a href="rel">2</a>'
             '<a href="https://b.example/x#frag">3</a>'
             '<img src="/i.png"/></body></html>')
        ],
        "url string, html string",
    )
    r = wat_from_pages(pages).collect()[0]
    assert r["title"] == "T"
    assert r["links"] == [
        "https://a.example/abs",
        "https://a.example/dir/rel",
        "https://b.example/x",
    ]
    assert r["n_links"] == 3 and r["n_images"] == 1
