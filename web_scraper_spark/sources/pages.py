"""Deterministic synthetic ``pages`` table (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Generation is a pure function of ``(seed, row_id)`` and runs
executor-side: ``spark.range(n)`` → ``mapInPandas`` — no driver-side
materialization, so the same generator scales from 64-row parity
fixtures to the ≥10^6-row bench frontier. Host distribution is
deliberately skewed (one hot host) to exercise salting and AQE
skew handling.

The HTML generator covers every extraction branch the cleaning/markdown
semantics dispatch on (content-root cascade, boilerplate drops,
comments, attr whitelist, duplicate/empty <li>, adjacent-span runs,
og meta, h1-h6, inline a/strong/em, code/pre+language, blockquote,
ul/ol, tables, hr/br, relative+absolute <img>, control characters) so
the per-row byte-identical invariant is exercised, not vacuous.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), False),
    ]
)

_WORDS = (
    "spark crawl frontier fetch page content extract token politeness "
    "robots sitemap shard bloom filter queue host delay budget round "
    "checkpoint lineage metric partition shuffle broadcast join window "
    "aggregate schedule priority depth seed discover markdown render"
).split()

_LANGS = ("en", "de", "fr", "es")

# 8 hosts; host 0 is hot (~50% of URLs) to exercise skew handling.
_HOSTS = tuple(f"site{i}.example.com" for i in range(8))

_PATH_SEGS = ("docs", "blog", "api", "guide", "news", "ref", "tags", "archive")


def host_for(rid: int) -> str:
    """Skewed host assignment: even rids → hot host 0."""
    return _HOSTS[0] if rid % 2 == 0 else _HOSTS[1 + (rid % 7)]


def url_for(rid: int) -> str:
    if rid == 0:
        # the one empty-path URL (exercises the 'index' filename case,
        # contxt/outputs.py:108-109)
        return f"https://{host_for(rid)}/"
    rng = random.Random(0xC0FFEE ^ rid)
    depth = rng.randint(0, 3)
    segs = [rng.choice(_PATH_SEGS) for _ in range(depth)]
    path = "/".join(segs + [f"page-{rid}"])
    return f"https://{host_for(rid)}/{path}"


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def gen_page_html(rid: int, seed: int = 42, universe: int = 1024) -> str:
    """Pure function of (seed, rid, universe) → an HTML document string.

    ``universe`` bounds the rid-space that in-document links target, so
    a crawl over an n-row pages table discovers real member URLs
    (frontier expansion is testable end-to-end).
    """
    rng = random.Random(seed * 1_000_003 + rid)
    title = _sentence(rng, 3).title()
    og_desc = _sentence(rng, 8)
    head = [
        "<head>",
        f"<title>{title}</title>",
        f'<meta property="og:title" content="{title}"/>',
        f'<meta property="og:description" content="{og_desc}"/>',
        f'<meta property="og:image" content="https://{host_for(rid)}/og-{rid}.png"/>',
        "<script>var boilerplate = 1;</script>",
        "<style>.x { color: red }</style>",
        "</head>",
    ]

    blocks: list[str] = []
    blocks.append(f"<h1>{title}</h1>")
    blocks.append("<!-- navigation comment to be dropped -->")
    blocks.append(f"<nav><a href='/home'>home</a> {_sentence(rng, 2)}</nav>")

    n_blocks = 3 + rng.randint(0, 6)
    for b in range(n_blocks):
        kind = rng.randint(0, 11)
        if kind == 0:
            lvl = rng.randint(2, 6)
            blocks.append(f"<h{lvl}>{_sentence(rng, 4)}</h{lvl}>")
        elif kind == 1:
            inner = _sentence(rng, 10)
            target = url_for((rid * 31 + b * 7 + 1) % universe)
            link = f'<a href="{target}">{_sentence(rng, 2)}</a>'
            strong = f"<strong>{_sentence(rng, 2)}</strong>"
            em = f"<em>{_sentence(rng, 2)}</em>"
            blocks.append(f"<p data-track='{b}' class='lead'>{inner} {link} {strong} {em}</p>")
        elif kind == 2:
            items = [_sentence(rng, 3) for _ in range(rng.randint(2, 5))]
            items += [items[0], ""]  # duplicate + empty li (quirk Q13)
            rng.shuffle(items)
            li = "".join(f"<li>{t}</li>" for t in items)
            tag = rng.choice(("ul", "ol"))
            blocks.append(f"<{tag}>{li}</{tag}>")
        elif kind == 3:
            spans = "".join(
                f"<span>{_sentence(rng, 2)}</span>" for _ in range(rng.randint(3, 5))
            )
            blocks.append(f"<div>{spans}</div>")
        elif kind == 4:
            code = _sentence(rng, 4)
            if rng.random() < 0.3:
                code = "x = `tpl`; " + code
            blocks.append(f"<p>inline <code>{code}</code> sample</p>")
        elif kind == 5:
            lang = rng.choice(("python", "sql", ""))
            cls = f' class="language-{lang}"' if lang else ""
            blocks.append(f"<pre{cls}><code{cls}>def f():\n    return {rid}</code></pre>")
        elif kind == 6:
            blocks.append(f"<blockquote>{_sentence(rng, 8)}</blockquote>")
        elif kind == 7:
            hdr = "".join(f"<th>{w}</th>" for w in ("col a", "col b", "c"))
            rows = "".join(
                "<tr>" + "".join(f"<td>{_sentence(rng, 1)}</td>" for _ in range(3)) + "</tr>"
                for _ in range(rng.randint(1, 3))
            )
            blocks.append(f"<table><tr>{hdr}</tr>{rows}</table>")
        elif kind == 8:
            src = (
                f"/img/rel-{b}.png"
                if rng.random() < 0.5
                else f"https://cdn.example.org/abs-{b}.jpg"
            )
            wh = ' width="640" height="480"' if rng.random() < 0.5 else ""
            blocks.append(f'<p><img src="{src}" alt="pic {b}"{wh}/></p>')
        elif kind == 9:
            blocks.append("<hr/>")
            blocks.append(f"<p>{_sentence(rng, 5)}<br/>{_sentence(rng, 5)}</p>")
        elif kind == 10:
            blocks.append(f"<aside>{_sentence(rng, 6)}</aside>")
            blocks.append(f"<form><input value='q'/><button>go</button></form>")
        else:
            # control chars + quotes exercise XML escaping paths
            blocks.append(f"<p>weird \x07 chars &amp; \"quotes\" '{_sentence(rng, 4)}'</p>")

    body_inner = "\n".join(blocks)
    root_kind = rng.randint(0, 5)
    if root_kind == 0:
        content = f"<main>{body_inner}</main>"
    elif root_kind == 1:
        content = f"<article>{body_inner}</article>"
    elif root_kind == 2:
        content = f'<div id="content">{body_inner}</div>'
    elif root_kind == 3:
        content = f'<div class="content wide">{body_inner}</div>'
    elif root_kind == 4:
        content = f'<div role="main">{body_inner}</div>'
    else:
        content = body_inner

    footer = "<footer><p>footer boilerplate</p></footer>"
    return (
        "<html>" + "".join(head) + f"<body>{content}{footer}</body></html>"
    )


_EPOCH = _dt.datetime(2025, 1, 1)


def gen_pages_pdf(ids, seed: int = 42, universe: int = 1024) -> pd.DataFrame:
    """Pandas batch of pages rows for the given row ids."""
    rows = []
    for rid in ids:
        rid = int(rid)
        html = gen_page_html(rid, seed, universe)
        rng = random.Random(seed ^ rid)
        rows.append(
            {
                "url": url_for(rid),
                "warc_ts": _EPOCH + _dt.timedelta(seconds=rid),
                "html": html.encode("utf-8"),
                "text": None,
                "lang": rng.choice(_LANGS),
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])


def pages_df(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages DataFrame of n rows."""
    if partitions is None:
        partitions = max(1, min(64, n // 256 or 1))

    universe = max(n, 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_pages_pdf(pdf["id"].tolist(), seed, universe)

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
