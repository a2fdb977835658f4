"""D5 HTML→clean-HTML conversion.

From-scratch reimplementation of the reference's HTML formatter
semantics (contxt/formatters/html_formatter.py:48-338): drop
script/style/iframe/noscript/object/embed, whitelist attributes
(href/src/alt/title/id/class — wider than the D1 clean stage, quirk
Q11), select the main-content root, then re-indent recursively:
block elements own their lines, inline single-text elements render
one-line, self-closing tags emit only the start tag (children of an
<img> are dropped — faithful), <pre> content is passed through
unformatted. Boilerplate/CSS shell or raw-comment header per options.

Attribute-rendering note: with bs4 the reference renders multi-valued
class attributes as a Python list repr (``class="['a', 'b']"``). Our
DOM keeps attribute strings raw, so class renders as written — the
sane behavior; divergence documented here.
"""

from __future__ import annotations

import html as _html
import re

from .dom import Element, TextNode, parse_html
from .markdown import _find_main_content

BLOCK_ELEMENTS = frozenset(
    "div p h1 h2 h3 h4 h5 h6 ul ol li table tr td th article section "
    "header footer nav aside main figure figcaption form pre blockquote hr".split()
)

SELF_CLOSING = frozenset(
    "img br hr meta input link area base col embed param source track wbr".split()
)

DROP_TAGS_HTML = ("script", "style", "iframe", "noscript", "object", "embed")
ALLOWED_ATTRS_HTML = ("href", "src", "alt", "title", "id", "class")

_WS_RE = re.compile(r"\s+")


def clean_for_html(doc: Element) -> Element:
    """P12: drop set + attr whitelist (html_formatter.py:76-86)."""
    for el in doc.find_all(DROP_TAGS_HTML):
        el.decompose()
    for el in doc.find_all():
        el.attrs = {k: v for k, v in el.attrs.items() if k in ALLOWED_ATTRS_HTML}
    return doc


def _node_is_effectively_empty(node: Element | TextNode) -> bool:
    if isinstance(node, TextNode):
        return not node.text.strip()
    return not node.to_html().strip()


def _format_node(node, output: list[str], indent_level: int = 0, in_pre: bool = False) -> None:
    if node is None or _node_is_effectively_empty(node):
        return

    if isinstance(node, TextNode):
        if node.is_comment:
            return
        text = node.text
        if text and text.strip():
            if in_pre:
                output.append(text)
            else:
                text = _WS_RE.sub(" ", text).strip()
                if text:
                    output.append(" " * (indent_level * 2) + text)
        return

    is_pre = node.name == "pre"
    current_in_pre = in_pre or is_pre

    if node.name in ("script", "style", "noscript", "iframe"):
        return

    indent = " " * (indent_level * 2)
    attrs = " ".join(f'{k}="{v}"' for k, v in node.attrs.items())
    start_tag = f"{indent}<{node.name} {attrs}>" if attrs else f"{indent}<{node.name}>"

    if node.name in SELF_CLOSING:
        output.append(start_tag)
        return

    if node.name in BLOCK_ELEMENTS and not current_in_pre:
        output.append(start_tag)
        for child in node.children:
            _format_node(child, output, indent_level + 1, current_in_pre)
        output.append(f"{indent}</{node.name}>")
    else:
        if node.name and not current_in_pre:
            single = node.single_string_node()
            if len(node.children) == 1 and single is not None and single.text:
                text = _WS_RE.sub(" ", single.text).strip()
                output.append(f"{start_tag}{text}</{node.name}>")
            else:
                output.append(start_tag)
                for child in node.children:
                    _format_node(child, output, indent_level + 1, current_in_pre)
                output.append(f"{indent}</{node.name}>")
        else:
            output.append(start_tag)
            single = node.single_string_node()
            if single is not None and single.text:
                output.append(single.text)
            else:
                for child in node.children:
                    _format_node(child, output, 0, current_in_pre)
            output.append(f"</{node.name}>")


def format_html_body(content_html: str, clean: bool = True) -> str:
    """Main-content selection + recursive re-indent
    (html_formatter.py:209-238)."""
    doc = parse_html(content_html)
    if clean:
        doc = clean_for_html(doc)
    main = _find_main_content(doc)
    out: list[str] = []
    _format_node(main, out, indent_level=0, in_pre=False)
    return "\n".join(out)


_CSS = """  <style>
    body { font-family: -apple-system, BlinkMacSystemFont, "Segoe UI", Roboto, Helvetica, Arial, sans-serif; line-height: 1.6; color: #333; max-width: 800px; margin: 0 auto; padding: 20px; }
    img { max-width: 100%; height: auto; }
    a { color: #0366d6; text-decoration: none; }
    a:hover { text-decoration: underline; }
    h1, h2, h3, h4, h5, h6 { margin-top: 1.5em; margin-bottom: 0.5em; }
    p, ul, ol { margin-bottom: 1em; }
    code { background-color: #f6f8fa; padding: 0.2em 0.4em; border-radius: 3px; }
    pre { background-color: #f6f8fa; padding: 16px; overflow: auto; border-radius: 3px; }
    blockquote { margin: 0; padding-left: 1em; color: #6a737d; border-left: 0.25em solid #dfe2e5; }
    table { border-collapse: collapse; width: 100%; }
    table, th, td { border: 1px solid #dfe2e5; }
    th, td { padding: 8px 12px; }
    .source-link { margin-bottom: 20px; font-style: italic; }
  </style>
"""


def format_html_document(
    title: str,
    url: str,
    content_html: str,
    og_metadata: dict | None = None,
    add_boilerplate: bool = True,
    add_css: bool = True,
    clean: bool = True,
) -> str:
    """Full D5 document (html_formatter.py:48-207)."""
    if not content_html:
        return f"<!-- Error fetching content from {url} -->\n<h1>{title}</h1>"
    og_metadata = og_metadata or {}
    body = format_html_body(content_html, clean=clean)
    esc = _html.escape

    if not add_boilerplate:
        return f"<!-- Title: {title} -->\n<!-- Source: {url} -->\n\n{body}"

    desc = (
        esc(og_metadata["og_description"])
        if "og_description" in og_metadata
        else esc(f"Content from {title}")
    )
    out = ['<!DOCTYPE html>\n<html lang="en">\n<head>\n']
    out.append('  <meta charset="UTF-8">\n')
    out.append('  <meta name="viewport" content="width=device-width, initial-scale=1.0">\n')
    out.append(f"  <title>{esc(title)}</title>\n")
    out.append(f'  <meta name="description" content="{desc}">\n')
    if "og_title" in og_metadata:
        out.append(f'  <meta property="og:title" content="{esc(og_metadata["og_title"])}">\n')
    if "og_description" in og_metadata:
        out.append(f'  <meta property="og:description" content="{esc(og_metadata["og_description"])}">\n')
    if "og_image" in og_metadata:
        out.append(f'  <meta property="og:image" content="{esc(og_metadata["og_image"])}">\n')
    if add_css:
        out.append(_CSS)
    out.append("</head>\n<body>\n")
    out.append(f"  <h1>{esc(title)}</h1>\n")
    out.append(
        f'  <p class="source-link">Source: <a href="{esc(url)}" target="_blank">{esc(url)}</a></p>\n'
    )
    out.append(body)
    out.append("</body>\n</html>")
    return "".join(out)
