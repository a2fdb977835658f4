"""D4 HTML→XML conversion.

From-scratch reimplementation (over our DOM) of the reference's XML
formatter semantics (contxt/formatters/xml_formatter.py:104-414):

- <content><metadata><title/><url/>[<open_graph/>]</metadata>
  <body>…</body></content>, minidom-pretty-printed, indent="  ".
- recursive element mapping with a tag_mapping table, skip_tags set,
  empty-element skip (non img/br/hr with no stripped text), important
  attribute projection, text merged into parent.text with " " joins
  (text after child elements is *reordered before them* — faithful),
  empty-prune pass, whitespace normalization, html.escape text
  (double-escaped again at serialization — faithful), control-char /
  surrogate strip, tag/attr name sanitization (class→class_attr,
  for→for_attr, invalid chars→underscore, tag_/attr_ prefixes).

Quirk fidelity: the document root node (name ``[document]``) flows
through the same element path and renders as ``<_document_>`` inside
<body> — exactly what the reference produces when handed a soup.

Determinism deviation (documented): the reference iterates attribute
names from a Python *set*, whose order varies across processes under
hash randomization — its output is not run-stable. We iterate a fixed
canonical tuple instead (SURVEY.md §7 hard-part 4: non-determinism
hygiene); attribute *presence* is identical.
"""

from __future__ import annotations

import html as _html
import re
import xml.dom.minidom
import xml.etree.ElementTree as ET

from .dom import Element, TextNode, parse_html

TAG_MAPPING = {
    name: name
    for name in (
        "h1 h2 h3 h4 h5 h6 article section main div aside header footer nav "
        "p blockquote pre code ul ol li table thead tbody tfoot tr th td "
        "a span strong em b i u mark img figure figcaption picture video "
        "audio hr br"
    ).split()
}

SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "iframe", "svg", "canvas", "meta",
     "link", "input", "button", "form", "template"}
)

# Fixed canonical order (the reference uses an unordered set; see
# module docstring for the determinism deviation).
IMPORTANT_ATTRS = ("id", "class", "href", "src", "alt", "title", "aria-label", "role")

_CTRL_RE = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_SURR_RE = re.compile(r"[\uD800-\uDFFF]")
_WS_RE = re.compile(r"\s+")


def escape_text(text: str) -> str:
    if not text:
        return ""
    return _html.escape(str(text))


def escape_attr(text: str) -> str:
    if not text:
        return ""
    return _html.escape(str(text), quote=True)


def sanitize_tag_name(name: str) -> str:
    if not name:
        return "tag"
    sanitized = re.sub(r"[^a-zA-Z0-9_-]", "_", name)
    if not re.match(r"^[a-zA-Z_]", sanitized):
        sanitized = "tag_" + sanitized
    return sanitized


def sanitize_attr_name(name: str) -> str:
    if name == "class":
        return "class_attr"
    if name == "for":
        return "for_attr"
    sanitized = re.sub(r"[^a-zA-Z0-9_-]", "_", name)
    if not re.match(r"^[a-zA-Z_]", sanitized):
        sanitized = "attr_" + sanitized
    return sanitized


def _process(node: Element | TextNode, parent_xml: ET.Element, preserve_attrs: bool) -> None:
    if isinstance(node, TextNode):
        if node.is_comment:
            return
        if node.text and node.text.strip():
            safe = escape_text(node.text.strip())
            if parent_xml.text is None:
                parent_xml.text = safe
            else:
                parent_xml.text += " " + safe
        return

    if node.name in SKIP_TAGS:
        return
    if node.name not in ("img", "br", "hr") and not node.get_text(strip=True):
        return

    if node.name in TAG_MAPPING:
        tag_name = TAG_MAPPING[node.name]
    else:
        tag_name = sanitize_tag_name(node.name)

    new_el = ET.SubElement(parent_xml, tag_name)

    if preserve_attrs:
        for attr, value in node.attrs.items():
            new_el.set(sanitize_attr_name(attr), escape_attr(value if isinstance(value, str) else str(value)))
    else:
        for attr in IMPORTANT_ATTRS:
            if attr in node.attrs:
                value = node.attrs[attr]
                new_el.set(sanitize_attr_name(attr), escape_attr(value if isinstance(value, str) else str(value)))

    for child in node.children:
        _process(child, new_el, preserve_attrs)


def _clean_structure(element: ET.Element) -> None:
    to_remove = []
    for child in element:
        _clean_structure(child)
        if (
            child.tag not in ("img", "br", "hr")
            and not child.text
            and not child.tail
            and len(child) == 0
        ):
            to_remove.append(child)
    for child in to_remove:
        element.remove(child)
    if element.text:
        element.text = _WS_RE.sub(" ", element.text).strip()
    for child in element:
        if child.tail:
            child.tail = _WS_RE.sub(" ", child.tail).strip()


def clean_xml_string(xml_str: str) -> str:
    xml_str = _CTRL_RE.sub("", xml_str)
    xml_str = _SURR_RE.sub("", xml_str)
    return xml_str


def format_xml_document(
    title: str,
    url: str,
    content_html: str,
    og_metadata: dict | None = None,
    images: list[dict] | None = None,
    image_map: dict | None = None,
    preserve_attrs: bool = False,
) -> str:
    """Full D4 document: metadata + body + optional images block,
    pretty-printed (contxt/formatters/xml_formatter.py:104-212)."""
    if not content_html:
        return (
            f'<?xml version="1.0" ?>\n<error url="{escape_attr(url)}">'
            f"{escape_text(title)}</error>"
        )
    og_metadata = og_metadata or {}
    image_map = image_map or {}

    doc = parse_html(content_html)
    root = ET.Element("content")
    meta_elem = ET.SubElement(root, "metadata")
    ET.SubElement(meta_elem, "title").text = escape_text(title)
    ET.SubElement(meta_elem, "url").text = escape_text(url)
    if og_metadata:
        og_elem = ET.SubElement(meta_elem, "open_graph")
        if "og_title" in og_metadata:
            ET.SubElement(og_elem, "title").text = escape_text(og_metadata["og_title"])
        if "og_description" in og_metadata:
            ET.SubElement(og_elem, "description").text = escape_text(og_metadata["og_description"])
        if "og_image" in og_metadata:
            ET.SubElement(og_elem, "image").text = escape_text(og_metadata["og_image"])

    body = ET.SubElement(root, "body")
    _process(doc, body, preserve_attrs)
    _clean_structure(body)

    if images:
        images_elem = ET.SubElement(root, "images")
        for img in images:
            image = ET.SubElement(images_elem, "image")
            if img["url"] in image_map:
                ET.SubElement(image, "path").text = escape_text(image_map[img["url"]])
            else:
                ET.SubElement(image, "url").text = escape_text(img["url"])
            ET.SubElement(image, "alt").text = escape_text(img.get("alt", ""))
            dims = {
                k: img[k] for k in ("width", "height") if img.get(k) not in (None, "")
            }
            if dims:
                dimensions = ET.SubElement(image, "dimensions")
                for key, value in dims.items():
                    dimensions.set(key, str(value))

    xml_str = clean_xml_string(ET.tostring(root, encoding="unicode"))
    try:
        dom = xml.dom.minidom.parseString(f'<?xml version="1.0" ?>\n{xml_str}')
        return dom.toprettyxml(indent="  ")
    except Exception:
        return f'<?xml version="1.0" ?>\n{xml_str}'
