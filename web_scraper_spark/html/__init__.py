"""Pure-Python HTML engine (stdlib-only, no bs4).

This package re-implements the reference's extraction semantics from
scratch on top of ``html.parser``:

- :mod:`dom`      — a minimal document tree with the bs4-compatible
                    subset of behaviors the reference relies on
                    (``get_text(strip=True)`` joining, single-string
                    descent, document-order ``find_all``).
- :mod:`clean`    — D1 cleaning pipeline (element/comment drop, attr
                    whitelist, li dedup, span concatenation, text
                    normalization) + OpenGraph extraction + image
                    extraction (reference: contxt/scraper.py:237-343).
- :mod:`markdown` — D2 HTML→Markdown traversal (reference:
                    contxt/formatters/markdown_formatter.py:85-283),
                    including its quirks (ledger Q5 in SURVEY.md).

Every function here is a deterministic ``str -> str/dict`` transform:
no I/O, no clock, no randomness — safe to run inside vectorized UDFs
and to golden-test byte-for-byte.
"""
