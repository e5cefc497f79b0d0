"""HTML -> text extraction stage (stateful actor pool).

Text-native analog of the reference's image decode + validity filter
(reference fastdup/image.py:118-141 decode/resize; invalid/too-small files
-> features.bad.csv, definitions.py:151-153, __init__.py:519-520).

The extractor is a callable CLASS for `map_batches(..., concurrency=N)`:
parser machinery is built once per actor in __init__ (the pattern mandated
by the input_hint for stateful stages), each __call__ handles one Arrow
batch. The extraction itself is deterministic pure Python (stdlib
HTMLParser) so the north-rule invariant — byte-identical `text` per url —
holds across runs, platforms and parallelism levels.

Output schema (the `docs` table, SURVEY.md §1.2): doc_id int64 (stable
63-bit hash of url, replacing the reference's listing-order dense ids), url,
warc_ts, lang, text, n_bytes, error_code, is_valid. The wide `html`
binary column is dropped here so downstream blocks stay narrow
(SURVEY.md §7.4 "Wide rows").
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

from fastdup_ray.functions.hashing import id63

_SKIP_TAGS = frozenset(
    {"script", "style", "nav", "footer", "header", "aside", "noscript", "head", "title"}
)
_BLOCK_TAGS = frozenset({"p", "div", "article", "section", "li", "h1", "h2", "h3", "h4", "td", "pre"})

ERR_OK = ""
ERR_EMPTY = "EMPTY_HTML"
ERR_DECODE = "DECODE_ERROR"
ERR_NO_TEXT = "NO_TEXT"
ERR_TOO_SHORT = "TOO_SHORT"


class _TextExtractor(HTMLParser):
    """Collects text from content blocks, skipping script/style/nav/footer
    etc.; block-level elements are joined with a single newline."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._chunks: list[str] = []
        self._block_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_data(self, data):
        if self._skip_depth == 0 and data.strip():
            self._block_parts.append(data)

    def _flush_block(self):
        if self._block_parts:
            self._chunks.append("".join(self._block_parts))
            self._block_parts = []

    def result(self) -> str:
        self._flush_block()
        return "\n".join(self._chunks)


def extract_text(html_bytes: bytes) -> tuple[str, str]:
    """(text, error_code) for one page. Pure function; no I/O."""
    if not html_bytes:
        return "", ERR_EMPTY
    try:
        html = html_bytes.decode("utf-8")
    except UnicodeDecodeError:
        return "", ERR_DECODE
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return "", ERR_DECODE
    text = parser.result()
    if not text:
        return "", ERR_NO_TEXT
    return text, ERR_OK


class HtmlExtractStage:
    """map_batches actor: pages batch (pyarrow) -> docs batch (pyarrow)."""

    def __init__(self, min_text_len: int = 20):
        self.min_text_len = min_text_len
        # HTMLParser instances are rebuilt per document (they are cheap and
        # not reusable after close()); the per-actor state here is the
        # configuration + warmed-up module imports.

    def __call__(self, batch: pa.Table) -> pa.Table:
        html_col = batch["html"]
        urls = batch["url"].to_pylist()
        texts: list[str] = []
        errors: list[str] = []
        n_bytes = np.zeros(len(urls), dtype=np.int64)
        for i, buf in enumerate(html_col):
            raw = buf.as_py() or b""
            n_bytes[i] = len(raw)
            text, err = extract_text(raw)
            if err == ERR_OK and len(text) < self.min_text_len:
                err = ERR_TOO_SHORT
            texts.append(text)
            errors.append(err)
        is_valid = pa.array([e == ERR_OK for e in errors], pa.bool_())
        doc_id = pa.array(id63(batch["url"]), pa.int64())
        cols = {
            "doc_id": doc_id,
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "text": pa.array(texts, pa.string()),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "error_code": pa.array(errors, pa.string()),
            "is_valid": is_valid,
        }
        return pa.table({k: v for k, v in cols.items()})
