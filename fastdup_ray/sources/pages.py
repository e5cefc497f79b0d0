"""Deterministic synthetic `pages` corpus (the input table mandated by
BASELINE.json input_hint: url, warc_ts, html, text, lang).

Modeled on the reference's synthetic-data strategy
(/root/reference/fastdup/synthetic_image_data.py:52-111 plants controlled
classes: valid / corrupted / exact-duplicated / missing), extended with the
text-native classes from FIXTURES.md: unique, exact_dup, near_dup (at
controlled shingle-Jaccard), boilerplate_skew (hot-LSH-bucket stress),
substring_dup, corrupted, tiny.

Everything is seeded — same seed, same corpus, on any machine — and the
`text` column is the ground truth the HTML extractor must reproduce
byte-identically per url (the north-rule invariant). The generator also
returns a `truth` table (url, cls, cluster_id) for recall measurement.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

_VOCAB = [
    "data", "query", "table", "row", "column", "join", "filter", "group",
    "sort", "merge", "scan", "hash", "key", "value", "batch", "stream",
    "window", "agg", "count", "index", "shard", "block", "spill", "cache",
    "vector", "token", "shingle", "cluster", "graph", "edge", "node", "rank",
    "crawl", "fetch", "parse", "render", "link", "anchor", "domain", "path",
    "corpus", "sample", "model", "train", "score", "label", "split", "page",
]

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"]

_EPOCH = datetime(2025, 1, 1)


def _make_text(rng: np.random.Generator, n_tokens: int) -> str:
    words = rng.choice(_VOCAB, size=n_tokens)
    return " ".join(words.tolist())


def canonical_paragraphs(text: str, para_tokens: int = 40) -> list[str]:
    """Split a token string into the paragraph layout used in the HTML."""
    words = text.split()
    return [" ".join(words[i : i + para_tokens]) for i in range(0, len(words), para_tokens)]


def canonicalize_text(text: str) -> str:
    """The canonical extracted form: paragraphs joined by single newlines.

    This is the exact byte string `HtmlExtractStage` recovers from
    `render_html(text, ...)` — the generator and the extractor share this
    contract so the north-rule byte-identity invariant is testable.
    """
    return "\n".join(canonical_paragraphs(text))


def _mutate_text(rng: np.random.Generator, text: str, frac: float) -> str:
    """Replace/insert/delete ~frac of tokens — controlled shingle overlap."""
    words = text.split()
    n_mut = max(1, int(round(len(words) * frac)))
    for _ in range(n_mut):
        op = rng.integers(0, 3)
        i = int(rng.integers(0, len(words)))
        w = f"mut{int(rng.integers(0, 10**9))}"
        if op == 0:
            words[i] = w
        elif op == 1:
            words.insert(i, w)
        elif len(words) > 10:
            del words[i]
    return " ".join(words)


def render_html(text: str, title: str, site: str, corrupted: int = 0) -> bytes:
    """Deterministic HTML wrapping of `text` (paragraphs of <=40 tokens) with
    per-site nav/footer boilerplate. corrupted: 0 ok, 1 truncated,
    2 invalid utf-8, 3 empty."""
    if corrupted == 3:
        return b""
    paras = canonical_paragraphs(text)
    body = "\n".join(f"<p>{_html.escape(p)}</p>" for p in paras if p)
    nav = (
        f'<nav class="site"><a href="/">{site} home</a> | '
        f'<a href="/about">about {site}</a> | <a href="/contact">contact</a></nav>'
    )
    footer = f"<footer>&copy; 2025 {site} — all rights reserved. terms privacy sitemap</footer>"
    doc = (
        f"<html><head><title>{_html.escape(title)}</title>"
        f'<script>var t="{site}";trk(t);</script>'
        f"<style>p{{margin:0}}</style></head>\n"
        f"<body>\n{nav}\n{body}\n{footer}\n</body></html>"
    )
    raw = doc.encode("utf-8")
    if corrupted == 1:
        # cut inside <head>, before any content block, so no text is recoverable
        return raw[:100]
    if corrupted == 2:
        return raw[:50] + b"\xff\xfe\x80" + raw[50:120]
    return raw


def synthesize_pages(
    n_docs: int = 2000, seed: int = 42, *, skew: bool = True
) -> tuple[pa.Table, pa.Table]:
    """Build a (pages, truth) pair of Arrow tables.

    truth columns: url, cls (planted class), cluster_id (>=0 for docs planted
    in an exact/near-dup cluster; -1 for unique/boilerplate/corrupted/tiny),
    jaccard (the target shingle overlap of the cluster, 1.0 for exact).
    """
    rng = np.random.default_rng(seed)
    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    corrupt: list[int] = []
    cls: list[str] = []
    cluster: list[int] = []
    jac: list[float] = []

    def add(text: str, c: str, cl: int, j: float, corrupted: int = 0) -> None:
        i = len(urls)
        site = f"site{(i * 7919) % 200:04d}"
        urls.append(f"https://{site}.example/{c}/{i:07d}.html")
        texts.append(text)
        langs.append(_LANGS[i % len(_LANGS)])
        corrupt.append(corrupted)
        cls.append(c)
        cluster.append(cl)
        jac.append(j)

    n_unique = int(n_docs * 0.60)
    n_exact_docs = int(n_docs * 0.10)
    n_near_docs = int(n_docs * 0.15)
    n_boiler = int(n_docs * 0.10) if skew else 0
    n_substr = int(n_docs * 0.03)
    n_corrupt = max(2, int(n_docs * 0.01))
    n_tiny = max(2, int(n_docs * 0.01))

    next_cluster = 0
    for _ in range(n_unique):
        n_tok = int(np.exp(rng.uniform(np.log(50), np.log(800))))
        add(_make_text(rng, n_tok), "unique", -1, 0.0)

    made = 0
    while made < n_exact_docs:
        size = int(rng.integers(2, 6))
        base = _make_text(rng, int(rng.integers(60, 400)))
        for _ in range(min(size, n_exact_docs - made)):
            add(base, "exact_dup", next_cluster, 1.0)
            made += 1
        next_cluster += 1

    made = 0
    target_j = [0.98, 0.9, 0.8, 0.6]
    ti = 0
    while made < n_near_docs:
        size = int(rng.integers(2, 6))
        j = target_j[ti % len(target_j)]
        ti += 1
        # token-mutation fraction that yields roughly the target char-5-gram
        # Jaccard: mutating a token kills ~ (5 + len(tok)) shingles around it
        frac = {0.98: 0.004, 0.9: 0.02, 0.8: 0.045, 0.6: 0.12}[j]
        base = _make_text(rng, int(rng.integers(150, 500)))
        add(base, "near_dup", next_cluster, j)
        made += 1
        for _ in range(min(size - 1, n_near_docs - made)):
            add(_mutate_text(rng, base, frac), "near_dup", next_cluster, j)
            made += 1
        next_cluster += 1

    # boilerplate skew: one mega-template, short distinct bodies — all land in
    # the same LSH buckets for the template-dominated bands
    template = _make_text(rng, 180)
    for _ in range(n_boiler):
        body = _make_text(rng, int(rng.integers(10, 30)))
        add(template + " " + body, "boilerplate", -1, 0.0)

    for _ in range(n_substr):
        # span aligned to the 40-token paragraph grid on BOTH sides so the
        # canonical newline positions inside the span coincide and the
        # shared byte run stays contiguous (>= 3 paragraphs ~ 700 bytes)
        host = _make_text(rng, 320)
        span_words = host.split()[40:160]  # paragraphs 2-4 of the host
        fresh = _make_text(rng, 160)       # exactly 4 paragraphs
        add(host, "substring_host", next_cluster, 0.0)
        add(fresh + " " + " ".join(span_words) + " " + _make_text(rng, 50),
            "substring_dup", next_cluster, 0.0)
        next_cluster += 1

    for i in range(n_corrupt):
        add("", "corrupted", -1, 0.0, corrupted=1 + (i % 3))

    for _ in range(n_tiny):
        add(_make_text(rng, 2), "tiny", -1, 0.0)

    n = len(urls)
    ts = [_EPOCH + timedelta(minutes=int((i * 137) % 100000)) for i in range(n)]
    htmls = [
        render_html(texts[i], f"page {i}", urls[i].split("//")[1].split(".")[0], corrupt[i])
        for i in range(n)
    ]
    # ground truth = the canonical extracted form; corrupted pages have none
    gt_texts = ["" if corrupt[i] else canonicalize_text(texts[i]) for i in range(n)]

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(gt_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "cls": pa.array(cls, pa.string()),
            "cluster_id": pa.array(cluster, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )
    return pages, truth


def replicate_documents_ds(documents_path: str, *, replicate: int, seed: int = 42,
                           dup_frac: float = 0.2):
    """Ray-parallel, order-free version of `pages_from_documents`: every
    output row is a pure function of (doc_id, replica, seed), so the
    corpus is deterministic regardless of partitioning or parallelism.
    Returns a Dataset of the input_hint pages schema."""
    import ray.data as rd

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        langs = (
            batch["lang"].to_pylist()
            if "lang" in batch.column_names
            else ["en"] * len(texts)
        )
        urls, out_texts, out_langs, ts = [], [], [], []
        for i in range(len(texts)):
            d = int(ids[i])
            for r in range(replicate):
                rng = np.random.default_rng((seed, d & 0x7FFFFFFF, r))
                if r == 0:
                    urls.append(f"https://docs.example/src/{d:08d}.html")
                    out_texts.append(texts[i])
                else:
                    urls.append(f"https://docs.example/rep{r}/{d:08d}.html")
                    roll = rng.random()
                    if roll < dup_frac / 2:
                        out_texts.append(texts[i])
                    elif roll < dup_frac:
                        out_texts.append(_mutate_text(rng, texts[i], 0.02))
                    else:
                        out_texts.append(_mutate_text(rng, texts[i], 0.6))
                out_langs.append(langs[i])
                ts.append(_EPOCH + timedelta(minutes=int((d * 131 + r * 137) % 100000)))
        htmls = [
            render_html(out_texts[j], f"doc {j}", f"site{j % 97:04d}")
            for j in range(len(urls))
        ]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([canonicalize_text(t) for t in out_texts], pa.string()),
                "lang": pa.array(out_langs, pa.string()),
            }
        )

    base = rd.read_parquet(documents_path)
    n = base.count()
    blocks = max(16, (n * replicate) // 20_000)
    return base.repartition(min(blocks, max(1, n // 4))).map_batches(
        expand, batch_format="pyarrow", batch_size=32
    )


def pages_from_documents(documents: pa.Table, *, replicate: int = 1, seed: int = 42,
                         dup_frac: float = 0.2) -> pa.Table:
    """Deterministically derive a `pages` table (input_hint shape) from the
    driver's `documents` table (doc_id, text, lang, source, n_chars).

    replicate>1 scales the corpus for benchmarking: each extra copy mutates
    a (1-dup_frac) share of docs into fresh near-uniques and leaves dup_frac
    as planted near-duplicates of the original."""
    rng = np.random.default_rng(seed)
    doc_ids = documents["doc_id"].to_pylist()
    texts = documents["text"].to_pylist()
    langs = documents["lang"].to_pylist() if "lang" in documents.column_names else ["en"] * len(texts)

    urls, out_texts, out_langs = [], [], []
    for r in range(replicate):
        for i, (d, t) in enumerate(zip(doc_ids, texts)):
            if r == 0:
                urls.append(f"https://docs.example/src/{d:08d}.html")
                out_texts.append(t)
            else:
                urls.append(f"https://docs.example/rep{r}/{d:08d}.html")
                roll = rng.random()
                if roll < dup_frac / 2:
                    out_texts.append(t)  # exact duplicate
                elif roll < dup_frac:
                    out_texts.append(_mutate_text(rng, t, 0.02))  # near-dup
                else:
                    out_texts.append(_mutate_text(rng, t, 0.6))
            out_langs.append(langs[i])
    n = len(urls)
    ts = [_EPOCH + timedelta(minutes=int((i * 137) % 100000)) for i in range(n)]
    htmls = [render_html(out_texts[i], f"doc {i}", f"site{i % 97:04d}") for i in range(n)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([canonicalize_text(t) for t in out_texts], pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )
