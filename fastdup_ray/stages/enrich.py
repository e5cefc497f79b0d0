"""Model-enrichment stages: captioning + zero-shot labeling (SURVEY.md
M7/M8, model cache T4).

Reference shape:
  - captions.py:10-97 — an image-to-text HF pipeline loaded once and
    cached in the module-global `device_to_captioner` (captions.py:8),
    then applied batch-wise to produce a caption column.
  - fastdup_controller.py:1380-1458 + models_ram.py / models_tag2text.py
    — zero-shot enrichment: a tagging model loaded once, `.apply`'d over
    rows to attach labels from an open vocabulary.

Text-native analogs, same Ray plumbing (stateful actor-pool
`map_batches`, model built once per actor in `__init__`, vectorized
work in `__call__`):

  - `CaptionStage` — deterministic extractive caption: the first
    sentence-like prefix of the document (RE2 `extract_regex`, fully
    vectorized). A generative model drops in by replacing `_caption`.
  - `ZeroShotLabelStage` — label prototypes are embedded ONCE per actor
    with the same hashed-n-gram encoder the M9 embedding stage uses;
    each batch is embedded and cosine-scored against the prototype
    matrix (numpy matmul). Swapping in a real bi-encoder only replaces
    the encoder, exactly like `embed.TextEmbedStage`.
  - T4 model cache: `embed.get_projection` memoizes the projection
    weights per (dim, seed) per worker process, so every stage in the
    same process (embed, zero-shot, search) shares one copy — the
    analog of `device_to_captioner`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fastdup_ray.stages.embed import TextEmbedStage

# First sentence-like prefix: skip leading whitespace, take up to
# `max_chars` codepoints that don't cross a sentence boundary or
# newline. RE2 semantics match DuckDB's regexp_extract (both RE2),
# which is what makes the catalog query SQL-oracle-able.
_CAPTION_RE_TMPL = r"^\s*(?P<caption>[^.!?\n]{{1,{n}}})"


class CaptionStage:
    """M7 analog (captions.py:65-97 generate_labels): adds a `caption`
    column. Deterministic extractive captioner — the swap point for a
    real image-to-text / summarization model is `_caption` only."""

    def __init__(self, *, text_col: str = "text", max_chars: int = 160,
                 caption_col: str = "caption"):
        self.text_col = text_col
        self.caption_col = caption_col
        self.pattern = _CAPTION_RE_TMPL.format(n=max_chars)

    def _caption(self, texts: pa.ChunkedArray | pa.Array) -> pa.Array:
        ext = pc.extract_regex(texts, self.pattern)
        cap = pc.struct_field(ext, "caption")
        # leading \s* is consumed by the pattern; trim TRAILING ASCII
        # whitespace with the same RE2 class the SQL oracle uses (Arrow's
        # utf8_trim_whitespace is Unicode-aware and would diverge from
        # DuckDB trim() on e.g. \xa0)
        return pc.replace_substring_regex(
            pc.fill_null(cap, ""), r"[\t\r\f ]+$", "")

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            self.caption_col, self._caption(batch[self.text_col]))


def caption_documents(docs, *, text_col: str = "text", max_chars: int = 160,
                      concurrency: int = 4, batch_size: int = 2048):
    """docs (doc_id, text, ...) -> (+ caption)."""
    return docs.map_batches(
        CaptionStage,
        fn_constructor_kwargs={"text_col": text_col, "max_chars": max_chars},
        # (1, N): autoscaling pool. A FIXED pool of N deadlocks when N
        # equals the cluster CPU count (actors hold every CPU, the
        # upstream read task starves) — same fix as embed.embed_documents
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=batch_size,
    )


class ZeroShotLabelStage:
    """M8 analog (fastdup_controller.py:1380-1458 RAM/Tag2Text
    enrichment): adds `zs_label` (best prototype) and `zs_score`
    (cosine) columns.

    labels: candidate label names.
    prototypes: one prototype text per label (defaults to the label
        name itself, like a zero-shot prompt).
    Embedding model = the deterministic hashed char-3-gram projection
    encoder from `embed.TextEmbedStage` (shared per-process weights via
    `embed.get_projection`, the T4 cache analog)."""

    def __init__(self, labels: list[str], prototypes: list[str] | None = None,
                 *, dim: int = 64, seed: int = 42, text_col: str = "text",
                 weights: str = "gaussian"):
        if prototypes is None:
            prototypes = list(labels)
        if len(prototypes) != len(labels):
            raise ValueError("need one prototype text per label")
        self.labels = np.asarray(list(labels), dtype=object)
        self.text_col = text_col
        self.enc = TextEmbedStage(dim=dim, seed=seed, text_col=text_col,
                                  weights=weights)
        P = self.enc._encode([str(p) for p in prototypes])
        P /= np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
        self.P = P  # (L, dim), rows unit-norm

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        E = self.enc._encode(texts)
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
        S = E @ self.P.T                      # (n, L) cosine scores
        best = np.argmax(S, axis=1)
        score = S[np.arange(S.shape[0]), best]
        out = batch.append_column(
            "zs_label", pa.array(self.labels[best], pa.string()))
        return out.append_column("zs_score", pa.array(score, pa.float64()))


def zero_shot_enrich(docs, labels: list[str],
                     prototypes: list[str] | None = None, *,
                     dim: int = 64, seed: int = 42, text_col: str = "text",
                     weights: str = "gaussian",
                     concurrency: int = 4, batch_size: int = 1024):
    """docs (doc_id, text, ...) -> (+ zs_label, zs_score) via an actor
    pool (prototype matrix built once per actor)."""
    return docs.map_batches(
        ZeroShotLabelStage,
        fn_constructor_kwargs={
            "labels": labels, "prototypes": prototypes,
            "dim": dim, "seed": seed, "text_col": text_col,
            "weights": weights,
        },
        batch_format="pyarrow", concurrency=(1, concurrency),
        batch_size=batch_size,
    )
