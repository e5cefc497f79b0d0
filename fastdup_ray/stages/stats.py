"""Per-document text statistics + language ID + quality scoring.

Text-native analog of the reference's image-stats stage (`run_stats=1`
writing atrain_stats.csv with blur/mean/min/max/unique/stdv per image,
reference definitions.py:30, SURVEY.md M6): one vectorized `map_batches`
pass computing, per doc —

  n_chars, n_tokens, n_lines, uniq_token_ratio, mean_word_len,
  digit_ratio, non_ascii_ratio, stopword_ratio, lang_pred, lang_score,
  quality

The numeric columns use definitions that DuckDB SQL can reproduce
exactly (the driver's oracle gate compares value hashes):

  n_tokens        = number of \\s+-separated tokens of trim(text)
  n_lines         = 1 + count of '\\n' (0 for empty text)
  uniq_token_ratio= distinct tokens / n_tokens
  mean_word_len   = (chars excluding all \\s) / n_tokens
  digit_ratio     = count of [0-9] / n_chars
  non_ascii_ratio = count of chars > U+007F / n_chars

Ratios are rounded to 6 decimals ON BOTH SIDES to avoid float-hash
mismatches. The stage is a callable class (regexes compiled once per
actor — the reference loads its stats kernels once per process too).

Language ID is a deterministic stopword/char-class heuristic (en, de,
fr, es, it, pt + CJK) — the SURVEY's "text analysis" extension; not
SQL-expressible, tested against the documents.lang column instead.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on",
           "with", "as", "this", "was", "are", "be", "at", "by", "or", "an"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht",
           "ein", "eine", "auf", "im", "für", "des", "sich", "dem", "als", "auch"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "du", "dans",
           "que", "pour", "pas", "sur", "par", "avec", "au", "il", "ne"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "en", "un", "una", "del",
           "que", "por", "con", "para", "se", "su", "al", "lo", "como"},
    "it": {"il", "la", "di", "e", "che", "un", "una", "per", "non", "sono", "del",
           "con", "si", "da", "nel", "le", "dei", "al", "come", "della"},
    "pt": {"o", "a", "os", "as", "de", "e", "que", "um", "uma", "do", "da", "em",
           "para", "não", "com", "por", "se", "no", "na", "dos"},
}


class TextStatsStage:
    """map_batches callable: docs batch -> stats batch (doc_id + metrics)."""

    def __init__(self, round_decimals: int = 6):
        self.round = round_decimals
        self.re_ws = re.compile(r"\s+")
        self.re_digit = re.compile(r"[0-9]")
        self.re_word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.stopwords = _STOPWORDS

    def _one(self, text: str):
        n_chars = len(text)
        if n_chars == 0:
            return (0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0, "unknown", 0.0, 0.0)
        tokens = text.split()
        n_tokens = len(tokens)
        n_lines = text.count("\n") + 1
        uniq = len(set(tokens)) / n_tokens if n_tokens else 0.0
        non_ws = sum(len(t) for t in tokens)
        mean_wl = non_ws / n_tokens if n_tokens else 0.0
        digits = len(self.re_digit.findall(text))
        non_ascii = sum(1 for c in text if ord(c) > 0x7F)
        lang, score, stop_ratio = self._lang(tokens, text, non_ascii / n_chars)
        quality = self._quality(n_tokens, uniq, mean_wl, digits / n_chars, stop_ratio)
        return (
            n_chars, n_tokens, n_lines, uniq, mean_wl,
            digits / n_chars, non_ascii / n_chars, stop_ratio,
            lang, score, quality,
        )

    def _lang(self, tokens, text: str, non_ascii_ratio: float):
        lower = [t.lower() for t in tokens]
        n = max(1, len(lower))
        cjk = sum(1 for c in text if 0x4E00 <= ord(c) <= 0x9FFF)
        if cjk / max(1, len(text)) > 0.05:
            return "zh", round(cjk / len(text), 6), 0.0
        best_lang, best_hits = "unknown", 0
        for lang, sw in self.stopwords.items():
            hits = sum(1 for t in lower if t in sw)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        ratio = best_hits / n
        if best_hits == 0:
            return "unknown", 0.0, 0.0
        return best_lang, round(ratio, 6), ratio

    @staticmethod
    def _quality(n_tokens, uniq, mean_wl, digit_ratio, stop_ratio) -> float:
        """Web-text quality heuristic in [0,1]: favors mid-length docs with
        diverse tokens, plausible word lengths, few digits (Gopher-rule
        style thresholds, simplified & deterministic)."""
        s = 1.0
        if n_tokens < 50:
            s *= n_tokens / 50.0
        if uniq < 0.3:
            s *= uniq / 0.3
        if not (2.0 <= mean_wl <= 12.0):
            s *= 0.5
        if digit_ratio > 0.2:
            s *= 0.5
        return round(min(1.0, max(0.0, s)), 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        rows = [self._one(t or "") for t in texts]
        cols = list(zip(*rows)) if rows else [[]] * 11
        r = self.round
        out = {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(np.asarray(cols[0], np.int64)),
            "n_tokens": pa.array(np.asarray(cols[1], np.int64)),
            "n_lines": pa.array(np.asarray(cols[2], np.int64)),
            "uniq_token_ratio": pa.array(np.round(np.asarray(cols[3], np.float64), r)),
            "mean_word_len": pa.array(np.round(np.asarray(cols[4], np.float64), r)),
            "digit_ratio": pa.array(np.round(np.asarray(cols[5], np.float64), r)),
            "non_ascii_ratio": pa.array(np.round(np.asarray(cols[6], np.float64), r)),
            "stopword_ratio": pa.array(np.round(np.asarray(cols[7], np.float64), r)),
            "lang_pred": pa.array(list(cols[8]), pa.string()),
            "lang_score": pa.array(np.asarray(cols[9], np.float64)),
            "quality": pa.array(np.asarray(cols[10], np.float64)),
        }
        if "url" in batch.column_names:
            out["url"] = batch["url"]
        return pa.table(out)
