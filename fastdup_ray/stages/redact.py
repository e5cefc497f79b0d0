"""PII / pattern redaction over text columns.

The reference has no redaction stage (its payload is images); for a
web-text training pipeline PII scrubbing is a standard pre-training pass
(C4 strips bad-words pages; production pipelines additionally rewrite
emails/IPs/phones in place). This stage is the generic form: an ordered
set of (name, RE2 pattern, replacement) rules applied in one vectorized
pass per rule.

Scale shape: pure map — no shuffle, no driver state. Each rule is one
`pyarrow.compute.replace_substring_regex` call (Arrow's RE2, compiled
once per kernel instance inside Arrow), so a batch of N docs costs
len(rules) C-kernel sweeps, never a Python loop over rows. The stage is
a callable CLASS for `map_batches(RedactStage(...), concurrency=N)` —
the actor-pool shape — so a future model-based detector (NER) can hold
its weights in `__init__` behind the same contract.

Pattern syntax must stay inside the RE2 subset shared by Arrow and
DuckDB (`regexp_replace(..., 'g')`) so every rule has an exact SQL twin.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement) presets. RE2-safe (no lookaround/backrefs).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d[\d\- ]{7,14}\d", "<PHONE>"),
}


class RedactStage:
    """map_batches callable: redact `column` with the ordered rule dict,
    emitting `<column>_redacted` plus one `n_<rule>` match-count column
    per rule (counts are measured BEFORE that rule's rewrite, on the
    text as left by the previous rules — the same order the SQL twin
    uses)."""

    def __init__(self, patterns: dict[str, tuple[str, str]] | None = None,
                 *, column: str = "text", keep: list[str] | None = None,
                 counts: bool = True):
        self.patterns = patterns if patterns is not None else PII_PATTERNS
        self.column = column
        self.keep = keep
        self.counts = counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.column]
        cols: dict = {}
        for k in (self.keep if self.keep is not None else
                  [c for c in batch.column_names if c != self.column]):
            cols[k] = batch[k]
        for name, (pat, repl) in self.patterns.items():
            if self.counts:
                cols[f"n_{name}"] = pc.cast(
                    pc.count_substring_regex(text, pat), pa.int64())
            text = pc.replace_substring_regex(text, pat, repl)
        cols[f"{self.column}_redacted"] = text
        return pa.table(cols)


def redact(ds, patterns=None, *, column: str = "text",
           keep: list[str] | None = None, counts: bool = True,
           concurrency: int | None = None):
    """Dataset-level wrapper; task pool by default (stateless rules),
    pass `concurrency` to pin an actor pool for stateful detectors."""
    stage = RedactStage(patterns, column=column, keep=keep, counts=counts)
    kwargs = {"batch_format": "pyarrow"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(stage, **kwargs)


def sql_redact_exprs(patterns: dict[str, tuple[str, str]],
                     column: str) -> tuple[str, list[str]]:
    """DuckDB twin of one RedactStage pass: returns (redacted_expr,
    [count_exprs...]) with counts measured in the same rule order."""
    text = column
    count_exprs = []
    for name, (pat, _repl) in patterns.items():
        count_exprs.append(
            f"CAST(len(regexp_extract_all({text}, '{pat}')) AS BIGINT)"
            f" AS n_{name}")
        text = f"regexp_replace({text}, '{pat}', '{_repl}', 'g')"
    return f"{text} AS {column}_redacted", count_exprs
