"""DSIR-style importance weights for target-aware data selection.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", arXiv:2302.03169, public): score every raw document by the
log-likelihood ratio of a bag-of-words model of a small TARGET corpus
(the distribution you want more of) against a model of the RAW corpus,
then sample proportionally. The paper bounds the model with hashed
n-gram buckets; here the bound is the ``vocab_k`` top-token cap (same
role — the model size is a knob, independent of corpus size), with
everything else mapped to ``<unk>`` exactly like ``stages/lm.py``.

Reference analog: the quality/stat columns fastdup's galleries filter
on (reference fastdup/definitions.py:30, galleries.py:1637-1651) — a
per-document scalar that downstream selection sorts/thresholds.

Distributed shape (three bounded passes, nothing data-proportional on
the driver):

1. vocab = top ``vocab_k`` tokens of the RAW corpus (one partition
   exchange, per-partition exact top-k — ``lm.train_vocab``);
2. unigram counts of the raw corpus and of the target slice over
   vocab+<unk> (map-side combined, shuffle volume <= vocab_k+1 rows per
   block — ``lm.unigram_counts``);
3. score: both count vectors (< vocab_k+1 ints each) broadcast once per
   actor; per doc,  dsir_logratio = mean_i [ ln p_T(w_i) - ln p_R(w_i) ],
   add-one smoothed  p(w) = (c(w)+1) / (N + V),  V = len(vocab)+1,
   rounded to 4dp (the float contract of the SQL twin, same as
   ``lm_cross_entropy``: ln of identical rational doubles + a mean the
   rounding absorbs).

Positive scores mean "looks more like the target than like the average
raw document" — the selection signal DSIR resamples by.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from fastdup_ray.stages.lm import (
    _BOS,
    _UNK,
    _token_regions,
    train_vocab,
    unigram_counts,
)


class DsirScoreStage:
    """map_batches actor: docs batch -> (doc_id, n_tokens, dsir_logratio).

    The per-token log-ratio table (< vocab_k+1 floats) is fetched from
    the object store once per actor in ``__init__``."""

    def __init__(self, model_ref):
        model = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) \
            else model_ref
        self.cats = model["cats"]
        # precompute ln pT - ln pR per category once per actor
        self.lr = model["lr"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "dsir_logratio": pa.array([], pa.float64()),
            })
        import pandas as pd

        ids, offs, flat = _token_regions(batch)
        codes = pd.Categorical(flat, categories=self.cats).codes.astype(np.int64)
        codes[codes < 0] = len(self.cats) - 1
        lp = self.lr[codes]
        sums = np.add.reduceat(lp, offs[:-1])
        n = np.diff(offs)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            # + 0.0 normalizes IEEE -0.0 (scores straddle zero; the SQL
            # twin applies the same `+ 0.0` so both engines emit +0.0)
            "dsir_logratio": pa.array(np.round(sums / n, 4) + 0.0,
                                      pa.float64()),
        })


def dsir_weights(docs, target, *, vocab_k: int = 4096, concurrency: int = 4):
    """Score every row of ``docs`` against the ``target`` slice.

    docs / target: Datasets with (doc_id, text); target is typically a
    small filtered view of docs (a trusted source, a reference corpus).
    Returns a Dataset (doc_id, n_tokens, dsir_logratio[4dp])."""
    vocab = train_vocab(docs, vocab_k)
    if _UNK in vocab:
        raise ValueError("corpus contains the reserved <unk> token")
    if _BOS in vocab:
        raise ValueError("corpus contains the reserved <s> token")
    cats = vocab + [_UNK]
    c_raw = unigram_counts(docs, cats)
    c_tgt = unigram_counts(target, cats)
    V = float(len(vocab) + 1)
    lr = (
        np.log((c_tgt + 1.0) / (float(c_tgt.sum()) + V))
        - np.log((c_raw + 1.0) / (float(c_raw.sum()) + V))
    )
    model_ref = ray.put({"cats": cats, "lr": lr})
    docs = docs.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )
    return docs.map_batches(
        DsirScoreStage,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )


def sql_dsir_weights(vocab_k: int, target_pred: str,
                     doc_table: str = "documents") -> str:
    """DuckDB twin: same tokenization (split on single spaces), same
    (cnt desc, token asc) vocab tie-break, same add-one smoothing; the
    target slice is ``WHERE {target_pred}`` over the same table."""
    return f"""
WITH tl AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {doc_table}),
tok AS (
  SELECT doc_id, r.i AS pos, toks[r.i + 1] AS token
  FROM tl, unnest(range(len(toks))) AS r(i)
),
uni AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
vocab AS (SELECT token FROM uni ORDER BY cnt DESC, token LIMIT {vocab_k}),
vsize AS (SELECT count(*) + 1 AS v FROM vocab),
mapped AS (
  SELECT t.doc_id, t.pos,
         CASE WHEN v.token IS NULL THEN '{_UNK}' ELSE t.token END AS cur
  FROM tok t LEFT JOIN vocab v ON t.token = v.token
),
rawc AS (SELECT cur, count(*) AS c FROM mapped GROUP BY cur),
rawn AS (SELECT sum(c) AS n FROM rawc),
tgtc AS (
  SELECT m.cur, count(*) AS c
  FROM mapped m JOIN {doc_table} d USING (doc_id)
  WHERE {target_pred} GROUP BY m.cur
),
tgtn AS (SELECT coalesce(sum(c), 0) AS n FROM tgtc),
scored AS (
  SELECT m.doc_id,
         ln((coalesce(t.c, 0) + 1.0)
            / ((SELECT n FROM tgtn) + (SELECT v FROM vsize)))
         - ln((r.c + 1.0)
              / ((SELECT n FROM rawn) + (SELECT v FROM vsize))) AS lr
  FROM mapped m
  JOIN rawc r ON m.cur = r.cur
  LEFT JOIN tgtc t ON m.cur = t.cur
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       ROUND(avg(lr), 4) + 0.0 AS dsir_logratio
FROM scored GROUP BY doc_id
"""
