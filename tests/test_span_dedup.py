"""C4-style span dedup: window-explosion edge cases + end-to-end
invariants (the oracle hash-match lives in test_queries.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fastdup_ray.stages.span_dedup import (
    _windows_of_batch,
    span_dedup_docs,
    span_kill_list,
)


def test_window_explosion_edges(ray_session):
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "",                      # one empty token -> no full window
            "a b",                   # shorter than window
            "a b c",                 # exactly one window
            "a b c d e f g",         # two windows + trailer
        ]),
    })
    doc_ids, win_idx, spans = _windows_of_batch(batch, 3)
    assert doc_ids.tolist() == [3, 4, 4]
    assert win_idx.tolist() == [0, 0, 1]
    assert spans.to_pylist() == ["a b c", "a b c", "d e f"]


def test_span_dedup_end_to_end(ray_session):
    # doc 10 and doc 20 share window "x0..x2"; doc 20's copy must die and
    # its trailer survive verbatim. doc 30 is untouched.
    rows = [
        {"doc_id": 10, "text": "x0 x1 x2 a b"},
        {"doc_id": 20, "text": "x0 x1 x2 tail1 tail2"},
        {"doc_id": 30, "text": "u v w"},
    ]
    docs = rd.from_items(rows)
    kills = span_kill_list(docs, window=3).take_all()
    assert [(k["doc_id"], k["win_idx"]) for k in kills] == [(20, 0)]
    out = {r["doc_id"]: r["text_clean"]
           for r in span_dedup_docs(docs, window=3).take_all()}
    assert out == {10: "x0 x1 x2 a b", 20: "tail1 tail2", 30: "u v w"}


def test_cogroup_rebuild_equals_broadcast(ray_session):
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"]).repartition(8)
    a = sorted((r["doc_id"], r["text_clean"]) for r in
               span_dedup_docs(docs, window=13).take_all())
    # broadcast_budget=0 forces the cogroup shuffle path
    b = sorted((r["doc_id"], r["text_clean"]) for r in
               span_dedup_docs(docs, window=13,
                               broadcast_budget=0).take_all())
    assert a == b


def test_span_dedup_token_conservation(ray_session):
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    w = 13
    n_kill = span_kill_list(docs, window=w).count()
    before = sum(len(r["text"].split(" ")) for r in docs.take_all())
    after = sum(
        len(r["text_clean"].split(" ")) if r["text_clean"] else 0
        for r in span_dedup_docs(docs, window=w).take_all()
    )
    assert n_kill > 0  # the synthetic corpus has real cross-doc dup spans
    assert before - after == w * n_kill
