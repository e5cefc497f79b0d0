"""Deterministic shuffle: dense permutation + parallelism invariance
(oracle hash-match is in test_queries.py: shuffle_positions)."""

import ray.data as rd

from fastdup_ray.stages.shuffle import deterministic_shuffle

SF = "/root/testdata/sf0.001/documents.parquet"


def test_positions_are_dense_permutation(ray_session):
    docs = rd.read_parquet(SF, columns=["doc_id"]).repartition(8)
    out = deterministic_shuffle(docs, key="doc_id", salt=5).take_all()
    pos = sorted(r["pos"] for r in out)
    assert pos == list(range(len(out))) and len(out) == 500


def test_shuffle_parallelism_invariant(ray_session):
    def run(nparts):
        docs = rd.read_parquet(SF, columns=["doc_id"]).repartition(nparts)
        out = deterministic_shuffle(docs, key="doc_id", salt=5,
                                    bucket_bits=4).take_all()
        return sorted((r["doc_id"], r["pos"]) for r in out)

    assert run(1) == run(8)


def test_salt_changes_order(ray_session):
    docs = rd.read_parquet(SF, columns=["doc_id"])
    a = {r["doc_id"]: r["pos"] for r in
         deterministic_shuffle(docs, key="doc_id", salt=1).take_all()}
    b = {r["doc_id"]: r["pos"] for r in
         deterministic_shuffle(docs, key="doc_id", salt=2).take_all()}
    assert a != b and set(a) == set(b)
