"""Deterministic hash sampling: parallelism invariance + exact-N
semantics (oracle hash-match lives in test_queries.py)."""

import ray.data as rd

from fastdup_ray.stages.sample import hash_sample, stratified_fixed_n

SF = "/root/testdata/sf0.001/documents.parquet"


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


def test_hash_sample_parallelism_invariant(ray_session):
    docs1 = rd.read_parquet(SF, columns=["doc_id", "lang"]).repartition(1)
    docs8 = rd.read_parquet(SF, columns=["doc_id", "lang"]).repartition(8)
    kw = dict(key="doc_id", group_col="lang", rates={"en": 0.2},
              default_rate=0.6, salt=99)
    a, b = _ids(hash_sample(docs1, **kw)), _ids(hash_sample(docs8, **kw))
    assert a == b and 0 < len(a) < 500


def test_fixed_n_exact_group_sizes(ray_session):
    docs = rd.read_parquet(SF, columns=["doc_id", "lang"]).repartition(8)
    out = stratified_fixed_n(docs, n=30, key="doc_id", group_col="lang",
                             salt=7).take_all()
    sizes = {}
    for r in out:
        sizes[r["lang"]] = sizes.get(r["lang"], 0) + 1
    assert sizes == {g: 30 for g in ["en", "fr", "es", "zh", "de"]}
    # invariance across block layouts
    out1 = stratified_fixed_n(
        rd.read_parquet(SF, columns=["doc_id", "lang"]).repartition(2),
        n=30, key="doc_id", group_col="lang", salt=7).take_all()
    assert sorted((r["lang"], r["doc_id"]) for r in out) == \
           sorted((r["lang"], r["doc_id"]) for r in out1)
