"""Round-3 additions: ADVICE r2 bug fixes + VERDICT r2 next-round items."""

import dataclasses

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from fastdup_ray.config import DedupConfig


# ---------------------------------------------------------------- ADVICE r2
def test_normalize_urls_scheme_aware_ports(ray_session):
    from fastdup_ray.functions.urls import normalize_urls

    urls = pa.array(
        [
            "http://h.com:80/x",     # default port for scheme -> stripped
            "https://h.com:443/x",   # default port for scheme -> stripped
            "http://h.com:443/x",    # NOT the scheme default -> kept
            "https://h.com:80/x",    # NOT the scheme default -> kept
            "h.com:80/x",            # schemeless defaults to http -> stripped
            "h.com:443/x",           # schemeless -> :443 kept
        ]
    )
    out = normalize_urls(urls).to_pylist()
    assert out == [
        "http://h.com/x",
        "https://h.com/x",
        "http://h.com:443/x",
        "https://h.com:80/x",
        "h.com/x",
        "h.com:443/x",
    ]


def test_oph_seed_selects_signatures():
    from fastdup_ray.functions.minhash import OnePermMinHasher

    docs = ["the quick brown fox jumps over the lazy dog" * 3]
    a, _ = OnePermMinHasher(5, 128, seed=1).signatures(docs)
    b, _ = OnePermMinHasher(5, 128, seed=2).signatures(docs)
    c, _ = OnePermMinHasher(5, 128, seed=1).signatures(docs)
    assert not np.array_equal(a, b), "seed must select the minwise sample"
    assert np.array_equal(a, c), "same seed must be deterministic"


def test_oph_num_perms_guard():
    from fastdup_ray.functions.minhash import OnePermMinHasher

    for bad in (0, 1, 3, 96):
        with pytest.raises(ValueError):
            OnePermMinHasher(5, bad, 42)


def test_confirm_equal_ranges_rejects_hash_collisions():
    """The equal-hash verify short-circuit must confirm with real bytes:
    distinct sets that (hypothetically) collide on the 64-bit set hash
    may not be scored 1.0."""
    from fastdup_ray.stages.verify import _confirm_equal_ranges

    vals_a = np.array([1, 2, 3, 7, 8, 9], np.uint32)
    vals_b = np.array([1, 2, 3, 7, 8, 10], np.uint32)
    sa = np.array([0, 3], np.int64)
    sb = np.array([0, 3], np.int64)
    lens = np.array([3, 3], np.int64)
    conf = _confirm_equal_ranges(vals_a, sa, vals_b, sb, lens)
    assert conf.tolist() == [True, False]
    # chunk boundary: many segments forcing multiple chunks
    n = 5000
    va = np.arange(n * 4, dtype=np.uint32)
    vb = va.copy()
    vb[7] += 1  # corrupt one element of segment 1
    s = np.arange(n, dtype=np.int64) * 4
    ln = np.full(n, 4, np.int64)
    conf = _confirm_equal_ranges(va, s, vb, s, ln)
    assert not conf[1] and conf.sum() == n - 1


def test_verify_endpoints_never_materialize_on_driver(ray_session):
    """verify_pairs must compute the endpoint set via task-side tree
    reduce; equal-set pairs still score exactly 1.0 (byte-confirmed) and
    near-dup pairs keep their exact Jaccard."""
    from fastdup_ray.stages.signatures import SignStage
    from fastdup_ray.stages.verify import verify_pairs

    cfg = DedupConfig()
    base = "word%d " * 60
    texts = [base % tuple(range(i, i + 60)) for i in range(0, 40, 2)]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts) * 2) // 2, pa.int64()),
            "text": pa.array([t for t in texts for _ in (0, 1)]),
        }
    )
    # duplicate doc ids collapse: make ids unique, every even id's text
    # equals the next odd id's text -> (2i, 2i+1) are exact dups
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts) * 2), pa.int64()),
            "text": docs["text"],
        }
    )
    ds = rd.from_arrow(docs).repartition(4)
    sigs = ds.map_batches(SignStage(cfg), batch_format="pyarrow").materialize()
    pairs = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.arange(0, len(texts) * 2, 2), pa.int64()),
                "dst": pa.array(np.arange(1, len(texts) * 2, 2), pa.int64()),
            }
        )
    ).repartition(3)
    scores = verify_pairs(pairs, sigs, ds, cfg).take_all()
    assert len(scores) == len(texts)
    assert all(abs(r["distance"] - 1.0) < 1e-12 for r in scores)


# ------------------------------------------------ search index persistence
def test_search_index_persist_and_reload(ray_session, tmp_path):
    """VERDICT r2 #3: save the CSR arrays, kill the actors, reload —
    identical query results. Also exercises the distributed map_batches
    ingest path (no driver-side iter_batches loop)."""
    from fastdup_ray.sources.pages import synthesize_pages
    from fastdup_ray.stages.extract import HtmlExtractStage
    from fastdup_ray.stages.signatures import SignStage
    from fastdup_ray.state.search import (
        ShardedSearchIndex,
        build_search_index,
        load_search_index,
        save_search_index,
    )

    pages, truth = synthesize_pages(200, seed=7)
    cfg = DedupConfig()
    docs = rd.from_arrow(HtmlExtractStage(cfg.min_text_len)(pages)).repartition(4)
    sigs = docs.map_batches(SignStage(cfg), batch_format="pyarrow").materialize()

    queries = [t for t in pages["text"].to_pylist() if t][:8]
    for shards in (1, 4):
        idx = build_search_index(sigs, cfg, num_shards=shards)
        if shards == 1:
            before = [ray.get(idx.query_text.remote(q, k=5)) for q in queries]
            n_before = ray.get(idx.stats.remote())["n_docs"]
        else:
            before = [idx.query_text(q, k=5) for q in queries]
            n_before = idx.stats()["n_docs"]
        assert n_before == sigs.count()
        d = str(tmp_path / f"searchidx_{shards}")
        save_search_index(idx, d)
        # kill every actor: the reload must not depend on live state
        actors = idx.actors if isinstance(idx, ShardedSearchIndex) else [idx]
        for a in actors:
            ray.kill(a)
        reloaded = load_search_index(d)
        if shards == 1:
            after = [ray.get(reloaded.query_text.remote(q, k=5)) for q in queries]
        else:
            assert reloaded.num_shards == shards
            after = [reloaded.query_text(q, k=5) for q in queries]
        assert after == before
        racts = (
            reloaded.actors if isinstance(reloaded, ShardedSearchIndex)
            else [reloaded]
        )
        for a in racts:
            ray.kill(a)
