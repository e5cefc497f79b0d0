"""SimHash pair path + exact-substring (fingerprint) stage vs planted fixtures."""

import collections

import numpy as np
import pytest

import ray.data as rd

from fastdup_ray.config import DedupConfig
from fastdup_ray.functions.hashing import id63
from fastdup_ray.sources.pages import synthesize_pages
from fastdup_ray.stages.extract import HtmlExtractStage
from fastdup_ray.stages.signatures import SignStage
from fastdup_ray.stages.simhash_pairs import simhash_candidate_pairs
from fastdup_ray.stages.substring import substring_pairs


@pytest.fixture(scope="module")
def fixture(ray_session):
    pages, truth = synthesize_pages(500, seed=42)
    cfg = DedupConfig()
    docs_tbl = HtmlExtractStage(cfg.min_text_len)(pages)
    docs = rd.from_arrow(docs_tbl).repartition(4).materialize()
    sigs = docs.map_batches(SignStage(cfg), batch_format="pyarrow").materialize()
    ids = id63(pages["url"].to_pylist())
    return {"pages": pages, "truth": truth, "cfg": cfg, "docs": docs,
            "sigs": sigs, "ids": ids}


def test_simhash_pairs_catch_exact_dups(fixture):
    truth = fixture["truth"]
    pairs = simhash_candidate_pairs(fixture["sigs"], fixture["cfg"]).take_all()
    found = {(min(p["src"], p["dst"]), max(p["src"], p["dst"])): p["hamming"] for p in pairs}

    clusters = collections.defaultdict(list)
    for url, cls, cl in zip(
        truth["url"].to_pylist(), truth["cls"].to_pylist(), truth["cluster_id"].to_pylist()
    ):
        if cls == "exact_dup":
            clusters[cl].append(int(id63([url])[0]))
    checked = 0
    for cl, ids in clusters.items():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                key = (min(ids[i], ids[j]), max(ids[i], ids[j]))
                assert key in found, f"exact-dup pair missing from simhash candidates"
                assert found[key] == 0
                checked += 1
    assert checked >= 20
    # all emitted pairs respect the hamming bound
    assert all(p["hamming"] <= fixture["cfg"].simhash_hamming for p in pairs)


def test_substring_pairs_catch_planted_spans(fixture):
    truth = fixture["truth"]
    cfg = fixture["cfg"]
    out = substring_pairs(fixture["docs"], cfg).take_all()
    found = {(min(p["src"], p["dst"]), max(p["src"], p["dst"])): p["match_len"] for p in out}

    hosts = {}
    planted = []
    for url, cls, cl in zip(
        truth["url"].to_pylist(), truth["cls"].to_pylist(), truth["cluster_id"].to_pylist()
    ):
        if cls == "substring_host":
            hosts[cl] = int(id63([url])[0])
        elif cls == "substring_dup":
            planted.append((cl, int(id63([url])[0])))
    assert len(planted) >= 5
    missed = 0
    for cl, dup_id in planted:
        host_id = hosts[cl]
        key = (min(host_id, dup_id), max(host_id, dup_id))
        if key not in found:
            missed += 1
        else:
            assert found[key] >= cfg.substring_len
    assert missed == 0, f"{missed}/{len(planted)} planted substring pairs missed"
    # exact dups also share full-text runs
    assert len(found) > len(planted)
