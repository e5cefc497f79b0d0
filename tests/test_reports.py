"""Keep policies, outliers, domain summary, HTML report."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from fastdup_ray.config import DedupConfig
from fastdup_ray.functions.hashing import id63
from fastdup_ray.pipelines.neardup import NearDupPipeline
from fastdup_ray.pipelines.reports import domain_pair_summary, write_html_report
from fastdup_ray.sources.pages import synthesize_pages


@pytest.fixture(scope="module")
def run(ray_session, tmp_path_factory):
    pages, truth = synthesize_pages(400, seed=42)
    cfg = DedupConfig()
    pipe = NearDupPipeline(cfg, work_dir=str(tmp_path_factory.mktemp("wd")))
    res = pipe.run(rd.from_arrow(pages).repartition(4), input_token="reports")
    return {"res": res, "pages": pages, "truth": truth}


def test_keep_policies(run):
    res = run["res"]
    truth = run["truth"]
    first = res.keep_table(policy="first").take_all()
    comps = {}
    for r in first:
        comps.setdefault(r["component_id"], []).append(r["keep"])
    assert all(sum(v) == 1 for v in comps.values())

    none = res.keep_table(policy="none").take_all()
    assert not any(r["keep"] for r in none)

    labels = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(id63(truth["url"].to_pylist()), pa.int64()),
                "label": truth["cls"],
            }
        )
    ).materialize()
    maj = res.keep_table(policy="majority", labels=labels).take_all()
    by_comp = {}
    for r in maj:
        by_comp.setdefault(r["component_id"], []).append(r["keep"])
    # planted components are label-pure -> majority keeps exactly one each
    assert all(sum(v) == 1 for v in by_comp.values())

    with pytest.raises(ValueError):
        res.keep_table(policy="majority")
    with pytest.raises(ValueError):
        res.keep_table(policy="not-a-policy")


def test_outliers(run):
    out = run["res"].outliers().take_all()
    # outliers = docs whose best match sits in the bottom quantile of
    # best-match similarity; the columns carry that best distance
    assert all("src" in r and "distance" in r for r in out)
    if out:
        scores = [r["distance"] for r in out]
        all_best = run["res"].pair_scores().take_all()
        assert max(scores) <= max(s["distance"] for s in all_best)


def test_domain_summary_and_html(run, tmp_path):
    dom = domain_pair_summary(run["res"]).take_all()
    for r in dom:
        assert r["domain_a"] != r["domain_b"]
        assert r["n_edges"] >= 1 and 0 < r["best_distance"] <= 1.0

    path = write_html_report(run["res"], str(tmp_path / "report.html"))
    html = open(path).read()
    assert "fastdup_ray run report" in html
    assert "Top duplicate edges" in html
    assert os.path.getsize(path) > 500
