"""Round-2 additions: own-code hash vectors, large-doc minhash, outlier
semantics, substring multi-run recall, annotation url coalesce, pagerank,
hierarchical components, classification report, sharded search, shuffle
anti-join, vectorized stats parity, galleries, file:// work_dir."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from fastdup_ray.config import DedupConfig
from fastdup_ray.functions.hashing import hash64_strings, id63
from fastdup_ray.functions.minhash import MinHasher


# ------------------------------------------------------------------ hashing v2
def test_hash_v2_fixed_vectors():
    """Pins the own-code string hash forever — checkpointed doc_ids must
    never silently change (VERDICT r1 #10)."""
    vectors = {
        "": 7171347544907833250,
        "a": 1551166993505926438,
        "hello world": 4142144083479816312,
        "http://example.com/page?q=1": 5031823315010335016,
    }
    for s, expect in vectors.items():
        assert int(id63([s])[0]) == expect
    h = hash64_strings(list(vectors))
    for i, s in enumerate(vectors):
        assert int(hash64_strings([s])[0]) == int(h[i])  # batch-invariant
    assert all(int(x) != 0 for x in h)


def test_minhash_large_doc_over_chunk_budget():
    """ADVICE r1 (high): docs with > 65,536 shingles crashed the sign
    stage; now they sign correctly and batch-invariantly."""
    m = MinHasher()
    big = "abcdefghij" * 25_000  # ~250k shingles, far over the 32k budget
    small = "hello world this is a doc"
    sig, ns = m.signatures([small, big, big, small])
    assert ns[1] > 65_536
    assert (sig[1] == sig[2]).all() and (sig[0] == sig[3]).all()
    solo, _ = m.signatures([big])
    assert (solo[0] == sig[1]).all()


# ------------------------------------------------------------------ anti-join
def test_cogroup_anti_join(ray_session):
    from fastdup_ray.relational.ops import cogroup_anti_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                                   "v": pa.array(list("abcde"))}))
    right = rd.from_arrow(pa.table({"r": pa.array([2, 4, 4, 9], pa.int64())}))
    out = cogroup_anti_join(left, right, on="k", right_on="r").take_all()
    assert sorted((r["k"], r["v"]) for r in out) == [(1, "a"), (3, "c"), (5, "e")]


# ------------------------------------------------------------------- pagerank
def test_pagerank_matches_dense_reference(ray_session):
    from fastdup_ray.stages.pagerank import pagerank

    # planted graph: triangle (1,2,3) + edge (4,5), node ids arbitrary
    edges = pa.table(
        {
            "src": pa.array([10, 10, 20, 40], pa.int64()),
            "dst": pa.array([20, 30, 30, 50], pa.int64()),
        }
    )
    ds = rd.from_arrow(edges)
    out = {r["node"]: r for r in pagerank(ds, DedupConfig(), iters=10).take_all()}
    # dense numpy reference on the symmetrized graph
    nodes = [10, 20, 30, 40, 50]
    idx = {n: i for i, n in enumerate(nodes)}
    adj = np.zeros((5, 5))
    for s, t in [(10, 20), (10, 30), (20, 30), (40, 50)]:
        adj[idx[s], idx[t]] = adj[idx[t], idx[s]] = 1
    deg = adj.sum(1)
    pr = np.full(5, 1 / 5)
    for _ in range(10):
        pr = (1 - 0.85) / 5 + 0.85 * adj.T @ (pr / deg)
    for n in nodes:
        assert abs(out[n]["pagerank"] - pr[idx[n]]) < 1e-9
        assert out[n]["degree"] == int(deg[idx[n]])

    # distributed path gives identical results
    cfg0 = DedupConfig(cc_driver_max_edges=0, num_partitions=4)
    out2 = {r["node"]: r for r in pagerank(ds, cfg0, iters=10).take_all()}
    for n in nodes:
        assert abs(out2[n]["pagerank"] - out[n]["pagerank"]) < 1e-9
        assert out2[n]["degree"] == out[n]["degree"]


# ------------------------------------------------------- classification report
def test_classification_report(ray_session):
    from fastdup_ray.stages.metrics import classification_report

    preds = rd.from_arrow(
        pa.table(
            {
                "label": pa.array(["a", "a", "a", "b", "b", "c"]),
                "pred": pa.array(["a", "a", "b", "b", "a", "c"]),
            }
        )
    )
    rep = classification_report(preds).to_pandas().set_index("class")
    # hand-computed: a: tp=2 fp=1 fn=1 -> p=2/3 r=2/3; b: tp=1 fp=1 fn=1 -> .5/.5
    assert abs(rep.loc["a", "precision"] - 2 / 3) < 1e-6
    assert abs(rep.loc["a", "recall"] - 2 / 3) < 1e-6
    assert abs(rep.loc["b", "f1"] - 0.5) < 1e-6
    assert rep.loc["c", "precision"] == 1.0 and rep.loc["c", "support"] == 1
    assert abs(rep["accuracy"].iloc[0] - 4 / 6) < 1e-6


# -------------------------------------------------------------- search shards
def test_sharded_search_equals_single(ray_session):
    from fastdup_ray.sources.pages import synthesize_pages
    from fastdup_ray.stages.extract import HtmlExtractStage
    from fastdup_ray.stages.signatures import SignStage
    from fastdup_ray.state.search import build_search_index

    cfg = DedupConfig()
    pages, _ = synthesize_pages(300, seed=7)
    docs = rd.from_arrow(HtmlExtractStage(cfg.min_text_len)(pages))
    sigs = docs.map_batches(SignStage(cfg), batch_format="pyarrow").materialize()
    single = build_search_index(sigs, cfg)
    sharded = build_search_index(sigs, cfg, num_shards=4)
    texts = [r["text"] for r in docs.limit(10).take_all()]
    for t in texts:
        a = ray.get(single.query_text.remote(t, 5))
        b = sharded.query_text(t, 5)
        assert a == b, (a, b)
    st = sharded.stats()
    assert st["n_docs"] > 0 and len(st["shards"]) == 4


# ------------------------------------------------------------- substring runs
def test_substring_reports_longest_of_multiple_runs(ray_session):
    """ADVICE r1 (medium): when two docs share several distinct runs, the
    reported pair must reflect a qualifying run even if another anchor
    lands in a short run."""
    from fastdup_ray.stages.substring import substring_pairs

    rng = np.random.default_rng(3)

    def rand_text(n):
        return "".join(
            rng.choice(list("abcdefghijklmnopqrstuvwxyz ")) for _ in range(n)
        )

    short_run = rand_text(90)     # shared but < substring_len
    long_run = rand_text(400)     # shared and >= substring_len
    doc_a = short_run + rand_text(200) + long_run + rand_text(50)
    doc_b = rand_text(120) + short_run + rand_text(333) + long_run
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([doc_a, doc_b]),
        }
    )
    # pin sampled mode explicitly (winnow became the config default in
    # r5) so the 1/mod anchor path keeps its own coverage
    cfg = DedupConfig(substring_len=256, substring_sample_mod=4,
                      substring_anchor_mode="sampled")
    out = substring_pairs(rd.from_arrow(tbl), cfg).take_all()
    assert len(out) == 1
    assert out[0]["match_len"] >= 256


# ------------------------------------------------------ annotations url keep
def test_expand_annotations_keeps_phantom_url(ray_session):
    from fastdup_ray.stages.annotations import ERR_MISSING_DOC, expand_annotations

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "url": pa.array(["u1", "u2"]),
            }
        )
    )
    annots = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["u2", "phantom://missing"]),
                "label": pa.array(["x", "y"]),
            }
        )
    )
    rows = expand_annotations(docs, annots, num_partitions=4).take_all()
    missing = [r for r in rows if r["annot_error"] == ERR_MISSING_DOC]
    assert len(missing) == 1
    # the dangling annotation keeps ITS url, not 'None'/'nan'
    assert missing[0]["url"] == "phantom://missing"
    assert missing[0]["label"] == "y"


# -------------------------------------------------------------- stats parity
def test_stats_vectorized_matches_scalar_reference():
    from fastdup_ray.stages.stats import TextStatsStage

    st = TextStatsStage()
    rng = np.random.default_rng(11)
    words = ["the", "cat", "123", "ünïté", "于", "der", "la", "data", "of"]
    texts = ["", "  spaced   out  ", "这是中文测试" * 10, None, "x"]
    texts += [
        " ".join(rng.choice(words, size=rng.integers(0, 50)))
        for _ in range(150)
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = st(batch).to_pandas()
    names = ["n_chars", "n_tokens", "n_lines", "uniq_token_ratio",
             "mean_word_len", "digit_ratio", "non_ascii_ratio",
             "stopword_ratio", "lang_pred", "lang_score", "quality"]
    for i, t in enumerate(texts):
        ref = st._one(t or "")
        for j, nm in enumerate(names):
            got = out[nm][i]
            if isinstance(ref[j], str):
                assert got == ref[j], (i, nm)
            else:
                assert abs(float(got) - round(float(ref[j]), 6)) < 1e-9, (i, nm)


# ----------------------------------------------------- e2e: outliers+galleries
@pytest.fixture(scope="module")
def r2_run(ray_session, tmp_path_factory):
    from fastdup_ray.pipelines.neardup import NearDupPipeline
    from fastdup_ray.sources.pages import synthesize_pages

    pages, truth = synthesize_pages(600, seed=5)
    work = tmp_path_factory.mktemp("r2work")
    # file:// URI work_dir exercises the pyarrow.fs checkpoint path
    pipe = NearDupPipeline(DedupConfig(num_partitions=4), work_dir=f"file://{work}")
    res = pipe.run(rd.from_arrow(pages).repartition(4), input_token="r2", resume=False)
    return {"res": res, "truth": truth, "work": str(work), "pipe": pipe}


def test_file_uri_workdir_and_resume(r2_run):
    import json
    import os

    work = r2_run["work"]
    man = json.load(open(os.path.join(work, "docs", "manifest.json")))
    assert man["rows"] > 0 and man["fingerprint"]
    assert os.path.isdir(os.path.join(work, "docs", man["data_dir"]))
    # resume through the file:// FS: same fingerprint -> checkpoint read
    # back without running the build
    from fastdup_ray.pipelines.neardup import NearDupPipeline

    pipe2 = NearDupPipeline(r2_run["pipe"].cfg, work_dir=f"file://{work}")

    def must_not_build():
        raise AssertionError("build must not run on resume")

    # run() keys the docs fingerprint on [input_token, hooks_token]
    ds, fp = pipe2._stage(
        "docs", ["r2", pipe2.hooks_token], must_not_build, resume=True)
    assert fp == man["fingerprint"]
    assert ds.count() == man["rows"]


def test_outliers_schema_and_zero_candidate_docs(r2_run):
    res = r2_run["res"]
    out = res.outliers().take_all()
    assert out, "outliers must not be empty on a corpus with unmatched docs"
    cols = set(out[0].keys())
    assert cols == {"src", "dst", "distance"}
    # zero-candidate docs present with null neighbor and distance 0
    unmatched = [r for r in out if r["dst"] is None]
    assert unmatched and all(r["distance"] == 0.0 for r in unmatched)
    # scored outliers keep their true nearest neighbor
    scored = [r for r in out if r["dst"] is not None]
    if scored:
        pairs = res.pair_scores().take_all()
        best = {}
        for p in pairs:
            for a, b in ((p["src"], p["dst"]), (p["dst"], p["src"])):
                cur = best.get(a)
                cand = (p["distance"], b)
                if cur is None or cand[0] > cur[0] or (
                    cand[0] == cur[0] and cand[1] < cur[1]
                ):
                    best[a] = cand
        for r in scored:
            assert best[r["src"]] == (r["distance"], r["dst"])


def test_galleries(r2_run, tmp_path):
    from fastdup_ray.pipelines.galleries import (
        components_gallery,
        duplicates_gallery,
        outliers_gallery,
        similarity_gallery,
        stats_gallery,
        write_all_galleries,
    )

    res = r2_run["res"]
    dup = duplicates_gallery(res, 10)
    assert len(dup) > 0 and (dup["distance"] >= 0.9).all()
    assert (dup["src_text"].str.len() > 0).all()
    # diff highlight: present for every row; empty exactly when the two
    # snippets agree byte-for-byte, '@<off>: ...' pinpointing otherwise
    assert "diff_snippet" in dup.columns
    same = dup["src_text"] == dup["dst_text"]
    assert (dup.loc[same, "diff_snippet"] == "").all()
    assert dup.loc[~same, "diff_snippet"].str.match(r"@\d+: ").all()
    comp = components_gallery(res, 10)
    assert len(comp) > 0 and (comp["len"] >= 2).all()
    outl = outliers_gallery(res, 10)
    assert len(outl) > 0
    stat = stats_gallery(res, "n_chars", 5)
    assert len(stat) == 5 and stat["n_chars"].is_monotonic_decreasing
    sim = similarity_gallery(res, 5)
    assert len(sim) > 0 and all(len(x) >= 1 for x in sim["neighbor_ids"])
    made = write_all_galleries(res, str(tmp_path / "gal"), num_rows=5)
    import os

    assert all(os.path.exists(p) for p in made.values())


def test_slice_regex_and_two_labels(ray_session):
    from fastdup_ray.stages.annotations import slice_by_label, slice_two_labels

    ds = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["http://a.com/x", "https://b.org/y", "http://c.com/z"]),
                "lang": pa.array(["en", "de", "en"]),
                "lang_nb": pa.array(["en", "en", "de"]),
            }
        )
    )
    got = slice_by_label(ds, "url", r"^https://", mode="regex").take_all()
    assert [r["url"] for r in got] == ["https://b.org/y"]
    same = slice_two_labels(ds, "lang", "lang_nb", mode="same").take_all()
    assert [r["url"] for r in same] == ["http://a.com/x"]
    diff = slice_two_labels(ds, "lang", "lang_nb", mode="diff").take_all()
    assert len(diff) == 2


def test_kmeans_assignments_and_cluster_vote(ray_session):
    from fastdup_ray.stages.ann import (
        cluster_label_vote,
        kmeans_assignments,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(4)
    # two well-separated blobs
    a = rng.normal((5, 0, 0), 0.05, size=(20, 3))
    b = rng.normal((0, 5, 0), 0.05, size=(20, 3))
    vecs = np.vstack([a, b])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl).materialize()
    cent = train_ivf_centroids(ds, n_centroids=2, sample_rows=40, seed=1)
    asg = kmeans_assignments(ds, cent).materialize()
    rows = asg.take_all()
    assert {r["vec_id"] for r in rows} == set(range(40))
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    # the two blobs separate perfectly
    assert sorted(len(v) for v in by_cluster.values()) == [20, 20]
    assert all(0 <= r["distance"] <= 1.0 for r in rows)

    labels = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "label": pa.array(["x"] * 20 + ["y"] * 20),
            }
        )
    )
    votes = cluster_label_vote(asg, labels, num_parts=4).take_all()
    assert {v["label"] for v in votes} == {"x", "y"}
    assert all(v["purity"] == 1.0 and v["votes"] == 20 for v in votes)


def test_multimodal_plumbing(ray_session):
    """Stubbed codec, real plumbing: schema, error codes, determinism,
    actor-pool form, frame explosion, byte-identical near-dup pairing."""
    from fastdup_ray.stages.multimodal import (
        ERR_EMPTY_MEDIA,
        FrameSampleStage,
        MediaDecodeStage,
        media_near_dup_pairs,
    )

    rng = np.random.default_rng(2)
    blobs = [rng.bytes(500) for _ in range(10)]
    payloads = blobs + [blobs[0], b""]  # one exact dup + one empty
    tbl = pa.table(
        {
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    # actor-pool form: callable CLASS + concurrency
    decoded = ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=4, concurrency=2
    ).materialize()
    rows = {r["media_id"]: r for r in decoded.take_all()}
    assert len(rows) == len(payloads)
    empty = rows[len(payloads) - 1]
    assert not empty["is_valid"] and empty["error_code"] == ERR_EMPTY_MEDIA
    dup, orig = rows[10], rows[0]
    assert dup["is_valid"] and list(dup["feature"]) == list(orig["feature"])
    assert len(orig["feature"]) == 64
    assert abs(np.linalg.norm(np.asarray(orig["feature"])) - 1.0) < 1e-9

    frames = decoded.map_batches(
        FrameSampleStage(max_frames=4), batch_format="pyarrow"
    ).take_all()
    per_media = {}
    for f in frames:
        per_media.setdefault(f["media_id"], []).append(f["frame_no"])
    assert len(per_media[0]) == min(rows[0]["n_frames"], 4)
    assert sorted(per_media[0]) == list(range(len(per_media[0])))
    assert empty["media_id"] not in per_media  # invalid rows emit no frames

    pairs = media_near_dup_pairs(decoded).take_all()
    assert any(
        {p["src"], p["dst"]} == {0, 10} and p["distance"] == 1.0 for p in pairs
    )


def test_hierarchical_components(ray_session):
    """Two-level fixture: components A (docs of theme X) and B (slightly
    mutated theme X) must cluster together at the lower threshold; C
    (different theme) must not."""
    from fastdup_ray.stages.hierarchy import hierarchical_components

    rng = np.random.default_rng(9)
    base = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], 200))
    other = " ".join(rng.choice(["omega", "sigma", "tau", "phi"], 200))
    mut = base.replace("alpha", "alphaz", 3)  # ~ near-dup of base at 0.7+
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array([base, base, mut, mut, other, other]),
        }
    )
    comps = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "component_id": pa.array([1, 1, 3, 3, 5, 5], pa.int64()),
        }
    )
    clusters, edges = hierarchical_components(
        rd.from_arrow(docs), rd.from_arrow(comps),
        DedupConfig(num_partitions=4), cluster_threshold=0.7,
    )
    cl = {r["component_id"]: r["cluster_id"] for r in clusters.take_all()}
    assert set(cl) == {1, 3, 5}
    assert cl[1] == cl[3] == 1, cl   # A and B merge (cluster = min comp id)
    assert cl[5] == 5                # C stays apart
    e = edges.take_all()
    assert any(
        {r["cluster_from"], r["cluster_to"]} == {1, 3} for r in e
    )


def test_cosine_dup_pairs_exact_oracle(ray_session):
    """Blocked all-pairs embedding-cosine dedup == dense numpy oracle,
    including across-block pairs (forced small blocks)."""
    from fastdup_ray.stages.ann import cosine_dup_pairs

    rng = np.random.default_rng(7)
    n, d = 300, 16
    m = rng.normal(size=(n, d))
    # plant near-dup pairs well above the threshold
    m[250] = m[10] + rng.normal(scale=0.01, size=d)
    m[251] = m[20] * 3.0
    ds = rd.from_arrow(
        pa.table({
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float32())),
        })
    ).repartition(6)

    got = (
        cosine_dup_pairs(ds, threshold=0.6, min_block_rows=32)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )

    mf = m.astype(np.float32).astype(np.float64)
    mn = mf / np.linalg.norm(mf, axis=1, keepdims=True)
    sims = mn @ mn.T
    iu = np.triu_indices(n, k=1)
    keep = sims[iu] >= 0.6
    import pandas as pd
    want = pd.DataFrame({
        "src": iu[0][keep].astype(np.int64),
        "dst": iu[1][keep].astype(np.int64),
        "distance": np.round(sims[iu][keep], 6),
    }).sort_values(["src", "dst"]).reset_index(drop=True)

    assert len(want) >= 2          # the planted pairs are in range
    pd.testing.assert_frame_equal(got, want)


def test_text_embed_stage(ray_session):
    """M9 encoder: deterministic across runs/parallelism, near-identical
    texts close in cosine, unrelated texts far."""
    from fastdup_ray.stages.embed import embed_documents

    texts = [
        "the quick brown fox jumps over the lazy dog " * 20,
        "the quick brown fox jumps over the lazy dog " * 20 + "tail!",
        "completely different content about ray data pipelines " * 20,
        "",
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out1 = embed_documents(rd.from_arrow(tbl).repartition(2), dim=32,
                           concurrency=2).to_pandas().sort_values("doc_id")
    out2 = embed_documents(rd.from_arrow(tbl), dim=32,
                           concurrency=1).to_pandas().sort_values("doc_id")
    m1 = np.stack(out1["embedding"].to_numpy())
    m2 = np.stack(out2["embedding"].to_numpy())
    assert m1.shape == (4, 32)
    np.testing.assert_array_equal(m1, m2)  # parallelism-invariant

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    assert cos(m1[0], m1[1]) > 0.99       # near-dup texts stay close
    assert cos(m1[0], m1[2]) < 0.8        # unrelated texts are far
    assert not m1[3].any()                # empty text -> zero vector


def test_pipeline_hooks(ray_session, tmp_path):
    """§2.12 extension hooks: post_extract runs inside the docs stage
    (and checkpoints with it), pre_components filters edges before CC,
    and the hooks token keys resume fingerprints."""
    import pyarrow.compute as pc

    from fastdup_ray.pipelines.neardup import NearDupPipeline
    from fastdup_ray.sources.pages import synthesize_pages

    pages, _ = synthesize_pages(200, seed=7)
    wd = str(tmp_path / "wd")

    def drop_fr(ds):
        return ds.map_batches(
            lambda b: b.filter(pc.not_equal(b["lang"], pa.scalar("fr"))),
            batch_format="pyarrow",
        )

    base = NearDupPipeline(DedupConfig(), work_dir=wd).run(
        rd.from_arrow(pages).repartition(4), input_token="hooks-t")
    n_base = base.docs().count()
    n_fr = base.docs().filter(lambda r: r["lang"] == "fr").count()

    hooked = NearDupPipeline(
        DedupConfig(), work_dir=wd, hooks={"post_extract": drop_fr},
    ).run(rd.from_arrow(pages).repartition(4), input_token="hooks-t")
    assert hooked.docs().count() == n_base - n_fr
    assert hooked.docs().filter(lambda r: r["lang"] == "fr").count() == 0
    # different hooks -> different fingerprint -> base checkpoint untouched
    again = NearDupPipeline(DedupConfig(), work_dir=wd).run(
        rd.from_arrow(pages).repartition(4), input_token="hooks-t")
    assert again.docs().count() == n_base

    # pre_components: drop every edge -> no components
    none = NearDupPipeline(
        DedupConfig(), work_dir=str(tmp_path / "wd2"),
        hooks={"pre_components": lambda ds: ds.limit(0)},
    ).run(rd.from_arrow(pages).repartition(4), input_token="hooks-t2")
    assert none.connected_components().count() == 0


def test_url_normalizers(ray_session):
    """M11 normalizer library: canonical forms, domains, stems."""
    from fastdup_ray.functions.urls import (
        add_url_columns, domain_of, normalize_urls, path_stem,
    )

    urls = pa.array([
        "HTTPS://Example.COM:443//a//b/page.HTML?utm_source=x&id=3#frag",
        "http://site.org/path/",
        "site.org/bare?gclid=zz",
        "https://h.net/dir/file.tar.gz",
        "",
    ])
    norm = normalize_urls(urls).to_pylist()
    assert norm[0] == "https://example.com/a/b/page.HTML?id=3"
    assert norm[1] == "http://site.org/path"
    assert norm[2] == "site.org/bare"
    assert norm[4] == ""
    assert domain_of(urls).to_pylist()[:4] == [
        "example.com", "site.org", "site.org", "h.net"]
    assert path_stem(urls).to_pylist()[3] == "file.tar"

    ds = rd.from_arrow(pa.table({"url": urls}))
    out = add_url_columns(ds).to_pandas()
    assert list(out.columns) == ["url", "url_norm", "domain", "stem"]
    assert out["domain"].iloc[0] == "example.com"


def test_export_projector(ray_session, tmp_path):
    """O6 projector export: sampled vectors.tsv + metadata.tsv."""
    from fastdup_ray.pipelines.sinks import export_projector

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = export_projector(ds, str(tmp_path / "proj"), max_rows=40,
                           label_col="label")
    assert out["rows"] == 40
    vecs = open(out["vectors"]).read().strip().split("\n")
    meta = open(out["metadata"]).read().strip().split("\n")
    assert len(vecs) == 40 and len(meta) == 41  # header + rows
    assert meta[0] == "vec_id\tlabel"
    dims = {len(v.split("\t")) for v in vecs}
    assert len(dims) == 1  # constant dimensionality


def test_snippet_diff_properties():
    """diff is '' iff the snippets are byte-equal; otherwise it names
    the first divergence offset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fastdup_ray.pipelines.galleries import _snippet_diff

    @settings(max_examples=80, deadline=None)
    @given(st.text(alphabet="abX ", max_size=12),
           st.text(alphabet="abX ", max_size=12))
    def run(a, b):
        d = _snippet_diff(a, b)
        if a == b:
            assert d == ""
        else:
            assert d.startswith("@")
            off = int(d[1:].split(":", 1)[0])
            assert a[:off] == b[:off]
            assert off == len(a) or off == len(b) or a[off] != b[off]

    run()


def test_export_projector_sprite(ray_session, tmp_path):
    """r5 K7 completion: sprite.ppm sheet of per-doc text thumbnails,
    tile order == vector order, decodable by the shipped P6 codec."""
    import numpy as np

    from fastdup_ray.pipelines.sinks import export_projector
    from fastdup_ray.stages.multimodal import (ppm_decode, ppm_encode,
                                               text_thumbnail)

    # codec roundtrip
    tile = text_thumbnail("def f(x):\n    return X * 42  # ok", 16)
    assert tile.shape == (16, 16, 3) and tile.dtype == np.uint8
    d = ppm_decode(ppm_encode(tile))
    assert (d["width"], d["height"]) == (16, 16)
    # deterministic and class-sensitive: same text -> same raster,
    # different class mix -> different raster
    assert np.array_equal(tile, text_thumbnail("def f(x):\n    return X * 42  # ok", 16))
    assert not np.array_equal(tile, text_thumbnail("ALL UPPER CASE TEXT", 16))

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet") \
        .map_batches(lambda b: b.select(["doc_id", "text"])
                     .rename_columns(["vec_id", "text"])
                     .append_column("embedding", b["doc_id"].cast("float64")),
                     batch_format="pyarrow")

    def listify(b):
        import pyarrow as pa
        return pa.table({
            "vec_id": b["vec_id"],
            "text": b["text"],
            "embedding": pa.array([[float(x)] for x in b["embedding"].to_pylist()]),
        })

    out = export_projector(docs.map_batches(listify, batch_format="pyarrow"),
                           str(tmp_path / "spr"), max_rows=10,
                           sprite_text_col="text", sprite_cell=8)
    assert out["rows"] == 10 and out["sprite_cell"] == 8
    dec = ppm_decode(open(out["sprite"], "rb").read())
    grid = int(np.ceil(np.sqrt(10)))  # 4x4 grid of 8px tiles
    assert (dec["width"], dec["height"]) == (grid * 8, grid * 8)


def test_checkpoint_stage_optout(ray_session, tmp_path):
    """checkpoint_stages opt-out: un-checkpointed stages skip the Parquet
    write (no stage dir) but the pipeline result is identical."""
    import os

    from fastdup_ray.pipelines.neardup import NearDupPipeline
    from fastdup_ray.sources.pages import synthesize_pages

    pages, _ = synthesize_pages(300, seed=11)
    full_dir = tmp_path / "full"
    part_dir = tmp_path / "part"
    cfg_full = DedupConfig(num_partitions=4)
    cfg_part = DedupConfig(
        num_partitions=4,
        checkpoint_stages=("docs", "pair_scores", "components"),
    )
    res_full = NearDupPipeline(cfg_full, work_dir=str(full_dir)).run(
        rd.from_arrow(pages).repartition(4), input_token="ck", resume=False
    )
    res_part = NearDupPipeline(cfg_part, work_dir=str(part_dir)).run(
        rd.from_arrow(pages).repartition(4), input_token="ck", resume=False
    )
    a = res_full.connected_components().to_pandas().sort_values("doc_id")
    b = res_part.connected_components().to_pandas().sort_values("doc_id")
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["component_id"].to_numpy() == b["component_id"].to_numpy()).all()
    # skipped stages left no checkpoint; kept stages did
    for st in ("signatures", "pairs", "shingles"):
        assert not os.path.exists(part_dir / st / "manifest.json"), st
    for st in ("docs", "pair_scores", "components"):
        assert os.path.exists(part_dir / st / "manifest.json"), st
    # config round-trips through JSON with the tuple intact
    assert DedupConfig.from_dict(
        __import__("json").loads(cfg_part.to_json())
    ) == cfg_part
