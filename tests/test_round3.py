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


# ------------------------------------------------- fused extract+sign stage
def test_fused_extract_sign_equivalence(ray_session, tmp_path_factory):
    """cfg.fused_extract_sign=True (one wide docsig materialization) must
    produce identical docs, signatures, edges and components to the split
    two-stage path."""
    from fastdup_ray.pipelines.neardup import NearDupPipeline
    from fastdup_ray.sources.pages import synthesize_pages

    pages, _ = synthesize_pages(600, seed=11)

    def run(cfg, tag):
        wd = str(tmp_path_factory.mktemp(f"wd_{tag}"))
        pipe = NearDupPipeline(cfg, work_dir=wd)
        return pipe.run(rd.from_arrow(pages).repartition(8), input_token=tag)

    split = run(DedupConfig(), "split")
    fused = run(DedupConfig(fused_extract_sign=True), "fused")

    def table(ds, keys):
        rows = sorted(ds.take_all(), key=lambda r: tuple(r[k] for k in keys))
        return rows

    d_s = table(split.docs().select_columns(
        ["doc_id", "url", "text", "n_bytes", "error_code", "is_valid"]), ["doc_id"])
    d_f = table(fused.docs().select_columns(
        ["doc_id", "url", "text", "n_bytes", "error_code", "is_valid"]), ["doc_id"])
    assert d_s == d_f
    s_s = table(split.signatures().select_columns(
        ["doc_id", "simhash", "n_shingles"]), ["doc_id"])
    s_f = table(fused.signatures().select_columns(
        ["doc_id", "simhash", "n_shingles"]), ["doc_id"])
    assert s_s == s_f
    e_s = table(split.pair_scores(), ["src", "dst"])
    e_f = table(fused.pair_scores(), ["src", "dst"])
    assert e_s == e_f
    assert split.summary() == fused.summary()


# -------------------------------------------------- multi-node verify routing
def test_verify_route_pairs_matches_default(ray_session):
    """cfg.verify_route_pairs: pairs shuffled by (src_shard, dst_shard)
    so each verify task reads at most TWO index shards (the <=2 invariant
    is asserted inside the kernel); scores must equal the unrouted path
    exactly."""
    from fastdup_ray.sources.pages import synthesize_pages
    from fastdup_ray.stages.extract import HtmlExtractStage
    from fastdup_ray.stages.lsh import candidate_pairs
    from fastdup_ray.stages.signatures import BandStage, SignStage
    from fastdup_ray.stages.verify import verify_pairs

    pages, _ = synthesize_pages(500, seed=3)
    base = DedupConfig(verify_index_shards=4)
    docs = rd.from_arrow(HtmlExtractStage(base.min_text_len)(pages)).repartition(8)
    sigs = docs.map_batches(SignStage(base), batch_format="pyarrow").materialize()
    pairs = candidate_pairs(
        sigs.map_batches(BandStage(base), batch_format="pyarrow"), base
    ).materialize()
    assert pairs.count() > 50

    def scores(cfg):
        out = verify_pairs(pairs, sigs, docs, cfg).take_all()
        return sorted((r["src"], r["dst"], round(r["distance"], 12)) for r in out)

    for mode in ("exact", "signature"):
        plain = scores(dataclasses.replace(base, verify_mode=mode))
        routed = scores(dataclasses.replace(
            base, verify_mode=mode, verify_route_pairs=True))
        assert routed == plain, f"routed {mode} verify diverged"


# ------------------------------------------------------- distributed KMeans
def test_train_kmeans_matches_driver_oracle(ray_session):
    """Distributed full-EM Lloyd (map_batches partial sums) must match a
    driver-side full-data Lloyd from the same seeded init."""
    from fastdup_ray.stages.ann import (
        _matrix,
        _normalize,
        kmeans_assignments,
        kmeans_topk_assignments,
        train_ivf_centroids,
        train_kmeans,
    )

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet").repartition(6)
    k, iters = 8, 7
    cent = train_kmeans(ds, k, iters=iters, seed=42)

    # driver-side oracle: same init, same spherical Lloyd over ALL rows
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    m = _normalize(np.stack([np.asarray(r["embedding"], np.float64) for r in rows]))
    oracle = train_ivf_centroids(ds, k, iters=0, seed=42)
    for _ in range(iters):
        a = (m @ oracle.T).argmax(axis=1)
        new = oracle.copy()
        for c in range(k):
            sel = a == c
            if sel.any():
                new[c] = m[sel].mean(axis=0)
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        oracle = new / norms
    assert np.allclose(cent, oracle, rtol=1e-9, atol=1e-12)

    # top-k artifact: rank 0 equals the argmax assignment everywhere
    top = kmeans_topk_assignments(ds, cent, k=3).take_all()
    argmax = {r["vec_id"]: r["cluster"] for r in kmeans_assignments(
        ds, cent).take_all()}
    seen = set()
    for r in top:
        assert 0 <= r["rank"] < 3
        if r["rank"] == 0:
            assert argmax[r["vec_id"]] == r["cluster"]
            seen.add(r["vec_id"])
    assert seen == set(ids.tolist())


# --------------------------------------------------- medoid exemplars (G9)
def test_hierarchy_medoid_exemplar_recovers_cluster(ray_session):
    """Planted fixture: component c1's min-id member is an ATYPICAL text
    (different theme); its other three members are theme-A. With
    exemplar='medoid' c1 clusters with the theme-A component c2; with
    exemplar='canonical' (min-id text) it does not."""
    from fastdup_ray.stages.hierarchy import (
        component_medoids,
        hierarchical_components,
    )
    from fastdup_ray.stages.signatures import SignStage

    theme_a = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon " * 6
    )
    theme_b = (
        "zebra quokka wombat numbat dingo bilby bandicoot kookaburra "
        "cassowary platypus echidna wallaby " * 8
    )
    rows = [
        (1, theme_b),              # c1 min-id member: atypical
        (10, theme_a + "one "),
        (11, theme_a + "two "),
        (12, theme_a + "three "),
        (2, theme_a + "four "),    # c2: all theme A
        (20, theme_a + "five "),
        (21, theme_a + "six "),
    ]
    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )).repartition(3)
    comps = rd.from_arrow(pa.table(
        {"doc_id": pa.array([1, 10, 11, 12, 2, 20, 21], pa.int64()),
         "component_id": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64())}
    ))
    cfg = DedupConfig(num_partitions=4)

    sigs = docs.map_batches(
        SignStage(cfg, emit_shingles=False), batch_format="pyarrow"
    ).materialize()
    med = {r["component_id"]: r["doc_id"]
           for r in component_medoids(comps, sigs, cfg).take_all()}
    assert med[1] in (10, 11, 12), f"medoid picked the atypical member: {med}"
    assert med[2] in (2, 20, 21)

    def clusters(exemplar):
        cl, _ = hierarchical_components(
            docs, comps, cfg, cluster_threshold=0.7, exemplar=exemplar,
            signatures=sigs,
        )
        return {r["component_id"]: r["cluster_id"] for r in cl.take_all()}

    m = clusters("medoid")
    assert m[1] == m[2], f"medoid exemplars must merge the theme: {m}"
    c = clusters("canonical")
    assert c[1] != c[2], f"canonical (min-id) exemplar must miss it: {c}"


def test_combine_aggregate_matches_pandas(ray_session):
    """Map-side combiner + tree-reduce == plain pandas groupby, across
    many blocks so the merge tree actually runs."""
    import pandas as pd

    from fastdup_ray.relational.ops import combine_aggregate

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 37, size=5000),
            "v": rng.integers(-100, 100, size=5000),
        }
    )
    ds = rd.from_pandas(df).repartition(23)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("k", as_index=False, sort=False).agg(
            s=("v", "sum"), n=("v", "size")
        )

    got = (
        combine_aggregate(ds, "k", partial)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False).agg(s=("v", "sum"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_combine_aggregate_custom_merge_minmax(ray_session):
    import pandas as pd

    from fastdup_ray.relational.ops import combine_aggregate

    df = pd.DataFrame({"k": [0, 0, 1, 1, 1], "v": [5, -3, 10, 2, 7]})
    ds = rd.from_pandas(df).repartition(3)

    def partial(b):
        return b.groupby("k", as_index=False, sort=False).agg(
            mn=("v", "min"), mx=("v", "max")
        )

    def merge(b):
        return b.groupby("k", as_index=False, sort=False).agg(
            mn=("mn", "min"), mx=("mx", "max")
        )

    got = combine_aggregate(ds, "k", partial, merge).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["mn"].tolist() == [-3, 2]
    assert got["mx"].tolist() == [5, 10]


def test_hash_join_broadcast_matches_shuffle(ray_session):
    """The broadcast small-side path must return exactly what the
    shuffle path returns (left key kept, right key dropped)."""
    import pandas as pd

    from fastdup_ray.relational.ops import hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"k": rng.integers(0, 50, size=2000), "lv": np.arange(2000)}
    )
    right = pd.DataFrame({"rk": np.arange(0, 40), "name": [f"n{i}" for i in range(40)]})
    lds = rd.from_pandas(left).repartition(7)
    rds = rd.from_pandas(right)

    bc = hash_join(lds, rds, on="k", right_on="rk").to_pandas()
    sh = hash_join(
        lds, rds, on="k", right_on="rk", broadcast_rows=0
    ).to_pandas()
    key = ["k", "lv", "name"]
    assert sorted(bc.columns) == sorted(sh.columns) == sorted(key)
    bc = bc[key].sort_values(key).reset_index(drop=True)
    sh = sh[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, sh)
    # oracle: pandas inner merge
    want = left.merge(right, left_on="k", right_on="rk").drop(columns="rk")
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, want, check_dtype=False)


def test_srp_lsh_recall_vs_exact(ray_session):
    """SRP-LSH + exact rescore vs the blocked all-pairs baseline:
    precision must be 1.0 with identical distances (every candidate is
    rescored from the real vectors); recall >= 0.95 at cos >= 0.9."""
    import pandas as pd

    from fastdup_ray.stages.ann import cosine_dup_pairs, srp_lsh_dup_pairs

    rng = np.random.default_rng(3)
    d = 64
    base = rng.standard_normal((40, d))
    rows = []
    vid = 0
    for c in range(40):
        # a planted cluster: 3 near-identical variants of each base vector
        for _ in range(3):
            v = base[c] + rng.standard_normal(d) * 0.08
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
            vid += 1
    # background noise vectors (pairwise near-orthogonal w.h.p.)
    for _ in range(200):
        rows.append({
            "vec_id": vid,
            "embedding": rng.standard_normal(d).astype(np.float32).tolist(),
        })
        vid += 1
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(8).materialize()

    exact = cosine_dup_pairs(ds, threshold=0.9).to_pandas()
    lsh = srp_lsh_dup_pairs(ds, threshold=0.9).to_pandas()

    ek = set(zip(exact["src"], exact["dst"]))
    lk = set(zip(lsh["src"], lsh["dst"]))
    assert len(ek) >= 40  # the fixture actually planted near-dups
    assert lk <= ek  # precision 1.0: every LSH pair is a true pair
    recall = len(lk & ek) / len(ek)
    assert recall >= 0.95, f"recall {recall:.3f} over {len(ek)} true pairs"
    # distances are the SAME exact cosine on both paths
    em = {(s, t): x for s, t, x in zip(exact["src"], exact["dst"], exact["distance"])}
    for s, t, x in zip(lsh["src"], lsh["dst"], lsh["distance"]):
        assert abs(em[(s, t)] - x) < 1e-9


def test_asof_join_matches_pandas_oracle(ray_session):
    """Distributed as-of join == a single global merge_asof, including
    deterministic tie-breaks on equal right timestamps."""
    import pandas as pd

    from fastdup_ray.relational.ops import asof_join

    rng = np.random.default_rng(5)
    n_l, n_r = 3000, 2000
    left = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.integers(0, 40, n_l),
        "t": rng.integers(0, 10_000, n_l).astype("datetime64[s]"),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 45, n_r),  # some keys only on one side
        "rt": rng.integers(0, 10_000, n_r).astype("datetime64[s]"),
        "rid": np.arange(n_r),
        "payload": rng.standard_normal(n_r),
    })
    # force right-timestamp ties within a key so the tiebreak matters
    right.loc[:200, "rt"] = right.loc[0, "rt"]
    right.loc[:200, "rk"] = right.loc[0, "rk"]

    got = asof_join(
        rd.from_pandas(left).repartition(9),
        rd.from_pandas(right).repartition(7),
        on="t", right_on="rt", by="k", right_by="rk", tiebreak=["rid"],
        num_parts=16,
    ).to_pandas()

    ls = left.sort_values("t", kind="mergesort")
    rs = right.sort_values(["rt", "rid"], kind="mergesort").rename(
        columns={"rk": "k"}
    )
    want = pd.merge_asof(ls, rs, left_on="t", right_on="rt", by="k",
                         direction="backward")
    want = want[want["rt"].notna()]

    key = ["lid", "k", "rid"]
    got = got[key].astype(np.int64).sort_values(key).reset_index(drop=True)
    want = want[key].astype(np.int64).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_bloom_anti_join_matches_exact(ray_session):
    """Bloom-prefiltered anti-join == plain cogroup anti-join (the sketch
    changes shuffle volume, never the answer), and the prefilter
    actually routes most non-matching rows around the shuffle."""
    import pandas as pd

    import ray as _ray

    from fastdup_ray.relational.ops import (
        bloom_cogroup_anti_join,
        build_bloom,
        cogroup_anti_join,
    )

    rng = np.random.default_rng(13)
    left = pd.DataFrame({
        "k": rng.integers(0, 100_000, 5000),
        "v": np.arange(5000),
    })
    right = pd.DataFrame({"rk": rng.integers(0, 100_000, 800)})
    lds = rd.from_pandas(left).repartition(9)
    rds = rd.from_pandas(right).repartition(5)

    got = bloom_cogroup_anti_join(lds, rds, on="k", right_on="rk",
                                  num_parts=16).to_pandas()
    want = cogroup_anti_join(lds, rds, on="k", right_on="rk",
                             num_parts=16).to_pandas()
    key = ["k", "v"]
    # the bloom path restores exact int64 via with_schema; the plain path
    # degrades to float64 through NaN padding — compare values
    got = got[key].astype(np.int64).sort_values(key).reset_index(drop=True)
    want = want[key].astype(np.int64).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # pandas truth
    truth = left[~left["k"].isin(set(right["rk"]))]
    assert len(got) == len(truth)

    # the Bloom itself: zero false negatives, few false positives
    bloom_ref, test_fn = build_bloom(rds, "rk")
    bm = _ray.get(bloom_ref)
    keys = left["k"].to_numpy()
    hit = test_fn(keys, bm)
    true_hit = left["k"].isin(set(right["rk"])).to_numpy()
    assert (hit | ~true_hit).all()  # no false negatives
    fp = (hit & ~true_hit).mean()
    assert fp < 0.05, f"false-positive rate {fp:.3f}"


def test_leakage_safe_split_invariants(ray_session):
    """No component straddles train/test; expected test fraction ~=
    test_mod/mod for uniform-hash component ids."""
    import pandas as pd

    from fastdup_ray.stages.splits import leakage_safe_split

    rng = np.random.default_rng(17)
    # component ids that look like doc ids: uniform 63-bit hashes
    comp_ids = rng.integers(0, 2**63 - 1, 500)
    rows = []
    did = 0
    for c in comp_ids:
        for _ in range(int(rng.integers(1, 5))):
            rows.append({"doc_id": did, "component_id": int(c)})
            did += 1
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(7)

    out = leakage_safe_split(ds).to_pandas()
    assert set(out["split"].unique()) <= {"train", "test"}
    # every component entirely on one side
    sides = out.groupby("component_id")["split"].nunique()
    assert (sides == 1).all()
    # expected fraction 0.2 of COMPONENTS, tolerance for 500 draws
    frac = (
        out.drop_duplicates("component_id")["split"].eq("test").mean()
    )
    assert 0.1 < frac < 0.3, frac


def test_srp_lsh_recall_at_scale_random_ids(ray_session):
    """The code-review repro: thousands of vectors with planted near-dup
    pairs at RANDOM id positions (so star-capped hot buckets can't cover
    them by luck). Adaptive band geometry must keep recall >= 0.95."""
    import pandas as pd

    from fastdup_ray.stages.ann import cosine_dup_pairs, srp_lsh_dup_pairs

    rng = np.random.default_rng(29)
    d = 64
    n_noise = 12_000
    n_pairs = 100
    vecs = [rng.standard_normal(d) for _ in range(n_noise)]
    for _ in range(n_pairs):
        a = rng.standard_normal(d)
        vecs.append(a)
        vecs.append(a + rng.standard_normal(d) * 0.05)
    ids = rng.permutation(len(vecs))  # planted pairs NOT at min ids
    df = pd.DataFrame({
        "vec_id": ids,
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
    })
    ds = rd.from_pandas(df).repartition(16).materialize()

    exact = cosine_dup_pairs(ds, threshold=0.9).to_pandas()
    lsh = srp_lsh_dup_pairs(ds, threshold=0.9).to_pandas()
    ek = set(zip(exact["src"], exact["dst"]))
    lk = set(zip(lsh["src"], lsh["dst"]))
    assert len(ek) >= n_pairs * 0.9  # the planting worked
    assert lk <= ek
    recall = len(lk & ek) / len(ek)
    assert recall >= 0.95, f"recall {recall:.3f} over {len(ek)} true pairs"


def test_hash_join_broadcast_composite_keys(ray_session):
    """Composite (tuple) join keys must survive the broadcast path."""
    import pandas as pd

    from fastdup_ray.relational.ops import hash_join

    rng = np.random.default_rng(31)
    left = pd.DataFrame({
        "a": rng.integers(0, 10, 500),
        "b": rng.integers(0, 10, 500),
        "lv": np.arange(500),
    })
    right = pd.DataFrame({
        "a": np.repeat(np.arange(10), 10),
        "b": np.tile(np.arange(10), 10),
        "rv": np.arange(100) * 7,
    })
    # same-named composite keys
    got = hash_join(
        rd.from_pandas(left).repartition(5), rd.from_pandas(right),
        on=("a", "b"),
    ).to_pandas()
    want = left.merge(right, on=["a", "b"], how="inner")
    key = ["a", "b", "lv", "rv"]
    got = got[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_join_broadcast_empty_left_blocks(ray_session):
    """Broadcast-join output must not carry schema-less empty blocks
    (zero-row shuffle blocks bypass map_batches UDFs): chaining a second
    join after a partitioned_groupby left side must work."""
    import pandas as pd

    from fastdup_ray.relational.ops import hash_join, partitioned_groupby

    left = pd.DataFrame({"k": np.arange(40) % 7, "v": np.arange(40)})

    def agg(df):
        return df.groupby("k", as_index=False).agg(s=("v", "sum"))

    # 64 partitions >> 7 keys -> the sort shuffle emits many empty blocks
    lds = partitioned_groupby(rd.from_pandas(left), "k", agg, num_parts=32)
    r1 = pd.DataFrame({"rk": np.arange(7), "name": [f"n{i}" for i in range(7)]})
    r2 = pd.DataFrame({"k2": np.arange(7), "extra": np.arange(7) * 3})
    j1 = hash_join(lds, rd.from_pandas(r1), on="k", right_on="rk").materialize()
    j2 = hash_join(j1, rd.from_pandas(r2), on="k", right_on="k2").to_pandas()
    want = agg(left).merge(r1, left_on="k", right_on="rk").drop(columns="rk")
    want = want.merge(r2, left_on="k", right_on="k2").drop(columns="k2")
    key = sorted(want.columns)
    got = j2[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bloom_anti_join_string_keys(ray_session):
    """Bloom prefilter must support non-integer keys (urls/domains)."""
    import pandas as pd

    from fastdup_ray.relational.ops import bloom_cogroup_anti_join

    left = pd.DataFrame({
        "u": [f"https://site{i}.com/p" for i in range(300)],
        "v": np.arange(300),
    })
    right = pd.DataFrame({"ru": [f"https://site{i}.com/p" for i in range(0, 300, 3)]})
    got = bloom_cogroup_anti_join(
        rd.from_pandas(left).repartition(4), rd.from_pandas(right),
        on="u", right_on="ru", num_parts=8,
    ).to_pandas()
    want = left[~left["u"].isin(set(right["ru"]))]
    assert sorted(got["v"].astype(int)) == sorted(want["v"])


def test_incremental_equals_full_run(ray_session, tmp_path_factory):
    """run_incremental(B, base=run(A)) must equal run(A+B) exactly:
    same verified edge set (canonicalized) and the same component
    partition — without re-processing A."""
    from fastdup_ray.pipelines.neardup import NearDupPipeline
    from fastdup_ray.sources.pages import synthesize_pages

    pages, _ = synthesize_pages(900, seed=23)
    A, B = pages.slice(0, 600), pages.slice(600)
    cfg = DedupConfig()

    full = NearDupPipeline(
        cfg, work_dir=str(tmp_path_factory.mktemp("wd_full"))
    ).run(rd.from_arrow(pages).repartition(8), input_token="full")

    pipe = NearDupPipeline(cfg, work_dir=str(tmp_path_factory.mktemp("wd_incr")))
    baseA = pipe.run(rd.from_arrow(A).repartition(6), input_token="A")
    # fast mode pinned here (exact below the skew cap, which this
    # fixture never trips); exact_pairs=True has its own cap-forced pin
    # in test_incremental_exact_under_skew_cap
    incr = pipe.run_incremental(
        rd.from_arrow(B).repartition(4), base=baseA, input_token="B",
        exact_pairs=False,
    )

    def edge_set(res):
        rows = res.similarity().take_all()
        return {
            (min(r["src"], r["dst"]), max(r["src"], r["dst"]),
             round(r["distance"], 9))
            for r in rows
        }

    ef, ei = edge_set(full), edge_set(incr)
    assert ef, "fixture must contain similarity edges"
    assert ef == ei

    def comp_map(res):
        return {
            r["doc_id"]: r["component_id"]
            for r in res.connected_components().take_all()
        }

    assert comp_map(full) == comp_map(incr)
    # the increment actually reused A: its incremental docs stage only
    # processed B's rows
    n_b_docs = incr._docs.count() - baseA.docs().count()
    assert 0 < n_b_docs <= 360  # ~300 pages + synthetic dup planting


def test_split_scored_pairs_partition(ray_session):
    """r5 unit pin: the pair-keyed split behind exact incremental —
    reused == scores ∩ pairs (distances intact), to_verify == pairs
    with no score, scores outside the pair set dropped; robust to an
    empty side."""
    from fastdup_ray.pipelines.neardup import _split_scored_pairs

    pairs = rd.from_arrow(pa.table({
        "src": pa.array([1, 1, 2, 9], pa.int64()),
        "dst": pa.array([2, 3, 3, 9], pa.int64()),
    }))
    scores = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 7], pa.int64()),
        "dst": pa.array([2, 3, 8], pa.int64()),
        "distance": pa.array([0.9, 0.0, 0.5], pa.float64()),
    }))
    reused, to_verify = _split_scored_pairs(pairs, scores, num_parts=4)
    got_r = sorted((r["src"], r["dst"], r["distance"])
                   for r in reused.take_all())
    # distance 0.0 is a legal score and must be REUSED, not re-verified
    assert got_r == [(1, 2, 0.9), (2, 3, 0.0)]
    got_v = sorted((r["src"], r["dst"]) for r in to_verify.take_all())
    assert got_v == [(1, 3), (9, 9)]  # (7,8) dropped: not re-emitted

    empty_scores = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "distance": pa.array([], pa.float64()),
    }))
    r2, v2 = _split_scored_pairs(pairs, empty_scores, num_parts=4)
    assert r2.count() == 0 and v2.count() == pairs.count()


def test_incremental_exact_under_skew_cap(ray_session, tmp_path_factory):
    """r5: with max_bucket_pairs forced tiny so the star cap engages,
    exact_pairs=True must STILL equal the full run bit-for-bit (the
    union-bands emission makes identical capping choices), while the
    fast mode's split emitters produce a known edge-superset."""
    from fastdup_ray.pipelines.neardup import NearDupPipeline
    from fastdup_ray.sources.pages import synthesize_pages

    pages, _ = synthesize_pages(900, seed=23)
    A, B = pages.slice(0, 600), pages.slice(600)
    cfg = DedupConfig(max_bucket_pairs=2)  # every bucket >2 docs stars

    full = NearDupPipeline(
        cfg, work_dir=str(tmp_path_factory.mktemp("wd_full_cap"))
    ).run(rd.from_arrow(pages).repartition(8), input_token="full")

    pipe = NearDupPipeline(
        cfg, work_dir=str(tmp_path_factory.mktemp("wd_incr_cap")))
    baseA = pipe.run(rd.from_arrow(A).repartition(6), input_token="A")
    incr = pipe.run_incremental(
        rd.from_arrow(B).repartition(4), base=baseA, input_token="B")

    def edge_set(res):
        return {
            (min(r["src"], r["dst"]), max(r["src"], r["dst"]),
             round(r["distance"], 9))
            for r in res.similarity().take_all()
        }

    ef, ei = edge_set(full), edge_set(incr)
    assert ef and ef == ei

    def comp_map(res):
        return {r["doc_id"]: r["component_id"]
                for r in res.connected_components().take_all()}

    assert comp_map(full) == comp_map(incr)

    # fast mode under the same forced cap: the split emitters make
    # different star choices, so its edge set is NEITHER a subset nor a
    # superset of the full run's — pin that it runs and that the
    # divergence is real on this fixture (the reason exact is default)
    pipe2 = NearDupPipeline(
        cfg, work_dir=str(tmp_path_factory.mktemp("wd_incr_fast")))
    baseA2 = pipe2.run(rd.from_arrow(A).repartition(6), input_token="A")
    fast = pipe2.run_incremental(
        rd.from_arrow(B).repartition(4), base=baseA2, input_token="B",
        exact_pairs=False)
    e_fast = edge_set(fast)
    assert e_fast and e_fast != ef


def test_load_result_roundtrip(ray_session, tmp_path_factory):
    """load_result restores a finished run's tables and config from the
    work_dir alone, and the loaded result can seed run_incremental."""
    from fastdup_ray.pipelines.neardup import NearDupPipeline
    from fastdup_ray.sources.pages import synthesize_pages

    pages, _ = synthesize_pages(500, seed=3)
    A, B = pages.slice(0, 350), pages.slice(350)
    wd = str(tmp_path_factory.mktemp("wd_load"))
    pipe = NearDupPipeline(DedupConfig(), work_dir=wd)
    orig = pipe.run(rd.from_arrow(A).repartition(4), input_token="A")

    loaded = NearDupPipeline.load_result(wd)
    assert loaded.cfg.threshold == orig.cfg.threshold
    assert loaded.docs().count() == orig.docs().count()

    def edges(res):
        return {
            (min(r["src"], r["dst"]), max(r["src"], r["dst"]),
             round(r["distance"], 9))
            for r in res.similarity().take_all()
        }

    assert edges(loaded) == edges(orig)

    # loaded result seeds an increment identically to the live result
    pipe2 = NearDupPipeline(
        DedupConfig(), work_dir=str(tmp_path_factory.mktemp("wd_incr2"))
    )
    incr_live = pipe2.run_incremental(
        rd.from_arrow(B).repartition(3), base=orig, input_token="B"
    )
    pipe3 = NearDupPipeline(
        DedupConfig(), work_dir=str(tmp_path_factory.mktemp("wd_incr3"))
    )
    incr_loaded = pipe3.run_incremental(
        rd.from_arrow(B).repartition(3), base=loaded, input_token="B"
    )
    assert edges(incr_live) == edges(incr_loaded)
