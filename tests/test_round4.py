"""Round-4 regression tests (VERDICT r3 / ADVICE r3 items)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fastdup_ray.config import DedupConfig

WINDOW = 64


def _rand_text(rng, n):
    return "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz ")) for _ in range(n))


def test_winnow_zero_miss_with_out_of_run_anchor_copy(ray_session):
    """ADVICE r3 (high): when the winnow-selected in-run 64-gram ALSO
    occurs outside the shared run in the same doc, the pair must still be
    found. The old one-occurrence-per-doc-per-fp bucket rule could keep
    the out-of-run copy, verify the wrong site, and silently drop the
    pair (missed on 4/25 of these crafted corpora before the fix)."""
    from fastdup_ray.functions.hashing import rolling_shingle_hashes
    from fastdup_ray.stages.substring import substring_pairs
    from fastdup_ray.stages.winnow import winnow_positions

    sub_len = 128
    w = sub_len - WINDOW + 1
    cfg = DedupConfig(substring_len=sub_len, substring_anchor_mode="winnow")
    for seed in range(8):
        rng = np.random.default_rng(seed)
        run = _rand_text(rng, sub_len)
        h_run = rolling_shingle_hashes(run.encode(), WINDOW)
        # the guaranteed-shared anchor: rightmost-min of the full in-run
        # winnow window (identical selection in both docs)
        p = int(winnow_positions(h_run, w)[0])
        decoy = run[p : p + WINDOW]  # same 64-gram, extends to < sub_len
        doc_a = decoy + _rand_text(rng, 150) + run + _rand_text(rng, 40)
        doc_b = _rand_text(rng, 90) + run + _rand_text(rng, 60)
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array([doc_a, doc_b]),
            }
        )
        out = substring_pairs(rd.from_arrow(tbl), cfg).take_all()
        assert any(
            r["src"] == 1 and r["dst"] == 2 and r["match_len"] >= sub_len
            for r in out
        ), (seed, out)


def test_distinct_value_quantile_bounded(ray_session):
    """A7 quantile contract: exact under the distinct budget, fixed-grid
    histogram above it with driver rows <= budget and threshold within
    one bin width of the true quantile (neardup outliers' scale path)."""
    from fastdup_ray.relational.ops import distinct_value_quantile

    # exact path: small distinct set, threshold = smallest v with
    # cumfrac >= q (ties and duplicates included)
    vals = [0.1] * 10 + [0.2] * 30 + [0.5] * 60
    ds = rd.from_arrow(
        pa.table({"distance": pa.array(vals, pa.float64())})
    ).repartition(4)
    thr, diag = distinct_value_quantile(ds, "distance", 0.05,
                                        distinct_budget=1000)
    assert diag["mode"] == "exact" and thr == 0.1
    thr, _ = distinct_value_quantile(ds, "distance", 0.3, distinct_budget=1000)
    assert thr == 0.2

    # grid path: 2,000,000 DISTINCT distances >> budget; driver holds at
    # most `budget` histogram rows, threshold within one bin of truth
    n, budget = 2_000_000, 50_000
    import pyarrow.compute as pc

    base = rd.range(n, override_num_blocks=16)
    dist = base.map_batches(
        lambda b: pa.table(
            {"distance": pc.divide(pc.cast(b["id"], pa.float64()), float(n))}
        ),
        batch_format="pyarrow",
    ).materialize()
    q = 0.05
    thr, diag = distinct_value_quantile(
        dist, "distance", q, distinct_budget=budget, grid=(0.0, 1.0)
    )
    assert diag["mode"] == "grid"
    assert diag["rows_collected"] <= budget  # driver memory bound
    tol = 1.0 / budget
    assert q - 1e-12 <= thr <= q + tol + 1e-9, thr
    # never under-selects: fraction(<= thr) >= q
    sel = dist.map_batches(
        lambda b: b.filter(pc.less_equal(b["distance"], pa.scalar(thr))),
        batch_format="pyarrow",
    ).count()
    assert sel / n >= q
    assert sel / n <= q + 2 * tol


def _edges_table(pairs):
    src, dst = zip(*pairs) if pairs else ((), ())
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).repartition(4)


def test_star_contraction_matches_union_find(ray_session):
    """connected_components_star == driver union-find on random graphs
    (several densities/seeds), including duplicate and reversed edges."""
    from fastdup_ray.stages.components import (
        connected_components_star, union_find_oracle)

    for seed, n, m in [(0, 50, 40), (1, 200, 150), (2, 300, 600)]:
        rng = np.random.default_rng(seed)
        ids = rng.choice(10_000_000, size=n, replace=False).astype(np.int64)
        pairs = [(int(ids[rng.integers(n)]), int(ids[rng.integers(n)]))
                 for _ in range(m)]
        pairs = [(a, b) for a, b in pairs if a != b]
        pairs += [(b, a) for a, b in pairs[: m // 4]]  # reversed dups
        expect = union_find_oracle(pairs)
        got = connected_components_star(_edges_table(pairs)).to_pandas()
        got_map = dict(zip(got["node"], got["label"]))
        assert got_map == expect, f"seed={seed}"


def test_star_contraction_log_rounds_on_path_graph(ray_session):
    """The scale property that motivates star contraction: a path graph
    of diameter n-1 (the worst case for min-label propagation, which
    needs O(n) rounds) converges in O(log n) alternating rounds."""
    from fastdup_ray.stages.components import (
        connected_components_star, union_find_oracle)

    n = 2048
    rng = np.random.default_rng(7)
    ids = rng.permutation(np.arange(1, 10 * n, 5))[:n].astype(np.int64)
    pairs = [(int(ids[i]), int(ids[i + 1])) for i in range(n - 1)]
    stats = {}
    got = connected_components_star(
        _edges_table(pairs), DedupConfig(num_partitions=8), stats=stats
    ).to_pandas()
    expect = union_find_oracle(pairs)
    assert dict(zip(got["node"], got["label"])) == expect
    # one component; all labels = global min
    assert set(got["label"]) == {min(min(p) for p in pairs)}
    # log2(2048) = 11; alternating star contraction halves star depth
    # per round — allow a small constant on top
    assert stats["rounds"] <= 18, stats


def test_cc_algorithm_dispatch_and_empty(ray_session):
    """cc_algorithm='star' routes connected_components through star
    contraction above the driver threshold; empty edge sets are fine."""
    from fastdup_ray.stages.components import (
        connected_components, connected_components_star, union_find_oracle)

    pairs = [(1, 2), (2, 3), (10, 11), (5, 1)]
    cfg = DedupConfig(cc_algorithm="star", cc_driver_max_edges=0,
                      num_partitions=4)
    got = connected_components(_edges_table(pairs), cfg).to_pandas()
    assert dict(zip(got["node"], got["label"])) == union_find_oracle(pairs)

    empty = connected_components_star(_edges_table([]))
    # NB: Dataset.to_pandas() drops columns on zero-row blocks, so
    # assert on the Dataset schema (the library surface)
    assert empty.count() == 0
    assert [f.name for f in empty.schema().base_schema] == ["node", "label"]
