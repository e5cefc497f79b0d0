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
