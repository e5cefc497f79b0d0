"""Leakage-safe train/test splitting.

The training-data analog of the reference's split-slice filters
(reference fastdup_controller.py:880-929 `slice` / split-column filters,
SURVEY.md §2.3 M16): a random per-DOC split leaks near-duplicates across
the boundary (a test page whose near-dup twin sits in train), so the
split unit must be the duplicate COMPONENT — every member of a connected
component lands on the same side.

The assignment rule is deterministic arithmetic on the component id
(min doc_id of the component, itself a uniform 63-bit url hash), so the
same split is reproducible anywhere — including in plain SQL, which is
what the catalog query's DuckDB twin checks end to end.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def leakage_safe_split(labels, *, col: str = "component_id",
                       test_mod: int = 2, mod: int = 10):
    """Attach a `split` column ('test' when `col % mod < test_mod`, else
    'train') to a (doc_id, component_id) Dataset. Components group
    near-duplicates, so no near-dup pair ever straddles the split;
    component ids are uniform hashes, so the expected test fraction is
    test_mod/mod. Pure map — no shuffle, no state."""

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        # fmod, not %: C-style sign-of-dividend semantics, the same as
        # SQL's % — so negative ids produce the same split in the DuckDB
        # twin (numpy % would map -7 % 10 -> 3, SQL -> -7)
        is_test = pa.array(np.fmod(ids, mod) < test_mod)
        split = pc.if_else(is_test, pa.scalar("test"), pa.scalar("train"))
        return batch.append_column("split", split)

    return labels.map_batches(assign, batch_format="pyarrow")
