"""fastdup_ray — a Ray-Data-native near-duplicate detection + clustering engine.

From-scratch re-expression of the capabilities of visual-layer/fastdup
(similarity graph -> connected components -> duplicates / outliers / stats /
dedup-deletion / search; see /root/repo/SURVEY.md) over Parquet tables of
Common-Crawl-style web pages, with the embedding-similarity core replaced by
text-native MinHash (char-5-gram shingles, 128 permutations), SimHash (64-bit)
and fingerprint-based exact-substring dedup, executed as ray.data.Dataset
pipelines of ``map_batches`` over zero-copy Arrow with actor pools for
stateful stages.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
session is owned by the caller (driver, bench.py, or the pytest fixture).
"""

from fastdup_ray.config import DedupConfig

__version__ = "0.1.0"

__all__ = ["DedupConfig", "__version__"]
