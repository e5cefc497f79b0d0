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


def _register_pickle_by_value() -> None:
    """Ship this package's code to Ray workers by value.

    The repo is used in-place (never pip-installed), so worker processes
    cannot import `fastdup_ray` by name — cloudpickle's default
    by-reference serialization would make every `map_batches(Cls)` actor
    die in a restart loop. Registering the package for by-value pickling
    embeds the needed classes/functions in the task spec instead.
    """
    try:
        import sys

        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_register_pickle_by_value()
