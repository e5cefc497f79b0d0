"""Similarity search over an embedding column (list<float>).

Three paths, smallest to largest scale:
  1. brute-force cosine top-k (broadcast query matrix, one matmul/batch);
  2. IVF: seeded-Lloyd centroids, assign once, probe nprobe cells;
  3. online: a bucket-sharded SearchIndex actor pool for incremental
     ingest + query without recomputing the corpus.

    python examples/similarity_search.py [sf_dir]
"""

import sys

import numpy as np
import ray

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")

import ray.data as rd
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from fastdup_ray.stages.ann import (
    brute_force_topk, ivf_assign, ivf_topk, train_ivf_centroids,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    # queries: the first 3 vectors (predicate pushdown, no full take_all)
    import pyarrow.compute as pc

    qrows = sorted(
        ds.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 3)), batch_format="pyarrow"
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])

    bf = brute_force_topk(ds, qids, qm, k=5)
    print("brute-force top-5 per query:")
    for r in bf.take_all()[:6]:
        print("  ", r)

    cent = train_ivf_centroids(ds, n_centroids=16, seed=42)
    assigned = ivf_assign(ds, cent).materialize()
    ivf = ivf_topk(assigned, cent, qids, qm, k=5, nprobe=4)
    print("IVF (nprobe=4) top-5 per query:")
    for r in ivf.take_all()[:6]:
        print("  ", r)
    ray.shutdown()


if __name__ == "__main__":
    main()
