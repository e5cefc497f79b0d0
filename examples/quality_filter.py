"""Training-data quality pipeline: stats -> language ID -> quality score
-> filtered corpus, all streaming (no driver materialization of the
corpus).

    python examples/quality_filter.py [sf_dir] [out_dir]
"""

import sys

import pyarrow as pa
import pyarrow.compute as pc
import ray

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")

import ray.data as rd
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from fastdup_ray.stages.stats import TextStatsStage


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fastdup_ray_quality_out"

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    stats = docs.map_batches(TextStatsStage(), batch_format="pyarrow",
                             batch_size=2048)

    # keep: confidently-English, mid-quality-or-better docs
    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["lang_pred"], "en"),
            pc.greater_equal(batch["quality"], 0.5),
        )
        return batch.filter(mask)

    kept = stats.map_batches(keep, batch_format="pyarrow")
    kept.write_parquet(out_dir)

    total = docs.count()
    survived = rd.read_parquet(out_dir).count()
    print(f"kept {survived}/{total} docs -> {out_dir}")
    ray.shutdown()


if __name__ == "__main__":
    main()
