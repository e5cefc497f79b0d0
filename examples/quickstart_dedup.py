"""End-to-end near-duplicate detection over a Parquet page corpus.

The fastdup-equivalent flow (reference: fastdup.run() -> duplicates /
connected_components / outliers galleries) on Ray Data:

    python examples/quickstart_dedup.py [pages_dir] [work_dir]

pages_dir defaults to a synthetic 5k-page corpus derived from the
sf0.001 documents table; outputs land under work_dir (default
/tmp/fastdup_ray_quickstart): per-stage Parquet checkpoints + manifests,
an HTML report, and a deduplicated corpus.
"""

import os
import sys

import ray

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")

import ray.data as rd
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from fastdup_ray.config import DedupConfig
from fastdup_ray.pipelines.neardup import NearDupPipeline
from fastdup_ray.pipelines.reports import domain_pair_summary, write_html_report
from fastdup_ray.pipelines.sinks import write_dedup_corpus


def main() -> None:
    work_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fastdup_ray_quickstart"
    if len(sys.argv) > 1:
        pages = rd.read_parquet(sys.argv[1])
    else:
        from fastdup_ray.sources.pages import replicate_documents_ds

        pages = replicate_documents_ds(
            "/root/testdata/sf0.001/documents.parquet", replicate=10, seed=7
        )

    cfg = DedupConfig()  # char-5-gram, 128 perms, 16x8 LSH, exact verify
    result = NearDupPipeline(cfg, work_dir=work_dir).run(
        pages, input_token="quickstart-v1"
    )

    print("summary:", result.summary())
    print("top duplicate edges:")
    for r in result.duplicates_report(num_rows=5).take_all():
        print("  ", r)
    print("domain pair rollup:")
    for r in domain_pair_summary(result).limit(5).take_all():
        print("  ", r)

    report = write_html_report(result, os.path.join(work_dir, "report.html"))
    out_dir = os.path.join(work_dir, "dedup_corpus")
    write_dedup_corpus(result, out_dir)
    print(f"report: {report}\ndeduplicated corpus: {out_dir}")
    ray.shutdown()


if __name__ == "__main__":
    main()
