"""Job entrypoint: ``python -m fastdup_ray.cli run --input ... --work-dir ...``

This is the script you hand to ``ray job submit`` on a real cluster
(north rule: "run via ray job submit on a fixed-size multi-node Ray
cluster"):

    ray job submit --working-dir . -- \
        python -m fastdup_ray.cli run \
        --input s3://bucket/pages/ --work-dir s3://bucket/work/ \
        --out s3://bucket/cleaned/

In this sandbox it runs against local parquet with
``ray.init(address="local")``. The CLI owns the Ray session (guarded, so
it also works inside a pre-initialised driver).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="fastdup_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="full near-dup pipeline over a pages parquet dir")
    run.add_argument("--input", required=True, help="parquet file/dir with the pages schema")
    run.add_argument("--work-dir", required=True)
    run.add_argument("--out", default=None, help="write pages_dedup + decisions here")
    run.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    run.add_argument("--threshold", type=float, default=0.9)
    run.add_argument("--cc-threshold", type=float, default=0.96)
    run.add_argument("--verify-mode", choices=["exact", "signature"], default="exact")
    run.add_argument("--no-resume", action="store_true")

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.num_cpus, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED

    from fastdup_ray.config import DedupConfig
    from fastdup_ray.pipelines.neardup import NearDupPipeline

    cfg = DedupConfig(
        threshold=args.threshold,
        cc_threshold=args.cc_threshold,
        verify_mode=args.verify_mode,
    )
    pipe = NearDupPipeline(cfg, work_dir=args.work_dir)
    res = pipe.run(pages_path=args.input, resume=not args.no_resume)
    summary = res.summary()
    if args.out:
        from fastdup_ray.pipelines.sinks import write_dedup_corpus

        summary["dedup"] = write_dedup_corpus(res, args.out, num_partitions=cfg.num_partitions)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
