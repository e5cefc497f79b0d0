"""End-to-end near-duplicate pipeline with per-stage Parquet checkpoints.

The Ray-Data-native replacement for the reference's
`fd = fastdup.create(input_dir, work_dir); fd.run()` flow
(reference engine.py:36-158, fastdup_controller.py:523-653; C++ do_main
writing similarity.csv / connected_components.csv into a work_dir,
SURVEY.md §3.1). Here every stage is a Dataset transform and every
checkpoint is a Parquet directory with a lineage manifest:

    work_dir/
      docs/          url-keyed corpus after HTML->text extraction
      signatures/    doc_id, minhash[128], simhash, n_shingles
      pairs/         distinct LSH candidate pairs (src, dst)
      pair_scores/   verified pairs (src, dst, distance)
      components/    node -> component label (min doc_id in component)
      <stage>/manifest.json   fingerprint, row counts per file, wall_s

Resume (north rule "resumable from checkpoint"): each stage's
fingerprint covers the config plus all upstream fingerprints; a stage
re-runs iff its fingerprint changed, otherwise its Parquet checkpoint is
read back. Writes are atomic (write to `_tmp.<name>`, rename) so a
killed run never leaves a half-checkpoint that resume would trust.

Accessors mirror the reference controller's query surface
(similarity/outliers/connected_components/..., SURVEY.md §2.5-2.8,
M4 milestone).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
import warnings

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Count, Max, Min

from fastdup_ray.config import DedupConfig
from fastdup_ray.relational.ops import hash_join
from fastdup_ray.stages.components import component_info, connected_components
from fastdup_ray.stages.extract import HtmlExtractStage
from fastdup_ray.stages.lsh import candidate_pairs
from fastdup_ray.stages.signatures import BandStage, SignStage
from fastdup_ray.stages.verify import verify_pairs


def _fs_and_path(path: str):
    """(pyarrow FileSystem, fs-local path) for a path or URI. Plain paths
    stay on the local FS; `file://`, `s3://`, ... resolve via Arrow so a
    multi-node work_dir on object storage works (VERDICT r1 #5: the
    os/open manifest IO was local-FS-only)."""
    from pyarrow import fs as pafs

    if "://" in path:
        f, p = pafs.FileSystem.from_uri(path)
        return f, p
    return pafs.LocalFileSystem(), os.path.abspath(path)


def _dir_fingerprint(path: str) -> str:
    """Cheap input fingerprint: file names + sizes + mtimes under path."""
    from pyarrow import fs as pafs

    f, p = _fs_and_path(path)
    info = f.get_file_info(p)
    parts = []
    if info.type == pafs.FileType.Directory:
        for fi in sorted(
            f.get_file_info(pafs.FileSelector(p)), key=lambda i: i.path
        ):
            parts.append(f"{fi.base_name}:{fi.size}:{fi.mtime_ns or 0}")
    elif info.type == pafs.FileType.File:
        parts.append(f"{info.base_name}:{info.size}:{info.mtime_ns or 0}")
    return "|".join(parts)


def _split_scored_pairs(pairs, scores, *, num_parts: int = 32):
    """(reused, to_verify): one (src,dst)-keyed hash-partition shuffle
    splitting candidate `pairs` against already-scored `scores`.

    reused    — scores rows whose pair IS in `pairs` (distance kept);
    to_verify — pairs with no score yet (src, dst only).

    Scores for pairs NOT in `pairs` are dropped. Exactness argument for
    the incremental path: verify is pointwise deterministic in the two
    endpoint payloads, which an append never mutates, so a reused
    distance equals what re-verifying would compute."""
    import pyarrow.compute as pc

    from fastdup_ray.relational.ops import partitioned_groupby

    def tag_pairs(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b["src"].cast(pa.int64()),
            "dst": b["dst"].cast(pa.int64()),
            "distance": pa.nulls(b.num_rows, pa.float64()),
            "__side": pa.array(np.zeros(b.num_rows, np.int8)),
        })

    def tag_scores(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b["src"].cast(pa.int64()),
            "dst": b["dst"].cast(pa.int64()),
            "distance": b["distance"].cast(pa.float64()),
            "__side": pa.array(np.ones(b.num_rows, np.int8)),
        })

    both = pairs.select_columns(["src", "dst"]).map_batches(
        tag_pairs, batch_format="pyarrow"
    ).union(scores.select_columns(["src", "dst", "distance"]).map_batches(
        tag_scores, batch_format="pyarrow"
    ))

    def split(df):
        left = df.loc[df["__side"] == 0, ["src", "dst"]]
        right = df.loc[df["__side"] == 1, ["src", "dst", "distance"]]
        return left.merge(right, on=["src", "dst"], how="left")

    merged = partitioned_groupby(
        both, ["src", "dst"], split, num_parts=num_parts
    ).materialize()
    reused = merged.map_batches(
        lambda b: b.filter(pc.is_valid(b["distance"])),
        batch_format="pyarrow",
    )
    to_verify = merged.map_batches(
        lambda b: b.filter(pc.is_null(b["distance"]))
                   .select(["src", "dst"]),
        batch_format="pyarrow",
    )
    return reused, to_verify


class NearDupPipeline:
    def __init__(self, config: DedupConfig | None = None,
                 work_dir: str = "/tmp/fastdup_ray_work", *,
                 hooks: dict | None = None, hooks_token: str | None = None):
        """hooks (§2.12 extension points, the analog of the reference's
        pluggable model/preprocessing callables, __init__.py:569-576):

        - "post_extract": Dataset -> Dataset, applied to the docs table
          inside the extract stage (custom filters/enrichment run and
          checkpoint with the stage);
        - "pre_components": Dataset -> Dataset, applied to the scored
          edge table before thresholding + connected components.

        hooks_token: stable identity string for the hook code, mixed
        into stage fingerprints so resume never serves a checkpoint
        produced by different hooks. Defaults to the sorted hook names —
        pass an explicit version token when hook BEHAVIOR changes.
        """
        self.cfg = config or DedupConfig()
        self.work_dir = work_dir
        self.hooks = hooks or {}
        if self.hooks and hooks_token is None:
            # the default token is just the hook NAMES, so editing a hook's
            # behavior without renaming it would let resume serve stale
            # checkpoints — make that the loud path, not the silent one
            warnings.warn(
                "NearDupPipeline(hooks=...) without hooks_token: resume "
                "fingerprints only cover the hook NAMES. If you change a "
                "hook's behavior, pass a new hooks_token (or resume=False) "
                "or resumed stages will serve results from the old hook.",
                UserWarning,
                stacklevel=2,
            )
        self.hooks_token = (
            hooks_token if hooks_token is not None
            else "+".join(sorted(self.hooks))
        )
        self._fs, self._root = _fs_and_path(work_dir)
        self._fs.create_dir(self._root, recursive=True)
        # in-flight async checkpoint writers (see _stage): joined by
        # flush_checkpoints() before any run() returns
        self._ckpt_threads: list = []
        self._ckpt_errors: list = []
        # compute wall per executed stage (seconds), recorded whether or
        # not the stage checkpoints — the scaling series runs in
        # no-checkpoint mode and still needs per-stage scaling evidence
        self.stage_walls: dict[str, float] = {}

    def _hook(self, name: str, ds):
        fn = self.hooks.get(name)
        return fn(ds) if fn else ds

    # ------------------------------------------------------------------ stages
    def _stage(self, name: str, upstream_fps: list[str], build, *, resume: bool = True):
        """Run-or-restore one checkpointed stage. Returns (Dataset, fingerprint).

        Object-store-safe commit protocol: data goes to a
        fingerprint-versioned directory, the manifest is written LAST as
        the commit marker (single-object PUTs are atomic on object
        stores; no cross-directory rename needed). Resume trusts a data
        dir only when the manifest exists and its fingerprint matches.
        """
        from pyarrow import fs as pafs

        fp = self.cfg.fingerprint(name, *upstream_fps)
        enabled = (
            self.cfg.checkpoint_stages is None
            or name in self.cfg.checkpoint_stages
        )
        if not enabled:
            # checkpoint opt-out: materialize once (multi-consumer safe,
            # object-store-resident) but skip the Parquet write + manifest
            # — not resumable, no stage IO (VERDICT r1 #7 follow-up)
            t0 = time.monotonic()
            ds = build().materialize()
            self.stage_walls[name] = round(time.monotonic() - t0, 3)
            return ds, fp
        stage_root = f"{self._root}/{name}"
        man_path = f"{stage_root}/manifest.json"
        data_dir = f"{stage_root}/data-{fp}"
        if resume:
            try:
                with self._fs.open_input_stream(man_path) as fh:
                    man = json.loads(fh.read().decode())
            except (OSError, json.JSONDecodeError):
                man = None
            if (
                man
                and man.get("fingerprint") == fp
                and self._fs.get_file_info(data_dir).type
                == pafs.FileType.Directory
            ):
                # resume hit: report the wall the original build recorded
                # so bench/stats consumers see a complete per-stage table
                if man.get("wall_s") is not None:
                    self.stage_walls[name] = man["wall_s"]
                return rd.read_parquet(data_dir, filesystem=self._fs), fp
        t0 = time.monotonic()
        # materialize first, then write the checkpoint FROM the object
        # store and hand the in-memory dataset downstream — downstream
        # stages start from memory instead of re-reading parquet
        ds = build().materialize()
        wall = time.monotonic() - t0
        self.stage_walls[name] = round(wall, 3)

        # checkpoint write runs OFF the critical path: the data is
        # already durable-enough in the object store for this run, so
        # the Parquet write + manifest commit happen in a background
        # thread that overlaps the NEXT stage's compute. The commit
        # protocol is unchanged (data dir fully written before the
        # manifest marker), and flush_checkpoints() — called before any
        # run() returns — re-raises failures, so a returned result
        # always has durable, committed checkpoints. On a real cluster
        # this overlaps S3 upload with compute; resume semantics are
        # identical because a crash mid-write leaves no manifest.
        def write_checkpoint():
            t_w = time.monotonic()
            try:
                self._fs.delete_dir_contents(data_dir, missing_dir_ok=True)
            except (OSError, TypeError):
                pass
            self._fs.create_dir(data_dir, recursive=True)
            ds.write_parquet(data_dir, filesystem=self._fs)
            # per-partition lineage: row count + bytes per written file
            files = []
            total_rows = 0
            for fi in sorted(
                self._fs.get_file_info(pafs.FileSelector(data_dir)),
                key=lambda i: i.path,
            ):
                if fi.type != pafs.FileType.File:
                    continue
                meta = pq.ParquetFile(self._fs.open_input_file(fi.path)).metadata
                files.append({"file": fi.base_name, "rows": meta.num_rows,
                              "bytes": fi.size})
                total_rows += meta.num_rows
            manifest = {
                "stage": name,
                "fingerprint": fp,
                "upstream": upstream_fps,
                "rows": total_rows,
                "wall_s": round(wall, 3),
                "write_s": round(time.monotonic() - t_w, 3),
                "data_dir": f"data-{fp}",
                "files": files,
                "config": self.cfg.to_dict(),
            }
            with self._fs.open_output_stream(man_path) as fh:
                fh.write(json.dumps(manifest, indent=1).encode())
            # best-effort cleanup of stale fingerprint dirs from older configs
            try:
                for fi in self._fs.get_file_info(pafs.FileSelector(stage_root)):
                    if (
                        fi.type == pafs.FileType.Directory
                        and fi.base_name.startswith("data-")
                        and fi.base_name != f"data-{fp}"
                    ):
                        self._fs.delete_dir(fi.path)
            except OSError:
                pass

        def runner():
            try:
                write_checkpoint()
            except BaseException as exc:  # noqa: BLE001 — re-raised at flush
                self._ckpt_errors.append((name, exc))

        import threading

        th = threading.Thread(
            target=runner, name=f"ckpt-{name}", daemon=True
        )
        th.start()
        self._ckpt_threads.append(th)
        return ds, fp

    def flush_checkpoints(self) -> None:
        """Join every in-flight checkpoint writer; raise the first
        failure. Called before run()/run_incremental() return, so a
        returned result always has committed checkpoints on disk."""
        while self._ckpt_threads:
            self._ckpt_threads.pop().join()
        if self._ckpt_errors:
            name, exc = self._ckpt_errors[0]
            self._ckpt_errors.clear()
            raise RuntimeError(f"checkpoint write failed for stage {name!r}") from exc

    def _settle_checkpoints(self) -> None:
        """Entry barrier for run()/run_incremental(): if a PREVIOUS run
        aborted mid-pipeline (stage exception, KeyboardInterrupt), its
        async checkpoint writers may still be in flight — a new run's
        resume-miss rebuild of the same stage would otherwise race two
        writers on one data_dir (interleaved delete/write -> a committed
        manifest over a mixed file set). Join them first, and drop their
        errors with a warning: those stages never committed a manifest,
        so this run rebuilds them regardless."""
        while self._ckpt_threads:
            self._ckpt_threads.pop().join()
        if self._ckpt_errors:
            names = sorted({n for n, _ in self._ckpt_errors})
            self._ckpt_errors.clear()
            warnings.warn(
                "discarding checkpoint-write failures from a previous "
                f"aborted run (stages {names}); the stages were never "
                "committed and will be rebuilt",
                RuntimeWarning,
                stacklevel=3,
            )

    @classmethod
    def load_result(cls, work_dir: str) -> "NearDupResult":
        """Restore a finished run from its checkpointed work_dir without
        re-executing anything (S13 artifact reader, the analog of the
        reference's load-from-work-dir controller init,
        fastdup_controller.py:60-108): each stage's manifest names its
        committed data dir, and the config is restored from the manifest
        snapshot so a loaded result's accessors behave identically.
        The loaded result can seed `run_incremental` (pass the base
        manifest fingerprint as base_token for resume-safe increments).
        """
        pipe = None
        tables = {}
        for stage in ("docs", "signatures", "pairs", "pair_scores", "components"):
            fs, root = _fs_and_path(work_dir)
            man_path = f"{root}/{stage}/manifest.json"
            try:
                with fs.open_input_stream(man_path) as fh:
                    man = json.loads(fh.read().decode())
            except (OSError, json.JSONDecodeError):
                raise FileNotFoundError(
                    f"no committed manifest for stage {stage!r} in {work_dir}"
                )
            if pipe is None:
                cfg_dict = dict(man.get("config") or {})
                known = {f.name for f in dataclasses.fields(DedupConfig)}
                cfg = DedupConfig(
                    **{k: v for k, v in cfg_dict.items() if k in known}
                )
                if cfg.checkpoint_stages is not None:
                    cfg = dataclasses.replace(
                        cfg, checkpoint_stages=tuple(cfg.checkpoint_stages)
                    )
                pipe = cls(cfg, work_dir=work_dir)
            tables[stage] = rd.read_parquet(
                f"{root}/{stage}/{man['data_dir']}", filesystem=fs
            )
        return NearDupResult(
            pipe, tables["docs"], tables["signatures"], tables["pairs"],
            tables["pair_scores"], tables["components"],
        )

    def run(self, pages=None, *, pages_path: str | None = None,
            input_token: str | None = None, resume: bool = True,
            already_extracted: bool = False) -> "NearDupResult":
        """Execute extract -> sign -> LSH -> verify -> components.

        pages: a Dataset of the input_hint schema (url, warc_ts, html, text,
        lang), or pass pages_path to read Parquet. input_token identifies the
        input for resume fingerprinting (defaults to pages_path's file
        stat fingerprint; ad-hoc Datasets are never resumed unless a token
        is given).
        """
        cfg = self.cfg
        self._settle_checkpoints()
        if pages is None:
            if pages_path is None:
                raise ValueError("pass pages or pages_path")
            pages = rd.read_parquet(pages_path)
        if input_token is None:
            input_token = (
                _dir_fingerprint(pages_path) if pages_path else f"adhoc:{time.time_ns()}"
            )

        if cfg.fused_extract_sign and not already_extracted:
            return self._run_fused(pages, input_token, resume)

        if already_extracted:
            # S11 precomputed-input path (reference run_mode=2 skips
            # extraction, RUN.md:194-227): `pages` is already a docs table
            schema = pages.schema()
            need = {"doc_id", "url", "text", "is_valid"}
            missing = need - set(schema.names if schema else [])
            if missing:
                raise ValueError(
                    f"already_extracted=True needs docs columns {sorted(need)}; "
                    f"missing {sorted(missing)}"
                )
            build_docs = lambda: self._hook("post_extract", pages)  # noqa: E731
        else:
            # instance => stateless elastic tasks; parser construction is
            # cheap, and a fixed-size actor pool only adds ramp-up latency
            # and CPU reservations here (heavy-state stages keep the
            # class/actor-pool form)
            build_docs = lambda: self._hook(  # noqa: E731
                "post_extract",
                pages.map_batches(
                    HtmlExtractStage(cfg.min_text_len),
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                ),
            )
        docs, fp_docs = self._stage(
            "docs", [input_token, self.hooks_token], build_docs, resume=resume
        )

        sigs, fp_sigs = self._stage(
            "signatures", [fp_docs],
            lambda: docs.map_batches(
                SignStage(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
            ),
            resume=resume,
        )
        return self._run_tail(docs, fp_docs, sigs, fp_sigs, resume)

    def run_incremental(self, new_pages, *, base: "NearDupResult",
                        input_token: str, base_token: str | None = None,
                        resume: bool = True,
                        exact_pairs: bool = True) -> "NearDupResult":
        """Append-mode dedup — the daily-crawl increment path the
        reference covers with its test-vs-train run modes (RUN.md:188-191
        run_mode=3/4, __init__.py:594-597): extract + sign ONLY the new
        batch, then:

        * ``exact_pairs=True`` (default) — re-emit candidates over the
          UNION of both corpora's band rows (one groupby, the same
          emission — including the max_bucket_pairs skew-cap choices —
          a full run over old+new would make), split the emitted pairs
          against the base run's scored edges (one pair-keyed shuffle:
          already-scored pairs reuse their distance, a pair's endpoints
          and texts are unchanged so the verify kernel is pointwise
          deterministic), and verify ONLY the never-scored pairs. The
          result is EXACTLY what a full run over old+new pages would
          produce at ANY scale (pytest-pinned with a forced skew cap:
          tests/test_round3.py::test_incremental_exact_under_skew_cap).
          Saves re-extracting, re-signing and re-verifying the base
          corpus; re-pays only the candidate-emission groupby.
        * ``exact_pairs=False`` (fast mode) — emit intra-new candidates
          plus new-x-base candidates via the G7 cross emitter, verify
          those, and union with the base run's scored edges. Skips the
          union-bands emission, but in buckets that trip the
          max_bucket_pairs skew cap the split emitters make DIFFERENT
          capping choices than a full run would (richer bipartite
          emission, but also star centers that shift when new docs join
          a capped bucket) — the edge set is neither a subset nor a
          superset of the full run's, and components drift slightly
          (measured at 2.2M pages: 2.00M vs 0.51M edges, components
          12,717 vs 12,722 — 0.04%). Exact below the cap
          (tests/test_round3.py::test_incremental_equals_full_run).

        Verify runs against the union of both corpora's payloads (the
        verify stage endpoint-filters, so only pair members are ever
        indexed); connected components re-runs over the combined edge
        set (CC is the cheap stage).

        base_token identifies the base run for resume fingerprinting;
        when None, the incremental stages run with resume disabled (a
        different base could otherwise serve stale checkpoints).
        """
        cfg = self.cfg
        self._settle_checkpoints()
        if base_token is None:
            resume = False
            base_token = "unversioned-base"

        build_docs = lambda: self._hook(  # noqa: E731
            "post_extract",
            new_pages.map_batches(
                HtmlExtractStage(cfg.min_text_len),
                batch_format="pyarrow", batch_size=cfg.batch_size,
            ),
        )
        docs_n, fp_dn = self._stage(
            "docs_incr", [input_token, self.hooks_token], build_docs,
            resume=resume,
        )
        sigs_n, fp_sn = self._stage(
            "signatures_incr", [fp_dn],
            lambda: docs_n.map_batches(
                SignStage(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
            ),
            resume=resume,
        )

        from fastdup_ray.stages.lsh import cross_candidate_pairs

        mode_token = f"exact_pairs={exact_pairs}"

        def build_pairs():
            bands_new = sigs_n.map_batches(
                BandStage(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
            )
            bands_base = base.signatures().map_batches(
                BandStage(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
            )
            if exact_pairs:
                # full-run emission over the union band rows: identical
                # bucket membership => identical skew-cap choices
                return candidate_pairs(bands_new.union(bands_base), cfg)
            intra = candidate_pairs(bands_new, cfg)
            cross = cross_candidate_pairs(bands_new, bands_base, cfg)
            return intra.union(cross)

        pairs_n, fp_pn = self._stage(
            "pairs_incr", [fp_sn, base_token, mode_token], build_pairs,
            resume=resume,
        )

        docs_all = docs_n.union(base.docs())
        sigs_all = sigs_n.union(base.signatures())
        shingle_sets = None
        sig_schema = sigs_all.schema()
        if cfg.verify_mode == "exact" and sig_schema and "shingles" in sig_schema.names:
            shingle_sets = sigs_all.select_columns(["doc_id", "shingles"])

        if exact_pairs:
            # one pair-keyed shuffle: emitted pairs that the base run
            # already scored reuse their distance; the rest go to verify.
            # Base scores whose pair was NOT re-emitted are dropped — the
            # full run would never have scored them (star centers shift
            # when new docs join a capped bucket).
            reused, to_verify = _split_scored_pairs(
                pairs_n, base.pair_scores(), num_parts=cfg.num_partitions
            )
            scores_n, fp_scn = self._stage(
                "pair_scores_incr", [fp_pn, base_token, mode_token],
                lambda: verify_pairs(to_verify, sigs_all, docs_all, cfg,
                                     shingle_sets=shingle_sets),
                resume=resume,
            )
            scores_all = scores_n.union(reused).materialize()
        else:
            scores_n, fp_scn = self._stage(
                "pair_scores_incr", [fp_pn, base_token, mode_token],
                lambda: verify_pairs(pairs_n, sigs_all, docs_all, cfg,
                                     shingle_sets=shingle_sets),
                resume=resume,
            )
            scores_all = scores_n.union(base.pair_scores()).materialize()

        def build_components():
            edges = self._hook("pre_components", scores_all).map_batches(
                lambda b: b.filter(
                    pa.compute.greater_equal(
                        b["distance"], pa.scalar(cfg.cc_threshold)
                    )
                ),
                batch_format="pyarrow",
            )
            return connected_components(edges, cfg)

        comps, _ = self._stage(
            "components_incr", [fp_scn, base_token, self.hooks_token],
            build_components, resume=resume,
        )

        # exact mode's pairs_n IS the full-run emission; fast mode's
        # covers only new-touching pairs and needs the base set unioned
        pairs_all = pairs_n if exact_pairs else pairs_n.union(base._pairs)
        self.flush_checkpoints()
        return NearDupResult(self, docs_all, sigs_all, pairs_all, scores_all, comps)

    def _run_fused(self, pages, input_token: str, resume: bool) -> "NearDupResult":
        """Fused extract+sign: ONE task pipeline (Ray Data fuses the two
        unmaterialized map_batches) producing a single wide `docsig`
        materialization; `docs` and `signatures` are projections of it.
        Saves a full object-store write+read of the extracted text
        between the stages — the memory-bus lever for the two sub-linear
        map stages on a single box (VERDICT r2 #2)."""
        cfg = self.cfg

        def build_docsig():
            lazy = pages.map_batches(
                HtmlExtractStage(cfg.min_text_len),
                batch_format="pyarrow", batch_size=cfg.batch_size,
            )
            lazy = self._hook("post_extract", lazy)
            return lazy.map_batches(
                SignStage(cfg, keep_docs=True),
                batch_format="pyarrow", batch_size=cfg.batch_size,
            )

        docsig, fp_ds = self._stage(
            "docsig", [input_token, self.hooks_token], build_docsig, resume=resume
        )
        doc_cols = ["doc_id", "url", "warc_ts", "lang", "text", "n_bytes",
                    "error_code", "is_valid"]
        schema = docsig.schema()
        doc_cols = [c for c in doc_cols if c in schema.names]
        sig_cols = ["doc_id", "minhash", "simhash", "n_shingles"]
        if "shingles" in schema.names:
            sig_cols.append("shingles")
        docs = docsig.select_columns(doc_cols)

        def project_sigs(batch: pa.Table) -> pa.Table:
            keep = pa.compute.and_(
                batch["is_valid"],
                pa.compute.greater(batch["n_shingles"], pa.scalar(0)),
            )
            return batch.filter(keep).select(sig_cols)

        sigs = docsig.map_batches(project_sigs, batch_format="pyarrow")
        return self._run_tail(docs, fp_ds, sigs, fp_ds, resume)

    def _run_tail(self, docs, fp_docs: str, sigs, fp_sigs: str,
                  resume: bool) -> "NearDupResult":
        cfg = self.cfg
        pairs, fp_pairs = self._stage(
            "pairs", [fp_sigs],
            lambda: candidate_pairs(
                sigs.map_batches(BandStage(cfg), batch_format="pyarrow",
                                 batch_size=cfg.batch_size),
                cfg,
            ),
            resume=resume,
        )

        shingle_sets = None
        fp_shingles = "unused"
        if cfg.verify_mode == "exact":
            if cfg.fused_shingles:
                # fused: the signatures table already carries the sets.
                # Lazy projection: verify endpoint-filters it and
                # materializes only the (small) filtered result, so the
                # full-width projection is executed exactly once
                shingle_sets = sigs.select_columns(["doc_id", "shingles"])
                fp_shingles = fp_sigs
            else:
                from fastdup_ray.stages.shingles import ShingleSetStage

                shingle_sets, fp_shingles = self._stage(
                    "shingles", [fp_docs],
                    lambda: docs.map_batches(
                        ShingleSetStage(cfg), batch_format="pyarrow",
                        batch_size=cfg.batch_size,
                    ),
                    resume=resume,
                )

        scores, fp_scores = self._stage(
            "pair_scores", [fp_pairs, fp_docs, fp_shingles],
            lambda: verify_pairs(pairs, sigs, docs, cfg, shingle_sets=shingle_sets),
            resume=resume,
        )

        def build_components():
            edges = self._hook("pre_components", scores).map_batches(
                lambda b: b.filter(
                    pa.compute.greater_equal(b["distance"], pa.scalar(cfg.cc_threshold))
                ),
                batch_format="pyarrow",
            )
            return connected_components(edges, cfg)

        comps, fp_comps = self._stage(
            "components", [fp_scores, self.hooks_token], build_components,
            resume=resume,
        )

        self.flush_checkpoints()
        return NearDupResult(self, docs, sigs, pairs, scores, comps)


class NearDupResult:
    """Query surface over the pipeline's checkpointed tables — the analog of
    the reference's FastdupController accessors (similarity() at
    fastdup_controller.py:260-280, outliers() :282-310,
    connected_components() :420-453, connected_components_grouped()
    :456-520, summary() :660-756)."""

    def __init__(self, pipe: NearDupPipeline, docs, sigs, pairs, scores, comps):
        self.cfg = pipe.cfg
        self.work_dir = pipe.work_dir
        self._docs = docs
        self._sigs = sigs
        self._pairs = pairs
        self._scores = scores
        self._comps = comps

    # raw tables ---------------------------------------------------------
    def docs(self):
        return self._docs

    def signatures(self):
        return self._sigs

    def pair_scores(self):
        return self._scores

    def doc_stats(self):
        """Per-doc text statistics — the img_stats() analog
        (reference fastdup_controller.py:384-408, atrain_stats.csv)."""
        from fastdup_ray.stages.stats import TextStatsStage

        return self._docs.map_batches(
            TextStatsStage(), batch_format="pyarrow", batch_size=self.cfg.batch_size
        )

    # reference-parity accessors ----------------------------------------
    def similarity(self, threshold: float | None = None):
        """Edges (src, dst, distance) with distance >= threshold, most
        similar first — similarity.csv semantics (RUN.md:43-55)."""
        t = self.cfg.threshold if threshold is None else threshold
        return (
            self._scores.map_batches(
                lambda b: b.filter(pa.compute.greater_equal(b["distance"], pa.scalar(t))),
                batch_format="pyarrow",
            )
            .sort("distance", descending=True)
        )

    def connected_components(self):
        """(doc_id, component_id) for every edge-touched doc; docs absent
        here are singletons (component_id == own doc_id)."""
        return self._comps.rename_columns({"node": "doc_id", "label": "component_id"})

    def component_info(self):
        return component_info(self._comps)

    def connected_components_grouped(self, min_count: int = 2):
        """One row per component: component_id, files_ids (sorted), len —
        fastdup_controller.connected_components_grouped():456-520."""
        import pandas as pd

        from fastdup_ray.relational.ops import partitioned_groupby

        def to_lists(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["component_id", "doc_id"], kind="mergesort")
            g = df.groupby("component_id", sort=False)["doc_id"].agg(list)
            g = g[g.map(len) >= min_count]
            return pd.DataFrame(
                {
                    "component_id": g.index.to_numpy(),
                    "files_ids": g.to_numpy(),
                    "len": g.map(len).to_numpy().astype(np.int64),
                }
            )

        return partitioned_groupby(
            self.connected_components(), "component_id", to_lists,
            num_parts=self.cfg.num_partitions,
        )

    def outliers(self, include_unmatched: bool = True):
        """(src, dst, distance): each outlier doc with its NEAREST
        NEIGHBOR — the reference outliers.csv `from,to,distance` schema
        (RUN.md:57-68, fastdup_controller.py:282-310). Rows are docs whose
        best candidate similarity falls in the bottom `lower_threshold`
        quantile of per-doc best similarities, PLUS (include_unmatched)
        valid docs with ZERO scored candidates — the definitional "far
        from everything" outliers (G3) — emitted with dst=null,
        distance=0. Quantile is computed on a driver-side sample of
        per-doc maxima over SCORED docs (documented approximation,
        SURVEY.md §7.4)."""
        import pandas as pd

        from fastdup_ray.relational.ops import cogroup_anti_join, partitioned_groupby

        def best_row(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(
                ["node", "distance", "neighbor"],
                ascending=[True, False, True], kind="mergesort",
            )
            return df.drop_duplicates("node")

        best = partitioned_groupby(
            self._scores.map_batches(_symmetrize_scores, batch_format="pyarrow"),
            "node", best_row, num_parts=self.cfg.num_partitions,
        ).materialize()
        n_best = best.count()
        out_schema = {"src": pa.int64(), "dst": pa.int64(), "distance": pa.float64()}
        if n_best == 0:
            low = rd.from_arrow(
                pa.table({k: pa.array([], t) for k, t in out_schema.items()})
            )
        else:
            sample = best.random_sample(
                min(1.0, 200_000 / n_best), seed=self.cfg.seed
            )
            vals = np.array([r["distance"] for r in sample.take_all()], np.float64)
            q = float(np.quantile(vals, self.cfg.lower_threshold)) if vals.size else 0.0
            low = best.map_batches(
                lambda b: b.filter(
                    pa.compute.less_equal(b["distance"], pa.scalar(q))
                ),
                batch_format="pyarrow",
            ).rename_columns({"node": "src", "neighbor": "dst"})
        if not include_unmatched:
            return low
        valid = self._docs.map_batches(
            lambda b: b.filter(b["is_valid"]).select(["doc_id"]),
            batch_format="pyarrow",
        )
        unmatched = cogroup_anti_join(
            valid, best, on="doc_id", right_on="node",
            num_parts=self.cfg.num_partitions,
        ).map_batches(
            lambda b: pa.table(
                {
                    "src": b["doc_id"].cast(pa.int64()),
                    "dst": pa.nulls(b.num_rows, pa.int64()),
                    "distance": pa.array(np.zeros(b.num_rows, np.float64)),
                }
            ),
            batch_format="pyarrow",
        )
        return low.union(unmatched)

    def summary(self) -> dict:
        """Counts digest — reference summary() (fastdup_controller.py:660-756)."""
        n_docs = self._docs.count()
        n_valid = self._docs.map_batches(
            lambda b: b.filter(b["is_valid"]), batch_format="pyarrow"
        ).count()
        n_edges = self.similarity().count()
        info = self.component_info().materialize()
        n_comp = info.count()
        largest = info.max("count") if n_comp else 0
        in_comps = self._comps.count()
        return {
            "total_docs": n_docs,
            "valid_docs": n_valid,
            "invalid_docs": n_docs - n_valid,
            "similarity_edges": n_edges,
            "clustered_docs": in_comps,
            "components": n_comp,
            "largest_component": largest,
        }

    def duplicates_report(self, num_rows: int = 100, ascending: bool = False):
        """Top similarity edges (O1: sort desc + head, galleries.py:353-378)."""
        return self.similarity().limit(num_rows) if not ascending else (
            self._scores.sort("distance").limit(num_rows)
        )

    def keep_table(self, policy: str = "first", labels=None):
        """Per-doc keep/drop decision within each component.

        policy="first": keep the doc with min (warc_ts, url) — the D4
        `delete_components(how='one')` keep-first policy (reference
        __init__.py:1629-1677) with a deterministic canonical choice
        instead of list order.
        policy="none": drop every clustered doc (`how='all'`).
        policy="majority": D5 label-majority variant (reference
        __init__.py:1682-1736) — keep the earliest doc carrying the
        component's majority label; a component with no majority
        (all labels tied at count 1 with >1 distinct) drops entirely.
        `labels`: Dataset (doc_id, label), required for "majority".
        """
        import pandas as pd

        if policy not in ("first", "none", "majority"):
            raise ValueError(f"unknown keep policy {policy!r}")
        side = self._docs.select_columns(["doc_id", "url", "warc_ts"])
        labeled = hash_join(
            self.connected_components(), side, on="doc_id", right_on="doc_id",
            num_partitions=self.cfg.num_partitions,
        )
        if policy == "majority":
            if labels is None:
                raise ValueError("policy='majority' needs a labels Dataset")
            labeled = hash_join(
                labeled.materialize(),
                labels.rename_columns({"doc_id": "ldoc"}),
                on="doc_id", right_on="ldoc",
                num_partitions=self.cfg.num_partitions,
            )

        return keep_decisions(
            labeled, policy, num_parts=self.cfg.num_partitions
        )


def keep_decisions(labeled, policy: str, *, order_cols=("warc_ts", "url"),
                   label_col: str = "label", num_parts: int = 32):
    """Shared D4/D5 keep/drop decision kernel over an arbitrary
    component-labeled table (used by NearDupResult.keep_table and the
    oracled majority_keep catalog query).

    labeled: Dataset with (doc_id, component_id, *order_cols[, label_col]).
    policy "first": keep the member that sorts first by order_cols;
    "none": drop every member; "majority": keep the first-sorted member
    carrying the component's majority label (ties -> lexicographically
    smallest label); a component whose labels are all distinct (every
    count 1, >1 distinct) drops entirely. Returns
    (doc_id, keep bool, component_id)."""
    import pandas as pd

    from fastdup_ray.relational.ops import partitioned_groupby

    if policy not in ("first", "none", "majority"):
        raise ValueError(f"unknown keep policy {policy!r}")
    sort_cols = ["component_id", *order_cols]

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        if policy == "none":
            keep = np.zeros(len(df), dtype=bool)
        elif policy == "majority":
            keep = np.zeros(len(df), dtype=bool)
            for _, g in df.groupby("component_id", sort=False):
                counts = g[label_col].value_counts()
                if counts.iloc[0] > 1 or len(counts) == 1:
                    winners = sorted(counts[counts == counts.max()].index)
                    keep[g[g[label_col] == winners[0]].index[0]] = True
        else:
            keep = (df.groupby("component_id", sort=False).cumcount() == 0).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "keep": keep,
                "component_id": df["component_id"].to_numpy(),
            }
        )

    return partitioned_groupby(labeled, "component_id", decide,
                               num_parts=num_parts)


def _symmetrize_scores(batch: pa.Table) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False)
    d = batch["distance"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "node": pa.array(np.concatenate([src, dst]), pa.int64()),
            "neighbor": pa.array(np.concatenate([dst, src]), pa.int64()),
            "distance": pa.array(np.concatenate([d, d]), pa.float64()),
        }
    )
