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

import json
import os
import shutil
import time

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


def _dir_fingerprint(path: str) -> str:
    """Cheap input fingerprint: file names + sizes + mtimes under path."""
    parts = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, f))
            parts.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
    elif os.path.exists(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}")
    return "|".join(parts)


class NearDupPipeline:
    def __init__(self, config: DedupConfig | None = None, work_dir: str = "/tmp/fastdup_ray_work"):
        self.cfg = config or DedupConfig()
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)

    # ------------------------------------------------------------------ stages
    def _stage(self, name: str, upstream_fps: list[str], build, *, resume: bool = True):
        """Run-or-restore one checkpointed stage. Returns (Dataset, fingerprint)."""
        fp = self.cfg.fingerprint(name, *upstream_fps)
        stage_dir = os.path.join(self.work_dir, name)
        data_dir = os.path.join(stage_dir, "data")
        man_path = os.path.join(stage_dir, "manifest.json")
        if resume and os.path.exists(man_path):
            try:
                man = json.load(open(man_path))
            except json.JSONDecodeError:
                man = None
            if man and man.get("fingerprint") == fp and os.path.isdir(data_dir):
                return rd.read_parquet(data_dir), fp
        t0 = time.monotonic()
        # materialize first, then write the checkpoint FROM the object
        # store and hand the in-memory dataset downstream — downstream
        # stages start from memory instead of re-reading parquet
        ds = build().materialize()
        tmp_dir = os.path.join(stage_dir, f"_tmp.{name}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        ds.write_parquet(tmp_dir)
        wall = time.monotonic() - t0
        # per-partition lineage: row count + bytes per written file
        files = []
        total_rows = 0
        for f in sorted(os.listdir(tmp_dir)):
            fpath = os.path.join(tmp_dir, f)
            meta = pq.ParquetFile(fpath).metadata
            files.append({"file": f, "rows": meta.num_rows,
                          "bytes": os.stat(fpath).st_size})
            total_rows += meta.num_rows
        shutil.rmtree(data_dir, ignore_errors=True)
        os.replace(tmp_dir, data_dir)
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "upstream": upstream_fps,
            "rows": total_rows,
            "wall_s": round(wall, 3),
            "files": files,
            "config": self.cfg.to_dict(),
        }
        with open(man_path + ".tmp", "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(man_path + ".tmp", man_path)
        return ds, fp

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
        if pages is None:
            if pages_path is None:
                raise ValueError("pass pages or pages_path")
            pages = rd.read_parquet(pages_path)
        if input_token is None:
            input_token = (
                _dir_fingerprint(pages_path) if pages_path else f"adhoc:{time.time_ns()}"
            )

        docs, fp_docs = self._stage(
            "docs", [input_token],
            # instance => stateless elastic tasks; parser construction is
            # cheap, and a fixed-size actor pool only adds ramp-up latency
            # and CPU reservations here (heavy-state stages keep the
            # class/actor-pool form)
            lambda: pages.map_batches(
                HtmlExtractStage(cfg.min_text_len),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
            ),
            resume=resume,
        )

        sigs, fp_sigs = self._stage(
            "signatures", [fp_docs],
            lambda: docs.map_batches(
                SignStage(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
            ),
            resume=resume,
        )

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
            edges = scores.map_batches(
                lambda b: b.filter(
                    pa.compute.greater_equal(b["distance"], pa.scalar(cfg.cc_threshold))
                ),
                batch_format="pyarrow",
            )
            return connected_components(edges, cfg)

        comps, fp_comps = self._stage(
            "components", [fp_scores], build_components, resume=resume
        )

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

    def outliers(self):
        """Per-doc best-match edges in the bottom `lower_threshold` quantile
        of best-match similarity (G3; reference outliers.csv RUN.md:57-68).
        Quantile is computed on a driver-side sample of per-doc maxima
        (documented approximation, SURVEY.md §7.4)."""
        import pandas as pd

        from fastdup_ray.relational.ops import partitioned_groupby

        def best_agg(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", as_index=False, sort=False)["distance"].max()
            return g.rename(columns={"distance": "best"})

        best = partitioned_groupby(
            self._scores.map_batches(_symmetrize_scores, batch_format="pyarrow"),
            "node", best_agg, num_parts=self.cfg.num_partitions,
        ).materialize()
        sample = best.random_sample(min(1.0, 200_000 / max(1, best.count())), seed=self.cfg.seed)
        vals = np.array([r["best"] for r in sample.take_all()], dtype=np.float64)
        if vals.size == 0:
            return best.rename_columns({"node": "src", "best": "distance"})
        q = float(np.quantile(vals, self.cfg.lower_threshold))
        return best.map_batches(
            lambda b: b.filter(pa.compute.less_equal(b["best"], pa.scalar(q))),
            batch_format="pyarrow",
        ).rename_columns({"node": "src", "best": "distance"})

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

        from fastdup_ray.relational.ops import partitioned_groupby

        def decide(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(
                ["component_id", "warc_ts", "url"], kind="mergesort"
            ).reset_index(drop=True)
            if policy == "none":
                keep = np.zeros(len(df), dtype=bool)
            elif policy == "majority":
                keep = np.zeros(len(df), dtype=bool)
                for _, g in df.groupby("component_id", sort=False):
                    counts = g["label"].value_counts()
                    if counts.iloc[0] > 1 or len(counts) == 1:
                        winners = sorted(counts[counts == counts.max()].index)
                        keep[g[g["label"] == winners[0]].index[0]] = True
            else:
                keep = (df.groupby("component_id", sort=False).cumcount() == 0).to_numpy()
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(),
                    "keep": keep,
                    "component_id": df["component_id"].to_numpy(),
                }
            )

        return partitioned_groupby(
            labeled, "component_id", decide, num_parts=self.cfg.num_partitions
        )


def _symmetrize_scores(batch: pa.Table) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False)
    dst = batch["dst"].to_numpy(zero_copy_only=False)
    d = batch["distance"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "node": pa.array(np.concatenate([src, dst]), pa.int64()),
            "distance": pa.array(np.concatenate([d, d]), pa.float64()),
        }
    )
