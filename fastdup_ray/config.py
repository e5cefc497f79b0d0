"""Run configuration for the near-dup pipeline.

Analog of the reference's ``config.json`` run-parameter snapshot
(reference: fastdup/__init__.py:231-247, fastdup_controller.py:816-842) —
every parameter that affects results is captured here, serialized into the
work_dir manifest, and folded into each stage's resume fingerprint.

Defaults mirror the reference's thresholds where a text-native analog
exists: similarity threshold 0.9 (reference __init__.py:481), component
threshold 0.96 ("ccthreshold", fastdup_controller.py:1519), outlier
percentile 0.05 (reference __init__.py:482), and the signature config
mandated by BASELINE.json: char-5-gram shingles, 128 permutations,
16 bands x 8 rows.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- signature config (fixed by BASELINE.json north rule) ---
    shingle_size: int = 5          # char n-gram width
    num_perms: int = 128           # minhash permutations
    num_bands: int = 16            # LSH bands
    rows_per_band: int = 8         # minhash rows per band (num_bands*rows_per_band == num_perms)
    seed: int = 42                 # seeds the permutation matrix (deterministic)
    signer: str = "minhash"        # "minhash": classic K-permutation (BASELINE
                                   # config, the default); "oph": one-permutation
                                   # hashing w/ rotation densification — ONE pass
                                   # over the shingles instead of K, the sign-stage
                                   # scale path (same banding/verify downstream)
    hash_version: int = 2          # doc_id/string-hash algorithm version; folded
                                   # into every stage fingerprint so checkpoints
                                   # from a different hash can never be reused

    # --- thresholds (reference parity) ---
    threshold: float = 0.9         # similarity edge cutoff (est. Jaccard)
    cc_threshold: float = 0.96     # component-merge cutoff ("ccthreshold")
    lower_threshold: float = 0.05  # outlier percentile (bottom 5% of pair sims)

    # --- validity filter (analog of reference's <10x10px / min_file_size rule,
    #     reference __init__.py:519-520) ---
    min_text_len: int = 20         # chars; shorter docs -> is_valid=False, error_code="TOO_SHORT"

    # --- verification ---
    verify_mode: str = "exact"     # "exact": true shingle Jaccard; "signature": estimate
                                   # from the 128-perm signature
    fused_shingles: bool = True    # exact mode: the sign stage emits the sorted-unique
                                   # shingle-set column alongside the signatures (ONE
                                   # shingling pass over the text and one fewer pipeline
                                   # barrier); False restores the separate set stage
    fused_extract_sign: bool = False  # run extract+sign as ONE fused task pipeline
                                   # producing a single wide `docsig` materialization
                                   # (docs columns + signature columns per row); docs
                                   # and signatures become zero-copy projections of it.
                                   # Removes a full object-store write+read of the
                                   # extracted text between the two map stages — the
                                   # single-box memory-bus lever for the two
                                   # sub-linear map stages. Default off: the split
                                   # stages keep docs/signatures independently
                                   # resumable.
    # when the corpus' packed shingle sets fit under this many bytes, the
    # verify stage broadcasts them once via ray.put (one zero-copy plasma
    # read per node) and scores pairs with pure lookups — no payload
    # shuffle. Above it, two hash joins ship the sets to the pairs.
    verify_broadcast_max_bytes: int = 4_000_000_000
    # the broadcast index is built as this many doc_id-sharded pieces by
    # parallel Ray tasks (no driver-side collection); verify tasks fetch
    # only the shards their batch touches. On one node every shard is a
    # zero-copy plasma read; on a multi-node cluster pairs can be
    # pre-partitioned by src shard so each node holds a subset.
    verify_index_shards: int = 16
    # multi-node verify routing: shuffle candidate pairs by their
    # (src_shard, dst_shard) group before scoring, so each verify task
    # reads AT MOST TWO index shards (pinnable per node on a real
    # cluster instead of every node faulting in every shard). Costs one
    # extra candidate-sized shuffle; off by default on a single node
    # where every shard is a local zero-copy plasma read anyway.
    verify_route_pairs: bool = False

    # --- skew handling (hot LSH buckets; SURVEY.md §4 "Skew") ---
    max_bucket_pairs: int = 32     # buckets with <= this many docs emit all C(m,2) pairs;
                                   # larger buckets emit a star to the min doc_id (keeps the
                                   # bucket connected with diameter 2, caps emission at m-1).
                                   # Components are unaffected; the similarity() edge list
                                   # under-reports intra-mega-cluster pairs (still far richer
                                   # than the reference's k=2 NN edges, RUN.md:43-55)

    # --- exact-substring stage (fingerprint-based; SURVEY.md G10) ---
    substring_len: int = 256       # minimum shared-run length targeted
    substring_sample_mod: int = 16 # keep 1/mod of rolling fingerprints (sampled mode)
    # anchor selection: "winnow" (default; rightmost-min per
    # (len-window+1)-hash window — ZERO misses for runs >= substring_len
    # provided every selected occurrence per doc per fingerprint is
    # emitted (stages/substring._emit_anchor_pairs
    # keep_all_occurrences=True); the only truncation left is the
    # max_bucket_pairs skew cap. Density ~2/(w+1), SPARSER than
    # sampled's 1/mod at the defaults (w=193 -> ~1% vs 6.25%) and
    # measurably faster at the bench (BASELINE.md r5: winnow beat the
    # sampled catalog query 3.0s vs 5.0s at sf0.1). "sampled" (1/mod
    # density, miss prob (1-1/mod)^(run-window) per shared run) remains
    # for anchor-budget control at very small substring_len, where the
    # winnow window shrinks and its density approaches 1.
    substring_anchor_mode: str = "winnow"

    # --- simhash ---
    simhash_hamming: int = 3       # max hamming distance for simhash near-dup pairs
    simhash_value_cap: int = 256   # max DISTINCT fingerprint values verified as a full
                                   # clique per quarter bucket; beyond, star-verified
                                   # against the bucket's min-canon value (identical
                                   # fingerprints are collapsed before bucketing, so
                                   # this only triggers on pathological diversity)

    # --- execution knobs ---
    batch_size: int = 1024         # rows per batch for signature/extract stages
    extract_concurrency: int = 4   # actor-pool size for the HTML extractor stage
    num_partitions: int = 32       # hash-join / shuffle partition count
    cc_max_rounds: int = 50        # safety bound on label-propagation rounds
    # below this many edges, connected components finishes with a
    # driver-side union-find instead of iterative shuffle rounds — the
    # post-threshold edge set is a tiny fraction of the corpus, and each
    # distributed round costs a join + two shuffles of fixed latency.
    # Above the threshold (the 10^12-doc regime) the iterative path runs.
    cc_driver_max_edges: int = 5_000_000
    # distributed CC algorithm above the driver threshold: "label" =
    # iterative min-label propagation (O(diameter) rounds — fine for
    # LSH-emitted clique/star graphs), "star" = alternating large/small
    # star contraction (Kiveris et al. 2014; O(log^2 n) rounds regardless
    # of diameter — the escape hatch for boilerplate mega-components
    # chained through overlapping buckets)
    cc_algorithm: str = "label"
    # which stages write Parquet checkpoints + manifests. None = all (the
    # default: every stage resumable, the north-rule posture). A tuple
    # (e.g. ("docs", "pair_scores", "components")) skips the write for the
    # other stages — they still materialize once into the object store
    # (multi-consumer safe) but are not resumable; on S3-backed work_dirs
    # the skipped write is the dominant per-stage IO cost.
    checkpoint_stages: tuple | None = None

    def __post_init__(self) -> None:
        if self.num_bands * self.rows_per_band != self.num_perms:
            raise ValueError(
                f"num_bands*rows_per_band ({self.num_bands}*{self.rows_per_band}) "
                f"!= num_perms ({self.num_perms})"
            )
        if self.verify_mode not in ("exact", "signature"):
            raise ValueError(f"unknown verify_mode {self.verify_mode!r}")

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "DedupConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in names}
        if isinstance(kw.get("checkpoint_stages"), list):
            kw["checkpoint_stages"] = tuple(kw["checkpoint_stages"])
        return cls(**kw)

    def fingerprint(self, *parts: str) -> str:
        """Stable fingerprint of this config plus extra context strings.

        Used as the stage resume key: a checkpoint is only reused when the
        config AND the upstream fingerprints are unchanged (SURVEY.md §7.4
        "Resume correctness").
        """
        h = hashlib.sha256(self.to_json().encode())
        for p in parts:
            h.update(b"\x00")
            h.update(p.encode())
        return h.hexdigest()[:24]


DEFAULT_CONFIG = DedupConfig()
