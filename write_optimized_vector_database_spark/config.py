"""Engine configuration — the reference's declared config surface mapped
knob-by-knob onto this engine.

The reference's entire behavior is declared in
/root/reference/src/cpp/core/config.h (241 lines) +
configs/woved-default.yaml (190 lines). Every knob is either carried
(it changes results or index shape), re-expressed (its Spark analog is a
different mechanism), or documented as subsumed (Catalyst/AQE/Parquet
already does it — SURVEY §4's inventory).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IvfConfig:
    """IVF coarse quantization (reference config.h:74-100).

    The delta/stable split (fresh uncompressed vs merged PQ-compressed
    generations) maps to the snapshot-vs-tail materialization; one
    centroid table serves both (global_centroids=true, config.h:80)."""

    nlist_delta: int = 1024  # config.h:75
    nprobe_delta: int = 6  # config.h:76
    nlist_stable: int = 4096  # config.h:85
    nprobe_stable: int = 12  # config.h:86
    sample_p: float = 0.25  # delta posting-list sampling, config.h:78
    global_centroids: bool = True  # config.h:80
    rebuild_interval_hours: int = 24  # config.h:81 — scheduled job cadence
    # list_cap=2000 (config.h:79) bounds per-list delta scan cost in the
    # reference; here the delta generation is exact and small BY
    # CONSTRUCTION (everything since the last build/refresh, bounded by
    # the compaction/refresh cadence), so the cap is subsumed — a list
    # can never outgrow the tail it is built from.
    list_cap: int = 2000


@dataclass(frozen=True)
class PqConfig:
    """Product quantization (reference config.h:84-94, types.h:136-137)."""

    m: int = 96  # subspaces (config.h:88) — scaled down when dim < 768
    nbits: int = 8  # config.h:89
    rerank_factor: int = 4  # config.h:93
    # config.h:90 use_opq=true — implemented (train_opq + rotated-space
    # ADC with original-space rerank); opt-in via
    # build_indexes(use_opq=True) because on isotropic data the rotation
    # buys little (docs/SCALE.md recall ladder) while real corpora are
    # exactly where it pays. Since r06 the engine closes its own loop:
    # build_indexes(target_recall=0.95) walks the SCALE.md knob ladder
    # (m/spill/OPQ) until a sampled recall probe at the reference
    # serving knobs (nprobe=12, rerank_factor=4) clears the target — no
    # doc-reading required (VERDICT r05 #2; gated by
    # vec_autotune_build_recall).
    opq: bool = False
    # IVF multiple assignment (NOT a reference knob — public technique,
    # Jégou et al.): each vector stored in its `spill` nearest lists.
    # The coverage lever when the corpus is weakly clustered; index
    # grows spill×, still ≪ raw vectors. Recorded per build in the
    # collection manifest.
    spill: int = 1

    def m_for_dim(self, dim: int) -> int:
        """Reference m=96 assumes dim=768 (8 dims/subspace); keep that
        ratio for other dims."""
        return max(1, dim // 8)


@dataclass(frozen=True)
class QueryLimits:
    """Hard caps on the query surface (reference config.h:128-133, 179-181)."""

    max_top_k: int = 100  # types.h:69, config.h:130
    max_batch_queries: int = 100  # config.h:180
    max_upsert_batch: int = 10_000  # config.h:179 — enforced in api.run_upsert
    max_candidates: int = 10_000  # config.h:129
    two_phase_enabled: bool = True  # config.h:132
    buffer_scan_enabled: bool = True  # RYW union, config.h:133


def candidate_budget(
    k: int, rerank_factor: int, n_branches: int = 1, limits: QueryLimits | None = None
) -> int:
    """Per-branch candidate budget for two-phase search: k × rerank_factor,
    clamped so the UNION of `n_branches` candidate sets stays within the
    global `max_candidates` cap (reference config.h:129) — an adversarial
    k/rerank_factor combination cannot blow up the rerank join."""
    limits = limits or QueryLimits()
    return max(1, min(k * rerank_factor, limits.max_candidates // n_branches))


@dataclass(frozen=True)
class CompactionConfig:
    """Delta→stable merge policy (reference config.h:54-61)."""

    tombstone_ratio_threshold: float = 0.2  # config.h:57
    max_segments_per_leaf: int = 8  # config.h:59 — maps to max changelog
    # batches before a compaction is forced
    # merge_bandwidth_limit (config.h:58): cluster-scheduler concern, not carried


@dataclass(frozen=True)
class AutotuneConfig:
    """nprobe auto-tuning (reference config.h:138-147)."""

    recall_target: float = 0.95  # types.h:140, config.h:139
    nprobe_min_delta: int = 4
    nprobe_max_delta: int = 8
    nprobe_min_stable: int = 8
    nprobe_max_stable: int = 16


@dataclass(frozen=True)
class EngineConfig:
    """Top-level collection config (reference config.h:18-23 + yaml)."""

    dim: int = 768  # config.h:19 (fixtures use 64)
    metric: str = "cosine"  # woved-default.yaml:14 (cosine→IP at ingest)
    id_type: str = "uuidv7"  # config.h:22
    tag_dict_size: int = 50_000  # config.h:122
    max_tags_per_vector: int = 16  # config.h:123
    ivf: IvfConfig = field(default_factory=IvfConfig)
    pq: PqConfig = field(default_factory=PqConfig)
    limits: QueryLimits = field(default_factory=QueryLimits)
    compaction: CompactionConfig = field(default_factory=CompactionConfig)
    autotune: AutotuneConfig = field(default_factory=AutotuneConfig)

    # Knobs intentionally NOT carried — subsumed by the Spark runtime
    # (SURVEY §4): WAL framing/group-commit/fsync (streaming checkpoints),
    # buffer shard_count/max_bytes (repartition + backpressure), Bε-tree
    # epsilon/node_size/fanout (micro-batch append + compaction), io_uring/
    # NUMA/SIMD (Tungsten/Arrow), bitmap tag index + cache (arrays_overlap
    # pushdown), bloom fpp (parquet bloom / runtime bloom join), HNSW cache
    # (serving-only, off by default in the reference too).


DEFAULT_CONFIG = EngineConfig()
