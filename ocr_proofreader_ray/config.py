"""Extraction pipeline configuration (SURVEY.md §3.2)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ExtractionConfig:
    """All knobs of the two-pass extraction pipeline.

    Scale guidance (100 TB / multi-node): ``files_per_chunk`` bounds the
    checkpoint-resume unit (one streaming execution per chunk);
    ``correct_batch_size`` × actor-pool size bounds corrector heap;
    extraction batches are byte-bounded by Ray's block splitting
    (``batch_size=None``), so whale pages cannot blow a worker's memory.
    """

    input_paths: list[str] | str = ""
    work_dir: str = "/tmp/opr_work"

    # Pass-1 dictionary policy (deterministic → byte-identical output)
    dict_min_count: int = 8
    dict_top_k: int | None = 50_000

    # persistent fix-log (state/fixlog.py): accepted corrections applied as
    # an override layer in pass 2; None → no overrides
    fix_log_path: str | None = None

    # parallelism / batching
    correct_batch_size: int = 128
    # None → fixed pool of ncpu - max(2, ncpu//8) actors (the reserved CPUs
    # run the read/LPT/write tasks feeding the pool; measured in
    # BASELINE.md round 2) — see pipelines/extraction.py _corrector_concurrency
    correct_concurrency: tuple[int, int] | int | None = None
    extract_num_cpus: float = 1.0

    # skew handling (SURVEY.md §2 A2): whales isolate into their own blocks
    # via byte-bounded block splitting; per-block biggest-first ordering
    # gives LPT dispatch and size-homogeneous actor batches (no shuffle)
    size_bucketing: bool = True

    # whale-page hard cap (SURVEY.md §7 hard-parts): a single html value
    # larger than this is truncated to the cap BEFORE parsing — Ray's
    # byte-bounded blocks isolate whales between rows but cannot split one
    # value, so one unbounded page would still sit whole in a worker heap.
    # Truncated docs are flagged in the raw output (``truncated`` column)
    # and counted in the per-chunk manifest; 0/None disables the cap.
    whale_max_html_bytes: int | None = 32 << 20

    # checkpoint-resume granularity: input files per chunk; 0 → single chunk
    files_per_chunk: int = 64

    # chunks processed per Dataset execution (both passes): one flat read
    # and one actor pool / task pipeline serve the whole group instead of
    # paying pipeline + pool startup and an execution barrier per chunk
    # (barriers idle the entire cluster at every chunk boundary).  Outputs
    # still commit atomically per chunk; a crash mid-group re-runs the
    # group (bounded wasted work, identical bytes).
    chunks_per_exec: int = 8

    # window-2 pipelining of consecutive PASS-1 group executions (disjoint
    # chunks; the dictionary barrier still separates the passes): group
    # k+1's read/ramp fills the cluster while group k drains and commits,
    # so finer checkpoint granularity (smaller chunks_per_exec) stops
    # costing a full barrier per group.  Pass-2 groups always run serial —
    # two concurrent FIXED corrector pools reserve every CPU slot and
    # deadlock-starve both executions' read/write tasks (measured; see
    # pipelines/extraction.py run_groups).  Commits stay per-chunk atomic;
    # manifest bookkeeping stays on the driver thread.
    overlap_groups: bool = True

    # live-progress counter actor (advisory telemetry DURING a run).  The
    # manifest's per-chunk lineage counters do not depend on it — they are
    # always derived exactly from the committed parquet outputs.
    enable_lineage: bool = False

    # output column layout
    extra_columns: tuple[str, ...] = field(default=())

    @property
    def raw_dir(self) -> str:
        return f"{self.work_dir}/raw_extracted"

    @property
    def counts_dir(self) -> str:
        return f"{self.work_dir}/token_counts"

    @property
    def dict_path(self) -> str:
        return f"{self.work_dir}/lang_dict.parquet"

    @property
    def out_dir(self) -> str:
        return f"{self.work_dir}/extracted"

    @property
    def manifest_dir(self) -> str:
        return f"{self.work_dir}/manifest"
