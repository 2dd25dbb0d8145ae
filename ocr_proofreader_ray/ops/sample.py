"""Deterministic sampling (SURVEY.md §2 B10).

Ray's ``Dataset.random_sample(fraction, seed=...)`` is NOT reproducible
across executions (observed: two identical seeded runs return different
rows — the seed mixes with execution-dependent task state).  For pipelines
that must be re-runnable (checkpoint-resume, auditable experiments), this
module samples by KEY HASH: a row is kept iff
``mix(key, seed) < fraction * 2^64``.  Same key + seed -> same decision on
any run, any parallelism, any engine — and the same rule is expressible in
SQL for oracle checks (``hash(key)``-style) or as a plain modulo filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)


def seeded_sample(
    ds: "ray.data.Dataset", key: str, fraction: float, seed: int = 42
) -> "ray.data.Dataset":
    """Keep rows whose 64-bit key-hash falls below ``fraction`` of the hash
    space.  ``key`` must be an integer column (e.g. a surrogate id)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # clamp: float(2^64-1) rounds UP to 2^64, which overflows uint64 at
    # fraction=1.0 (found by probing the edge)
    threshold = np.uint64(min(int(fraction * float(2**64 - 1)), 2**64 - 1))
    seed64 = np.uint64(seed | 1)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        filled = pc.fill_null(b.column(key).cast(pa.int64()),
                              pa.scalar(0, pa.int64()))
        vals = filled.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (vals + seed64) * _MIX
            h ^= h >> np.uint64(29)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(32)
        return b.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
