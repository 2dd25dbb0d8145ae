"""Join strategies (SURVEY.md §2 B7/B8).

Two physical strategies, chosen by the caller:

* **Broadcast hash join** — the small side (dimension table, key set) is
  ``ray.put`` ONCE on the driver; every map task ``ray.get``s it (object is
  node-local after first fetch, and additionally memoized per worker process
  here) and joins each Arrow batch with ``pyarrow.Table.join`` (Arrow C++
  hash join).  No shuffle; the big side streams.
* **Shuffle hash join** — both sides large → ``Dataset.join`` (Ray 2.49
  hash-partitioned join).  All-to-all exchange on the key; used only when the
  small-side assumption fails.

Semi/anti joins broadcast the key set and filter with ``pyarrow.compute.is_in``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# per-worker-process memo of fetched broadcast objects
_FETCH_CACHE: dict[str, object] = {}


def _fetch(ref: "ray.ObjectRef"):
    key = ref.hex()
    if key not in _FETCH_CACHE:
        _FETCH_CACHE[key] = ray.get(ref)
    return _FETCH_CACHE[key]


def broadcast_join(
    ds: "ray.data.Dataset",
    right: pa.Table,
    on: list[str] | str,
    right_on: list[str] | str | None = None,
    join_type: str = "inner",
) -> "ray.data.Dataset":
    """Join a streaming Dataset against a small in-memory Arrow table."""
    on = [on] if isinstance(on, str) else list(on)
    right_on = (
        on if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    ref = ray.put(right)

    def _join(batch: pa.Table) -> pa.Table:
        rt: pa.Table = _fetch(ref)
        return batch.join(
            rt, keys=on, right_keys=right_on, join_type=join_type,
            coalesce_keys=True,
        )

    return ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_semi_anti(
    ds: "ray.data.Dataset",
    keys: pa.Array | pa.ChunkedArray,
    on: str,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Semi (keep matches) or anti (keep non-matches) join via a broadcast
    key set — no shuffle.  For very large key sets swap the exact set for a
    Bloom filter; the sf scales here never need it."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    ref = ray.put(pc.unique(keys))

    def _filter(batch: pa.Table) -> pa.Table:
        key_set = _fetch(ref)
        mask = pc.is_in(batch.column(on), value_set=key_set)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Fact-fact hash-partitioned join (Ray Data built-in)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
    )
