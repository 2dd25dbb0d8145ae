"""Partial-aggregation ("combiner") grouped aggregates.

Ray Data's ``groupby().aggregate()`` is a sort-based all-to-all over every
input row — measured ~15 s for a 6-group aggregate of 600 k rows, because
the whole table moves.  The scale-correct plan for aggregates is the
combiner pattern: each ``map_batches`` task reduces its batch with pyarrow's
C++ ``Table.group_by`` (vectorized, zero Python per row), so only
``n_blocks x n_groups`` partial rows ever leave the map stage.

Two final-merge strategies:

* ``final="driver"`` — partials are gathered and merged on the driver with
  one more pyarrow group_by.  Right when group cardinality is small
  (dimension keys, day buckets: ≤ ~10^5 groups) — the gathered data is tiny
  at ANY input scale, so this stays cheap on a 256-node cluster.
* ``final="ray"`` — partials go through a Ray ``groupby().aggregate()``.
  Right for high-cardinality keys (per-customer, per-token) where the
  partials themselves are big; the shuffle still moves only partials,
  never input rows.

Supported agg fns: ``sum`` / ``min`` / ``max`` / ``count`` (count of rows).
Means are derived by callers from sum+count (exact-integer trick).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

# how each partial column merges in the final pass
_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
_RAY_AGG = {"sum": Sum, "count": Sum, "min": Min, "max": Max}


def _arrow_blocks(ds: "ray.data.Dataset") -> list[pa.Table]:
    """Materialize a (small) dataset's non-empty blocks as Arrow tables.

    ``to_arrow_refs`` passes pandas blocks through unconverted (seen when an
    upstream ``map_groups(batch_format="pandas")`` emitted only empty frames
    and the empty blocks skipped later Arrow stages), so convert here."""
    import pandas as pd

    out = []
    for blk in ray.get(ds.to_arrow_refs()):
        if isinstance(blk, pd.DataFrame):
            if len(blk):
                out.append(pa.Table.from_pandas(blk, preserve_index=False))
        elif blk.num_rows:
            out.append(blk)
    return out


def _empty_like(ds: "ray.data.Dataset") -> pa.Table:
    """Empty Arrow table matching a dataset's schema (Arrow or pandas-block)."""
    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    if isinstance(base, pa.Schema):
        return base.empty_table()
    # PandasBlockSchema: ``types`` may hold numpy dtypes or Arrow DataTypes
    fields = []
    for n, typ in zip(schema.names, schema.types):
        if not isinstance(typ, pa.DataType):
            try:
                typ = pa.from_numpy_dtype(typ)
            except (pa.ArrowNotImplementedError, TypeError):
                typ = pa.string()  # object dtype and friends
        fields.append((n, typ))
    return pa.schema(fields).empty_table()


def _partial_specs(aggs: list[tuple[str | None, str, str]]):
    """-> (pyarrow aggregate specs, partial column names); dedups count."""
    specs, names, seen = [], [], set()
    for col, fn, _alias in aggs:
        pname = "count_all" if fn == "count" else f"{col}_{fn}"
        names.append(pname)
        if pname not in seen:
            seen.add(pname)
            specs.append(([], "count_all") if fn == "count" else (col, fn))
    return specs, names


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str | None, str, str]],
    final: str = "driver",
) -> pa.Table | "ray.data.Dataset":
    """Grouped aggregate via per-batch pyarrow partials.

    ``aggs``: list of ``(column, fn, alias)``; ``fn`` in sum|min|max|count
    (column is ignored for count).  Returns a pyarrow Table
    (``final="driver"``) or a Dataset (``final="ray"``), with columns
    ``keys + [alias...]`` in declaration order.
    """
    specs, pnames = _partial_specs(aggs)

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(keys).aggregate(specs)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    aliases = [alias for _c, _f, alias in aggs]
    if final == "ray":
        merged = parts.groupby(keys).aggregate(*[
            _RAY_AGG[fn](pname, alias_name=alias)
            for (c, fn, alias), pname in zip(aggs, pnames)
        ])
        return merged

    # materialize the (tiny) partials before draining: to_arrow_refs'
    # internal schema probe otherwise runs the upstream plan a SECOND time
    # via a limit-1 execution, and an upstream all-to-all (shuffle join,
    # sort) cannot early-stop — measured 2x the whole join per aggregate
    tables = _arrow_blocks(parts.materialize())
    if not tables:
        # empty input: derive an empty partial so output schema is stable
        tables = [partial(_empty_like(ds))]
    merged = pa.concat_tables(tables, promote_options="default")
    # one merge spec per unique partial column (count may repeat)
    merge_specs = {pname: (pname, _MERGE_FN[fn])
                   for (_c, fn, _a), pname in zip(aggs, pnames)}
    out = merged.group_by(keys).aggregate(list(merge_specs.values()))
    # final columns: keys..., then {pname}_{mergefn} per unique pname
    rename = {f"{pname}_{_MERGE_FN[fn]}": pname
              for (c, fn, _a), pname in zip(aggs, pnames)}
    out = out.rename_columns([rename.get(n, n) for n in out.schema.names])
    cols = {k: out.column(k) for k in keys}
    for (c, fn, alias), pname in zip(aggs, pnames):
        cols[alias] = out.column(pname)
    return pa.table(cols)


def grouped_top_k(
    ds: "ray.data.Dataset",
    group_cols: list[str],
    sort_keys: list[tuple[str, str]],
    k: int,
) -> pa.Table:
    """Per-group top-k (stratified selection) without a global sort.

    Every block keeps its local top-k PER GROUP (one vectorized sort +
    grouped head), so at most ``n_blocks x n_groups x k`` survivor rows
    reach the driver merge — right when group cardinality is bounded
    (languages, segments, day buckets).  For per-document groups prefer a
    batch-local argmax (docs never span blocks after an explode).
    ``sort_keys`` must totally order rows within a group for deterministic
    output.
    """
    import pyarrow.compute as pc

    def local(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=sort_keys)
        df = b.take(idx).to_pandas()
        # dropna=False: a null group key is a group (SQL window PARTITION BY
        # semantics — the oracle keeps a NULL stratum, so must we)
        return pa.Table.from_pandas(
            df.groupby(group_cols, sort=False, dropna=False).head(k),
            preserve_index=False, schema=b.schema)

    parts = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    tables = _arrow_blocks(parts.materialize())
    if not tables:
        return _empty_like(ds)
    merged = pa.concat_tables(tables, promote_options="default")
    idx = pc.sort_indices(merged, sort_keys=sort_keys)
    df = merged.take(idx).to_pandas()
    return pa.Table.from_pandas(
        df.groupby(group_cols, sort=False, dropna=False).head(k),
        preserve_index=False, schema=merged.schema).combine_chunks()


def top_k(
    ds: "ray.data.Dataset",
    sort_keys: list[tuple[str, str]],
    k: int,
) -> pa.Table:
    """Distributed top-k without a global sort.

    ``Dataset.sort().limit(k)`` range-partitions EVERY row to produce k of
    them.  Here each block keeps its local top-k (pyarrow sort of one block),
    and the driver merges ``n_blocks x k`` survivors — tiny at any input
    scale.  ``sort_keys``: [(col, "ascending"|"descending"), ...]; ties must
    be broken by the key list itself for deterministic output.
    """
    import pyarrow.compute as pc

    def local(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=sort_keys)
        return b.take(idx[:k])

    parts = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    # materialize before draining — same double-execution trap as in
    # grouped_agg: the schema probe would re-run the upstream plan
    tables = _arrow_blocks(parts.materialize())
    if not tables:
        return _empty_like(ds)
    merged = pa.concat_tables(tables, promote_options="default")
    idx = pc.sort_indices(merged, sort_keys=sort_keys)
    return merged.take(idx[:k]).combine_chunks()
