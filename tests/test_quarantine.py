"""map_with_quarantine: poison rows are isolated by bisection, good rows
flow through fn, the happy path is untouched."""

import pyarrow as pa
import pyarrow.compute as pc
import ray

from ocr_proofreader_ray.ops.quarantine import (
    map_with_quarantine,
    split_quarantine,
)

OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("double", pa.int64())])


def _ds(n=100, blocks=4):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
    })).repartition(blocks)


def test_poison_rows_quarantined_good_rows_transformed(ray_session):
    # defined inside the test so cloudpickle ships it by value (the test
    # module is not importable on Ray workers)
    def fn(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        if pc.any(pc.equal(pc.bit_wise_and(ids, 63), 13)).as_py():
            raise ValueError("poison payload")
        return pa.table({"doc_id": ids,
                         "double": pc.multiply(ids, 2)})

    tagged = map_with_quarantine(_ds(), fn, OUT_SCHEMA)
    good, bad = split_quarantine(tagged)
    gdf = good.to_pandas().sort_values("doc_id")
    poison = {i for i in range(100) if i & 63 == 13}  # 13 and 77
    assert set(gdf["doc_id"]) == set(range(100)) - poison
    assert (gdf["double"] == gdf["doc_id"] * 2).all()
    assert bad.num_rows == len(poison)
    assert set(bad.column("__error_type").to_pylist()) == {"ValueError"}
    assert all("poison payload" in e
               for e in bad.column("__error").to_pylist())
    assert all("doc_id" in j for j in bad.column("__row_json").to_pylist())


def test_clean_input_passes_through(ray_session):
    def clean_fn(b):
        return pa.table({"doc_id": b.column("doc_id"),
                         "double": pc.multiply(b.column("doc_id"), 2)})

    good, bad = split_quarantine(
        map_with_quarantine(_ds(40, 2), clean_fn, OUT_SCHEMA))
    assert bad.num_rows == 0
    assert good.count() == 40


def test_all_rows_poison(ray_session):
    def always_fail(b):
        raise RuntimeError("boom")

    good, bad = split_quarantine(
        map_with_quarantine(_ds(8, 2), always_fail, OUT_SCHEMA))
    assert good.count() == 0
    assert bad.num_rows == 8
    assert set(bad.column("__error_type").to_pylist()) == {"RuntimeError"}


def test_empty_batch_raise_does_not_recurse(ray_session):
    """fn raising on a 0-row batch (e.g. code indexing row 0) must not
    bisect forever — slice(0,0) reproduces the same empty batch until
    RecursionError (ADVICE r03).  There is no poison row to report, so
    the empty batch yields nothing."""
    def fn(b: pa.Table) -> pa.Table:
        first = b.column("doc_id")[0].as_py()  # raises on 0 rows
        return pa.table({"doc_id": b.column("doc_id"),
                         "double": pc.multiply(b.column("doc_id"), 2)})

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64())}))
    good, bad = split_quarantine(
        map_with_quarantine(empty, fn, OUT_SCHEMA))
    assert good.count() == 0
    assert bad.num_rows == 0
