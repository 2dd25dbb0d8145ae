"""User-extension Stage/Pipeline surface (SURVEY.md §2)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from ocr_proofreader_ray.pipelines.api import Pipeline, Stage


# UDFs shipped to Ray workers are built inside factories so cloudpickle
# serializes them BY VALUE: module-level defs in tests/ are pickled by
# reference, and Ray workers cannot import the non-package test module
# (observed: ModuleNotFoundError 'test_pipeline_api' in every map worker,
# surfacing as an endless worker-restart hang).

def _make_upper():
    def upper(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("text"), "text",
                            pc.utf8_upper(b.column("text")))

    return upper


_upper = _make_upper()


def _make_suffixer():
    class Suffixer:
        def __init__(self, suffix: str):
            self.suffix = suffix

        def __call__(self, b: pa.Table) -> pa.Table:
            out = pc.binary_join_element_wise(
                b.column("text"), pa.scalar(self.suffix), "")
            return b.set_column(b.schema.get_field_index("text"), "text", out)

    return Suffixer


_Suffixer = _make_suffixer()


def _docs():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["hello", "world"]),
    }))


def test_task_and_actor_stages_chain(ray_session):
    pipe = Pipeline([
        Stage("upper", fn=_upper,
              schema_in={"text": pa.string()}),
        Stage("suffix", actor_cls=_Suffixer, actor_args=("!!",),
              schema_in={"text": pa.string()}, concurrency=(1, 2)),
    ])
    rows = pipe.apply(_docs()).take_all()
    assert sorted(r["text"] for r in rows) == ["HELLO!!", "WORLD!!"]


def test_validation_rejects_missing_column(ray_session):
    pipe = Pipeline([
        Stage("needs_lang", fn=_upper, schema_in={"lang": pa.string()}),
    ])
    with pytest.raises(ValueError, match="needs_lang.*'lang'"):
        pipe.apply(_docs())


def test_validation_rejects_type_mismatch(ray_session):
    pipe = Pipeline([
        Stage("wants_int_text", fn=_upper,
              schema_in={"text": pa.int64()}),
    ])
    with pytest.raises(ValueError, match="wants_int_text"):
        pipe.apply(_docs())


def test_stage_declaration_errors():
    with pytest.raises(ValueError, match="exactly one"):
        Stage("both", fn=_upper, actor_cls=_Suffixer)
    with pytest.raises(ValueError, match="exactly one"):
        Stage("neither")
    with pytest.raises(ValueError, match="size their pool"):
        Stage("pool", actor_cls=_Suffixer)
    with pytest.raises(ValueError, match="duplicate"):
        Pipeline([Stage("a", fn=_upper), Stage("a", fn=_upper)])


def test_schema_out_flows_between_stages(ray_session):
    def project(b: pa.Table) -> pa.Table:
        return b.select(["doc_id"])

    pipe = Pipeline([
        Stage("project", fn=project, schema_out={"doc_id": pa.int64()}),
        Stage("needs_text", fn=_upper, schema_in={"text": pa.string()}),
    ])
    with pytest.raises(ValueError, match="needs_text.*'text'"):
        pipe.apply(_docs())
