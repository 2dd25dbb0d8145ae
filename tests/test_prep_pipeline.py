"""Composed LLM prep pipeline: stage lineage consistency and the written
final corpus artifact."""

import os

import pyarrow.parquet as pq

from ocr_proofreader_ray.pipelines.prep import q_llm_prep_corpus

SF = "/root/testdata/sf0.001"


def test_prep_lineage_and_artifact(ray_session):
    out = q_llm_prep_corpus(SF)
    stages = out.column("stage").to_pylist()
    rows_in = out.column("rows_in").to_pylist()
    rows_out = out.column("rows_out").to_pylist()
    assert stages == ["input", "near_dup_dedup", "decontaminate",
                      "source_cap", "mixture_sample"]
    # chain consistency: each stage consumes the previous stage's output
    for i in range(2, len(stages)):
        assert rows_in[i] == rows_out[i - 1]
    assert all(o <= i for i, o in zip(rows_in, rows_out))
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert rows_in[0] == rows_out[0] == n_docs

    final = "/tmp/opr_llm_prep/sf0.001/final/documents.parquet"
    assert os.path.isdir(final)
    written = pq.ParquetDataset(final).read()
    assert written.num_rows == rows_out[-1]
    assert set(written.schema.names) == {
        "doc_id", "text", "lang", "source", "n_chars"}

    # deterministic: a re-run reproduces identical lineage
    again = q_llm_prep_corpus(SF)
    assert again.column("rows_out").to_pylist() == rows_out
