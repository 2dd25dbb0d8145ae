"""The `ray job submit` entrypoint (jobs/extract_job.py): runs the full
extraction on an existing Ray session, reports lineage-counter totals,
and a resubmission resumes from the committed manifests."""

import glob
import json
import os

import pytest

from fixtures.gen_pages import generate_pages
from jobs.extract_job import main


@pytest.fixture(scope="module")
def job_pages(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job_pages"))
    generate_pages(out, n_docs=200, seed=13, n_files=4)
    return out


def test_job_runs_and_resumes(ray_session, job_pages, tmp_path, capsys):
    work = str(tmp_path / "job_work")
    args = ["--input", os.path.join(job_pages, "pages-*.parquet"),
            "--work-dir", work, "--files-per-chunk", "2"]

    assert main(args) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["rows"] == 200
    assert first["counters"]["extract"]["rows_in"] == 200
    assert first["counters"]["correct"]["rows_out"] == 200
    assert first["cluster_cpus"] > 0

    # resubmission resumes: committed chunk manifests are not rewritten
    stamps = {p: os.path.getmtime(p) for p in
              glob.glob(os.path.join(work, "manifest", "*", "chunk-*.json"))}
    assert stamps
    assert main(args) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["rows"] == 200
    assert second["counters"] == first["counters"]
    for p, t0 in stamps.items():
        assert os.path.getmtime(p) == t0, f"manifest rewritten: {p}"
