"""Sink coverage (SURVEY.md §2 B16): parquet is exercised everywhere; here
CSV and JSON sinks round-trip through DuckDB to prove the written files are
standard-conformant, and parquet output is re-readable with identical rows."""

import glob

import duckdb
import pyarrow.compute as pc
import ray.data


def _segments(sf_dir="/root/testdata/sf0.001"):
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING")),
        batch_format="pyarrow", zero_copy_batch=True)


def test_write_csv_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "csv")
    ds = _segments()
    n = ds.count()
    ds.write_csv(out)
    files = glob.glob(f"{out}/*")
    assert files
    got = duckdb.sql(
        f"SELECT count(*) n, min(c_custkey) lo FROM read_csv_auto('{out}/*')"
    ).fetchone()
    want = duckdb.sql(
        "SELECT count(*) n, min(c_custkey) lo FROM "
        "read_parquet('/root/testdata/sf0.001/customer.parquet') "
        "WHERE c_mktsegment = 'BUILDING'"
    ).fetchone()
    assert got == want and got[0] == n


def test_write_json_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "json")
    _segments().write_json(out)
    got = duckdb.sql(
        f"SELECT count(*), min(c_custkey) FROM read_json_auto('{out}/*')"
    ).fetchone()
    want = duckdb.sql(
        "SELECT count(*), min(c_custkey) FROM "
        "read_parquet('/root/testdata/sf0.001/customer.parquet') "
        "WHERE c_mktsegment = 'BUILDING'"
    ).fetchone()
    assert got == want


def test_write_parquet_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "pq")
    ds = _segments()
    ds.write_parquet(out)
    back = ray.data.read_parquet(out)
    a = sorted(r["c_custkey"] for r in ds.take_all())
    b = sorted(r["c_custkey"] for r in back.take_all())
    assert a == b
