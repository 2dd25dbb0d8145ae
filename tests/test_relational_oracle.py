"""Local replica of the driver's correctness gate: run every registered query
on sf0.001 and compare against its DuckDB oracle — row count, schema (by
sorted column names), and order-insensitive values."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from ocr_proofreader_ray.pipelines.registry import all_oracles, all_queries

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(ray_session, con, name):
    got = canon(to_pandas(QUERIES[name](SF_DIR)))
    want = canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # Driver-style representation check: the real gate hashes canonical
    # VALUES, so a pandas extension dtype (Int64 <NA>) or an int/float
    # mismatch fails it even when assert_frame_equal(check_dtype=False)
    # passes — caught live in round 3 on q_lead_lag_orders.  Exact floats
    # (engine contract) make this hash stable.
    h_got = pd.util.hash_pandas_object(got, index=False).sum()
    h_want = pd.util.hash_pandas_object(want, index=False).sum()
    assert h_got == h_want, (
        f"{name}: value-hash mismatch (dtypes {dict(got.dtypes.astype(str))} "
        f"vs {dict(want.dtypes.astype(str))})"
    )


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_registry_names_match_functions():
    """Each registered name must point at the function of the same name —
    a ``@register`` decorator landing on the wrong def (e.g. a helper
    inserted above the query during a refactor) silently swaps the
    driver-contract callable; caught live in round 3 on q_ann_ivf."""
    for name, fn in QUERIES.items():
        assert fn.__name__ == name, (
            f"registry entry {name!r} is bound to {fn.__name__!r}"
        )
