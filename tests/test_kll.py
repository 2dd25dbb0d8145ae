"""KLL quantile sketch: rank-error bound, mergeability, and the
per-event-type query against exact ranks."""

import numpy as np
import pyarrow as pa

from ocr_proofreader_ray.functions.kll import KLLSketch

SF = "/root/testdata/sf0.001"


def _rank_error(values: np.ndarray, estimate: float, q: float) -> float:
    true_rank = (values <= estimate).mean()
    return abs(true_rank - q)


def test_kll_rank_error_within_bound():
    rng = np.random.RandomState(1)
    values = np.concatenate([rng.lognormal(0, 2, 60_000),
                             rng.standard_normal(40_000) * 5])
    sk = KLLSketch(k=400)
    for chunk in np.array_split(values, 37):
        sk.add_batch(chunk)
    assert sk.n == len(values)
    for q in (0.1, 0.5, 0.9, 0.99):
        err = _rank_error(values, sk.quantile(q), q)
        assert err <= 0.02, (q, err)  # eps ~ 0.4%; 5x margin


def test_kll_merge_matches_single_feed_error():
    rng = np.random.RandomState(7)
    values = rng.exponential(3.0, 50_000)
    # merged partials (the distributed plan) must stay within the bound
    parts = [KLLSketch(k=400) for _ in range(8)]
    for sk, chunk in zip(parts, np.array_split(values, 8)):
        sk.add_batch(chunk)
    merged = parts[0]
    for sk in parts[1:]:
        merged.merge(sk)
    assert merged.n == len(values)
    for q in (0.5, 0.9, 0.99):
        assert _rank_error(values, merged.quantile(q), q) <= 0.02
    # sketch memory stays tiny regardless of n
    assert sum(lvl.size for lvl in merged.levels) < 5_000


def test_kll_nan_and_empty():
    sk = KLLSketch(k=50)
    sk.add_batch(np.array([np.nan, np.nan]))
    assert sk.n == 0 and np.isnan(sk.quantile(0.5))
    sk.add_batch(np.array([1.0, np.nan, 3.0]))
    assert sk.n == 2


def test_value_quantiles_query_vs_exact(ray_session):
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.relational import (
        q_value_quantiles_approx,
    )

    out = q_value_quantiles_approx(SF)
    events = pq.read_table(f"{SF}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
    assert out.num_rows == events["event_type"].nunique()
    for row in out.to_pylist():
        vals = events.loc[events["event_type"] == row["event_type"],
                          "value"].to_numpy()
        vals = vals[~np.isnan(vals)]
        assert row["n_events"] == len(vals)
        for q, key in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            err = abs((vals <= row[key]).mean() - q)
            # small per-type n at sf0.001: generous absolute rank margin
            assert err <= 0.05, (row["event_type"], q, err)


def test_kll_retains_extremes_through_odd_compactions():
    """code-review r03: the odd-size hold-back must protect the extreme on
    the side the offset drops — min and max survive heavy compaction."""
    rng = np.random.RandomState(3)
    values = rng.standard_normal(30_001)  # odd chunks force hold-backs
    sk = KLLSketch(k=40)  # tiny k: many compactions
    for chunk in np.array_split(values, 101):
        sk.add_batch(chunk)
    assert sk.quantile(0.0) == values.min()
    assert sk.quantile(1.0) == values.max()


def test_value_quantiles_keeps_null_event_type(ray_session, tmp_path):
    """code-review r03: a null event_type is a stratum — it must appear in
    the output with its exact count, not silently drop."""
    import pandas as pd
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.relational import (
        q_value_quantiles_approx,
    )

    tab = pa.table({
        "event_type": pa.array(["a"] * 10 + [None] * 7, pa.string()),
        "value": pa.array(np.arange(17, dtype=np.float64)),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    out = q_value_quantiles_approx(str(tmp_path)).to_pylist()
    by_type = {r["event_type"]: r["n_events"] for r in out}
    assert by_type == {"a": 10, None: 7}
