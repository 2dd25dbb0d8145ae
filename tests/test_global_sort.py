"""global_sort_position: exact global ranks, invariant to partitioning."""

import numpy as np
import pyarrow as pa
import ray

from ocr_proofreader_ray.ops.sort import global_sort_position


def _run(keys, num_partitions, blocks=5):
    t = pa.table({
        "k": pa.array(keys, pa.int64()),
        "tag": pa.array([f"r{k}" for k in keys], pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = global_sort_position(ds, "k", position_name="pos",
                               num_partitions=num_partitions,
                               sample_max=50).to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def test_positions_are_exact_global_ranks(ray_session):
    rng = np.random.default_rng(11)
    keys = rng.permutation(np.arange(-500, 500, dtype=np.int64)).tolist()
    out = _run(keys, num_partitions=7)
    # sorted by k, positions must be exactly 1..n
    assert out["pos"].tolist() == list(range(1, len(keys) + 1))
    assert out["tag"].tolist() == [f"r{k}" for k in sorted(keys)]


def test_partition_count_invariance(ray_session):
    rng = np.random.default_rng(5)
    keys = rng.choice(10**9, size=400, replace=False).astype(np.int64).tolist()
    a = _run(keys, num_partitions=1, blocks=2)
    b = _run(keys, num_partitions=13, blocks=7)
    assert a["pos"].tolist() == b["pos"].tolist()
    assert a["k"].tolist() == b["k"].tolist()


def test_tiny_input_fewer_boundaries(ray_session):
    out = _run([3, -8, 12], num_partitions=16, blocks=1)
    assert out["k"].tolist() == [-8, 3, 12]
    assert out["pos"].tolist() == [1, 2, 3]


def test_string_keys_sort_and_rank(ray_session):
    words = [f"k{idx:04d}x{idx % 7}" for idx in range(300)]
    rng = np.random.default_rng(3)
    perm = rng.permutation(300)
    t = pa.table({
        "k": pa.array([words[i] for i in perm], pa.string()),
        "v": pa.array([int(i) for i in perm], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    out = global_sort_position(ds, "k", position_name="pos",
                               num_partitions=5, sample_max=40).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == sorted(words)
    assert out["pos"].tolist() == list(range(1, 301))


def test_reserved_column_collision_raises(ray_session):
    import pytest

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "pos": pa.array([0, 0], pa.int64())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="reserved column"):
        global_sort_position(ds, "k", position_name="pos")


def test_string_outlier_key_no_fixed_width_blowup(ray_session):
    """A single 1 MB outlier string key must not multiply partition memory
    (the old fixed-width numpy unicode path cost max_len x rows x 4 bytes);
    routing + ranks stay exact (VERDICT r03 #4)."""
    import pytest

    whale = "z" * 1_000_000
    words = sorted(f"k{idx:05d}" for idx in range(2000))
    keys = words + [whale]
    rng = np.random.default_rng(7)
    perm = rng.permutation(len(keys))
    t = pa.table({"k": pa.array([keys[i] for i in perm], pa.string())})
    ds = ray.data.from_arrow(t).repartition(6)
    out = global_sort_position(ds, "k", position_name="pos",
                               num_partitions=8,
                               sample_max=100).to_pandas()
    out = out.sort_values("pos").reset_index(drop=True)
    assert out["k"].tolist() == sorted(keys)
    assert out["pos"].tolist() == list(range(1, len(keys) + 1))

    # null keys fail loudly, not as the literal string "None"
    tn = pa.table({"k": pa.array(["a", None, "c"], pa.string())})
    with pytest.raises((ValueError, Exception)) as exc:
        global_sort_position(ray.data.from_arrow(tn), "k").to_pandas()
    assert "null" in str(exc.value)


def test_duplicate_keys_raise(ray_session):
    import pytest

    t = pa.table({"k": pa.array([5, 3, 5, 1], pa.int64())})
    with pytest.raises(Exception) as exc:
        global_sort_position(ray.data.from_arrow(t), "k",
                             num_partitions=2).to_pandas()
    assert "duplicate" in str(exc.value)
