"""Bloom filter + Bloom-prefiltered shuffle join (VERDICT r01 missing #5)."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_proofreader_ray.functions.bloom import BloomFilter, build_bloom


def test_bloom_no_false_negatives_and_low_fpp():
    keys = pa.array(np.arange(0, 50_000, 2, dtype=np.int64))  # evens
    f = BloomFilter(25_000, fpp=0.01)
    f.add_column(keys)
    # every inserted key must test positive
    assert f.contains_column(keys).all()
    # odd keys were never inserted: false-positive rate near the target
    probe = pa.array(np.arange(1, 50_001, 2, dtype=np.int64))
    fpp = f.contains_column(probe).mean()
    assert fpp < 0.03


def test_bloom_string_keys():
    keys = pa.array([f"user-{i}" for i in range(1000)])
    f = BloomFilter(1000, fpp=0.01)
    f.add_column(keys)
    assert f.contains_column(keys).all()
    other = pa.array([f"ghost-{i}" for i in range(1000)])
    assert f.contains_column(other).mean() < 0.05


def test_bloom_merge_is_union():
    a, b = BloomFilter(100, 0.01), BloomFilter(100, 0.01)
    a.add_column(pa.array([1, 2, 3], pa.int64()))
    b.add_column(pa.array([4, 5, 6], pa.int64()))
    a.merge(b)
    assert a.contains_column(pa.array([1, 4, 6], pa.int64())).all()


def test_distributed_build_and_prefiltered_join_exactness(ray_session):
    """bloom on vs off must give bit-identical join results (the filter is a
    superset prefilter; the exact Arrow join resolves false positives)."""
    import ray.data

    from ocr_proofreader_ray.ops.join import shuffle_join

    def make_left():
        rng = np.random.RandomState(5)
        return ray.data.from_arrow(pa.table({
            "k": pa.array(rng.randint(0, 10_000, size=20_000), pa.int64()),
            "v": pa.array(np.arange(20_000), pa.int64()),
        }))

    def make_right():
        return ray.data.from_arrow(pa.table({
            "k2": pa.array(np.arange(0, 10_000, 7), pa.int64()),  # selective
            "w": pa.array(np.arange(0, 10_000, 7) * 2, pa.int64()),
        }))

    # distributed build finds every right key
    f = build_bloom(make_right(), "k2", n_keys_estimate=2000)
    assert f.contains_column(
        pa.array(np.arange(0, 10_000, 7), pa.int64())).all()

    plain = shuffle_join(make_left(), make_right(),
                         on=("k",), right_on=("k2",)).take_all()
    bloomed = shuffle_join(make_left(), make_right(),
                           on=("k",), right_on=("k2",),
                           bloom_prefilter=True).take_all()
    key = lambda r: (r["k"], r["v"], r["w"])
    assert sorted(map(key, plain)) == sorted(map(key, bloomed))
    assert len(plain) > 0


def test_bloom_prefilter_rejects_outer_join(ray_session):
    import ray.data

    from ocr_proofreader_ray.ops.join import shuffle_join

    ds = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    rt = ray.data.from_arrow(pa.table({"k2": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="inner"):
        shuffle_join(ds, rt, on=("k",), right_on=("k2",),
                     join_type="left outer", bloom_prefilter=True)
