"""Unit tests for sketching primitives + the MinHash-LSH near-dup pipeline
on constructed near-duplicates (driver brief: dedup operators)."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_proofreader_ray.functions.sketches import (
    MinHasher,
    hamming64,
    shingles,
    simhash64,
    stable_hash32,
    stable_hash64,
)


def test_stable_hashes_are_process_independent():
    # pinned values: guard against accidental use of salted hash()
    assert stable_hash32("hello") == 907060870
    assert stable_hash64("hello") == stable_hash64("hello")
    assert stable_hash64("hello") != stable_hash64("hellp")


def test_shingles_basic():
    toks = "a b c d".split()
    assert len(shingles(toks, 3)) == 2
    assert shingles([], 3) == set()
    assert len(shingles(["x"], 3)) == 1  # short doc → whole-doc shingle


def test_minhash_similarity_tracks_jaccard():
    mh = MinHasher(num_perm=256)
    base = [f"tok{i}" for i in range(100)]
    a = shingles(base, 3)
    b = shingles(base[:90] + [f"other{i}" for i in range(10)], 3)
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    true_j = len(a & b) / len(a | b)
    assert abs(est - true_j) < 0.15


def test_minhash_identical_docs_identical_signatures():
    mh = MinHasher()
    s = shingles("the quick brown fox jumps".split(), 3)
    assert np.array_equal(mh.signature(s), mh.signature(set(s)))


def test_simhash_near_duplicates_close():
    from collections import Counter

    doc = Counter(("word%d" % (i % 50) for i in range(200)))
    near = Counter(doc)
    near["extra_token"] = 1
    far = Counter(("other%d" % i for i in range(100)))
    assert hamming64(simhash64(doc), simhash64(near)) <= 8
    assert hamming64(simhash64(doc), simhash64(far)) > 10


def test_minhash_lsh_pipeline_finds_planted_dups(ray_session):
    import ray.data

    from ocr_proofreader_ray.pipelines.dedup import minhash_lsh_pairs

    base = " ".join(f"tok{i % 40}x{i % 7}" for i in range(120))
    near = base.replace("tok3x3", "changed", 1)  # ~1 token differs
    other = " ".join(f"zzz{i}" for i in range(120))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": other},
        {"doc_id": 4, "text": base},  # exact dup of 1
    ]
    token_sets = {r["doc_id"]: shingles(r["text"].split(), 3) for r in rows}
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = minhash_lsh_pairs(ds, shingle_n=3, jaccard_threshold=0.5,
                              token_sets=token_sets).take_all()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    assert (1, 4) in found          # exact dup
    assert (1, 2) in found          # near dup
    assert not any(3 in p for p in found)  # unrelated doc clean


def test_embedding_neardup_pairs(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.dedup import q_dedup_embedding

    rng = np.random.RandomState(3)
    base = rng.standard_normal(16).astype(np.float32)
    vecs = [base, base + 1e-4 * rng.standard_normal(16).astype(np.float32),
            rng.standard_normal(16).astype(np.float32)]
    tab = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32()),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    pairs = q_dedup_embedding(str(tmp_path)).take_all()
    keys = {(p["vec_a"], p["vec_b"]) for p in pairs}
    assert keys == {(0, 1)}


def test_embedding_scheme_two_widths_agree(ray_session, tmp_path):
    """VERDICT r02 #2: the planted near-dup pair must be recalled at both
    the narrow (8-bit) and wide (16-bit) hyperplane bucketing, and the
    width chooser must respond to corpus size."""
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.dedup import (
        _emb_scheme,
        q_dedup_embedding,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal(32).astype(np.float32)
    vecs = [base, base + 1e-4 * rng.standard_normal(32).astype(np.float32)]
    vecs += [rng.standard_normal(32).astype(np.float32) for _ in range(40)]
    tab = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))

    for scheme in ((8, 10), (16, 18)):
        pairs = q_dedup_embedding(str(tmp_path), scheme=scheme).take_all()
        assert {(p["vec_a"], p["vec_b"]) for p in pairs} == {(0, 1)}, scheme

    # expected bucket population corpus/2^bits tracks the 256-member target
    assert _emb_scheme(1_000)[0] == 8
    assert _emb_scheme(256 * (1 << 16))[0] == 16
    assert _emb_scheme(10**12)[0] == 24
    # wider keys demand more tables to hold the same miss probability
    assert _emb_scheme(10**12)[1] > _emb_scheme(1_000)[1]


def test_minhash_shuffle_verify_matches_broadcast(ray_session):
    """VERDICT r01 #1: the scale-safe shuffle-join verification must produce
    the identical pair set as the legacy broadcast token_sets path."""
    import ray.data

    from ocr_proofreader_ray.pipelines.dedup import minhash_lsh_pairs

    rng = np.random.RandomState(11)
    rows = []
    base = " ".join(f"tok{i % 40}x{i % 7}" for i in range(120))
    rows.append({"doc_id": 1, "text": base})
    rows.append({"doc_id": 2, "text": base.replace("tok3x3", "changed", 1)})
    rows.append({"doc_id": 3, "text": " ".join(f"zzz{i}" for i in range(120))})
    rows.append({"doc_id": 4, "text": base})
    rows.append({"doc_id": 5, "text": ""})  # empty doc: must not pair
    for d in range(6, 30):  # background corpus
        words = [f"w{rng.randint(0, 500)}" for _ in range(60)]
        rows.append({"doc_id": d, "text": " ".join(words)})
    token_sets = {r["doc_id"]: shingles(r["text"].split(), 3) for r in rows}
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    old = minhash_lsh_pairs(ds, shingle_n=3, jaccard_threshold=0.5,
                            token_sets=token_sets).take_all()
    new_tab = minhash_lsh_pairs(ds, shingle_n=3, jaccard_threshold=0.5)
    new = new_tab.take_all()  # _verify_pairs returns a Dataset (r05)

    as_set = lambda recs: {(r["doc_a"], r["doc_b"], r["inter"], r["uni"])
                           for r in recs}
    assert as_set(old) == as_set(new)
    assert (1, 4) in {(r["doc_a"], r["doc_b"]) for r in new}

    # the adaptive default picked the gather plan at this size; force the
    # shuffle-join plan too and pin all three paths identical
    from ocr_proofreader_ray.pipelines.dedup import (
        _band_rows,
        _candidate_pairs,
        _cand_elements,
        _verify_pairs_shuffle,
    )

    pairs_table = _candidate_pairs(_band_rows(ds, 3))

    def shingle_elements(text):
        return [h - (1 << 63) for h in shingles((text or "").split(), n=3)]

    elements = _cand_elements(ds, pairs_table,
                              shingle_elements).materialize()
    shuffled = _verify_pairs_shuffle(pairs_table, elements,
                                     thr_num=500_000, thr_den=1_000_000)
    assert as_set(shuffled.take_all()) == as_set(new)


def test_simhash_hamming_finds_planted_neardups(ray_session):
    """VERDICT r01 #4: Hamming-ball banding must find docs whose SimHash
    differs in 1-3 bits (verified precondition), and skip distant docs."""
    from collections import Counter

    import ray.data

    from ocr_proofreader_ray.pipelines.dedup import simhash_hamming_pairs

    base = " ".join(f"word{i % 50}" for i in range(200))
    near = base + " extra_token"  # tiny perturbation → few flipped bits
    far = " ".join(f"other{i}" for i in range(100))
    # precondition: the planted pair really is within the Hamming ball
    d_near = hamming64(simhash64(Counter(base.split())),
                       simhash64(Counter(near.split())))
    d_far = hamming64(simhash64(Counter(base.split())),
                      simhash64(Counter(far.split())))
    assert d_near <= 3 < d_far

    ds = ray.data.from_arrow(pa.Table.from_pylist([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": far},
        {"doc_id": 4, "text": base},  # identical → distance 0
    ]))
    pairs = simhash_hamming_pairs(ds).to_pylist()
    found = {(p["doc_a"], p["doc_b"]): p["hamming"] for p in pairs}
    assert found[(1, 4)] == 0
    assert found[(1, 2)] == d_near
    assert found[(2, 4)] == d_near
    assert not any(3 in k for k in found)


def test_lsh_flood_bucket_emits_star_pairs(ray_session):
    """VERDICT r02 #1: m identical templated pages (boilerplate flood) must
    produce O(m) candidate pairs — star edges to the bucket min — not m^2/2,
    and still resolve to ONE dedup cluster with the min doc_id as rep."""
    import ray.data

    from ocr_proofreader_ray.pipelines.dedup import (
        _band_rows,
        _candidate_pairs,
        dedup_clusters,
        minhash_lsh_pairs,
    )

    m = 10_000
    template = " ".join(f"boiler{i}" for i in range(12))
    tab = pa.table({
        "doc_id": pa.array(np.arange(1, m + 1), pa.int64()),
        "text": pa.array([template] * m),
    })
    ds = ray.data.from_arrow(tab)

    cand = _candidate_pairs(_band_rows(ds, 3))  # Dataset (r04: streams)
    assert cand.count() == m - 1           # star, not all-pairs
    cand_pd = cand.to_pandas()
    assert set(cand_pd["doc_a"]) == {1}    # bucket min

    pairs = minhash_lsh_pairs(ds, shingle_n=3, jaccard_threshold=0.5)
    clusters = dedup_clusters(pairs)
    assert clusters.num_rows == m
    assert set(clusters.column("rep_id").to_pylist()) == {1}


def test_star_cap_below_threshold_keeps_all_pairs(ray_session):
    """Buckets at or below star_cap keep exact all-pairs emission — forcing
    star_cap low on the same corpus must switch the plan (star) while the
    default returns every pair of the 4-dup group."""
    import ray.data

    from ocr_proofreader_ray.pipelines.dedup import minhash_lsh_pairs

    base = " ".join(f"tok{i % 40}x{i % 7}" for i in range(120))
    rows = [{"doc_id": d, "text": base} for d in (1, 2, 3, 4)]
    rows.append({"doc_id": 5, "text": " ".join(f"zzz{i}" for i in range(120))})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    full = minhash_lsh_pairs(ds, shingle_n=3, jaccard_threshold=0.5)
    keys = {(r["doc_a"], r["doc_b"]) for r in full.take_all()}
    assert keys == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}

    star = minhash_lsh_pairs(ds, shingle_n=3, jaccard_threshold=0.5,
                             star_cap=2)
    star_keys = {(r["doc_a"], r["doc_b"]) for r in star.take_all()}
    assert star_keys == {(1, 2), (1, 3), (1, 4)}


def test_simhash_hamming_two_key_widths_agree(ray_session):
    """VERDICT r02 #2: planted near-dup recall must hold at both the narrow
    (4 blocks, concat 1 → 16-bit keys) and wide (6 blocks, concat 3 →
    ~31-bit keys) banding schemes, with identical verified output — the
    exact Hamming verification makes width a pure bucketing choice."""
    import ray.data

    from ocr_proofreader_ray.pipelines.dedup import (
        _sim_scheme,
        simhash_hamming_pairs,
    )

    base = " ".join(f"word{i % 50}" for i in range(200))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " extra_token"},
        {"doc_id": 3, "text": " ".join(f"other{i}" for i in range(100))},
        {"doc_id": 4, "text": base},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    results = []
    for scheme in ((4, 1), (6, 3)):
        pairs = simhash_hamming_pairs(ds, scheme=scheme)
        results.append({(r["doc_a"], r["doc_b"]): r["hamming"]
                        for r in pairs.to_pylist()})
    assert results[0] == results[1]
    assert results[0][(1, 4)] == 0
    assert (1, 2) in results[0]
    assert not any(3 in k for k in results[0])
    # the width chooser: small corpora narrow, trillion-scale wide
    assert _sim_scheme(10_000) == (4, 1)
    assert _sim_scheme(10**12) == (6, 3)


def test_simhash_hamming_degenerate_buckets_stay_linear(ray_session):
    """ADVICE r02: empty docs (simhash 0) must emit no pairs, and m docs
    with IDENTICAL fingerprints must produce O(m) star edges, not m^2/2."""
    import ray.data

    from ocr_proofreader_ray.pipelines.dedup import simhash_hamming_pairs

    m = 500
    template = " ".join(f"boiler{i % 30}" for i in range(80))
    rows = [{"doc_id": d, "text": template} for d in range(1, m + 1)]
    rows += [{"doc_id": m + 1, "text": ""},
             {"doc_id": m + 2, "text": "   \n\t "},
             {"doc_id": m + 3, "text": None}]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    pairs = simhash_hamming_pairs(ds).to_pylist()
    assert len(pairs) == m - 1                     # star, not all-pairs
    assert all(p["doc_a"] == 1 and p["hamming"] == 0 for p in pairs)
    assert not any(p["doc_b"] > m for p in pairs)  # empty docs pair-free


def test_dedup_keep_drops_cluster_members(ray_session, tmp_path):
    """q_dedup_keep must drop exactly the non-representative members of
    near-dup clusters and keep everything else."""
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.dedup import q_dedup_keep

    base = " ".join(f"tok{i % 40}x{i % 7}" for i in range(120))
    rows = [
        {"doc_id": 1, "text": base, "lang": "en", "source": "a"},
        {"doc_id": 2, "text": base, "lang": "en", "source": "a"},
        {"doc_id": 3, "text": base.replace("tok3x3", "changed", 1),
         "lang": "en", "source": "a"},
        {"doc_id": 4, "text": " ".join(f"zzz{i}" for i in range(120)),
         "lang": "de", "source": "b"},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    kept = sorted(r["doc_id"] for r in q_dedup_keep(str(tmp_path)).take_all())
    assert kept == [1, 4]  # 2 and 3 collapse into 1's cluster


def test_label_propagation_matches_union_find(ray_session):
    """VERDICT r02 #9: the distributed min-label-propagation fallback must
    produce exactly the union-find components — including a long chain
    (multi-round convergence) and an isolated pair."""
    from ocr_proofreader_ray.pipelines.dedup import (
        _clusters_label_propagation,
        dedup_clusters,
    )

    rng = np.random.RandomState(5)
    edges = [(int(a), int(b)) for a, b in
             rng.randint(0, 60, size=(80, 2)) if a != b]
    edges += [(1000 + i, 1001 + i) for i in range(6)]  # 7-node chain
    edges += [(5000, 5001)]
    pairs = pa.table({
        "doc_a": pa.array([min(e) for e in edges], pa.int64()),
        "doc_b": pa.array([max(e) for e in edges], pa.int64()),
    })

    uf = dedup_clusters(pairs)                       # driver union-find
    # threshold 0 forces the distributed path through the public switch
    lp = dedup_clusters(pairs, max_driver_pairs=0)
    assert uf.column("doc_id").to_pylist() == lp.column("doc_id").to_pylist()
    assert uf.column("rep_id").to_pylist() == lp.column("rep_id").to_pylist()
    # chain resolved to its min across 6 hops (multi-round + pointer jump)
    reps = dict(zip(lp.column("doc_id").to_pylist(),
                    lp.column("rep_id").to_pylist()))
    assert all(reps[1000 + i] == 1000 for i in range(7))
    assert reps[5001] == 5000
    assert _clusters_label_propagation is dedup_clusters.__globals__[
        "_clusters_label_propagation"]  # the switch targets the real impl


def test_cand_elements_bloom_path_identical(ray_session):
    """Forcing the Bloom semi-filter (threshold 0) must yield the same
    verified pairs as the exact key-set path — FPs only waste explode work."""
    import ray.data

    from ocr_proofreader_ray.pipelines.dedup import (
        _band_rows,
        _candidate_pairs,
        _cand_elements,
        _verify_pairs_gather,
    )

    base = " ".join(f"tok{i % 40}x{i % 7}" for i in range(120))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base.replace("tok3x3", "changed", 1)},
        {"doc_id": 3, "text": " ".join(f"zzz{i}" for i in range(120))},
        {"doc_id": 4, "text": base},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs_table = _candidate_pairs(_band_rows(ds, 3))

    def shingle_elements(text):
        return [h - (1 << 63) for h in shingles((text or "").split(), n=3)]

    results = []
    for threshold in (10**9, 0):  # exact path, then forced Bloom path
        elements = _cand_elements(ds, pairs_table, shingle_elements,
                                  bloom_threshold=threshold)
        out = _verify_pairs_gather(pairs_table, elements,
                                   thr_num=500_000, thr_den=1_000_000)
        results.append({(r["doc_a"], r["doc_b"], r["inter"], r["uni"])
                        for r in out.to_pylist()})
    assert results[0] == results[1]
    assert any(p[:2] == (1, 4) for p in results[0])


def test_segment_dedup_planted(ray_session, tmp_path):
    """A doc identical to an earlier one keeps ZERO windows; a doc sharing
    an aligned 10-token prefix loses exactly that window; unique docs keep
    everything."""
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.dedup import q_segment_dedup

    first = " ".join(f"w{i}" for i in range(25))          # 3 windows
    prefix_share = " ".join(f"w{i}" for i in range(10)) + " " + \
        " ".join(f"x{i}" for i in range(10))              # 2 windows, 1st shared
    unique = " ".join(f"u{i}" for i in range(12))         # 2 windows
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [first, first, prefix_share, unique],
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
    }), str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: (r["n_segments"], r["n_kept"])
           for r in q_segment_dedup(str(tmp_path)).to_pylist()}
    assert got == {1: (3, 3), 2: (3, 0), 3: (2, 1), 4: (2, 2)}


def test_segment_dedup_ray_final_path(ray_session, monkeypatch):
    """Forced-low threshold exercises the at-scale Ray-shuffle final: same
    values as the driver merge, returned as a Dataset."""
    from ocr_proofreader_ray.pipelines import dedup as dmod

    sf = "/root/testdata/sf0.001"
    driver = dmod.q_segment_dedup(sf).to_pandas()
    monkeypatch.setattr(dmod, "_SEG_DRIVER_MAX_DOCS", 0)
    ray_final = dmod.q_segment_dedup(sf)
    assert hasattr(ray_final, "to_pandas") and not isinstance(
        ray_final, pa.Table)
    got = ray_final.to_pandas()
    key = ["doc_id"]
    import pandas as pd
    pd.testing.assert_frame_equal(
        driver.sort_values(key).reset_index(drop=True),
        got[driver.columns].sort_values(key).reset_index(drop=True))


def test_candidate_pairs_ray_exchange_branch_equivalent(ray_session,
                                                        monkeypatch):
    """Force the above-gate Ray-exchange pair dedup (the 100-TB path that
    normally needs >5M pairs) and pin it identical to the driver-combiner
    branch — same distinct pair set, streaming all the way."""
    import ray.data

    import ocr_proofreader_ray.pipelines.dedup as dd

    base = " ".join(f"tok{i % 40}x{i % 7}" for i in range(120))
    rows = [{"doc_id": d, "text": base} for d in (1, 2, 3, 4)]
    rows += [{"doc_id": d, "text": " ".join(f"u{d}w{i}" for i in range(60))}
             for d in range(5, 40)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    # three-way pin across both size gates: the bands-driver fast path
    # (default at this size), the exchange + driver pair combiner, and the
    # fully distributed exchange + Ray pair dedup must emit one pair set
    small = dd._candidate_pairs(dd._band_rows(ds, 3)).to_pandas()
    monkeypatch.setattr(dd, "_BANDS_DRIVER_MAX", 0)
    mid = dd._candidate_pairs(dd._band_rows(ds, 3)).to_pandas()
    monkeypatch.setattr(dd, "_PAIRS_DRIVER_MAX", 0)
    big = dd._candidate_pairs(dd._band_rows(ds, 3)).to_pandas()

    canon = lambda df: sorted(map(tuple, df[["doc_a", "doc_b"]].to_numpy()))
    assert canon(small) == canon(mid) == canon(big)
    assert len(small) == len(set(canon(small)))  # globally distinct
    assert (1, 2) in canon(small)


def test_verify_pairs_streaming_shuffle_threshold_joins(ray_session,
                                                        monkeypatch):
    """Force the fully-streaming verify plan (Dataset pairs + Ray-side size
    joins + threshold map) and pin it equal to the gather plan."""
    import ray.data

    import ocr_proofreader_ray.pipelines.dedup as dd

    base = " ".join(f"tok{i % 40}x{i % 7}" for i in range(120))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base.replace("tok3x3", "changed", 1)},
        {"doc_id": 3, "text": " ".join(f"zzz{i}" for i in range(120))},
        {"doc_id": 4, "text": base},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = dd._candidate_pairs(dd._band_rows(ds, 3))

    def shingle_elements(text):
        return [h - (1 << 63) for h in shingles((text or "").split(), n=3)]

    want = dd._verify_pairs(ds, pairs, shingle_elements,
                            thr_num=500_000, thr_den=1_000_000)
    monkeypatch.setattr(dd, "_GATHER_MAX_ELEMENTS", 0)
    got = dd._verify_pairs(ds, pairs, shingle_elements,
                           thr_num=500_000, thr_den=1_000_000)
    got = got.to_pandas()    # always a Dataset since r05
    want = want.to_pandas()
    canon = lambda df: sorted(map(tuple, df.to_numpy()))
    assert canon(got) == canon(want)
    assert any(r[:2] == (1, 4) for r in canon(got))
