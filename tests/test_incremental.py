"""Incremental cross-snapshot MinHash dedup (pipelines/incremental.py):
planted duplicates across and within increments, batch equivalence on the
planted fixture, idempotent re-increment of copies, index growth."""

import numpy as np
import pyarrow as pa
import ray

from ocr_proofreader_ray.pipelines.dedup import dedup_clusters, minhash_lsh_pairs
from ocr_proofreader_ray.pipelines.incremental import (
    bootstrap_index,
    dedup_increment,
)


def _text(rng, n_words=30, vocab=1000):
    return " ".join(f"w{rng.integers(0, vocab)}" for _ in range(n_words))


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(3)


def _fixture():
    rng = np.random.default_rng(42)
    texts = {i: _text(rng) for i in range(1, 11)}
    old = [(i, texts[i]) for i in range(1, 11)]
    old.append((11, texts[1]))          # in-bootstrap duplicate of doc 1
    t22 = _text(rng)
    new = [
        (20, texts[2]),                 # duplicate of retained corpus doc
        (21, t22), (22, t22),           # duplicate pair within increment
        (23, _text(rng)),               # unique
        (24, texts[1]),                 # dup of doc 1 via DROPPED doc 11
    ]
    return old, new


def test_increment_drops_and_keeps(ray_session, tmp_path):
    old, new = _fixture()
    work = str(tmp_path / "w1")
    drop_old = bootstrap_index(_docs(old), work)
    assert drop_old.to_pylist() == [11]

    kept_old = _docs([r for r in old if r[0] != 11])
    res = dedup_increment(_docs(new), kept_old, work, "inc-1")
    assert res["keep_ids"].to_pylist() == [21, 23]
    assert res["n_new"] == 5
    assert res["n_dropped_vs_corpus"] == 2      # 20 and 24
    assert res["n_dropped_within_increment"] == 1  # 22

    # equivalence with the batch plan on the planted fixture
    pairs = minhash_lsh_pairs(_docs(old + new), shingle_n=3,
                              jaccard_threshold=0.5)
    clusters = dedup_clusters(pairs)
    batch_drop = {d for d, r in zip(clusters.column("doc_id").to_pylist(),
                                    clusters.column("rep_id").to_pylist())
                  if d != r}
    batch_keep = sorted({r[0] for r in old + new} - batch_drop)
    inc_keep = sorted([r[0] for r in old if r[0] != 11]
                      + res["keep_ids"].to_pylist())
    assert inc_keep == batch_keep


def test_second_increment_of_copies_all_dropped(ray_session, tmp_path):
    old, new = _fixture()
    work = str(tmp_path / "w2")
    bootstrap_index(_docs(old), work)
    kept_old = _docs([r for r in old if r[0] != 11])
    res1 = dedup_increment(_docs(new), kept_old, work, "inc-1")

    # copies of the SURVIVORS of increment 1 under fresh ids: the index
    # grew, so every copy must now be dropped vs the corpus
    by_id = dict(new)
    copies = [(30, by_id[21]), (31, by_id[23])]
    corpus2 = _docs([r for r in old if r[0] != 11]
                    + [r for r in new if r[0] in res1["keep_ids"].to_pylist()])
    res2 = dedup_increment(_docs(copies), corpus2, work, "inc-2")
    assert res2["keep_ids"].to_pylist() == []
    assert res2["n_dropped_vs_corpus"] == 2


def test_disjoint_increment_all_kept(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    old = [(i, _text(rng)) for i in range(1, 6)]
    new = [(i, _text(rng)) for i in range(10, 15)]
    work = str(tmp_path / "w3")
    bootstrap_index(_docs(old), work)
    res = dedup_increment(_docs(new), _docs(old), work, "inc-1")
    assert res["keep_ids"].to_pylist() == [10, 11, 12, 13, 14]
    assert res["n_dropped_vs_corpus"] == 0
    assert res["n_dropped_within_increment"] == 0


def test_bloom_touch_path_equals_broadcast(ray_session, tmp_path, monkeypatch):
    import ocr_proofreader_ray.pipelines.incremental as inc

    old, new = _fixture()
    results = {}
    for label, thresh in [("broadcast", 10**9), ("bloom", 0)]:
        monkeypatch.setattr(inc, "_KEYS_BLOOM_THRESHOLD", thresh)
        work = str(tmp_path / label)
        bootstrap_index(_docs(old), work)
        kept_old = _docs([r for r in old if r[0] != 11])
        res = dedup_increment(_docs(new), kept_old, work, "inc-1")
        results[label] = res["keep_ids"].to_pylist()
    assert results["broadcast"] == results["bloom"] == [21, 23]


def test_empty_increment_is_noop(ray_session, tmp_path):
    import numpy as np

    rng = np.random.default_rng(1)
    old = [(i, _text(rng)) for i in range(1, 6)]
    work = str(tmp_path / "w4")
    bootstrap_index(_docs(old), work)
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    res = dedup_increment(empty, _docs(old), work, "empty-inc")
    assert res["keep_ids"].to_pylist() == []
    assert res["n_new"] == 0


def test_exact_incremental_planted_fixture(ray_session, tmp_path):
    """Incremental exact dedup: drop byte-identical re-crawls against the
    persisted key index AND within the increment; keep everything else."""
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.incremental import (
        q_dedup_exact_incremental,
    )

    rows = [
        # corpus half (doc_id <= (1+20)//2 = 10)
        {"doc_id": 1, "text": "alpha body"},
        {"doc_id": 2, "text": "alpha body"},     # in-corpus exact dup of 1
        {"doc_id": 3, "text": "beta body"},
        # increment half
        {"doc_id": 11, "text": "alpha body"},    # re-crawl: drops vs corpus
        {"doc_id": 12, "text": "gamma body"},
        {"doc_id": 13, "text": "gamma body"},    # within-increment dup of 12
        {"doc_id": 20, "text": "delta body"},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = {(r["doc_id"], r["phase"])
           for r in q_dedup_exact_incremental(str(tmp_path)).take_all()}
    assert out == {(1, "bootstrap"), (3, "bootstrap"),
                   (12, "inc-1"), (20, "inc-1")}
    # re-run (same tag) is idempotent: the per-tag index dir overwrites
    out2 = {(r["doc_id"], r["phase"])
            for r in q_dedup_exact_incremental(str(tmp_path)).take_all()}
    assert out2 == out


def test_exact_increment_appends_index(ray_session, tmp_path):
    """A second increment must dedup against keys the FIRST increment
    admitted (the append-only index grows per tag)."""
    from ocr_proofreader_ray.pipelines.incremental import (
        bootstrap_exact_index,
        dedup_exact_increment,
    )

    def _docs(rows):
        return ray.data.from_arrow(pa.Table.from_pylist(
            [{"doc_id": d, "text": t} for d, t in rows]))

    work = str(tmp_path / "w")
    bootstrap_exact_index(_docs([(1, "a"), (2, "b")]), work)
    r1 = dedup_exact_increment(_docs([(10, "c"), (11, "a")]), work, "inc-1")
    assert sorted(r1["keep"].column("doc_id").to_pylist()) == [10]
    assert r1["n_dropped_vs_corpus"] == 1
    # "c" is now retained: a later increment re-crawling it must drop it
    r2 = dedup_exact_increment(_docs([(20, "c"), (21, "d")]), work, "inc-2")
    assert sorted(r2["keep"].column("doc_id").to_pylist()) == [21]
    assert r2["n_dropped_vs_corpus"] == 1
    assert r2["n_dropped_within"] == 0
