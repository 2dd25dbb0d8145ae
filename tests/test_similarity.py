"""ANN tests: LSH recall vs brute force, determinism of top-k."""

import pytest

SF = "/root/testdata/sf0.001"


def test_lsh_finds_query_and_returns_k(ray_session):
    # testdata embeddings are isotropic-random: no neighbor structure exists
    # for LSH to exploit, so assert mechanism (query found, k rows, scores
    # sorted), not recall — recall is asserted on clustered data below
    from ocr_proofreader_ray.pipelines.similarity import q_ann_lsh

    rows = q_ann_lsh(SF).to_pylist()
    assert rows[0]["vec_id"] == 0
    assert rows[0]["cos_micro"] == 1_000_000
    scores = [r["cos_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_lsh_recall_on_clustered_vectors(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.similarity import q_ann_lsh, q_ann_topk

    rng = np.random.RandomState(9)
    center = rng.standard_normal(64)
    cluster = center[None, :] + 0.15 * rng.standard_normal((20, 64))
    noise = rng.standard_normal((480, 64))
    mat = np.vstack([cluster, noise]).astype(np.float32)
    tab = pa.table({
        "vec_id": pa.array(range(500), pa.int64()),
        "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        "label": pa.array([0] * 500, pa.int32()),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    brute = [r["vec_id"] for r in q_ann_topk(str(tmp_path)).to_pylist()]
    lsh = [r["vec_id"] for r in q_ann_lsh(str(tmp_path)).to_pylist()]
    overlap = len(set(brute) & set(lsh))
    assert overlap >= 7, (brute, lsh)  # clustered neighbors must be recalled


def test_ivf_mechanism_and_recall(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.similarity import q_ann_ivf, q_ann_topk

    rng = np.random.RandomState(99)
    center = rng.standard_normal(64)
    cluster = center + 0.05 * rng.standard_normal((20, 64))
    noise = rng.standard_normal((480, 64))
    mat = np.vstack([cluster, noise]).astype(np.float32)
    tab = pa.table({
        "vec_id": pa.array(range(500), pa.int64()),
        "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        "label": pa.array([0] * 500, pa.int32()),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    brute = [r["vec_id"] for r in q_ann_topk(str(tmp_path)).to_pylist()]
    ivf = [r["vec_id"] for r in q_ann_ivf(str(tmp_path)).to_pylist()]
    assert len(ivf) == 10
    overlap = len(set(brute) & set(ivf))
    assert overlap >= 7, (brute, ivf)  # clustered neighbors share a cell
    # deterministic across runs (seedless systematic sample + Lloyd)
    again = [r["vec_id"] for r in q_ann_ivf(str(tmp_path)).to_pylist()]
    assert ivf == again


def test_ivf_training_sample_is_bounded(ray_session, tmp_path, monkeypatch):
    """VERDICT r02 #3: the IVF trainer's driver gather must be count-bounded
    — with the budget forced below the corpus size the hash sample thins
    deterministically and the query still returns a full, stable top-k."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ocr_proofreader_ray.pipelines.similarity as sim

    rng = np.random.RandomState(99)
    center = rng.standard_normal(64)
    cluster = center + 0.05 * rng.standard_normal((20, 64))
    noise = rng.standard_normal((480, 64))
    mat = np.vstack([cluster, noise]).astype(np.float32)
    tab = pa.table({
        "vec_id": pa.array(range(500), pa.int64()),
        "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        "label": pa.array([0] * 500, pa.int32()),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))

    monkeypatch.setattr(sim, "_IVF_TRAIN_MAX", 80)
    out = [r["vec_id"] for r in sim.q_ann_ivf(str(tmp_path)).to_pylist()]
    assert len(out) == 10
    again = [r["vec_id"] for r in sim.q_ann_ivf(str(tmp_path)).to_pylist()]
    assert out == again  # the thinned sample is deterministic

    # the keep threshold really thins to ~the budget (binomial spread)
    ids = np.arange(500, dtype=np.uint64)
    thresh = np.uint64(int(80 / 500 * float((1 << 64) - 1)))
    with np.errstate(over="ignore"):
        kept = (ids * np.uint64(0x9E3779B97F4A7C15) <= thresh).sum()
    assert 40 <= kept <= 130, kept


def test_topk_deterministic_across_runs(ray_session):
    from ocr_proofreader_ray.pipelines.similarity import q_ann_topk

    a = [(r["vec_id"], r["cos_micro"]) for r in q_ann_topk(SF).to_pylist()]
    b = [(r["vec_id"], r["cos_micro"]) for r in q_ann_topk(SF).to_pylist()]
    assert a == b


def test_kmeans_labels(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.similarity import (
        _train_centroids,
        q_kmeans_labels,
    )

    n_cells = 8
    out = q_kmeans_labels(SF, n_cells=n_cells).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    assert len(out) == emb.num_rows
    assert out["vec_id"].is_unique
    assert out["cell"].between(0, n_cells - 1).all()

    # every label is the true nearest centroid (naive L2 recomputation)
    cents = _train_centroids(SF, n_cells)
    mat = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float64)
    naive = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    by_id = dict(zip(emb.column("vec_id").to_pylist(), naive))
    assert all(by_id[v] == c for v, c in zip(out["vec_id"], out["cell"]))

    # determinism across runs
    out2 = q_kmeans_labels(SF, n_cells=n_cells).to_pandas()
    assert out.sort_values("vec_id").reset_index(drop=True).equals(
        out2.sort_values("vec_id").reset_index(drop=True))


def test_embedding_pca_matches_numpy_reference(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.pipelines.similarity import (
        _PCA_QUANT,
        q_embedding_pca,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    mat = np.asarray(t.column("embedding").to_pylist(), np.float64)
    q = np.floor(mat * _PCA_QUANT + 0.5)
    mu = q.mean(axis=0)
    cov = (q.T @ q) / len(q) - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    w = evecs[:, order].T.copy()
    for i in range(2):
        j = int(np.argmax(np.abs(w[i])))
        if w[i, j] < 0:
            w[i] = -w[i]
    want = (q - mu) @ w.T / _PCA_QUANT

    got = q_embedding_pca(sf).to_pandas().sort_values("vec_id")
    ids = t.column("vec_id").to_pylist()
    order_idx = np.argsort(ids)
    np.testing.assert_allclose(
        got[["pc1", "pc2"]].to_numpy(), want[order_idx], atol=1e-9)
    # projections onto orthonormal components preserve variance ordering
    assert got["pc1"].var() >= got["pc2"].var() - 1e-12
