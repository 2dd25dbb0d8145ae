"""Deduplication operators over the ``documents`` table (driver brief:
"exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup").

Scale notes (100 TB):
* exact dedup shuffles only (hash, doc_id) pairs, never document text;
* MinHash-LSH shuffles (band_id, band_key, doc_id) triples — the classic
  shingle→minhash→band→bucket-groupby plan; candidate verification joins
  token sets back by doc_id (here: broadcast, because the sf tables are
  small; the large-scale path is a shuffle join on doc_id — see docstring of
  ``q_dedup_minhash``);
* n-gram Jaccard is restricted to (lang, source) co-groups — an explicit
  partitioning assumption that keeps the pairwise work bounded per group;
* embedding near-dup co-groups by label (same assumption).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from ocr_proofreader_ray.functions.sketches import (
    MinHasher,
    shingles,
    simhash64,
    stable_hash64,
)
from ocr_proofreader_ray.ops.agg import grouped_agg
from ocr_proofreader_ray.pipelines.registry import register
from ocr_proofreader_ray.pipelines.relational import t


# ---------------------------------------------------------------------------
# B12 — exact dedup: hash-partition on content hash, keep min doc_id
# ---------------------------------------------------------------------------

@register(
    "q_dedup_exact",
    sql="SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
)
def q_dedup_exact(sf_dir: str):
    ds = t(sf_dir, "documents", ["doc_id", "text"])

    def hash_batch(b: pa.Table) -> pa.Table:
        hs = [hashlib.sha1(x.encode()).hexdigest()
              for x in b.column("text").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id"), "h": pa.array(hs)})

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (no SQL oracle — sketch-based)
# ---------------------------------------------------------------------------

_MINHASHER = MinHasher(num_perm=128)
_BANDS = 32  # 32 bands x 4 rows → catches Jaccard ≳ 0.5 with high recall


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    token_sets: dict[int, set[int]] | None = None,
) -> "ray.data.Dataset":
    """shingle → minhash → band → bucket-groupby → verified candidate pairs.

    ``token_sets`` (doc_id → shingle hashes) is broadcast for verification —
    valid while the candidate universe fits in memory; at 10^12-doc scale
    replace with a shuffle join of (pair, doc_id) against the shingle table.
    Output: (doc_a, doc_b, inter, uni) with 2*inter >= uni*2*threshold kept
    exactly (integer comparison: inter/uni >= thr ⇔ inter*K >= uni*thr*K).
    """

    rows_per_band = _MINHASHER.num_perm // _BANDS

    def to_bands(b: pa.Table) -> pa.Table:
        """One (doc_id, band_id, band_key, part) row per band per doc.

        Band keys are a vectorized FNV-1a fold of the band's signature rows
        (no per-band string hashing); ``part`` is a coarse bucket-preserving
        partition (same band_key -> same part) so the pair-generation stage
        runs over ~n_parts groups instead of one Python call per bucket.
        """
        doc_ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        n = len(doc_ids)
        sigs = np.empty((n, _MINHASHER.num_perm), dtype=np.uint64)
        for i, text in enumerate(texts):
            sh = shingles((text or "").split(), n=shingle_n)
            sigs[i] = _MINHASHER.signature(sh)
        bands_mat = sigs.reshape(n, _BANDS, rows_per_band)
        key = np.full((n, _BANDS), 0xCBF29CE484222325, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(rows_per_band):
                key = (key ^ bands_mat[:, :, r]) * np.uint64(0x100000001B3)
        flat_key = key.reshape(-1)
        return pa.table({
            "doc_id": pa.array(np.repeat(np.asarray(doc_ids, np.int64), _BANDS)),
            "band_id": pa.array(np.tile(np.arange(_BANDS, dtype=np.int32), n)),
            "band_key": pa.array((flat_key - (1 << 63)).view(np.int64)),
            "part": pa.array((flat_key % np.uint64(128)).astype(np.int32)),
        })

    bands = docs.map_batches(to_bands, batch_format="pyarrow", zero_copy_batch=True)

    sets_ref = ray.put(token_sets)
    thr_num = int(jaccard_threshold * 1_000_000)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one coarse partition — only buckets with
        >1 member survive the duplicated() prefilter, so the Python loop
        touches collision buckets only (rare)."""
        dup = g[g.duplicated(["band_id", "band_key"], keep=False)]
        out_a, out_b = [], []
        for _, ids in dup.groupby(["band_id", "band_key"], sort=False)["doc_id"]:
            u = np.unique(ids.to_numpy())
            if len(u) > 1:
                ia, ib = np.triu_indices(len(u), k=1)
                out_a.append(u[ia])
                out_b.append(u[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "doc_a": np.concatenate(out_a),
            "doc_b": np.concatenate(out_b),
        }).drop_duplicates()  # same pair from several bands in this part

    pairs = bands.groupby("part").map_groups(part_pairs, batch_format="pandas")
    # global pair dedup across partitions: tiny post-LSH volume -> combiner
    pairs_table = grouped_agg(pairs, ["doc_a", "doc_b"], [(None, "count", "n")])
    pairs = ray.data.from_arrow(pairs_table.select(["doc_a", "doc_b"]))

    def verify(b: pa.Table) -> pa.Table:
        sets = ray.get(sets_ref)
        rows = {"doc_a": [], "doc_b": [], "inter": [], "uni": []}
        for a_id, b_id in zip(b.column("doc_a").to_pylist(),
                              b.column("doc_b").to_pylist()):
            sa, sb = sets.get(a_id, set()), sets.get(b_id, set())
            inter = len(sa & sb)
            uni = len(sa | sb)
            if uni and inter * 1_000_000 >= thr_num * uni:
                rows["doc_a"].append(a_id)
                rows["doc_b"].append(b_id)
                rows["inter"].append(inter)
                rows["uni"].append(uni)
        return pa.table({
            "doc_a": pa.array(rows["doc_a"], pa.int64()),
            "doc_b": pa.array(rows["doc_b"], pa.int64()),
            "inter": pa.array(rows["inter"], pa.int64()),
            "uni": pa.array(rows["uni"], pa.int64()),
        })

    return pairs.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def _load_token_sets(sf_dir: str, shingle_n: int) -> dict[int, set[int]]:
    import pyarrow.parquet as pq

    table = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return {
        d: shingles((x or "").split(), n=shingle_n)
        for d, x in zip(table.column("doc_id").to_pylist(),
                        table.column("text").to_pylist())
    }


@register("q_dedup_minhash")  # sketch-based: no SQL oracle (rows-only check)
def q_dedup_minhash(sf_dir: str):
    docs = t(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(
        docs, shingle_n=3, jaccard_threshold=0.5,
        token_sets=_load_token_sets(sf_dir, 3),
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints + exact-fingerprint grouping (no SQL oracle)
# ---------------------------------------------------------------------------

@register("q_dedup_simhash")
def q_dedup_simhash(sf_dir: str):
    from collections import Counter

    docs = t(sf_dir, "documents", ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        sims = []
        for text in b.column("text").to_pylist():
            counts = Counter((text or "").split())
            sims.append(simhash64(counts) - (1 << 63))  # signed int64
        return pa.table({
            "doc_id": b.column("doc_id"),
            "simhash": pa.array(sims, pa.int64()),
        })

    fps = docs.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
    # group identical fingerprints → canonical representative per group
    return fps.groupby("simhash").aggregate(Min("doc_id", alias_name="rep_doc_id"))


# ---------------------------------------------------------------------------
# n-gram Jaccard within (lang, source) co-groups — SQL-oracle-checkable
# ---------------------------------------------------------------------------

@register(
    "q_dedup_ngram_jaccard",
    sql="""
    WITH sets AS (
        SELECT DISTINCT doc_id, lang, source, tok FROM (
            SELECT doc_id, lang, source,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        )
    ), sizes AS (
        SELECT doc_id, count(*) AS sz FROM sets GROUP BY doc_id
    ), inters AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM sets a JOIN sets b
          ON a.lang = b.lang AND a.source = b.source
         AND a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, inter, sa.sz + sb.sz - inter AS uni
    FROM inters
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE 10 * inter >= 9 * (sa.sz + sb.sz - inter)
    """,
)
def q_dedup_ngram_jaccard(sf_dir: str):
    """Unigram-set Jaccard >= 0.9 between docs of the same (lang, source).

    The co-group is the documented partitioning assumption: pairwise work is
    bounded per (lang, source) partition, and the exact integer comparison
    ``10*inter >= 9*uni`` is float-free on both engines.
    """
    docs = t(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].tolist()
        sets = [set((x or "").split()) for x in g["text"].tolist()]
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        rows = {"doc_a": [], "doc_b": [], "inter": [], "uni": []}
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                inter = len(sets[i] & sets[j])
                uni = len(sets[i] | sets[j])
                if uni and 10 * inter >= 9 * uni:
                    rows["doc_a"].append(ids[i])
                    rows["doc_b"].append(ids[j])
                    rows["inter"].append(inter)
                    rows["uni"].append(uni)
        return pd.DataFrame(rows, dtype="int64")

    return docs.groupby(["lang", "source"]).map_groups(
        group_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup within label co-groups (no SQL oracle: the exact
# pairwise float comparison is verified by tests/test_dedup.py instead)
# ---------------------------------------------------------------------------

@register("q_dedup_embedding")
def q_dedup_embedding(sf_dir: str, threshold: float = 0.99):
    emb = t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.asarray(g["vec_id"].tolist(), dtype=np.int64)
        mat = np.asarray([np.asarray(v, dtype=np.float64)
                          for v in g["embedding"].tolist()])
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        ai, bi = np.where(np.triu(cos >= threshold, k=1))
        return pd.DataFrame({
            "vec_a": ids[ai],
            "vec_b": ids[bi],
            "cos_milli": np.floor(cos[ai, bi] * 1000 + 0.5).astype(np.int64),
        })

    return emb.groupby("label").map_groups(group_pairs, batch_format="pandas")
