"""Incremental (cross-snapshot) MinHash dedup.

The 100-TB-relevant shape of near-dup dedup is not "dedup one frozen
corpus" — it is "a new crawl snapshot arrives every week; drop its docs
that duplicate the ALREADY-RETAINED corpus (or each other) WITHOUT
reprocessing the corpus".  The state that makes this possible is the
**band index**: the (doc_id, band_id, band_key) LSH rows of every retained
document, persisted as append-only parquet under a work dir.  Per
increment the plan is:

1. band the new docs (`dedup._band_rows` — the exact machinery the batch
   path uses, so incremental and batch agree on candidate generation);
2. SEMI-FILTER the index to buckets touched by the new docs — the new
   band-key set is increment-sized and broadcasts (or Blooms, same
   size-gate as elsewhere); the corpus-sized index streams through ONE
   `is_in` filter, nothing corpus-sized shuffles;
3. candidate pairs over (touched-index ∪ new bands) via the shared
   star-capped bucket pair generation, kept only where at least one side
   is new;
4. exact verification via the shared adaptive gather/shuffle element-join
   plan (`dedup._verify_pairs`) over (retained-corpus ∪ increment) docs —
   the element explode is candidate-only, so old docs are touched only if
   an LSH bucket put them in a pair;
5. cluster the verified pairs: a component containing ANY retained old
   doc drops all of its new members; an all-new component keeps its min
   doc_id.  With increments arriving in ascending doc_id order this
   reproduces the batch keep rule (rep = component min) whenever the
   connecting pairs survive — the planted-fixture equivalence is pinned
   by tests; chains that run EXCLUSIVELY through a doc the bootstrap
   itself dropped can differ (greedy-incremental semantics, the standard
   tradeoff for this plan);
6. append the kept new docs' band rows to the index — append-only files,
   so a failed increment re-runs cleanly.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ocr_proofreader_ray.ops.agg import _arrow_blocks, grouped_agg
from ocr_proofreader_ray.ops.join import broadcast_semi_anti
from ocr_proofreader_ray.pipelines.dedup import (
    _band_rows,
    _candidate_pairs,
    _verify_pairs,
    dedup_clusters,
)
from ocr_proofreader_ray.functions.sketches import shingles

_INDEX_SUBDIR = "band_index"

# above this many distinct increment band keys the touched-bucket semi
# filter ships a fixed-size Bloom instead of the exact key set (same gate
# family as dedup._BLOOM_SEMI_THRESHOLD)
_KEYS_BLOOM_THRESHOLD = 2_000_000

# stage wall-times of the most recent q_dedup_incremental run (VERDICT r04
# next-steps #3: the slowest bench-slice query gets a per-stage split the
# bench JSON can report); written by the timed sections below, read by
# bench.py — keys are <phase>_<stage>_sec
_LAST_TIMINGS: dict[str, float] = {}


def last_stage_timings() -> dict[str, float]:
    """Per-stage wall-times (seconds) of the most recent incremental-dedup
    query run in this process; empty until one runs."""
    return dict(_LAST_TIMINGS)


@contextmanager
def _timed(timings: dict | None, key: str):
    if timings is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        timings[key] = round(time.perf_counter() - t0, 4)


def _index_dir(work_dir: str) -> str:
    d = os.path.join(work_dir, _INDEX_SUBDIR)
    os.makedirs(d, exist_ok=True)
    return d


def _write_index_batch(work_dir: str, bands: "ray.data.Dataset",
                       batch_tag: str) -> None:
    """Write one batch of band rows as new parquet files (append-only: a
    re-run of a failed increment overwrites its own tag, nothing else)."""
    import shutil

    out = os.path.join(_index_dir(work_dir), batch_tag)
    if os.path.exists(out):
        shutil.rmtree(out)
    # consolidate files: the default one-file-per-block write fragments a
    # batch into ~30 KB files whose open/footer overhead dominates the
    # increment's index re-read (the r04 bench's slowest-slice stage)
    bands.select_columns(["doc_id", "band_id", "band_key", "part"]) \
        .write_parquet(out, min_rows_per_file=500_000)


def _element_rows(shingle_n: int):
    def fn(text: str):
        return [h - (1 << 63)
                for h in shingles((text or "").split(), n=shingle_n)]
    return fn


def bootstrap_index(docs: "ray.data.Dataset", work_dir: str,
                    shingle_n: int = 3,
                    jaccard_threshold: float = 0.5,
                    timings: dict | None = None) -> pa.Array:
    """Batch-dedup the initial corpus, persist the retained docs' band
    index under ``work_dir``; returns the dropped doc ids (the keep set is
    everything else — callers keep their corpus store and drop these)."""
    from ocr_proofreader_ray.pipelines.dedup import minhash_lsh_pairs

    with _timed(timings, "bootstrap_band_sec"):
        docs = docs.materialize()
        # band ONCE: minhash signatures dominate banding cost, and the same
        # materialized band rows serve pair generation and the index write
        bands = _band_rows(docs, shingle_n).materialize()
    with _timed(timings, "bootstrap_verify_sec"):
        pairs = minhash_lsh_pairs(docs, shingle_n=shingle_n,
                                  jaccard_threshold=jaccard_threshold,
                                  bands=bands).materialize()
    with _timed(timings, "bootstrap_cluster_sec"):
        clusters = dedup_clusters(pairs)
        drop = clusters.filter(
            pc.not_equal(clusters.column("doc_id"),
                         clusters.column("rep_id"))
        ).column("doc_id").combine_chunks()
    with _timed(timings, "bootstrap_index_write_sec"):
        if len(drop):
            bands = broadcast_semi_anti(bands, drop, on="doc_id", anti=True)
        _write_index_batch(work_dir, bands, "bootstrap")
    return drop


def dedup_increment(
    new_docs: "ray.data.Dataset",
    corpus_docs: "ray.data.Dataset",
    work_dir: str,
    batch_tag: str,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    timings: dict | None = None,
) -> dict:
    """Dedup ``new_docs`` against the persisted band index (and itself).

    ``corpus_docs`` is the retained corpus (doc_id, text) — read only for
    the candidate-only verification explode.  Returns a dict with the kept
    new ids plus drop lineage counts, and appends the kept band rows to
    the index under ``batch_tag``.
    """
    with _timed(timings, "inc_band_sec"):
        new_docs = new_docs.materialize()  # banded + verified + id-scanned
        if new_docs.count() == 0:
            # empty increment: nothing to dedup, nothing to index
            return {
                "keep_ids": pa.array([], pa.int64()),
                "n_new": 0,
                "n_dropped_vs_corpus": 0,
                "n_dropped_within_increment": 0,
            }
        new_bands = _band_rows(new_docs, shingle_n).materialize()

        new_ids = pa.concat_tables(
            ray.get(new_docs.select_columns(["doc_id"]).to_arrow_refs()),
            promote_options="default",
        ).column("doc_id").combine_chunks().unique()
        new_id_set = set(new_ids.to_pylist())

        # 2. touched index buckets: the new band-key set is increment-sized
        # (32 keys/doc); over-selection from a cross-band key collision only
        # admits old rows whose old-old pairs are filtered out below
        new_keys = pa.concat_tables(
            ray.get(new_bands.select_columns(["band_key"]).to_arrow_refs()),
            promote_options="default",
        ).column("band_key").combine_chunks().unique()
    _t_pairs0 = time.perf_counter()
    index = ray.data.read_parquet(_index_dir(work_dir))
    if len(new_keys) > _KEYS_BLOOM_THRESHOLD:
        # huge increment: ship a fixed-size Bloom instead of the exact key
        # set; false positives only admit old rows whose old-old pairs are
        # dropped below — results identical, waste bounded
        from ocr_proofreader_ray.functions.bloom import BloomFilter

        bf = BloomFilter(len(new_keys), fpp=0.01)
        bf.add_column(new_keys)
        bref = ray.put(bf)

        def bloom_touch(b: pa.Table) -> pa.Table:
            f = ray.get(bref)
            return b.filter(pa.array(f.contains_column(b.column("band_key"))))

        touched = index.map_batches(bloom_touch, batch_format="pyarrow",
                                    zero_copy_batch=True)
    else:
        touched = broadcast_semi_anti(index, new_keys, on="band_key")

    # 3. shared star-capped pair generation; keep pairs touching a new doc
    # (new_ids is increment-sized — safe to close over and ship per task)
    pairs = _candidate_pairs(touched.union(new_bands))

    def touches_new(b: pa.Table) -> pa.Table:
        return b.filter(pc.or_(
            pc.is_in(b.column("doc_a"), value_set=new_ids),
            pc.is_in(b.column("doc_b"), value_set=new_ids)))

    pairs = pairs.map_batches(touches_new, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    if timings is not None:
        # spans index read + touched-bucket semi filter + candidate pair
        # generation (_candidate_pairs materializes its output eagerly)
        timings["inc_pairs_sec"] = round(time.perf_counter() - _t_pairs0, 4)

    # 4. exact verification over (corpus ∪ increment); explode is
    # candidate-only on both sides
    thr_num = int(jaccard_threshold * 1_000_000)
    with _timed(timings, "inc_verify_sec"):
        verified = _verify_pairs(
            corpus_docs.select_columns(["doc_id", "text"])
            .union(new_docs.select_columns(["doc_id", "text"])),
            pairs, _element_rows(shingle_n),
            thr_num=thr_num, thr_den=1_000_000).materialize()

    # 5. component rule: any old member -> drop all new members;
    # all-new component -> keep min
    with _timed(timings, "inc_cluster_sec"):
        clusters = dedup_clusters(verified)
    comp: dict[int, list[int]] = {}
    comp_has_old: dict[int, bool] = {}
    for d, r in zip(clusters.column("doc_id").to_pylist(),
                    clusters.column("rep_id").to_pylist()):
        if d in new_id_set:
            comp.setdefault(r, []).append(d)
        else:
            comp_has_old[r] = True
    dropped_vs_corpus: list[int] = []
    dropped_within: list[int] = []
    for r, members in comp.items():
        if comp_has_old.get(r):
            dropped_vs_corpus.extend(members)
        else:
            dropped_within.extend(m for m in members if m != min(members))
    drop_set = set(dropped_vs_corpus) | set(dropped_within)
    keep_ids = pa.array(
        sorted(i for i in new_id_set if i not in drop_set), pa.int64())

    # 6. append kept band rows (append-only, re-runnable per tag)
    with _timed(timings, "inc_index_write_sec"):
        _write_index_batch(
            work_dir, broadcast_semi_anti(new_bands, keep_ids, on="doc_id"),
            batch_tag)
    return {
        "keep_ids": keep_ids,
        "n_new": len(new_id_set),
        "n_dropped_vs_corpus": len(dropped_vs_corpus),
        "n_dropped_within_increment": len(dropped_within),
    }


from ocr_proofreader_ray.pipelines.registry import register  # noqa: E402
from ocr_proofreader_ray.pipelines.relational import t  # noqa: E402


@register("q_dedup_incremental")  # sketch-based incremental plan: rows-only
def q_dedup_incremental(sf_dir: str):
    """Cross-snapshot dedup demonstration over the documents table: the
    lower doc_id half bootstraps the corpus + band index, the upper half
    arrives as a crawl increment and dedups against the index WITHOUT
    re-banding the retained corpus.  Returns the final keep list with the
    phase each survivor was admitted in."""
    import shutil

    from ray.data.aggregate import Max, Min

    tm: dict[str, float] = {}
    docs = t(sf_dir, "documents", ["doc_id", "text"])
    with _timed(tm, "minmax_scan_sec"):
        # id-only read: the min/max split point must not pay a text scan
        stats = t(sf_dir, "documents", ["doc_id"]).aggregate(
            Min("doc_id"), Max("doc_id"))
    cut = (int(stats["min(doc_id)"]) + int(stats["max(doc_id)"])) // 2

    def below(b: pa.Table) -> pa.Table:
        return b.filter(pc.less_equal(b.column("doc_id"), cut))

    def above(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("doc_id"), cut))

    old = docs.map_batches(below, batch_format="pyarrow", zero_copy_batch=True)
    new = docs.map_batches(above, batch_format="pyarrow", zero_copy_batch=True)

    work_dir = os.path.join(
        "/tmp/opr_incremental", os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(work_dir, ignore_errors=True)

    with _timed(tm, "split_sec"):
        old = old.materialize()
    drop_old = bootstrap_index(old, work_dir, timings=tm)
    with _timed(tm, "kept_old_sec"):
        kept_old = old
        if len(drop_old):
            kept_old = broadcast_semi_anti(old, drop_old, on="doc_id",
                                           anti=True)
        kept_old = kept_old.materialize()

    res = dedup_increment(new, kept_old, work_dir, "inc-1", timings=tm)
    _LAST_TIMINGS.clear()
    _LAST_TIMINGS.update(tm)

    # stream the (corpus-sized) keep list out as a Dataset — only the
    # increment's keep ids (increment-sized by assumption) sit on the driver
    def tag(phase: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b.column("doc_id"),
                "phase": pa.array([phase] * b.num_rows, pa.string()),
            })
        return fn

    old_part = kept_old.select_columns(["doc_id"]).map_batches(
        tag("bootstrap"), batch_format="pyarrow", zero_copy_batch=True)
    new_part = ray.data.from_arrow(pa.table({
        "doc_id": res["keep_ids"],
        "phase": pa.array(["inc-1"] * len(res["keep_ids"]), pa.string()),
    }))
    return old_part.union(new_part)


# ---------------------------------------------------------------------------
# incremental EXACT dedup (persisted content-hash index) — the cheap sibling
# of the banded plan above: a weekly crawl drops byte-identical re-crawls
# against the retained corpus without re-hashing it
# ---------------------------------------------------------------------------

_EXACT_INDEX_SUBDIR = "exact_index"


def _exact_index_dir(work_dir: str) -> str:
    d = os.path.join(work_dir, _EXACT_INDEX_SUBDIR)
    os.makedirs(d, exist_ok=True)
    return d


def _write_exact_index_batch(work_dir: str, keys: "ray.data.Dataset",
                             batch_tag: str) -> None:
    """Append one batch of (h1, h2) key rows (append-only per tag, same
    re-run contract as the band index)."""
    import shutil

    out = os.path.join(_exact_index_dir(work_dir), batch_tag)
    if os.path.exists(out):
        shutil.rmtree(out)
    keys.select_columns(["h1", "h2"]).write_parquet(
        out, min_rows_per_file=500_000)


def bootstrap_exact_index(docs: "ray.data.Dataset", work_dir: str) -> dict:
    """Exact-dedup the initial corpus (keep min doc_id per 128-bit content
    key — `dedup.content_keys_batch`), persist the retained keys, return
    {"keep": (h1, h2, doc_id) Dataset}."""
    from ocr_proofreader_ray.pipelines.dedup import content_keys_batch

    keyed = docs.map_batches(content_keys_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
    # corpus-sized distinct: Ray hash exchange (the bench-scale driver
    # combiner would be fine too, but bootstrap is a one-off whose output
    # is immediately persisted — no reason to route it through the driver)
    keep = grouped_agg(keyed, ["h1", "h2"],
                       [("doc_id", "min", "doc_id")], final="ray",
                       ).materialize()
    _write_exact_index_batch(work_dir, keep, "bootstrap")
    return {"keep": keep}


def dedup_exact_increment(new_docs: "ray.data.Dataset", work_dir: str,
                          batch_tag: str) -> dict:
    """Drop increment docs whose content key is already in the persisted
    exact index (or duplicates a smaller doc_id within the increment).

    Scale shape: the corpus-sized index STREAMS through one h1-lane
    ``is_in`` filter against the broadcast increment key set; only the
    matched key rows (duplicate-bounded + ~|index|·|new|/2^64 expected
    h1-lane false positives) gather, and the exact (h1, h2) anti join of
    the increment against them is a vectorized polars join per batch.
    Nothing corpus-sized ever concentrates.  Returns the kept
    (doc_id) rows and drop counts; appends kept keys under ``batch_tag``.
    """
    import polars as pl

    from ocr_proofreader_ray.pipelines.dedup import content_keys_batch

    keyed = new_docs.map_batches(content_keys_batch, batch_format="pyarrow",
                                 zero_copy_batch=True)
    # within-increment collapse (increment-sized: driver combiner)
    new_keys = grouped_agg(keyed, ["h1", "h2"],
                           [("doc_id", "min", "doc_id")])
    n_new_distinct = new_keys.num_rows
    if n_new_distinct == 0:
        return {"keep": new_keys.select(["doc_id", "h1", "h2"]),
                "n_dropped_vs_corpus": 0, "n_dropped_within": 0}

    h1_set = new_keys.column("h1").combine_chunks()
    index = ray.data.read_parquet(_exact_index_dir(work_dir))
    hit_ref = ray.put(pc.unique(h1_set))

    def h1_hits(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("h1"), value_set=ray.get(hit_ref)))

    matched = index.map_batches(h1_hits, batch_format="pyarrow",
                                zero_copy_batch=True)
    matched_tbl = pa.concat_tables(
        _arrow_blocks(matched.materialize()) or
        [pa.table({"h1": pa.array([], pa.int64()),
                   "h2": pa.array([], pa.int64())})],
        promote_options="default")

    kept = pl.from_arrow(new_keys).join(
        pl.from_arrow(matched_tbl.select(["h1", "h2"])),
        on=["h1", "h2"], how="anti").to_arrow()
    n_dropped_vs_corpus = n_new_distinct - kept.num_rows
    n_dropped_within = (
        # rows that collapsed into another increment row's key
        # (input rows minus distinct keys)
        int(new_docs.count()) - n_new_distinct)

    _write_exact_index_batch(
        work_dir, ray.data.from_arrow(kept.select(["h1", "h2"])), batch_tag)
    return {"keep": kept, "n_dropped_vs_corpus": n_dropped_vs_corpus,
            "n_dropped_within": n_dropped_within}


@register(
    "q_dedup_exact_incremental",
    sql="""
    WITH cut AS (
      SELECT (min(doc_id) + max(doc_id)) // 2 AS c FROM documents),
    old_keep AS (
      SELECT min(doc_id) AS doc_id, text FROM documents
      WHERE doc_id <= (SELECT c FROM cut) GROUP BY text),
    new_keep AS (
      SELECT min(doc_id) AS doc_id FROM documents
      WHERE doc_id > (SELECT c FROM cut)
        AND text NOT IN (SELECT text FROM old_keep)
      GROUP BY text)
    SELECT doc_id, 'bootstrap' AS phase FROM old_keep
    UNION ALL
    SELECT doc_id, 'inc-1' AS phase FROM new_keep
    """,
)
def q_dedup_exact_incremental(sf_dir: str):
    """Cross-snapshot EXACT dedup over the documents table (lower doc_id
    half = retained corpus, upper half = crawl increment), via the
    persisted content-key index — the byte-identical-re-crawl filter every
    crawl pipeline runs before the fuzzier near-dup passes.

    Hash-exact DuckDB oracle: with increments arriving in ascending doc_id
    order, incremental exact dedup equals batch exact dedup (global min
    doc_id per text), which SQL expresses directly; engine/oracle equality
    additionally assumes no 128-bit content-key collision (probability
    ~n²/2^128-ish — see q_dedup_exact's strength note)."""
    import shutil

    from ray.data.aggregate import Max, Min

    docs = t(sf_dir, "documents", ["doc_id", "text"])
    stats = t(sf_dir, "documents", ["doc_id"]).aggregate(
        Min("doc_id"), Max("doc_id"))
    cut = (int(stats["min(doc_id)"]) + int(stats["max(doc_id)"])) // 2

    def below(b: pa.Table) -> pa.Table:
        return b.filter(pc.less_equal(b.column("doc_id"), cut))

    def above(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("doc_id"), cut))

    old = docs.map_batches(below, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    # materialized: the increment is both counted (within-drop lineage)
    # and hashed — unmaterialized it would re-run the filter per consumer
    new = docs.map_batches(above, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    work_dir = os.path.join(
        "/tmp/opr_exact_incremental",
        os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(work_dir, ignore_errors=True)

    boot = bootstrap_exact_index(old, work_dir)
    res = dedup_exact_increment(new, work_dir, "inc-1")

    def tag(phase: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b.column("doc_id"),
                "phase": pa.array([phase] * b.num_rows, pa.string()),
            })
        return fn

    old_part = boot["keep"].select_columns(["doc_id"]).map_batches(
        tag("bootstrap"), batch_format="pyarrow", zero_copy_batch=True)
    new_part = ray.data.from_arrow(tag("inc-1")(res["keep"]))
    return old_part.union(new_part)
