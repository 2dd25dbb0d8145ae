"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship two-pass extraction pipeline: synthesizes a
Common-Crawl-style ``pages`` table (url, warc_ts, html, text, lang) from the
sf0.001 ``documents`` texts (deterministic, no external data — FIXTURES.md
§1), then runs read → extract_main_text (stateless Arrow tasks) →
dictionary groupby (pass 1) → Corrector actor pool (pass 2) and returns the
extracted Dataset.

``queries()`` / ``oracle_sql()`` — the full registered operator surface
(SURVEY.md §2.B + dedup/similarity/text-analysis), DuckDB-checked where
SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_SF_DIR = "/root/testdata/sf0.001"
_ENTRY_WORK = "/tmp/opr_entry"


def _ensure_pages(sf_dir: str, out_dir: str) -> str:
    """Deterministically synthesize the pages table from documents.text.
    The cache marker carries the source parquet's (size, mtime) so a
    driver-side testdata regeneration between rounds rebuilds the pages."""
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    fingerprint = f"{st.st_size}:{int(st.st_mtime)}"
    done = os.path.join(out_dir, ".done")
    fresh = False
    if os.path.exists(done):
        with open(done) as f:
            fresh = f.read().strip() == fingerprint
    if not fresh:
        import shutil

        import pyarrow.parquet as pq

        from fixtures.gen_pages import generate_pages

        shutil.rmtree(out_dir, ignore_errors=True)
        docs = pq.read_table(src, columns=["lang", "text"])
        clean = list(zip(docs.column("lang").to_pylist(),
                         docs.column("text").to_pylist()))
        generate_pages(out_dir, n_docs=len(clean), seed=7, clean_texts=clean,
                       min_count=8, strict=False, n_files=4)
        with open(done, "w") as f:
            f.write(fingerprint)
    return out_dir


def entry() -> Any:
    """Flagship pipeline on pages synthesized from /root/testdata/sf0.001."""
    import shutil

    from ocr_proofreader_ray.config import ExtractionConfig
    from ocr_proofreader_ray.pipelines.extraction import run_extraction

    pages_dir = _ensure_pages(_SF_DIR, f"{_ENTRY_WORK}/pages")
    work_dir = f"{_ENTRY_WORK}/work"
    shutil.rmtree(work_dir, ignore_errors=True)  # fresh run each smoke check
    cfg = ExtractionConfig(
        input_paths=f"{pages_dir}/pages-*.parquet",
        work_dir=work_dir,
        files_per_chunk=0,  # single chunk at smoke scale
    )
    return run_extraction(cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from ocr_proofreader_ray.pipelines.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names; exact-integer arithmetic so value hashes match bit-for-bit)."""
    from ocr_proofreader_ray.pipelines.registry import all_oracles

    return all_oracles()
