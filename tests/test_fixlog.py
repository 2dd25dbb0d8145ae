"""Fix-log override layer (state/fixlog.py; VERDICT r01 #8 — reference
parity with the interactive tool's persisted accepted-corrections store)."""

import glob

import pyarrow.parquet as pq

from fixtures.gen_pages import generate_pages
from ocr_proofreader_ray.config import ExtractionConfig
from ocr_proofreader_ray.functions.spell import SpellCorrector
from ocr_proofreader_ray.pipelines.extraction import run_extraction
from ocr_proofreader_ray.state.fixlog import load_fixlog, save_fixlog


# -- unit: override semantics in the token policy ---------------------------

def test_override_beats_dictionary():
    sc = SpellCorrector({"cat": 100, "car": 50},
                        overrides={"cat": "car"})
    assert sc.transform_token("cat") == "car"      # dict word still overridden
    assert sc.transform_token("Cat.") == "Car."    # case + affixes preserved
    assert sc.transform_token("car") == "car"      # untouched tokens unchanged


def test_override_pins_verbatim_and_beats_garbage():
    # a pinned core suppresses both correction and the garbage filter
    sc = SpellCorrector({"word": 10}, overrides={"wrrd": "wrrd"})
    assert sc.transform_token("wrrd") == "wrrd"    # correction suppressed
    sc2 = SpellCorrector({"word": 10})
    assert sc2.transform_token("wrrd") == "word"   # without the pin it corrects


def test_fixlog_roundtrip(tmp_path):
    path = str(tmp_path / "fixlog.parquet")
    entries = {"en": {"teh": "the", "Hte": "the"}, "de": {"udn": "und"}}
    save_fixlog(entries, path)
    loaded = load_fixlog(path)
    assert loaded == {"en": {"teh": "the", "hte": "the"}, "de": {"udn": "und"}}
    assert load_fixlog(None) == {}
    assert load_fixlog(str(tmp_path / "missing.parquet")) == {}


# -- e2e: a logged decision survives resume and matches a fresh run ---------

def _run(pages_dir, work_dir, fix_log_path=None):
    cfg = ExtractionConfig(
        input_paths=sorted(glob.glob(f"{pages_dir}/pages-*.parquet")),
        work_dir=work_dir,
        files_per_chunk=2,
        fix_log_path=fix_log_path,
    )
    ds = run_extraction(cfg)
    return {r["url"]: r["extracted_text"] for r in ds.take_all()}


def test_fixlog_e2e_resume_and_invalidation(ray_session, tmp_path):
    pages = str(tmp_path / "pages")
    generate_pages(pages, n_docs=200, seed=13, n_files=4)

    # pick a token present in the golden output to override
    golden = pq.read_table(f"{pages}/golden_extracted.parquet")
    text0 = golden.column("extracted_text").to_pylist()[0]
    lang0 = golden.column("lang").to_pylist()[0]
    victim = next(t for t in text0.split() if t.isalpha() and len(t) > 4).lower()

    log_path = str(tmp_path / "fixlog.parquet")
    save_fixlog({lang0: {victim: "zzzfixed"}}, log_path)

    base = _run(pages, str(tmp_path / "work_nolog"))
    fresh = _run(pages, str(tmp_path / "work_log"), log_path)
    # the logged decision changed output where the token occurs
    assert base != fresh
    assert any("zzzfixed" in t for t in fresh.values())
    assert not any("zzzfixed" in t for t in base.values())

    # resume with the same log: all chunks skip, output byte-identical
    resumed = _run(pages, str(tmp_path / "work_log"), log_path)
    assert resumed == fresh

    # editing the log invalidates pass-2: resumed run == fresh run with log2
    save_fixlog({lang0: {victim: "qqqother"}}, log_path)
    edited = _run(pages, str(tmp_path / "work_log"), log_path)
    fresh2 = _run(pages, str(tmp_path / "work_log2"), log_path)
    assert edited == fresh2
    assert any("qqqother" in t for t in edited.values())
    assert not any("zzzfixed" in t for t in edited.values())


def test_fixlog_load_normalizes_case(tmp_path):
    """Hand-authored parquets with uppercase entries must still apply
    (code-review r02 finding #6): load normalizes like save does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_proofreader_ray.state.fixlog import FIXLOG_SCHEMA

    path = str(tmp_path / "raw_fixlog.parquet")
    pq.write_table(pa.table({
        "lang": ["en", "en"],
        "token": ["Teh", "PINNED"],
        "replacement": ["The", "PINNED"],
    }, schema=FIXLOG_SCHEMA), path)
    loaded = load_fixlog(path)
    assert loaded == {"en": {"teh": "the", "pinned": "pinned"}}
    sc = SpellCorrector({"the": 100}, overrides=loaded["en"])
    assert sc.transform_token("Teh") == "The"   # case restored on apply
    assert sc.transform_token("pinned") == "pinned"
