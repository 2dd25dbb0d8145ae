"""Generator ↔ engine round-trip: the pure-function path must reproduce the
golden extracted text byte-for-byte (BASELINE.json north_rule invariant),
including malformed-markup and whale documents."""

import pyarrow.parquet as pq
import pytest

from fixtures.gen_pages import generate_pages
from ocr_proofreader_ray.functions.dictionary import load_dicts
from ocr_proofreader_ray.functions.html_extract import extract_main_text
from ocr_proofreader_ray.functions.line_join import join_lines
from ocr_proofreader_ray.functions.spell import SpellCorrector


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pages"))
    stats = generate_pages(out, n_docs=150, seed=11, whale_every=75)
    assert stats["n_corruptions"] > 50
    assert stats["n_garbage"] > 50
    assert stats["uncovered_clean_tokens"] == 0
    return out


def test_byte_identical_roundtrip(fixture_dir):
    pages = pq.read_table(f"{fixture_dir}/pages.parquet").to_pylist()
    golden = {
        r["url"]: r
        for r in pq.read_table(f"{fixture_dir}/golden_extracted.parquet").to_pylist()
    }
    dicts = load_dicts(f"{fixture_dir}/lang_dict_golden.parquet")
    correctors = {lang: SpellCorrector(d) for lang, d in dicts.items()}
    assert len(pages) == 150
    for r in pages:
        extracted = extract_main_text(r["html"])
        assert extracted == r["text"], r["url"]
        paras = join_lines(extracted, dicts[r["lang"]])
        final, n_lines, n_tokens = correctors[r["lang"]].transform_text(paras)
        g = golden[r["url"]]
        assert final == g["extracted_text"], r["url"]
        assert n_lines == g["n_lines"]
        assert n_tokens == g["n_tokens"]


def test_whale_document_present(fixture_dir):
    pages = pq.read_table(f"{fixture_dir}/pages.parquet", columns=["html"])
    sizes = [len(h) for h in pages["html"].to_pylist()]
    assert max(sizes) > 20 * sorted(sizes)[len(sizes) // 2]  # heavy tail exists
