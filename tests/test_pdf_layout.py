"""PDF/layout parse stage (north_rule surface; codec stubbed, layout real)."""

import pyarrow as pa
import pytest

from ocr_proofreader_ray.stages.pdf_layout import (
    PdfLayoutStage,
    build_fake_pdf,
    extract_reading_order,
    synthesize_pdf_batch,
)


def test_reading_order_and_boilerplate_suppression():
    blocks = [
        (0, "footer", 0.1, 0.95, 0.9, 0.99, "page 1"),
        (0, "body", 0.1, 0.50, 0.9, 0.55, "second paragraph"),
        (0, "header", 0.1, 0.01, 0.9, 0.05, "RUNNING HEAD"),
        (0, "body", 0.1, 0.20, 0.9, 0.25, "first paragraph"),
        (0, "heading", 0.1, 0.10, 0.9, 0.14, "Title"),
        (0, "figure", 0.1, 0.60, 0.9, 0.80, "figure caption"),
        (1, "body", 0.1, 0.20, 0.9, 0.25, "next page"),
    ]
    text, n_pages, n_kept = extract_reading_order(build_fake_pdf(blocks))
    assert text == "Title\n\nfirst paragraph\nsecond paragraph\n\nnext page"
    assert n_pages == 2
    assert n_kept == 4  # header/footer/figure dropped


def test_same_y_orders_by_x():
    blocks = [
        (0, "body", 0.55, 0.30, 0.9, 0.35, "right column"),
        (0, "body", 0.10, 0.30, 0.5, 0.35, "left column"),
    ]
    text, _, _ = extract_reading_order(build_fake_pdf(blocks))
    assert text == "left column\nright column"


def test_real_pdf_magic_raises():
    with pytest.raises(NotImplementedError, match="pdfminer"):
        extract_reading_order(b"%PDF-1.7 whatever")
    with pytest.raises(ValueError):
        extract_reading_order(b"garbage")


def test_stage_over_synthesized_batch():
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha beta " * 100, "one two three"]),
    })
    pdfs = synthesize_pdf_batch(docs)
    assert pdfs.schema.field("pdf").type == pa.binary()
    out = PdfLayoutStage(strict=True)(pdfs)
    assert "pdf" not in out.schema.names
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    # doc 0: 200 tokens -> 17 paras -> 2 pages; heading adds 2 tokens
    assert rows[0]["n_blocks"] == 18 and rows[0]["n_pages"] == 2
    assert rows[1]["n_blocks"] == 2 and rows[1]["n_pages"] == 1
    assert rows[1]["layout_text"].startswith("Document 1\n\n")
    assert rows[1]["layout_text"].endswith("one two three")


def test_pdf_query_matches_oracle(ray_session):
    """End-to-end through the query surface vs the DuckDB counter oracle."""
    import duckdb

    from ocr_proofreader_ray.pipelines.registry import all_oracles, all_queries

    sf = "/root/testdata/sf0.001"
    mine = all_queries()["q_pdf_layout"](sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    theirs = con.execute(all_oracles()["q_pdf_layout"]).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert len(mine) == len(theirs) == 500
    for col in ("n_pages", "n_blocks", "n_tokens"):
        assert (mine[col].to_numpy() == theirs[col].to_numpy()).all(), col
