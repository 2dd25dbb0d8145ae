"""PDF / layout parsing stage (north_rule surface: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics").

No PDF library exists in this container, so real ``%PDF-`` payloads raise
``NotImplementedError`` at the decode boundary; the layout semantics —
block model, reading-order assembly, boilerplate suppression by page
geometry — run against a deterministic ``FPDF`` container and are fully
tested.  A production deployment swaps ``_parse_fake`` for a pdfminer/mupdf
call; everything downstream of the block list is codec-independent.

Container layout (little-endian):

    bytes 0:4   magic  b"FPDF"
    bytes 4:8   n_blocks uint32
    then per block:
        uint16 page, uint16 kind (0=body 1=heading 2=header 3=footer
                                  4=table 5=figure)
        4 x float32  x0 y0 x1 y1   (page-normalized [0,1]; y grows down)
        uint32 text_len, then utf-8 text

Layout extraction rule (public-knowledge geometric heuristic, cf. layout
analysis in pdfminer/Grobid): drop running headers (y1 <= 0.08) and footers
(y0 >= 0.92) and figure blocks; order the rest by (page, y0, x0); join body
lines into paragraphs, headings become their own paragraph.
"""

from __future__ import annotations

import struct

import pyarrow as pa

MAGIC = b"FPDF"
KINDS = ("body", "heading", "header", "footer", "table", "figure")
KIND_ID = {k: i for i, k in enumerate(KINDS)}


def build_fake_pdf(blocks: list[tuple[int, str, float, float, float, float, str]]) -> bytes:
    """blocks: (page, kind_name, x0, y0, x1, y1, text) -> FPDF bytes."""
    out = [MAGIC, struct.pack("<I", len(blocks))]
    for page, kind, x0, y0, x1, y1, text in blocks:
        enc = text.encode("utf-8")
        out.append(struct.pack("<HHffffI", page, KIND_ID[kind],
                               x0, y0, x1, y1, len(enc)))
        out.append(enc)
    return b"".join(out)


def _parse_fake(payload: bytes) -> list[tuple[int, int, float, float, float, float, str]]:
    if payload[:5] == b"%PDF-":
        raise NotImplementedError(
            "real PDF parsing needs a PDF library (pdfminer/mupdf), not "
            "available in this environment; only the FPDF container is "
            "supported — swap _parse_fake at this boundary"
        )
    if payload[:4] != MAGIC:
        raise ValueError("not an FPDF container")
    (n_blocks,) = struct.unpack_from("<I", payload, 4)
    off = 8
    blocks = []
    for _ in range(n_blocks):
        page, kind, x0, y0, x1, y1, tlen = struct.unpack_from("<HHffffI", payload, off)
        off += struct.calcsize("<HHffffI")
        text = payload[off:off + tlen].decode("utf-8")
        off += tlen
        blocks.append((page, kind, x0, y0, x1, y1, text))
    return blocks


def extract_reading_order(payload: bytes,
                          header_y: float = 0.08,
                          footer_y: float = 0.92) -> tuple[str, int, int]:
    """FPDF bytes -> (text, n_pages, n_blocks_kept).

    Geometry-based boilerplate suppression + (page, y0, x0) reading order;
    headings start a new paragraph, consecutive body blocks join with a
    newline, pages separate with a blank line.
    """
    blocks = _parse_fake(payload)
    kept = [b for b in blocks
            if KINDS[b[1]] not in ("header", "footer", "figure")
            and not (b[5] <= header_y) and not (b[3] >= footer_y)]
    kept.sort(key=lambda b: (b[0], b[3], b[2]))
    pages: dict[int, list[str]] = {}
    for page, kind, _x0, _y0, _x1, _y1, text in kept:
        lines = pages.setdefault(page, [])
        if KINDS[kind] == "heading":
            if lines:
                lines.append("")  # paragraph break before a heading
            lines.append(text)
            lines.append("")      # and after
        else:
            lines.append(text)
    parts = []
    for page in sorted(pages):
        body = "\n".join(pages[page]).strip("\n")
        parts.append(body)
    n_pages = len({b[0] for b in blocks}) if blocks else 0
    return "\n\n".join(parts), n_pages, len(kept)


class PdfLayoutStage:
    """Actor-pool stage: (doc_id, pdf:binary) -> extracted layout text.

    ``__init__`` is where a real deployment opens the PDF codec once per
    actor; ``__call__`` parses each payload and emits reading-order text
    plus layout counters.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, n_pages, n_blocks = [], [], []
        for payload in batch.column("pdf").to_pylist():
            try:
                text, np_, nb = extract_reading_order(payload)
            except (NotImplementedError, ValueError):
                if self.strict:
                    raise
                text, np_, nb = "", 0, 0
            texts.append(text)
            n_pages.append(np_)
            n_blocks.append(nb)
        out = batch.drop_columns(["pdf"])  # payload dies here
        return (out
                .append_column("layout_text", pa.array(texts, pa.string()))
                .append_column("n_pages", pa.array(n_pages, pa.int32()))
                .append_column("n_blocks", pa.array(n_blocks, pa.int32())))


def synthesize_pdf_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> (doc_id, pdf) with deterministic layout:
    paragraphs become body blocks flowing down two 14-paragraph pages, a
    heading opens each document, and every page carries a running header
    and footer (which extraction must drop)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    payloads = []
    for doc_id, text in zip(doc_ids, texts):
        toks = (text or "").split()
        paras = [" ".join(toks[i:i + 12]) for i in range(0, len(toks), 12)]
        blocks = [(0, "heading", 0.1, 0.10, 0.9, 0.14, f"Document {doc_id}")]
        for i, para in enumerate(paras):
            page, slot = divmod(i, 14)
            y0 = 0.15 + slot * 0.055
            blocks.append((page, "body", 0.1, y0, 0.9, y0 + 0.05, para))
        n_pages = max(b[0] for b in blocks) + 1
        for p in range(n_pages):
            blocks.append((p, "header", 0.1, 0.01, 0.9, 0.05, "RUNNING HEAD"))
            blocks.append((p, "footer", 0.1, 0.95, 0.9, 0.99, f"page {p + 1}"))
        payloads.append(build_fake_pdf(blocks))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "pdf": pa.array(payloads, pa.binary()),
    })
