"""The stateful correction stage (SURVEY.md §2 A6–A9 fused).

A callable CLASS → Ray actor pool: ``__init__`` runs once per actor and loads
the Pass-1 dictionary Parquet itself (no driver-side broadcast of a large
object; every worker node reads the small file from shared storage), builds
one ``SpellCorrector`` per language, and reuses its candidate cache across
every batch the actor ever sees.  ``__call__`` is the per-batch hot path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_proofreader_ray.functions.dictionary import load_dicts
from ocr_proofreader_ray.functions.line_join import join_lines_tokens
from ocr_proofreader_ray.functions.spell import SpellCorrector

SPAN_TYPE = pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32())]))

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("extracted_text", pa.string()),
        ("n_lines", pa.int32()),
        ("n_tokens", pa.int32()),
        ("n_chars", pa.int64()),
        # char-offset [start, end) of each paragraph within extracted_text
        # (north_rule: "extracted text/spans per document"); invariant:
        # extracted_text[s.start:s.end] is exactly paragraph i, and
        # paragraphs are separated by "\n\n"
        ("paragraph_spans", SPAN_TYPE),
        # lineage: html exceeded the whale byte cap and was truncated before
        # parsing (north_rule truncate-with-lineage-flag contract) — rides
        # from the pass-1 raw output into the shipped artifact
        ("truncated", pa.bool_()),
    ]
)


def paragraph_spans(text: str) -> list[dict[str, int]]:
    """[start, end) offsets of each blank-line-separated paragraph."""
    spans = []
    pos = 0
    for para in text.split("\n\n"):
        spans.append({"start": pos, "end": pos + len(para)})
        pos += len(para) + 2  # the "\n\n" separator
    return spans


class Corrector:
    """Actor-pool stage: (url, lang, raw_text) -> final extracted rows.

    Pure per-row function of (raw_text, frozen dictionary) → output is
    byte-identical regardless of batch boundaries, actor count, or cluster
    size (BASELINE.json north_rule).
    """

    def __init__(self, dict_path: str, fix_log_path: str | None = None):
        from ocr_proofreader_ray.state.fixlog import load_fixlog

        self._dicts = load_dicts(dict_path)
        # fix-log override layer (state/fixlog.py): read once per actor from
        # shared storage, same distribution path as the dictionary
        fixes = load_fixlog(fix_log_path)
        self._correctors = {
            lang: SpellCorrector(freqs, overrides=fixes.get(lang))
            for lang, freqs in self._dicts.items()
        }
        for lang in fixes:  # overrides for langs absent from the dictionary
            if lang not in self._correctors:
                self._correctors[lang] = SpellCorrector({}, overrides=fixes[lang])
        self._empty = SpellCorrector({})

    def correct_one(self, lang: str, raw_text: str) -> tuple[str, int, int]:
        corrector = self._correctors.get(lang, self._empty)
        paragraphs = join_lines_tokens(raw_text or "", corrector.freqs)
        return corrector.transform_text(paragraphs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("raw_text").to_pylist()
        truncated = (batch.column("truncated")
                     if "truncated" in batch.schema.names
                     else pa.array([False] * batch.num_rows, pa.bool_()))
        outs, n_lines, n_tokens, spans = [], [], [], []
        for lang, text in zip(langs, texts):
            final, nl, nt = self.correct_one(lang, text)
            outs.append(final)
            n_lines.append(nl)
            n_tokens.append(nt)
            spans.append(paragraph_spans(final))
        return pa.table(
            {
                "url": batch.column("url"),
                "lang": batch.column("lang"),
                "extracted_text": pa.array(outs, pa.string()),
                "n_lines": pa.array(n_lines, pa.int32()),
                "n_tokens": pa.array(n_tokens, pa.int32()),
                "n_chars": pa.array([len(t) for t in outs], pa.int64()),
                "paragraph_spans": pa.array(spans, SPAN_TYPE),
                "truncated": pc.cast(truncated, pa.bool_()),
            },
            schema=EXTRACTED_SCHEMA,
        )
