"""Language-dictionary policy + Parquet (de)serialisation (SURVEY.md §2 A5).

The Pass-1 dictionary is a per-language token→frequency table.  The policy —
which raw counts become dictionary entries — must be a deterministic pure
function of the global counts so every actor at every parallelism level loads
the identical dictionary:

* drop tokens with ``freq < min_count`` (kills rare OCR-corruption forms and
  junk merges from the dictionary-free unwrap);
* optionally keep only the ``top_k`` most frequent tokens per language, with
  the total order (freq desc, token asc) for deterministic cut-off ties.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

DICT_SCHEMA = pa.schema(
    [("lang", pa.string()), ("token", pa.string()), ("freq", pa.int64())]
)


def apply_dict_policy(
    counts: dict[str, int], min_count: int = 2, top_k: int | None = None
) -> dict[str, int]:
    """Filter one language's raw counts into its dictionary."""
    kept = {t: f for t, f in counts.items() if f >= min_count}
    if top_k is not None and len(kept) > top_k:
        ordered = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        kept = dict(ordered)
    return kept


def dicts_to_table(lang_dicts: dict[str, dict[str, int]]) -> pa.Table:
    langs, tokens, freqs = [], [], []
    for lang in sorted(lang_dicts):
        d = lang_dicts[lang]
        for tok in sorted(d):
            langs.append(lang)
            tokens.append(tok)
            freqs.append(d[tok])
    return pa.table(
        {"lang": langs, "token": tokens, "freq": freqs}, schema=DICT_SCHEMA
    )


def save_dicts(lang_dicts: dict[str, dict[str, int]], path: str) -> None:
    pq.write_table(dicts_to_table(lang_dicts), path)


def load_dicts(path: str) -> dict[str, dict[str, int]]:
    """Load the dictionary Parquet into {lang: {token: freq}}.

    Called once per corrector actor in ``__init__`` (each worker reads the
    small Parquet itself — no driver-side broadcast of a large object).
    """
    table = pq.read_table(path)
    out: dict[str, dict[str, int]] = {}
    langs = table["lang"].to_pylist()
    tokens = table["token"].to_pylist()
    freqs = table["freq"].to_pylist()
    for lang, tok, freq in zip(langs, tokens, freqs):
        out.setdefault(lang, {})[tok] = freq
    return out
