"""Persistent fix-log: accepted corrections that override the dictionary.

Reference parity (SURVEY.md §3.1 entry 2, §1.1 "Fix log / accepted-
corrections store"): the reference tool's interactive proofread loop
persists accepted fixes so re-runs are incremental — a decision made once
applies on every later run.  The engine has no interactive loop (the A8
policy is deterministic), so the fix-log becomes an explicit OVERRIDE
LAYER: a small Parquet of (lang, token, replacement) loaded into every
Corrector actor and consulted BEFORE the garbage filter and dictionary
(a logged human decision is authoritative over both).

Semantics:
* ``token`` is the lowercase word core (affixes split the same way the
  spell policy splits them); ``replacement`` is the lowercase output core,
  case-matched to the original surface form on application;
* ``replacement == token`` pins a token verbatim (suppresses correction
  and the garbage filter for that core);
* the file is tiny (human-scale decisions), sorted and atomically
  written — every actor reads it once in ``__init__`` from shared
  storage, the same distribution path as the dictionary;
* pass-2 resume fingerprints include the fix-log content hash
  (pipelines/extraction.py), so editing the log invalidates exactly the
  chunks whose output could change and a resumed run stays byte-identical
  to a fresh run with the same log.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

FIXLOG_SCHEMA = pa.schema([
    ("lang", pa.string()),
    ("token", pa.string()),
    ("replacement", pa.string()),
])


def save_fixlog(entries: dict[str, dict[str, str]], path: str) -> str:
    """entries: lang -> {token: replacement}; deterministic sorted file."""
    langs, toks, reps = [], [], []
    for lang in sorted(entries):
        for tok in sorted(entries[lang]):
            langs.append(lang)
            toks.append(tok.lower())
            reps.append(entries[lang][tok].lower())
    tab = pa.table({"lang": langs, "token": toks, "replacement": reps},
                   schema=FIXLOG_SCHEMA)
    tmp = path + ".tmp"
    pq.write_table(tab, tmp, compression="zstd")
    os.replace(tmp, path)
    return path


def load_fixlog(path: str | None) -> dict[str, dict[str, str]]:
    """lang -> {token: replacement}; missing/None path -> empty overrides."""
    if not path or not os.path.exists(path):
        return {}
    tab = pq.read_table(path)
    out: dict[str, dict[str, str]] = {}
    # normalize on LOAD as well as save: the CLI accepts any hand-authored
    # parquet, and lookups key on the lowercase core — an uppercase entry
    # would otherwise silently never match (code-review r02 finding #6)
    for lang, tok, rep in zip(tab.column("lang").to_pylist(),
                              tab.column("token").to_pylist(),
                              tab.column("replacement").to_pylist()):
        out.setdefault(lang, {})[tok.lower()] = rep.lower()
    return out
