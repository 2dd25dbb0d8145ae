"""Dictionary-build tokenizer (SURVEY.md §2 A4).

Pass 1 counts word frequencies per language over the *raw* extracted text —
before any dictionary exists — so it must un-wrap hyphenated line breaks
without consulting a dictionary.  Policy: a line ending in ``word-`` is always
joined to the next line's leading fragment with the hyphen dropped.  Soft-wrap
hyphens (the overwhelming majority) are thereby counted correctly; wrapped
literal compounds produce a rare junk merge (``wellknown``) that falls below
the dictionary's ``min_count`` threshold.

Only pure-alphabetic tokens of length >= 2 enter the counts, so OCR
digit-confusions (``w0rd``) can never pollute the dictionary regardless of
frequency.
"""

from __future__ import annotations

from collections import Counter


def _unwrap_token_lists(text: str) -> list[list[str]]:
    """Paragraph reflow with unconditional hyphen-join, as token lists."""
    paragraphs: list[list[str]] = []
    current: list[str] = []
    for line in text.split("\n"):
        if line.strip():
            current.append(line)
        elif current:
            paragraphs.append(current)
            current = []
    if current:
        paragraphs.append(current)

    out: list[list[str]] = []
    for lines in paragraphs:
        tokens: list[str] = []
        pending: str | None = None
        for line in lines:
            parts = line.split()
            if not parts:
                continue
            if pending is not None:
                parts[0] = pending + parts[0]
                pending = None
            last = parts[-1]
            if len(last) >= 2 and last.endswith("-") and not last.endswith("--"):
                pending = last[:-1]
                parts.pop()
            tokens.extend(parts)
        if pending is not None:
            tokens.append(pending + "-")
        out.append(tokens)
    return out


def naive_unwrap(text: str) -> list[str]:
    """Paragraph reflow with unconditional hyphen-join (no dictionary)."""
    return [" ".join(toks) for toks in _unwrap_token_lists(text)]


def dict_tokens(text: str) -> list[str]:
    """Lowercased pure-alpha tokens (len >= 2) of the unwrapped text.

    Consumes the unwrapped TOKEN LISTS directly — joining paragraphs to
    strings and re-splitting them was a measured ~15% of the tokenize
    stage."""
    toks: list[str] = []
    for para in _unwrap_token_lists(text):
        for tok in para:
            low = tok.lower()
            if len(low) >= 2 and low.isalpha():
                toks.append(low)
    return toks


def count_tokens(text: str) -> Counter:
    return Counter(dict_tokens(text))
