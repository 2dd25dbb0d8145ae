"""Garbage-token filtering (SURVEY.md §2 A7).

OCR noise detection per BASELINE.json north_star ("garbage-token filtering"):
a token is garbage when it is overwhelmingly non-alphabetic, contains
non-printable characters, alternates letters/digits like line noise
(``x7q9z3``), or is an implausible all-consonant run.  Plausible words with a
single OCR digit-confusion (``w0rd``) and contractions (``don't``) are NOT
garbage — they are the spell-corrector's job.

Pure predicate; thresholds pinned by tests/test_garbage.py.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyàáâäèéêëìíîïòóôöùúûüåæøœ")


def alpha_ratio(token: str) -> float:
    if not token:
        return 0.0
    return sum(ch.isalpha() for ch in token) / len(token)


def alternation_count(token: str) -> int:
    """Number of letter<->digit class switches, e.g. x7q9z3 -> 5."""
    n = 0
    prev = None
    for ch in token:
        cls = "a" if ch.isalpha() else ("d" if ch.isdigit() else None)
        if cls is not None and prev is not None and cls != prev:
            n += 1
        if cls is not None:
            prev = cls
    return n


def is_garbage(token: str) -> bool:
    if not token:
        return True
    if any(not ch.isprintable() for ch in token):
        return True
    if alpha_ratio(token) < 0.5:
        return True
    if alternation_count(token) >= 3:
        return True
    # implausible consonant-only latin token (OCR smear like "bcdfghk")
    letters = [ch for ch in token.lower() if ch.isalpha()]
    if (
        len(letters) >= 6
        and all(ord(ch) < 0x250 for ch in letters)  # latin ranges only
        and not any(ch in _VOWELS for ch in letters)
    ):
        return True
    return False
