"""Edit-distance spell correction with OCR confusion pairs (SURVEY.md §2 A8).

Semantics per BASELINE.json north_star: "per-language word-frequency
dictionaries ... edit-distance candidate ranking".  The candidate policy is a
**deterministic total order** so extracted text is byte-identical at any
parallelism level:

* tier 0 — token already in the dictionary → unchanged;
* tier 1 — OCR confusion-pair substitutions (``rn<->m``, ``1<->l``, ``0<->o``,
  ``cl<->d``, ``vv<->w``) and single-edit (Damerau) variants found in the
  dictionary;
* tier 2 — double-edit variants found in the dictionary (computed only when
  tier 1 is empty);
* rank within a tier by ``(frequency desc, token asc)``; the first candidate
  wins; with no candidate the token is kept verbatim.

Classic Norvig-style candidate generation (public knowledge), with a
per-instance memo cache — the corrector lives inside a long-lived Ray actor,
so the cache amortizes across batches.
"""

from __future__ import annotations

from ocr_proofreader_ray.functions.garbage import is_garbage

# (corrupt_substring, clean_substring): applied corrupt->clean when generating
# candidates for an unknown token.
OCR_CONFUSIONS: tuple[tuple[str, str], ...] = (
    ("rn", "m"),
    ("m", "rn"),
    ("1", "l"),
    ("l", "1"),
    ("0", "o"),
    ("o", "0"),
    ("cl", "d"),
    ("d", "cl"),
    ("vv", "w"),
    ("w", "vv"),
)

_ALPHABET = "abcdefghijklmnopqrstuvwxyz'"


def confusion_variants(token: str) -> set[str]:
    """All single confusion-pair substitutions at every position."""
    out: set[str] = set()
    for corrupt, clean in OCR_CONFUSIONS:
        start = 0
        while True:
            i = token.find(corrupt, start)
            if i < 0:
                break
            out.add(token[:i] + clean + token[i + len(corrupt):])
            start = i + 1
    out.discard(token)
    return out


def edits1(token: str) -> set[str]:
    """Damerau edit distance 1 neighborhood (delete/transpose/replace/insert)."""
    splits = [(token[:i], token[i:]) for i in range(len(token) + 1)]
    deletes = {a + b[1:] for a, b in splits if b}
    transposes = {a + b[1] + b[0] + b[2:] for a, b in splits if len(b) > 1}
    replaces = {a + c + b[1:] for a, b in splits if b for c in _ALPHABET}
    inserts = {a + c + b for a, b in splits for c in _ALPHABET}
    out = deletes | transposes | replaces | inserts
    out.discard(token)
    return out


def _split_affixes(token: str) -> tuple[str, str, str]:
    """Split leading/trailing non-alphanumeric punctuation off the word core."""
    start, end = 0, len(token)
    while start < end and not token[start].isalnum():
        start += 1
    while end > start and not token[end - 1].isalnum():
        end -= 1
    return token[:start], token[start:end], token[end:]


def _match_case(original: str, candidate: str) -> str:
    if original.isupper() and len(original) > 1:
        return candidate.upper()
    if original[:1].isupper():
        return candidate[:1].upper() + candidate[1:]
    return candidate


class SpellCorrector:
    """Deterministic per-language corrector over a frozen frequency dict.

    ``freqs``: mapping token -> frequency (the Pass-1 dictionary for one
    language).  Instances are cheap; the candidate cache grows with distinct
    unknown tokens seen.
    """

    # token-result memo cap: ~1M distinct surface forms per actor (bounded
    # memory at crawl scale; beyond the cap tokens are computed uncached)
    TOKEN_CACHE_MAX = 1_000_000

    def __init__(self, freqs: dict[str, int],
                 overrides: dict[str, str] | None = None):
        self.freqs = freqs
        # fix-log override layer (state/fixlog.py): lowercase core ->
        # lowercase replacement core, authoritative over garbage filter,
        # dictionary lookup and candidate ranking
        self.overrides = overrides or {}
        self._cache: dict[str, str | None] = {}
        # memo of the FULL per-token policy — transform_token is a pure
        # function of (token, frozen dict) and corpora repeat surface forms
        # heavily, so this converts the per-token garbage/affix/lookup work
        # into one dict hit (~3x faster correction measured at sf0.1)
        self._token_cache: dict[str, str | None] = {}

    # -- candidate machinery -------------------------------------------------

    def _rank_key(self, token: str):
        return (-self.freqs[token], token)

    def best_candidate(self, low: str) -> str | None:
        """Best dictionary candidate for a lowercase unknown token, or None."""
        cached = self._cache.get(low, "\x00")
        if cached != "\x00":
            return cached
        freqs = self.freqs
        tier1 = {v for v in confusion_variants(low) if v in freqs}
        e1 = edits1(low)
        tier1.update(v for v in e1 if v in freqs)
        if tier1:
            best = min(tier1, key=self._rank_key)
        else:
            tier2 = {v2 for v1 in e1 for v2 in edits1(v1) if v2 in freqs}
            best = min(tier2, key=self._rank_key) if tier2 else None
        self._cache[low] = best
        return best

    # -- per-token policy ----------------------------------------------------

    def transform_token(self, token: str) -> str | None:
        """Full token policy: returns None to drop (garbage) or the output.

        Order: garbage filter first, then dictionary lookup, then correction
        of plausible word cores; hyphenated compounds and other non-word
        tokens pass through verbatim.  Memoized per surface form (pure
        function of the frozen dictionary).
        """
        hit = self._token_cache.get(token, "\x00")
        if hit != "\x00":
            return hit
        out = self._transform_token_uncached(token)
        if len(self._token_cache) < self.TOKEN_CACHE_MAX:
            self._token_cache[token] = out
        return out

    def _transform_token_uncached(self, token: str) -> str | None:
        if self.overrides:
            prefix, core, suffix = _split_affixes(token)
            if core:
                rep = self.overrides.get(core.lower())
                if rep is not None:
                    # logged decision wins over garbage filter + dictionary;
                    # replacement == token pins the surface form verbatim
                    if rep == core.lower():
                        return token
                    return prefix + _match_case(core, rep) + suffix
        if is_garbage(token):
            return None
        prefix, core, suffix = _split_affixes(token)
        if not core:
            return token
        low = core.lower()
        if low in self.freqs:
            return token
        # tokens under 3 chars are too ambiguous to correct deterministically
        if len(low) < 3:
            return token
        # only correct plausible single-word cores (letters/digits/apostrophe);
        # compounds like "well-known" are handled by the line joiner and kept.
        if not all(ch.isalnum() or ch == "'" for ch in core):
            return token
        best = self.best_candidate(low)
        if best is None:
            return token
        return prefix + _match_case(core, best) + suffix

    def transform_text(self, paragraphs: list[str]) -> tuple[str, int, int]:
        """Apply the token policy to reflowed paragraphs.

        Returns (final_text, n_lines, n_tokens) where paragraphs are joined
        with blank lines — the engine's canonical extracted_text layout.
        ``paragraphs`` elements may be strings or pre-split token lists
        (the corrector passes token lists straight from the line joiner).

        The token cache is probed INLINE here (one dict.get per token in
        steady state) instead of through ``transform_token`` — the per-call
        Python frame was ~30% of warm pass-2 time at 140 tokens/doc; the
        miss path still goes through ``transform_token`` so memoization and
        policy stay in one place.
        """
        cache = self._token_cache
        transform = self.transform_token
        miss = "\x00"
        out_paras: list[str] = []
        n_tokens = 0
        for para in paragraphs:
            kept = []
            for tok in (para if isinstance(para, list) else para.split()):
                v = cache.get(tok, miss)
                if v == miss:
                    v = transform(tok)
                if v is not None:
                    kept.append(v)
            n_tokens += len(kept)
            if kept:
                out_paras.append(" ".join(kept))
        return "\n\n".join(out_paras), len(out_paras), n_tokens
