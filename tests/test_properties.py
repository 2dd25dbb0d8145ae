"""Property-based robustness tests (hypothesis).

The extraction surface ingests arbitrary crawl bytes, so the hard property
is total-function safety: never raise, always return str, and be a pure
function of the input (byte-identity across calls — the north_rule's
determinism requirement at the unit level).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_proofreader_ray.functions.bloom import BloomFilter
from ocr_proofreader_ray.functions.garbage import is_garbage
from ocr_proofreader_ray.functions.html_extract import extract_main_text
from ocr_proofreader_ray.functions.line_join import join_lines
from ocr_proofreader_ray.functions.sketches import shingles, simhash64
from ocr_proofreader_ray.functions.spell import SpellCorrector

_SETTINGS = dict(max_examples=150, deadline=None)


@given(st.binary(max_size=4096))
@settings(**_SETTINGS)
def test_extract_total_and_deterministic(data):
    out = extract_main_text(data)
    assert isinstance(out, str)
    assert extract_main_text(data) == out


# HTML-ish text: interleave tag fragments and text so the tokenizer's state
# machine (comments, raw text, self-closing, malformed) actually exercises
_HTMLISH = st.lists(
    st.one_of(
        st.sampled_from([
            "<div>", "</div>", "<p>", "</p>", "<br/>", "<br />",
            "<script>", "</script>", "<svg>", "</svg>", "<circle r='1'/>",
            "<!--", "-->", "<!DOCTYPE html>", "<title>", "</title>",
            "<a href='x'>", "</a>", "<td>", "<table>", "&amp;", "&#65;",
            "<", ">", "</", "<x", "'", '"',
        ]),
        st.text(max_size=20),
    ),
    max_size=40,
).map("".join)


@given(_HTMLISH)
@settings(**_SETTINGS)
def test_extract_htmlish_total(s):
    out = extract_main_text(s.encode("utf-8"))
    assert isinstance(out, str)
    assert extract_main_text(s.encode("utf-8")) == out


@given(st.text(max_size=500),
       st.sets(st.text(min_size=1, max_size=8), max_size=20))
@settings(**_SETTINGS)
def test_join_lines_total_and_deterministic(text, vocab):
    paras = join_lines(text, vocab)
    assert all(isinstance(p, str) and p for p in paras)
    assert join_lines(text, vocab) == paras
    # reflowed paragraphs never contain newlines
    assert not any("\n" in p for p in paras)


@given(st.text(max_size=40),
       st.dictionaries(st.text(min_size=1, max_size=8),
                       st.integers(min_value=1, max_value=1000), max_size=20))
@settings(**_SETTINGS)
def test_spell_token_policy_total(token, freqs):
    sc = SpellCorrector(freqs)
    out = sc.transform_token(token)
    assert out is None or isinstance(out, str)
    # memoized second call identical (cache correctness)
    assert sc.transform_token(token) == out
    # a fresh instance agrees (no hidden order-dependent state)
    assert SpellCorrector(dict(freqs)).transform_token(token) == out


@given(st.text(max_size=60))
@settings(**_SETTINGS)
def test_garbage_total(token):
    assert is_garbage(token) in (True, False)


@given(st.lists(st.text(min_size=1, max_size=6), max_size=30),
       st.integers(min_value=1, max_value=4))
@settings(**_SETTINGS)
def test_shingles_and_simhash_deterministic(tokens, n):
    s1, s2 = shingles(tokens, n), shingles(list(tokens), n)
    assert s1 == s2
    from collections import Counter

    c = Counter(tokens)
    assert simhash64(c) == simhash64(Counter(tokens))


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), min_size=1,
                max_size=200, unique=True))
@settings(**_SETTINGS)
def test_bloom_never_false_negative(keys):
    f = BloomFilter(len(keys), fpp=0.05)
    arr = pa.array(np.asarray(keys, dtype=np.int64))
    f.add_column(arr)
    assert f.contains_column(arr).all()


def _levenshtein_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(st.text(alphabet="ab#", max_size=6), st.text(alphabet="ab#", max_size=6))
@settings(**_SETTINGS)
def test_dist_is_1_matches_levenshtein_dp(a, b):
    from ocr_proofreader_ray.pipelines.relational import _dist_is_1

    assert _dist_is_1(a, b) == (_levenshtein_ref(a, b) == 1)
