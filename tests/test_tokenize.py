"""Unit tests for the dictionary-build tokenizer (SURVEY.md §2 A4)."""

from ocr_proofreader_ray.functions.tokenize import count_tokens, dict_tokens, naive_unwrap


def test_naive_unwrap_always_joins_hyphen():
    assert naive_unwrap("exam-\nple text") == ["example text"]
    # compounds are also joined here (dictionary-free pass); the junk merge
    # is filtered later by min_count
    assert naive_unwrap("well-\nknown") == ["wellknown"]


def test_dict_tokens_lowercase_alpha_only():
    toks = dict_tokens("The w0rd Example x7q9z3 a of")
    assert toks == ["the", "example", "of"]  # w0rd (digit), x7q9z3, "a" (len 1) out


def test_count_tokens_merges_across_lines():
    c = count_tokens("exam-\nple example\n\nexample")
    assert c["example"] == 3
