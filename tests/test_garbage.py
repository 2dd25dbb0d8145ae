"""Unit tests for the garbage-token predicate (SURVEY.md §2 A7)."""

from ocr_proofreader_ray.functions.garbage import is_garbage


def test_pure_punctuation_is_garbage():
    assert is_garbage("^%$#@")


def test_letter_digit_alternation_is_garbage():
    assert is_garbage("x7q9z3")


def test_nonprintable_is_garbage():
    assert is_garbage("ab\x0bcd")


def test_contraction_kept():
    assert not is_garbage("don't")


def test_single_ocr_digit_confusion_kept():
    # "w0rd" must survive to reach the spell corrector
    assert not is_garbage("w0rd")
    assert not is_garbage("examp1e")


def test_ordinary_words_kept():
    for w in ("the", "example", "Zürich", "mp3", "a"):
        assert not is_garbage(w), w


def test_consonant_smear_is_garbage():
    assert is_garbage("bcdfghk")


def test_empty_is_garbage():
    assert is_garbage("")
