"""Unit tests mirroring the reference's spell_checker tests (SURVEY.md §5)."""

from ocr_proofreader_ray.functions.spell import (
    SpellCorrector,
    confusion_variants,
    edits1,
)


def make(freqs=None):
    base = {"word": 100, "example": 80, "text": 60, "dog": 40, "cat": 30,
            "well": 50, "known": 50, "ward": 5}
    if freqs:
        base.update(freqs)
    return SpellCorrector(base)


def test_digit_confusion_corrected():
    sc = make()
    assert sc.transform_token("w0rd") == "word"


def test_rn_to_m_confusion_corrected():
    sc = make()
    assert sc.transform_token("exarnple") == "example"


def test_cl_to_d_confusion_corrected():
    sc = make()
    assert sc.transform_token("clog") == "dog"


def test_in_dictionary_untouched():
    sc = make()
    assert sc.transform_token("word") == "word"
    assert sc.transform_token("Example") == "Example"  # case-insensitive lookup


def test_tie_break_frequency_then_lexicographic():
    # "wird" is distance 1 from both "word" (freq 100) and "ward" (freq 5)
    sc = make()
    assert sc.transform_token("wird") == "word"
    # equal frequency → lexicographically smaller token wins
    sc2 = make({"word": 10, "ward": 10})
    assert sc2.transform_token("wird") == "ward"


def test_confusion_beats_plain_edit2():
    # "exarnple" is confusion-distance 1 from "example"; no dict word is a
    # plain single edit away, so the confusion candidate must win
    sc = make()
    assert sc.best_candidate("exarnple") == "example"


def test_no_candidate_keeps_original():
    sc = make()
    assert sc.transform_token("zebra") == "zebra"


def test_garbage_dropped():
    sc = make()
    assert sc.transform_token("x7q9z3") is None
    assert sc.transform_token("^%$#@") is None


def test_compound_kept_verbatim():
    sc = make()
    assert sc.transform_token("well-known") == "well-known"


def test_punctuation_affixes_preserved():
    sc = make()
    assert sc.transform_token("w0rd,") == "word,"
    assert sc.transform_token("(w0rd)") == "(word)"


def test_case_preserved_on_correction():
    sc = make()
    assert sc.transform_token("W0rd") == "Word"


def test_confusion_variants_positions():
    assert "word" in confusion_variants("w0rd")
    assert "example" in confusion_variants("exarnple")
    assert "dog" in confusion_variants("clog")


def test_edits1_contains_classics():
    assert "word" in edits1("wordd")   # delete
    assert "word" in edits1("wrod")    # transpose
    assert "word" in edits1("wore")    # replace
    assert "word" in edits1("wod")     # insert


def test_transform_text_counts():
    sc = make()
    text, n_lines, n_tokens = sc.transform_text(["w0rd text", "exarnple dog"])
    assert text == "word text\n\nexample dog"
    assert n_lines == 2
    assert n_tokens == 4
