"""Hand-written golden corpus (VERDICT r01 #9).

Every (html, expected_text) pair below was authored BY HAND — no engine
code generated any expected byte.  This closes the fixtures/gen_pages.py
circularity (the generator imports SpellCorrector for its fixpoint, so a
shared semantics bug there would be invisible to the generated-golden e2e
test; these literals pin the semantics independently).

Part 1 pins ``extract_main_text`` (HTML → text) over ~30 cases spanning
boilerplate drops, link-density scoring, malformed markup, entities and
paragraph emission.  Part 2 pins the full correction layer (extract →
join_lines → SpellCorrector) against a tiny hand-written dictionary.
"""

import pyarrow as pa
import pytest

from ocr_proofreader_ray.functions.html_extract import extract_main_text
from ocr_proofreader_ray.functions.line_join import join_lines
from ocr_proofreader_ray.functions.spell import SpellCorrector

# --------------------------------------------------------------------------
# Part 1: extract_main_text — hand-written html -> expected text
# --------------------------------------------------------------------------

HTML_CASES = [
    # --- basic structure -------------------------------------------------
    ("single_para",
     "<html><body><p>Hello world.</p></body></html>",
     "Hello world."),
    ("two_paras",
     "<body><p>First para.</p><p>Second para.</p></body>",
     "First para.\n\nSecond para."),
    ("heading_then_para",
     "<body><h1>Title</h1><p>Para.</p></body>",
     "Title\n\nPara."),
    ("list_items",
     "<body><ul><li>Alpha</li><li>Beta</li></ul></body>",
     "Alpha\n\nBeta"),
    ("table_cells",
     "<body><table><tr><td>Cell one</td><td>Cell two</td></tr></table></body>",
     "Cell one\n\nCell two"),
    ("nested_divs_same_text",
     "<body><div><div><p>Deep text.</p></div></div></body>",
     "Deep text."),
    ("inline_span",
     "<body><p>Inline <span>span</span> text</p></body>",
     "Inline span text"),
    ("anchor_text_kept",
     "<body><p>See <a href='x'>this link</a> end</p></body>",
     "See this link end"),
    ("blockquote",
     "<body><blockquote>Quoted words.</blockquote></body>",
     "Quoted words."),
    # --- newlines / br ---------------------------------------------------
    ("intra_text_newline_preserved",
     "<body><p>line one\nline two</p></body>",
     "line one\nline two"),
    ("br_splits_paragraph",
     "<body><p>line one<br>line two</p></body>",
     "line one\n\nline two"),
    ("pre_internal_whitespace",
     "<body><pre>a\n  b</pre></body>",
     "a\n  b"),
    # --- boilerplate drops ----------------------------------------------
    ("script_style_dropped",
     "<body><script>var x=1;</script><style>p{}</style><p>Visible.</p></body>",
     "Visible."),
    ("nav_dropped",
     "<body><nav>Home About Contact</nav><div>Real content here.</div></body>",
     "Real content here."),
    ("header_footer_dropped",
     "<body><header>Site head</header><p>Middle.</p><footer>(c) 2026</footer></body>",
     "Middle."),
    ("aside_dropped",
     "<body><aside>Ad junk</aside><article><p>Article body text.</p></article></body>",
     "Article body text."),
    ("form_dropped",
     "<body><form><input><label>Name</label></form><p>After form.</p></body>",
     "After form."),
    ("head_dropped",
     "<html><head><title>Site title</title></head><body><p>Body text.</p></body></html>",
     "Body text."),
    ("svg_figure_dropped",
     "<body><svg><circle r='1'/>ignored</svg><figure>cap</figure><p>Kept.</p></body>",
     "Kept."),
    ("noscript_dropped",
     "<body><noscript>enable js</noscript><p>Shown.</p></body>",
     "Shown."),
    # --- link-density scoring -------------------------------------------
    # body carries the sidebar's link text, so its score is discounted by
    # link density; the plain-text article div must win outright
    ("link_sidebar_loses",
     "<body><div><a href='a'>Link one</a> <a href='b'>Link two</a> "
     "<a href='c'>Link three</a></div>"
     "<div>This is the real article text of the page.</div></body>",
     "This is the real article text of the page."),
    # no links anywhere -> body outscores any child (it contains them all):
    # the emitted text includes every block, in order, as paragraphs
    ("no_links_body_wins",
     "<body><div>short</div><main><p>The principal content region.</p></main></body>",
     "short\n\nThe principal content region."),
    # --- entities --------------------------------------------------------
    ("named_entities",
     "<body><p>Fish &amp; chips &lt;now&gt;</p></body>",
     "Fish & chips <now>"),
    ("numeric_charref",
     "<body><p>&#65;lpha &#x42;eta</p></body>",
     "Alpha Beta"),
    # --- malformed markup ------------------------------------------------
    ("unclosed_p_nests",
     "<body><p>One<p>Two</body>",
     "One\n\nTwo"),
    ("stray_end_tag_ignored",
     "<body><p>Text</div> more</p></body>",
     "Text more"),
    ("unclosed_at_eof",
     "<body><div>Unclosed text",
     "Unclosed text"),
    ("comment_invisible",
     "<body><p>Before<!-- hidden -->After</p></body>",
     "BeforeAfter"),
    ("doctype_ignored",
     "<!DOCTYPE html><body><p>Doc.</p></body>",
     "Doc."),
    ("void_img_inline",
     "<body><p>Before<img src='x'>After</p></body>",
     "BeforeAfter"),
    ("attr_with_angle_in_quotes",
     "<body><div class=\"a>b\">text</div></body>",
     "text"),
    # --- degenerate inputs ----------------------------------------------
    ("empty_input", "", ""),
    ("whitespace_only_para", "<body><p>   </p></body>", ""),
    ("bare_text_no_tags", "Just plain text", "Just plain text"),
    ("unicode_text",
     "<body><p>Héllo wörld — ¿qué?</p></body>",
     "Héllo wörld — ¿qué?"),
]


@pytest.mark.parametrize("name,html,expected",
                         HTML_CASES, ids=[c[0] for c in HTML_CASES])
def test_extract_main_text_golden(name, html, expected):
    assert extract_main_text(html.encode("utf-8")) == expected


def test_invalid_utf8_replaced():
    out = extract_main_text(b"<body><p>bad \xff byte</p></body>")
    assert out == "bad � byte"


# --------------------------------------------------------------------------
# Part 2: full correction layer against a hand-written dictionary
# --------------------------------------------------------------------------

# hand-written frequency dictionary (never derived from engine output)
HAND_DICT = {
    "this": 20, "is": 20, "example": 10, "text": 8,
    "sample": 5, "words": 5, "well": 5, "known": 5,
}

CORRECTION_CASES = [
    # (name, html, expected_final_text, expected_n_tokens)
    # soft wrap-hyphen: exam- + ple merges because "example" is in the dict
    ("hyphen_rejoin",
     "<body><p>this is exam-\nple text</p></body>",
     "this is example text", 4),
    # literal compound hyphen: "wellknown" NOT in dict -> hyphen kept
    ("hyphen_literal",
     "<body><p>this is well-\nknown text</p></body>",
     "this is well-known text", 4),
    # OCR confusion rn->m: "sarnple" corrects to dictionary "sample"
    ("confusion_rn_m",
     "<body><p>this is sarnple text</p></body>",
     "this is sample text", 4),
    # garbage token (letter/digit alternation) is dropped
    ("garbage_dropped",
     "<body><p>this x7q9z3 is text</p></body>",
     "this is text", 3),
    # hard-wrapped lines reflow to one logical paragraph line
    ("reflow_wrapped_lines",
     "<body><p>this is\nexample text</p></body>",
     "this is example text", 4),
    # two html paragraphs stay two output paragraphs
    ("two_paragraphs",
     "<body><p>this is text</p><p>example words</p></body>",
     "this is text\n\nexample words", 5),
    # case preservation: capitalized known word unchanged; corrected token
    # inherits the original's capitalization
    ("case_preserved",
     "<body><p>This is Sarnple text</p></body>",
     "This is Sample text", 4),
]


@pytest.mark.parametrize("name,html,expected,n_tokens",
                         CORRECTION_CASES, ids=[c[0] for c in CORRECTION_CASES])
def test_correction_layer_golden(name, html, expected, n_tokens):
    sc = SpellCorrector(HAND_DICT)
    raw = extract_main_text(html.encode("utf-8"))
    paragraphs = join_lines(raw, sc.freqs)
    final, n_lines, n_toks = sc.transform_text(paragraphs)
    assert final == expected
    assert n_toks == n_tokens
