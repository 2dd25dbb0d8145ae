"""Deterministic synthetic Common-Crawl-style ``pages`` table generator.

Per FIXTURES.md §1: each document is built as the exact *inverse* of the
engine's passes, so ``golden_extracted.parquet`` is byte-exact ground truth by
construction:

1. clean paragraphs sampled from a fixed per-language vocabulary (or from a
   driver testdata ``documents.parquet``);
2. OCR noise: confusion-pair corruption of a deterministic token subset,
   garbage-token injection;
3. hard-wrap at ~60 chars with hyphen splits (soft wraps of dictionary words,
   plus literal hyphenated compounds wrapped at their hyphen);
4. boilerplate HTML wrap (nav/header/aside/footer/script/style + link farm),
   with a deterministic fraction of provably output-preserving malformed
   markup, and rare "whale" documents (~100x body) to exercise size-aware
   batching.

A generation-time **fixpoint verification** simulates the engine's own Pass-1
dictionary build (same code) and un-corrupts any token instance whose
correction would not round-trip, so the committed fixture satisfies
"byte-identical extracted text per url" against the dictionary the engine
will actually build (BASELINE.json north_rule).

Stdlib + pyarrow only; seeded; no network, no external data.
"""

from __future__ import annotations

import html as html_mod
import random
from collections import Counter
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_proofreader_ray.functions.dictionary import apply_dict_policy, save_dicts
from ocr_proofreader_ray.functions.garbage import is_garbage
from ocr_proofreader_ray.functions.spell import OCR_CONFUSIONS, SpellCorrector
from ocr_proofreader_ray.functions.tokenize import count_tokens

WRAP_WIDTH = 60
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

GOLDEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("extracted_text", pa.string()),
        ("n_lines", pa.int32()),
        ("n_tokens", pa.int32()),
    ]
)

GARBAGE_TOKENS = ["x7q9z3", "^%$#@", "zx9k2m1q", "##__##", "q8w3e9r2", "bcdfghk"]

VOCAB: dict[str, list[str]] = {
    "en": """the quick brown fox jumps over lazy dog time year people way day man
    thing woman life child world school state family student group country
    problem hand part place case week company system program question work
    government number night point home water room mother area money story fact
    month lot right study book eye job word business issue side kind head house
    service friend father power hour game line member city community name
    president team minute idea body information back parent face others level
    office door health person art war history party result change morning
    reason research girl guy moment air teacher force education example window
    dictionary model language document corpus sample modern ancient wisdom""".split(),
    "de": """der die das und ist nicht mit von sich auf für als auch wird bei
    einer wie nach wenn aber noch werden mehr durch kann wurde gegen vom beim
    schon haben nur oder zur wurden über einen sondern unter dann zwischen
    immer wieder drei jahren einem ihre seine ihrer alle diese seinem wäre
    hatte worden sein ihren wegen niemand heute leben wasser mutter schule
    kinder stadt welt haus jahr zeit mensch arbeit woche monat nacht morgen
    frage antwort beispiel sprache dokument geschichte bild buch wort satz
    himmel erde fenster garten strasse brief freund familie musik gemeinde""".split(),
    "es": """el la los las que de en un una por con para como más pero sus le
    ha me si sin sobre este ya entre cuando todo esta ser son dos también fue
    había era muy años hasta desde está mi porque qué sólo han yo hay vez
    puede todos así nos ni parte tiene él uno donde bien tiempo mismo ese
    ahora cada vida otro después te otros aunque casa nuestro ejemplo idioma
    palabra mundo escuela familia ciudad libro historia ventana agua madre
    noche trabajo semana pregunta respuesta documento lengua musica amigo""".split(),
    "fr": """le de un être et avoir que pour dans ce il qui ne sur se pas plus
    pouvoir par je avec tout faire son mettre autre on mais nous comme ou si
    leur bien encore aussi quand même lui temps très savoir falloir voir
    quelque sans raison notre dont non monde jour monsieur demander alors
    après trouver personne rendre part dernier venir pendant passer peu
    premier fois grand exemple langue maison famille ville livre histoire
    fenêtre eau mère nuit travail semaine question réponse document musique""".split(),
    "zh": """shi de yi bu le ren zai you ta zhe zhong da lai shang guo dao shuo
    men wei zi zhong neng hui jia chu dian men er duo me xue hao kan qi shui
    ming jing shou wen yu yan wang fang xin li jian tian nian yue ri xiao shan
    chuan feng yun hua cao mu niao yang gou mao yang jin yin tong tie shuiguo
    pingguo xiangjiao putao chengzi ningmeng xigua caomei shiwu mianbao mifan
    miantiao jiaozi baozi tangyuan yuebing zongzi chahua kafei niunai guozhi""".split(),
}
# dedupe while preserving determinism; all entries lowercase pure-alpha len>=2
for _lang in VOCAB:
    seen: list[str] = []
    for _w in VOCAB[_lang]:
        _w = _w.lower()
        if len(_w) >= 2 and _w.isalpha() and _w not in seen:
            seen.append(_w)
    VOCAB[_lang] = seen

# clean->corrupt substitutions = inverse direction of the corrector's pairs
_CLEAN_TO_CORRUPT = [(clean, corrupt) for corrupt, clean in OCR_CONFUSIONS]


@dataclass
class _Doc:
    idx: int
    lang: str
    url: str
    ts_us: int
    paragraphs: list[list[str]]  # clean tokens (compounds as "w1-w2")
    corruptions: list[list] = field(default_factory=list)  # [p, i, orig, corrupt]
    garbage: list[tuple[int, int, str]] = field(default_factory=list)  # (p, after_i, tok)
    malformed: bool = False


def _corrupt_token(rng: random.Random, token: str) -> str | None:
    """One confusion-pair substitution at a random applicable site, or None."""
    options = []
    for clean, corrupt in _CLEAN_TO_CORRUPT:
        start = 0
        while True:
            i = token.find(clean, start)
            if i < 0:
                break
            options.append(token[:i] + corrupt + token[i + len(clean):])
            start = i + 1
    options = [o for o in options if o != token]
    if not options:
        return None
    return rng.choice(sorted(set(options)))


def _noisy_tokens(doc: _Doc, p: int) -> tuple[list[str], set[int]]:
    """Apply recorded corruption + garbage decisions to paragraph ``p``.

    Returns (tokens, unsplittable_index_set) — corrupted and garbage tokens
    must never be hyphen-split by the wrapper.
    """
    toks = list(doc.paragraphs[p])
    no_split: set[int] = set()
    for cp, ci, _orig, corrupt in doc.corruptions:
        if cp == p:
            toks[ci] = corrupt
            no_split.add(ci)
    if doc.garbage:
        inserts = sorted(
            ((after_i, g) for gp, after_i, g in doc.garbage if gp == p),
            key=lambda x: x[0],
            reverse=True,
        )
        for after_i, g in inserts:
            toks.insert(after_i + 1, g)
        # recompute unsplittable set against shifted indices
        no_split = {
            i for i, t in enumerate(toks)
            if is_garbage(t) or any(
                cp == p and t == corrupt for cp, _ci, _o, corrupt in doc.corruptions
            )
        }
    return toks, no_split


def _wrap_paragraph(
    tokens: list[str], no_split: set[int], vocab_set: set[str],
    forbidden_merges: set[str],
) -> list[str]:
    """Greedy hard-wrap at WRAP_WIDTH with deterministic hyphen splits."""
    lines: list[str] = []
    cur = ""
    for i, tok in enumerate(tokens):
        cand = tok if not cur else cur + " " + tok
        if len(cand) <= WRAP_WIDTH:
            cur = cand
            continue
        room = WRAP_WIDTH - len(cur) - 1 if cur else WRAP_WIDTH
        split_done = False
        if cur and i not in no_split:
            if "-" in tok:
                # literal compound: wrap at its hyphen iff merge stays unknown
                head, _, rest = tok.partition("-")
                merged = (head + rest).lower()
                if (
                    len(cur) + 1 + len(head) + 1 <= WRAP_WIDTH
                    and len(head) >= 2
                    and len(rest) >= 2
                    and merged not in vocab_set
                    and merged not in forbidden_merges
                ):
                    lines.append(cur + " " + head + "-")
                    cur = rest
                    split_done = True
            elif (
                tok.isalpha()
                and tok.lower() in vocab_set
                and len(tok) >= 7
                and room >= 4
            ):
                cut = min(room - 1, len(tok) - 2)
                if cut >= 2:
                    lines.append(cur + " " + tok[:cut] + "-")
                    cur = tok[cut:]
                    split_done = True
        if not split_done:
            if cur:
                lines.append(cur)
            cur = tok
    if cur:
        lines.append(cur)
    return lines


_PAGE_TEMPLATE = """<html><head><title>{title}</title>
<script>var t = setTimeout(function() {{ track("{title}"); }}, 100);</script>
<style>body {{ margin: 0; }} .side {{ float: right; }}</style>
</head><body>
<nav><a href="/">home</a> <a href="/archive">archive</a> <a href="/tags">tags</a>
<a href="/about">about</a> <a href="/feed">subscribe to the feed</a></nav>
<header><h1>{title}</h1><p>posted in the archive section by the site robot</p></header>
<aside class="side"><ul><li><a href="/r/1">related article one</a></li>
<li><a href="/r/2">related article two</a></li><li><a href="/r/3">related article three</a></li>
<li><a href="/r/4">related article four</a></li><li><a href="/r/5">related article five</a></li>
<li><a href="/r/6">more from this author</a></li><li><a href="/r/7">trending now</a></li></ul></aside>
<article>{body}</article>
<footer><p>copyright example press</p><a href="/tos">terms of service</a>
<a href="/privacy">privacy policy</a> <a href="/contact">contact the editors</a></footer>
</body></html>"""


def _render_html(doc: _Doc, noisy_paras: list[list[str]]) -> str:
    parts = []
    for j, lines in enumerate(noisy_paras):
        body_text = html_mod.escape("\n".join(lines), quote=False)
        if doc.malformed and j == 0:
            # provably output-preserving malformations (see tests): an
            # unclosed <b>, a stray </div> (no div open above), unclosed <p>
            parts.append(f"<p><b>{body_text}</p></div>")
        else:
            parts.append(f"<p>{body_text}</p>")
    title = f"doc {doc.idx} ({doc.lang})"
    return _PAGE_TEMPLATE.format(title=title, body="".join(parts))


def _synth_doc(
    i: int,
    seed: int,
    langs: tuple[str, ...],
    p_corrupt: float,
    p_garbage: float,
    p_compound: float,
    whale_every: int,
    malformed_every: int,
    whale_factor: int,
) -> "_Doc":
    """Build one fully-synthetic document — deterministic in (seed, i) alone,
    so shards can be generated independently and in parallel."""
    rng = random.Random((seed << 32) ^ i)
    lang = langs[i % len(langs)]
    vocab = VOCAB[lang]
    vocab_set = set(vocab)
    n_paras = rng.randint(3, 8)
    if whale_every and i % whale_every == whale_every - 1:
        n_paras *= whale_factor
    paragraphs = []
    for _ in range(n_paras):
        n_tok = rng.randint(8, 30)
        ptoks = [rng.choice(vocab) for _ in range(n_tok)]
        if rng.random() < p_compound and n_tok >= 4:
            w1, w2 = rng.choice(vocab), rng.choice(vocab)
            if (w1 + w2) not in vocab_set:
                ptoks[rng.randrange(n_tok)] = f"{w1}-{w2}"
        paragraphs.append(ptoks)
    doc = _Doc(
        idx=i,
        lang=lang,
        url=f"https://example-{lang}.test/doc/{i:08d}",
        ts_us=EPOCH_US + i * 1_000_000,
        paragraphs=paragraphs,
        malformed=bool(malformed_every and i % malformed_every == malformed_every - 1),
    )
    for p, ptoks in enumerate(paragraphs):
        for ti, tok in enumerate(ptoks):
            if len(tok) >= 4 and tok.isalpha() and rng.random() < p_corrupt:
                corrupt = _corrupt_token(rng, tok)
                if corrupt is not None and not is_garbage(corrupt):
                    doc.corruptions.append([p, ti, tok, corrupt])
            if rng.random() < p_garbage:
                doc.garbage.append((p, ti, rng.choice(GARBAGE_TOKENS)))
    return doc


def render_shard(
    idx_start: int,
    idx_end: int,
    seed: int = 7,
    langs: tuple[str, ...] = ("en", "de", "es", "fr", "zh"),
    p_corrupt: float = 0.03,
    p_garbage: float = 0.015,
    p_compound: float = 0.25,
    whale_every: int = 250,
    malformed_every: int = 20,
    whale_factor: int = 100,
) -> pa.Table:
    """Fast-mode pages for global doc indices [idx_start, idx_end) — no
    fixpoint, static per-language vocab, empty forbidden-merge set.  A shard
    is byte-identical whether generated alone or as part of a bigger run."""
    urls, tss, htmls, texts, langs_col = [], [], [], [], []
    for i in range(idx_start, idx_end):
        doc = _synth_doc(i, seed, langs, p_corrupt, p_garbage, p_compound,
                         whale_every, malformed_every, whale_factor)
        vset = set(VOCAB[doc.lang])
        noisy = []
        for p in range(len(doc.paragraphs)):
            toks, no_split = _noisy_tokens(doc, p)
            noisy.append(_wrap_paragraph(toks, no_split, vset, set()))
        urls.append(doc.url)
        tss.append(doc.ts_us)
        htmls.append(_render_html(doc, noisy).encode())
        texts.append(_extracted_view(noisy))
        langs_col.append(doc.lang)
    return pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": texts,
            "lang": langs_col,
        },
        schema=PAGES_SCHEMA,
    )


def generate_pages_parallel(
    out_dir: str, n_docs: int, seed: int = 7, n_files: int = 64, **params
) -> None:
    """Benchmark-scale generation: one Ray task per output shard (the
    fixpoint-free fast path is embarrassingly parallel by doc index)."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files

    @ray.remote
    def shard(s: int) -> int:
        lo, hi = s * per, min((s + 1) * per, n_docs)
        if lo >= hi:
            return 0
        table = render_shard(lo, hi, seed=seed, **params)
        pq.write_table(table, f"{out_dir}/pages-{s:05d}.parquet",
                       row_group_size=2000)
        return hi - lo

    total = sum(ray.get([shard.remote(s) for s in range(n_files)]))
    assert total == n_docs, (total, n_docs)


def _extracted_view(noisy_paras: list[list[str]]) -> str:
    """What the engine's HTML extractor returns for this page (and the raw
    ``text`` column view): wrapped paragraphs separated by blank lines."""
    return "\n\n".join("\n".join(lines) for lines in noisy_paras)


def generate_pages(
    out_dir: str,
    n_docs: int = 500,
    seed: int = 7,
    langs: tuple[str, ...] = ("en", "de", "es", "fr", "zh"),
    clean_texts: list[tuple[str, str]] | None = None,  # (lang, text) overrides
    min_count: int = 8,
    top_k: int | None = 50_000,
    p_corrupt: float = 0.03,
    p_garbage: float = 0.015,
    p_compound: float = 0.25,
    whale_every: int = 250,
    malformed_every: int = 20,
    whale_factor: int = 100,
    strict: bool = True,
    write_golden: bool = True,
    n_files: int = 1,
    fast: bool = False,
) -> dict:
    """Generate pages.parquet (+ golden_extracted.parquet, lang_dict_golden
    .parquet) under ``out_dir``.  Returns generation stats."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    # ---- 1. clean documents -------------------------------------------------
    docs: list[_Doc] = []
    vocab_sets = {lang: set(VOCAB[lang]) for lang in VOCAB}
    for i in range(n_docs):
        if clean_texts is None:
            docs.append(_synth_doc(i, seed, langs, p_corrupt, p_garbage,
                                   p_compound, whale_every, malformed_every,
                                   whale_factor))
            continue
        rng = random.Random((seed << 32) ^ i)
        lang, text = clean_texts[i % len(clean_texts)]
        toks = text.split()
        paragraphs = [toks[j:j + 14] for j in range(0, len(toks), 14)] or [["empty"]]
        vocab_sets.setdefault(lang, set())
        doc = _Doc(
            idx=i,
            lang=lang,
            url=f"https://example-{lang}.test/doc/{i:08d}",
            ts_us=EPOCH_US + i * 1_000_000,
            paragraphs=paragraphs,
            malformed=bool(malformed_every and i % malformed_every == malformed_every - 1),
        )
        # corruption + garbage decisions
        for p, ptoks in enumerate(paragraphs):
            for ti, tok in enumerate(ptoks):
                if (
                    len(tok) >= 4
                    and tok.isalpha()
                    and rng.random() < p_corrupt
                ):
                    corrupt = _corrupt_token(rng, tok)
                    if corrupt is not None and not is_garbage(corrupt):
                        doc.corruptions.append([p, ti, tok, corrupt])
                if rng.random() < p_garbage:
                    doc.garbage.append((p, ti, rng.choice(GARBAGE_TOKENS)))
        docs.append(doc)

    if clean_texts is not None:
        # splittable set must be what Pass 1 will actually put in the
        # dictionary: corpus tokens comfortably above min_count
        corpus: dict[str, Counter] = {}
        for doc in docs:
            c = corpus.setdefault(doc.lang, Counter())
            for ptoks in doc.paragraphs:
                c.update(t.lower() for t in ptoks if t.isalpha() and len(t) >= 2)
        for lang, c in corpus.items():
            vocab_sets[lang] = {t for t, f in c.items() if f >= min_count * 3}

    # ---- 2. fixpoint: build engine dictionary, verify invertibility --------
    forbidden_merges: set[str] = set()
    stats = {"reverted_corruptions": 0, "rounds": 0}
    # ``fast``: one rendering round, no invertibility verification — for
    # benchmark-scale inputs where byte-exact golden output isn't asserted
    for _round in range(1 if fast else 6):
        stats["rounds"] = _round + 1
        # simulate the engine's Pass-1 build over the extracted text
        raw: dict[str, Counter] = {}
        all_paras: list[list[list[str]]] = []
        for doc in docs:
            noisy = []
            vset = vocab_sets.get(doc.lang, set()) or {
                t.lower() for p in doc.paragraphs for t in p if t.isalpha()
            }
            for p in range(len(doc.paragraphs)):
                toks, no_split = _noisy_tokens(doc, p)
                noisy.append(_wrap_paragraph(toks, no_split, vset, forbidden_merges))
            all_paras.append(noisy)
            raw.setdefault(doc.lang, Counter()).update(
                count_tokens(_extracted_view(noisy))
            )
        lang_dicts = {
            lang: apply_dict_policy(c, min_count=min_count, top_k=top_k)
            for lang, c in raw.items()
        }
        if fast:
            break
        correctors = {lang: SpellCorrector(d) for lang, d in lang_dicts.items()}

        violations = 0
        for doc in docs:
            sc = correctors[doc.lang]
            keep = []
            for c in doc.corruptions:
                _p, _ti, orig, corrupt = c
                ok = (
                    corrupt.lower() not in lang_dicts[doc.lang]
                    and sc.transform_token(corrupt) == orig
                )
                if ok:
                    keep.append(c)
                else:
                    violations += 1
                    stats["reverted_corruptions"] += 1
            doc.corruptions = keep
            # literal compounds must never merge into a dictionary word
            for p, ptoks in enumerate(doc.paragraphs):
                for tok in ptoks:
                    if "-" in tok:
                        head, _, rest = tok.partition("-")
                        merged = (head + rest).lower()
                        if merged in lang_dicts[doc.lang] and merged not in forbidden_merges:
                            forbidden_merges.add(merged)
                            violations += 1
        if violations == 0:
            break
    else:
        raise AssertionError("fixture fixpoint did not converge")

    # coverage: every clean pure-alpha token (len>=3) must be in the dictionary
    # so the corrector can never touch clean text (byte-identity guarantee)
    uncovered = 0
    for doc in docs:
        d = lang_dicts[doc.lang]
        for ptoks in doc.paragraphs:
            for tok in ptoks:
                if tok.isalpha() and len(tok) >= 3 and tok.lower() not in d:
                    uncovered += 1
    stats["uncovered_clean_tokens"] = uncovered
    if strict and clean_texts is None and uncovered:
        raise AssertionError(f"{uncovered} clean tokens below min_count — tune params")

    # ---- 3. serialize -------------------------------------------------------
    urls, tss, htmls, texts, langs_col = [], [], [], [], []
    g_urls, g_langs, g_texts, g_nl, g_nt = [], [], [], [], []
    html_bytes_total = 0
    for doc, noisy in zip(docs, all_paras):
        page_html = _render_html(doc, noisy).encode()
        html_bytes_total += len(page_html)
        urls.append(doc.url)
        tss.append(doc.ts_us)
        htmls.append(page_html)
        texts.append(_extracted_view(noisy))
        langs_col.append(doc.lang)
        if write_golden:
            clean_paras = [" ".join(p) for p in doc.paragraphs]
            g_urls.append(doc.url)
            g_langs.append(doc.lang)
            g_texts.append("\n\n".join(clean_paras))
            g_nl.append(len(clean_paras))
            g_nt.append(sum(len(p) for p in doc.paragraphs))

    pages = pa.table(
        {
            "url": urls,
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": texts,
            "lang": langs_col,
        },
        schema=PAGES_SCHEMA,
    )
    if n_files <= 1:
        pq.write_table(pages, f"{out_dir}/pages.parquet", row_group_size=2000)
    else:
        # shard round-robin-free: contiguous slices, one file per shard, so
        # chunked checkpoint-resume has multiple input fragments to work with
        per = (pages.num_rows + n_files - 1) // n_files
        for s in range(n_files):
            sl = pages.slice(s * per, per)
            if sl.num_rows:
                pq.write_table(sl, f"{out_dir}/pages-{s:05d}.parquet",
                               row_group_size=2000)
    if write_golden:
        golden = pa.table(
            {
                "url": g_urls,
                "lang": g_langs,
                "extracted_text": g_texts,
                "n_lines": pa.array(g_nl, pa.int32()),
                "n_tokens": pa.array(g_nt, pa.int32()),
            },
            schema=GOLDEN_SCHEMA,
        )
        pq.write_table(golden, f"{out_dir}/golden_extracted.parquet")
    save_dicts(lang_dicts, f"{out_dir}/lang_dict_golden.parquet")

    stats.update(
        n_docs=n_docs,
        html_bytes=html_bytes_total,
        n_corruptions=sum(len(d.corruptions) for d in docs),
        n_garbage=sum(len(d.garbage) for d in docs),
        dict_sizes={lang: len(d) for lang, d in lang_dicts.items()},
    )
    return stats


def main() -> None:
    import argparse, json

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-docs", type=int, default=500)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--no-strict", action="store_true")
    args = ap.parse_args()
    stats = generate_pages(args.out_dir, n_docs=args.n_docs, seed=args.seed,
                           strict=not args.no_strict)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
