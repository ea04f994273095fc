"""Fused PTB-style tokenization + sentence splitting as one Arrow-batched stage.

Behavioral reference (re-expressed, not ported):
  - token rules: ``process/PTBLexer.flex`` (rule cascade: URLs, emoticons,
    ellipses, currency, abbreviations, clitic splits like ``I'm → I 'm``,
    ``gonna → gon na``), API ``process/PTBTokenizer.java:61-177``.
  - sentence boundaries: ``process/WordToSentenceProcessor.java:76-131``
    (terminators ``[.!?]+``, boundary followers — close quotes/brackets —
    attach left; annotator ``pipeline/WordsToSentencesAnnotator.java:178``).
  - media spans terminate sentences, the analog of CleanXML block tags
    (``pipeline/CleanXmlAnnotator.java:164-226``).

Implementation is a compiled-regex cascade over each text span, run inside a
``mapInPandas`` iterator (one Python loop per *Arrow batch*, never a Spark
row-at-a-time UDF). The stage is a narrow transformation: no shuffle, and at
cluster scale it pipelines with every other per-doc stage.

Output columns:
  tokens:    array<struct<idx,word,original,begin,end,span_idx,sent>>
  sentences: array<struct<sent_idx,start_tok,end_tok,span_idx>>
The input ``spans`` column passes through untouched (span-sequence invariant).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

TOKENS_TYPE = (
    "array<struct<idx:int,word:string,original:string,begin:int,end:int,"
    "span_idx:int,sent:int>>"
)
SENTENCES_TYPE = "array<struct<sent_idx:int,start_tok:int,end_tok:int,span_idx:int>>"

# ---------------------------------------------------------------------------
# Rule cascade (ordered alternatives, first match wins — the JFlex discipline)
# ---------------------------------------------------------------------------

ABBREVS = {
    "mr.", "mrs.", "ms.", "dr.", "prof.", "sen.", "rep.", "gen.", "gov.",
    "inc.", "ltd.", "co.", "corp.", "pty.", "vs.", "etc.", "jr.", "sr.",
    "st.", "mt.", "dept.", "univ.", "assn.", "bros.", "ph.d.",
    "jan.", "feb.", "mar.", "apr.", "jun.", "jul.", "aug.", "sep.", "sept.",
    "oct.", "nov.", "dec.", "mon.", "tue.", "wed.", "thu.", "fri.", "sat.",
    "sun.", "approx.", "appt.", "est.", "min.", "max.", "misc.",
    "p.m.", "a.m.", "ore.", "calif.", "ave.", "blvd.", "rd.",
}

# ambiguous abbreviations: the period belongs to the token only when a digit
# follows ("No. 24", "Art. 53", "ca. 1300"); otherwise it ends the sentence
# ("I like Art. And I like History.") — PTBLexer's context-gated abbrevs
CONTEXT_ABBREVS = {"no.", "art.", "fig.", "sec.", "op.", "ch.", "ca.", "pp.",
                   "so."}

# direction/ordinal abbreviations also kept before a capitalized proper name
# ("No. Korea", "So. Calif.") — but split before sentence-starter function
# words ("No. I like…") like the reference's PTBTokenizerTest gold
_CAP_CONTEXT_ABBREVS = {"no.", "so."}
_CAP_CONTEXT_STOPS = {"I", "A", "An", "And", "The", "But", "Or", "He", "She",
                      "It", "We", "They", "You", "That", "This"}

# cp1252 control-range bytes inherited into text → unicode equivalents
# (PTBLexer cp1252 normalization set; 1:1 so char offsets are preserved)
CP1252 = {"\x91": "\u2018", "\x92": "\u2019", "\x93": "\u201c",
          "\x94": "\u201d", "\x95": "\u2022", "\x96": "\u2013",
          "\x97": "\u2014", "\x85": "\u2026"}
_CP1252_RE = re.compile("[" + "".join(CP1252) + "]")

# multi-word split table: PTBLexer splits these informal contractions
SPLIT_WORDS = {
    "gimme": ("gim", "me"),
    "gonna": ("gon", "na"),
    "wanna": ("wan", "na"),
    "gotta": ("got", "ta"),
    "lemme": ("lem", "me"),
    "outta": ("out", "ta"),
    "dunno": ("du", "n", "no"),
    "cannot": ("can", "not"),
}

CLITICS = ("'s", "'m", "'re", "'ve", "'ll", "'d", "n't", "'S", "'M", "'RE", "'VE", "'LL", "'D", "N'T")

_RULES = [
    # SGML/XML markup: recognized first, excluded from linguistic tokens,
    # preserved positionally, forces a sentence break
    # (pipeline/CleanXmlAnnotator.java:164-240 block-element semantics)
    ("XMLTAG", r"</?[A-Za-z][\w:.\-]*(?:\s[^<>]*?)?/?>|<!--.*?-->"),
    # angle-bracket-wrapped URIs/addresses stay whole: <mailto:…>, <x@y.z>
    ("ANGLEURI", r"<mailto:[^\s<>]+>|<[\w.+%\-]+@[\w\-]+(?:\.[\w\-]+)+>"),
    ("URL", r"(?:(?:https?|ftp|svn(?:\+ssh)?)://|www\.|mailto:)[\w.\-@]+(?:/[\w.\-/%&?=+#~:@]*)?"),
    ("EMAIL", r"[\w.+%\-]+@[\w\-]+(?:\.[\w\-]+)+"),
    # filenames with a known extension are one token (PTBLexer FILENAME)
    ("FILENAME", r"[\w\-]+(?:\.[\w\-]+)*\.(?:jpe?g|png|gif|bmp|tiff?|pdf|"
                 r"html?|txt|doc|docx|xlsx?|csv|tsv|zip|tar|gz|bz2|mp[34]|"
                 r"wav|avi|mov|mkv|py|java|cpp|js|rs|go|sh)(?![\w.])"),
    ("HANDLE", r"[@#][A-Za-z_][\w]*"),  # @Harry_Styles, #hashtag
    ("EMOTICON", r"\^_\^|<3|[<>]?[:;=8][\-o*']?[)\](\[dDpP/\\|@3]"),
    # company/product names with a trailing bang (PTBLexer's lexical list)
    ("BANGWORD", r"(?<![A-Za-z])(?:Yahoo|Jeopardy|OK|E)!"),
    # spaced ellipsis ". . ." normalizes to "..." (one token)
    ("SPACEDOTS", r"\.(?: \.){2,}"),
    ("ELLIPSIS", r"\.\.+|…"),
    # leading-decimal compounds: .38-Magnum, .45
    ("DOTNUM", r"\.\d[\d,]*(?:[-–]\w+)*"),
    # hyphenated ranges / number compounds stay whole: 2010-2015, 20-30,
    # 80,000-man, 1,000-1,200, 5:30-to-10, 9-to-11:45, 555-55-5555
    # (trailing %, ., ' split off — PTBLexer hyphenated-token behavior)
    ("NUMRANGE", r"\d[\d,.:]*(?:[-–](?:\d{1,3}(?:,\d{3})+|[\w:]+(?:\.\d+)?))+"),
    ("TIME", r"\d{1,2}:\d{2}(?::\d{2})?"),
    ("ORDINAL", r"\d+(?:st|nd|rd|th)\b"),
    # negative number: sign attaches only when space-preceded and glued to
    # the digits ("779.5 -9.5 %" vs "2 - 9.5 %")
    ("NEGNUM", r"(?<!\S)-\d+(?:,\d{3})*(?:\.\d+)?(?![\w-])"),
    ("VERSION", r"\d+\.[A-Za-z]\w*"),  # Windows 3.x
    ("NUMPLURAL", r"['’]?\d+s(?!\w)"),  # decades/plural numbers: 1990s, '60s
    ("NUMBER", r"\d{1,3}(?:,\d{3})+(?:\.\d+)?|\d+\.\d+|\d+"),
    ("PROGLANG", r"[A-Za-z]#"),
    ("CENSORED", r"[A-Za-z]+\*+[A-Za-z*]*"),
    ("CURRENCY", r"(?:US|HK|A|C|NZ)?\$|£|€|¥"),
    ("ACRONYM", r"(?:[A-Za-z]\.){2,}"),
    # inner-dot names: Ph.D, Mesa A.B (alpha parts joined by single dots)
    ("DOTTED", r"[A-Za-z]+(?:\.[A-Za-z]+)+"),
    # standalone leading-apostrophe clitics ('em, 'tis, 'til; bare 's after
    # a non-word token: "60-90 's") — gated on a following non-letter so
    # quoted words ("'email'") are untouched
    ("CLITICTOK", r"['’](?:em|tis|twas|cause|till?|s)(?![A-Za-z])"),
    # word with optional internal hyphens/slashes/apostrophes/backquotes
    # (O'Malley, anti-acquisition, Sydney-based, Mu`ammar); soft hyphens
    # (\u00AD) ride inside and are stripped from the normalized word.
    # Trailing clitics split in post-pass.
    ("WORD", r"[A-Za-zÀ-ɏ0-9_\u00AD]+(?:[-/'’`][A-Za-zÀ-ɏ0-9_\u00AD]+)*\.?"),
    ("MULTIPUNCT", r"[?!]+"),
    ("DASH", r"--+|—|–"),
    ("QUOTE", r"``|''|[\"'`‘’“”]"),
    ("PUNCT", r"[^\sA-Za-z0-9]"),
]
MASTER = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _RULES))

# normalization map (PTBLexer quote/dash/ellipsis normalization, default opts)
_NORM = {"‘": "`", "’": "'", "“": "``", "”": "''",
         "—": "--", "–": "--", "…": "..."}
_NORM_QUOTES = {"‘", "’", "“", "”"}
_NORM_DASHES = {"—", "–"}

# PTBTokenizer option surface (process/PTBTokenizer.java:61-177 subset):
#   normalize_quotes/dashes/ellipsis — the PTBLexer normalization toggles;
#   split_hyphenated — "Sydney-based" → Sydney - based (UD-style);
#   strict_treebank3 — disable the informal-contraction deviations from
#   PTB3 (gonna/gimme/cannot stay whole, as in the original treebank).
DEFAULT_OPTIONS = {
    "normalize_quotes": True,
    "normalize_dashes": True,
    "normalize_ellipsis": True,
    "normalize_parentheses": False,  # ( → -LRB- etc. (PTB3 token forms)
    "split_hyphenated": False,
    "strict_treebank3": False,
}

# PTB3 bracket token forms (PTBLexer normalizeParentheses/normalizeOtherBrackets)
_PAREN_NORM = {"(": "-LRB-", ")": "-RRB-", "[": "-LSB-", "]": "-RSB-",
               "{": "-LCB-", "}": "-RCB-"}

_SENT_END = re.compile(r"^[.!?]+$|^[。！？]+$")
_FOLLOWER = re.compile(r"^[\"'`)\]}’”]+$|^''$")


def _split_word(original: str, begin: int, opt: dict):
    """Post-pass on a WORD match: abbreviation periods, clitics, split table.

    Yields (word, original, begin, end) 4-tuples. ``opt`` is the resolved
    option dict — threaded explicitly so concurrent pipelines with different
    tokenize options never share state (no module-level option global).
    """
    # soft hyphens vanish from the normalized word, stay in the original
    if "\u00AD" in original:
        cleaned = original.replace("\u00AD", "")
        if cleaned:
            yield (cleaned, original, begin, begin + len(original))
        return
    lower = original.lower()
    # abbreviation: keep trailing period iff known abbrev, else detach
    # (CONTEXT_ABBREVS kept here; tokenize_text re-splits them when no digit
    # follows — the context the lexer state machine sees)
    if original.endswith("."):
        if lower in ABBREVS or lower in CONTEXT_ABBREVS:
            yield (original, original, begin, begin + len(original))
            return
        core = original[:-1]
        yield from _split_word(core, begin, opt)
        yield (".", ".", begin + len(core), begin + len(original))
        return
    if lower in SPLIT_WORDS and not opt.get("strict_treebank3"):
        parts = SPLIT_WORDS[lower]
        pos = 0
        for i, p in enumerate(parts):
            seg = original[pos : pos + len(p)] if i < len(parts) - 1 else original[pos:]
            word = seg if seg.lower() == p.lower() else p  # keep original case
            yield (word, seg, begin + pos, begin + pos + len(seg))
            pos += len(seg)
        return
    # clitic split: don't → do + n't ; Mary's → Mary + 's ; didn`t → did n't
    norm = original.replace("’", "'").replace("`", "'")
    for cl in CLITICS:
        if norm.lower().endswith(cl.lower()) and len(norm) > len(cl):
            stem_orig = original[: len(original) - len(cl)]
            cl_orig = original[len(original) - len(cl):]
            if cl.lower() == "n't":
                yield (stem_orig, stem_orig, begin, begin + len(stem_orig))
            else:
                yield from _split_word(stem_orig, begin, opt)
            yield (norm[len(norm) - len(cl):], cl_orig,
                   begin + len(stem_orig), begin + len(original))
            return
    # normalized word form (curly/backquote apostrophes → '), raw original
    yield (norm, original, begin, begin + len(original))


def _norm_word(matched: str, opt: dict) -> str:
    if matched in _NORM_QUOTES and not opt.get("normalize_quotes"):
        return matched
    if matched in _NORM_DASHES and not opt.get("normalize_dashes"):
        return matched
    if matched == "…" and not opt.get("normalize_ellipsis"):
        return matched
    return _NORM.get(matched, matched)


def _split_hyphenated(tokens):
    """splitHyphenated post-pass: internal hyphens become their own tokens
    ("Sydney-based" → Sydney - based); number ranges keep their hyphens."""
    out = []
    for w, o, b, e in tokens:
        if "-" in w[1:-1] and not any(c.isdigit() for c in w) and len(w) == e - b:
            pos = b
            for part in re.split(r"(-)", w):
                if part:
                    out.append((part, part, pos, pos + len(part)))
                    pos += len(part)
        else:
            out.append((w, o, b, e))
    return out


def tokenize_text_with_barriers(text: str, options: dict | None = None):
    """Tokenize one text span → (tokens, barriers) where tokens are
    (word, original, begin, end) and barriers is the set of token indices
    at which markup forced a sentence break (CleanXML: tags are excluded
    from tokens, preserved positionally, and break sentences).

    ``word`` is the normalized form; ``original`` is the raw slice of the
    input (invertible: originals + offsets reconstruct the span exactly)."""
    opt = dict(DEFAULT_OPTIONS, **(options or {}))
    # cp1252 control-range normalization (1:1, offsets preserved); raw text
    # still supplies the originals
    norm_text = _CP1252_RE.sub(lambda m: CP1252[m.group()], text)
    out: list[tuple[str, str, int, int]] = []
    barriers: set[int] = set()
    for m in MASTER.finditer(norm_text):
        kind = m.lastgroup
        matched = m.group()
        raw = text[m.start():m.end()]
        if kind == "XMLTAG":
            barriers.add(len(out))
            continue
        if kind == "WORD":
            # words split on NORMALIZED text; originals re-sliced from the
            # raw input at the same offsets (1:1 mapping → invertible)
            out.extend((w, text[b:e], b, e)
                       for w, _, b, e in _split_word(matched, m.start(), opt))
        elif kind == "URL" and matched.endswith("."):
            core = matched[:-1]
            out.append((core, core, m.start(), m.end() - 1))
            out.append((".", ".", m.end() - 1, m.end()))
        elif kind == "SPACEDOTS":
            out.append(("...", raw, m.start(), m.end()))
        else:
            word = _norm_word(matched, opt)
            if kind == "PUNCT" and opt.get("normalize_parentheses") \
                    and matched in _PAREN_NORM:
                word = _PAREN_NORM[matched]
            if kind == "CLITICTOK":
                word = matched.replace("\u2019", "'")
            if kind == "QUOTE" and matched == '"' and opt.get("normalize_quotes"):
                # PTB: straight double quote → `` if opening else ''
                prev_sp = m.start() == 0 or norm_text[m.start() - 1].isspace() \
                    or norm_text[m.start() - 1] in "([{"
                word = "``" if prev_sp else "''"
            out.append((word, raw, m.start(), m.end()))
    # context gate for ambiguous abbreviations: "No. 24" keeps the period,
    # "I like Art. And…" detaches it (sentence boundary). Split positions are
    # recorded in INPUT space and all barriers remapped once at the end —
    # shifting barriers inside the loop while comparing against unshifted
    # input indices moves a barrier too far after 2+ splits.
    gated: list[tuple[str, str, int, int]] = []
    split_pts: list[int] = []
    for i, (w, o, b, e) in enumerate(out):
        if w.lower() in CONTEXT_ABBREVS:
            nxt = out[i + 1][0] if i + 1 < len(out) else ""
            keep = nxt[:1].isdigit() or (
                w.lower() in _CAP_CONTEXT_ABBREVS and nxt[:1].isupper()
                and nxt not in _CAP_CONTEXT_STOPS)
            if not keep:
                gated.append((w[:-1], o[:-1], b, e - 1))
                gated.append((".", ".", e - 1, e))
                split_pts.append(i)
                continue
        gated.append((w, o, b, e))
    if split_pts:
        barriers = {x + sum(1 for p in split_pts if p < x) for x in barriers}
    if opt.get("split_hyphenated"):
        gated = _split_hyphenated(gated)
    return gated, barriers


def tokenize_text(text: str, options: dict | None = None) -> list[tuple[str, str, int, int]]:
    """Tokenize one text span → list of (word, original, begin, end)."""
    return tokenize_text_with_barriers(text, options)[0]


def annotate_doc(spans: Iterable[dict],
                 options: dict | None = None) -> tuple[list[dict], list[dict]]:
    """Tokenize + ssplit one document's span list. Media spans are barriers."""
    tokens: list[dict] = []
    sentences: list[dict] = []
    sent_start = 0

    def close_sentence(span_idx: int):
        nonlocal sent_start
        if len(tokens) > sent_start:
            sidx = len(sentences)
            for t in tokens[sent_start:]:
                t["sent"] = sidx
            sentences.append(
                {"sent_idx": sidx, "start_tok": sent_start,
                 "end_tok": len(tokens), "span_idx": span_idx}
            )
            sent_start = len(tokens)

    for span in spans:
        kind = span["kind"]
        if kind != "text" or not span["text"]:
            close_sentence(span["offset"])  # media barrier ends open sentence
            continue
        span_idx = span["offset"]
        toks, barriers = tokenize_text_with_barriers(span["text"], options)
        i = 0
        while i < len(toks):
            if i in barriers:
                close_sentence(span_idx)  # markup forces a sentence break
            w, orig, b, e = toks[i]
            tokens.append(
                {"idx": len(tokens), "word": w, "original": orig,
                 "begin": b, "end": e, "span_idx": span_idx, "sent": -1}
            )
            if _SENT_END.match(w):
                # attach boundary followers (close quotes / brackets) left
                while i + 1 < len(toks) and _FOLLOWER.match(toks[i + 1][0]):
                    i += 1
                    w2, o2, b2, e2 = toks[i]
                    tokens.append(
                        {"idx": len(tokens), "word": w2, "original": o2,
                         "begin": b2, "end": e2, "span_idx": span_idx, "sent": -1}
                    )
                close_sentence(span_idx)
            i += 1
        close_sentence(span_idx)  # span end is also a boundary
    return tokens, sentences


def tokenize_docs(df: DataFrame, options: dict | None = None) -> DataFrame:
    """DataFrame transform: docs(doc_id, spans, ...) → + tokens, sentences.

    ``options``: PTBTokenizer option subset (DEFAULT_OPTIONS keys)."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += f", tokens {TOKENS_TYPE}, sentences {SENTENCES_TYPE}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks_col, sents_col = [], []
            for spans in pdf["spans"]:
                t, s = annotate_doc(spans, options)
                toks_col.append(t)
                sents_col.append(s)
            pdf = pdf.copy()
            pdf["tokens"] = toks_col
            pdf["sentences"] = sents_col
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
