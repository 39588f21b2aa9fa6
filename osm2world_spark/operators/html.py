"""HTML -> text extraction — the crawl-to-corpus step between the WARC
source and the quality/dedup operators (what C4 ran before its line
rules, Raffel et al. 2020 §2.2; RefinedWeb/FineWeb use trafilatura for
the same role).  Implemented entirely as Catalyst Column regexps with
engine-portable syntax (non-greedy spans, inline (?is) flags, explicit
character classes — both java.util.regex and DuckDB's RE2 accept every
pattern here; no backreferences, which RE2 lacks), so extraction over
100 TB of crawl HTML is a shuffle-free whole-stage-codegen projection.

Pipeline per document:
  1. drop non-content subtrees wholesale: <script>, <style>,
     <noscript>, <svg>, <template>, plus comments and CDATA
  2. block-level closing/opening tags become newlines (so paragraph
     structure survives for the line-based quality rules downstream),
     <br> becomes a newline
  3. every remaining tag is stripped
  4. character references decode: the named set HTML actually uses in
     volume (amp/lt/gt/quot/apos/nbsp) plus ALL decimal and hex
     numeric references across the scalar range — a bounded chained-replace for the
     named set and a regexp+chr pass for numeric ones
  5. whitespace normalizes: runs of spaces/tabs collapse, >2 blank
     lines collapse, edges trim

Boundaries (documented, pinned by tests): no JS/CSS evaluation, no
charset re-sniffing (upstream decodes bytes), the full named-entity
table (~2k names) is out — rare names pass through literally rather
than guessing.  &amp; decodes LAST so "&amp;lt;" yields the literal
"&lt;" exactly as a browser does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# subtrees whose text is never content
_DROP_TAGS = ("script", "style", "noscript", "svg", "template")
# tags that imply a line break when they open or close
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|table|tr|td|th|h1|h2|h3|h4|h5|h6|blockquote|"
    "pre|section|article|header|footer|form|figure|figcaption|hr"
)
# decode order matters: &amp; LAST (see module docstring)
_NAMED_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(html: Column) -> Column:
    """Steps 1-3: the tag-free raw text with block newlines.  Tag-name
    boundaries are explicit ((\\s[^>]*)? / (\\s[^>]*|/)? — the char
    after the name must be whitespace, '/' or '>') so custom elements
    like <template-x> or <svg-icon> are NOT swallowed by their prefix;
    lookahead would be cleaner but RE2 (the oracle engine) lacks it."""
    out = html
    for t in _DROP_TAGS:
        out = F.regexp_replace(
            out, f"(?is)<{t}(\\s[^>]*)?>.*?</{t}\\s*>", " "
        )
    out = F.regexp_replace(out, "(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, "(?s)<!\\[CDATA\\[.*?\\]\\]>", " ")
    out = F.regexp_replace(
        out, f"(?i)</?({_BLOCK_TAGS})(\\s[^>]*|/)?>", "\n"
    )
    return F.regexp_replace(out, "<[^>]*>", "")


def decode_entities(text: Column) -> Column:
    """Step 4.  Numeric references need a computed chr() per match,
    which a single regexp_replace cannot express — so the bounded
    named-set chain runs as pure regexps and numeric references go
    through one vectorized Arrow pass only when requested via
    decode_numeric_entities (kept separate so the common path stays
    whole-stage codegen)."""
    out = text
    for src, dst in _NAMED_ENTITIES:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def decode_numeric_entities(text: Column) -> Column:
    """&#NNNN; / &#xHHHH; -> the character (any Unicode scalar), via one Arrow-batched
    pandas pass (chr-per-match is not expressible as a Column)."""
    import re

    import pandas as pd

    # full scalar range: U+10FFFF is 6 hex / 7 decimal digits
    pat = re.compile(r"&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")

    def sub(m) -> str:
        v = m.group(1)
        code = int(v[1:], 16) if v[0] in "xX" else int(v)
        return chr(code) if code < 0x110000 else m.group(0)

    def _decode(s):
        return s.map(lambda t: pat.sub(sub, t) if t is not None else None)

    # annotations must be real objects, not strings, for pandas_udf to
    # resolve them from a nested scope (same idiom as similarity.py)
    _decode.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_decode, "string")(text)


def normalize_whitespace(text: Column) -> Column:
    """Step 5: collapse space runs, cap blank-line runs, trim edges."""
    out = F.regexp_replace(text, "[ \\t\\x0b\\f\\r]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    out = F.regexp_replace(out, "\\n{3,}", "\n\n")
    # edge trim including newlines (F.trim is space-only)
    return F.regexp_replace(out, "^\\s+|\\s+$", "")


def extract_text(html: Column, numeric_entities: bool = False) -> Column:
    """The full HTML -> text pipeline as one Column expression.  With
    numeric_entities=False (default) the plan is 100% codegen regexps;
    True inserts the one Arrow pass for &#NNNN; references — BEFORE
    the named chain, so '&amp;#65;' stays the literal '&#65;' exactly
    as a browser renders it (the named pass must not manufacture
    numeric references for the numeric pass to eat)."""
    out = strip_markup(html)
    if numeric_entities:
        out = decode_numeric_entities(out)
    return normalize_whitespace(decode_entities(out))


def extract_title(html: Column) -> Column:
    """<title> text, entity-decoded and whitespace-collapsed ('' when
    absent) — the cheap document label crawl pipelines keep."""
    t = F.regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(decode_entities(t), "\\s+", " "))


def extract_links(html: Column) -> Column:
    """array<string> of href targets in document order (raw attribute
    values; resolution against a base URL composes with
    operators/web.py canonical_url downstream).  The two quote styles
    are separate alternates whose group INCLUDES the quotes (RE2 has
    no backreferences to enforce the match otherwise), stripped by one
    transform — so href="/p?a='x'" keeps its embedded single quote
    instead of truncating at it."""
    quoted = F.regexp_extract_all(
        html, F.lit("(?i)href=(\"[^\"]*\"|'[^']*')"), F.lit(1)
    )
    return F.transform(
        quoted, lambda s: s.substr(F.lit(2), F.length(s) - 2)
    )


def html_to_documents(
    docs: DataFrame, html_col: str = "text", out_col: str = "text"
) -> DataFrame:
    """Corpus form: replace the raw-HTML column with extracted text and
    attach title/link evidence — the frame the quality/dedup family
    consumes next."""
    return docs.withColumn("title", extract_title(F.col(html_col))).withColumn(
        "links", extract_links(F.col(html_col))
    ).withColumn(out_col, extract_text(F.col(html_col)))
