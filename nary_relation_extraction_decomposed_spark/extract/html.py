"""Frozen, dependency-free HTML -> text extractor.

BASELINE.json binds "byte-identical extracted text per url" across runs and
scales, so this module is the single source of truth for text extraction:

- Pure function of the input bytes. No wall clock, no locale, no env.
- No third-party parser (library upgrades would silently change bytes).
  The entity table below is fixed in-repo; numeric character references are
  decoded per the algorithm written here, nothing else.
- Versioned: bump EXTRACTOR_VERSION on ANY behavior change and regenerate
  goldens with fixtures/gen_pages.py in the same commit.

Executed Arrow-vectorized via ``mapInPandas`` (operators/textprep.py); this
file holds only the per-string kernel, which pandas ``Series.map`` applies
batch-wise (string kernels in Python are unavoidable here — the work is
real parsing, not expressible in Spark SQL functions; batches keep the
JVM<->Python crossing amortized).
"""

from __future__ import annotations

import re

EXTRACTOR_VERSION = 1

# Fixed entity table — intentionally small and frozen. Unknown named entities
# are passed through verbatim (deterministic).
_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
    "mdash": "—",
    "ndash": "–",
    "hellip": "…",
    "copy": "©",
    "reg": "®",
    "trade": "™",
    "eacute": "é",
    "egrave": "è",
    "uuml": "ü",
    "ouml": "ö",
    "auml": "ä",
    "szlig": "ß",
}

_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_SCRIPT = re.compile(r"<script\b.*?</script\s*>", re.DOTALL | re.IGNORECASE)
_RE_STYLE = re.compile(r"<style\b.*?</style\s*>", re.DOTALL | re.IGNORECASE)
# Block-level elements become line breaks; all other tags vanish.
_BLOCK_TAGS = (
    "p|div|br|hr|li|ul|ol|table|tr|td|th|h1|h2|h3|h4|h5|h6|blockquote|pre|"
    "section|article|header|footer|nav|aside|form|title"
)
_RE_BLOCK = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_ENTITY = re.compile(r"&(#x[0-9a-fA-F]{1,6}|#[0-9]{1,7}|[a-zA-Z][a-zA-Z0-9]{1,30});")
_RE_HSPACE = re.compile(r"[ \t\r\f\v ]+")


def _decode_entity(m: re.Match) -> str:
    body = m.group(1)
    # named entities first — the overwhelmingly common case in real pages
    # (identical decision tree as before: the entity regex guarantees a
    # body starting with '#' is a numeric reference and vice versa)
    if body[0] != "#":
        return _ENTITIES.get(body, m.group(0))
    if body[1] in "xX":
        cp = int(body[2:], 16)
    else:
        cp = int(body[1:], 10)
    if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
        return chr(cp)
    return "�"


def decode_bytes(html: bytes | None) -> str:
    """Charset handling: strict UTF-8, else latin-1 (total function, frozen)."""
    if html is None:
        return ""
    try:
        return html.decode("utf-8")
    except UnicodeDecodeError:
        return html.decode("latin-1")


def extract_text(html: bytes | None) -> str:
    """bytes -> canonical text. THE frozen kernel (see module docstring)."""
    s = decode_bytes(html)
    if not s:
        return ""
    s = _RE_COMMENT.sub("", s)
    s = _RE_SCRIPT.sub("", s)
    s = _RE_STYLE.sub("", s)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub("", s)
    s = _RE_ENTITY.sub(_decode_entity, s)
    # Collapse horizontal whitespace in ONE pass over the whole string —
    # the hspace class contains no '\n', so a run can never cross a line
    # boundary and the global sub is byte-identical to the old per-line
    # sub (which dominated the extractor profile at ~1 regex call per
    # output line) — then strip/drop per line as before.
    s = _RE_HSPACE.sub(" ", s)
    lines = []
    for raw in s.split("\n"):
        line = raw.strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_text_batch(htmls) -> list[str]:
    """Batch kernel for mapInPandas bodies."""
    return [extract_text(h) for h in htmls]
