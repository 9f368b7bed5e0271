"""Property-based fuzz of the frozen extractor (hypothesis): total on
arbitrary bytes, deterministic, and structurally clean output. No Spark —
pure kernel properties."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nary_relation_extraction_decomposed_spark.extract.html import extract_text


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_total_and_deterministic(data):
    out1 = extract_text(data)
    out2 = extract_text(data)
    assert out1 == out2
    assert isinstance(out1, str)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_output_shape_invariants(data):
    out = extract_text(data)
    if out == "":
        return
    # no leading/trailing blank lines, no horizontal-space runs, no blank lines
    for line in out.split("\n"):
        assert line == line.strip()
        assert line != ""
        assert "  " not in line and "\t" not in line


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters="<>&\x00",
                                       blacklist_categories=("Cs",)),
               max_size=500))
def test_plain_text_roundtrip(s):
    # text without markup/entities survives modulo whitespace normalization
    out = extract_text(s.encode("utf-8"))
    expected_lines = []
    for raw in s.split("\n"):
        line = " ".join(raw.split())
        if line:
            expected_lines.append(line)
    # extractor collapses only horizontal whitespace; vertical unicode spaces
    # may differ — compare token streams instead of raw strings
    assert "".join(out.split()) == "".join("\n".join(expected_lines).split())
