"""Truth tables for the expansion/normalization kernels (FIXTURES.md F6).

Expected sets follow the reference implementations exactly
(transistor_spaces.py:12-144, 229-327; opamp_spaces.py:10-60).
"""

from tecs_hardware_kbc_spark.functions.expand import (
    expand_part_range,
    normalize_current_span,
    normalize_temp_span,
    normalize_volt_span,
)


def test_slash_suffix():
    assert set(expand_part_range("BC546A/B")) == {"BC546A", "BC546B", "BC546A/B"}


def test_thru_range():
    assert set(expand_part_range("2N3904 thru 2N3906")) == {
        "2N3904", "2N3905", "2N3906", "2N3904 thru 2N3906"}


def test_to_range():
    assert set(expand_part_range("BC546 to BC548")) == {
        "BC546", "BC547", "BC548", "BC546 to BC548"}


def test_dash_range():
    assert set(expand_part_range("BC546 - BC548")) == {
        "BC546", "BC547", "BC548", "BC546 - BC548"}


def test_letter_range():
    assert set(expand_part_range("BC546A ~ BC546C")) == {
        "BC546A", "BC546B", "BC546C", "BC546A ~ BC546C"}


def test_single_slash_equal_halves():
    assert set(expand_part_range("BC337-16/BC338-16")) == {
        "BC337-16", "BC338-16", "BC337-16/BC338-16"}


def test_multi_suffix():
    assert set(expand_part_range("123X/Y/Z")) == {"123X", "123Y", "123Z",
                                                  "123X/Y/Z"}


def test_plain_part_identity():
    assert set(expand_part_range("BC546")) == {"BC546"}


def test_single_slash_unequal_halves_not_split():
    # halves differ in length -> no half-splitting; suffix swap still applies
    out = set(expand_part_range("ABCD/EFG"))
    assert "ABCD/EFG" in out and "ABCD" in out
    # the reference's documented unstated assumption: single suffix is
    # swapped regardless (yields AEFG for ABCD/EFG)
    assert "AEFG" in out


def test_replace_all_quirk_preserved():
    # the reference enumerates via str.replace, which replaces every
    # occurrence of the differing digit — we must reproduce that behavior
    out = set(expand_part_range("2SD1454 thru 2SD1456"))
    assert "2SD1555" in out and "2SD1656" in out


def test_temp_normalizer():
    assert normalize_temp_span("- 55") == "-55"
    assert normalize_temp_span("-55") == "-55"
    assert normalize_temp_span("+ 150") is None
    assert normalize_temp_span("+150") == "150"
    assert normalize_temp_span("150") == "150"
    assert normalize_temp_span("−55") == "-55"  # unicode minus
    assert normalize_temp_span("NPN") == "NPN"


def test_volt_normalizer():
    assert normalize_volt_span("40.0") == "40"
    assert normalize_volt_span("40") == "40"
    assert normalize_volt_span("40.5") == "40.5"


def test_current_normalizer():
    assert normalize_current_span("± 2 . 3") == "±2.3"
    assert normalize_current_span("±2.3") == "±2.3"
    assert normalize_current_span("230") == "230"
    assert normalize_current_span("hello") == "hello"


def test_trigger_free_spans_are_identity():
    """Soundness of mentions._EXPAND_TRIGGER_RGX: a span without any
    expansion trigger character must expand to exactly [itself] — this is
    what lets part_mentions route trigger-free grams around the pandas UDF
    and the vocabulary join."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    py_gate = re.compile("[~,/‐‑‒–—−-]|\\.{3}|to|thru|through", re.IGNORECASE)
    alphabet = st.sampled_from(
        list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
             "0123456789 ._+±°"))

    @settings(max_examples=2000, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=1, max_size=18))
    def check(s):
        if not py_gate.search(s):
            assert expand_part_range(s) == [s]

    check()
