"""MultiWordStringMatcherTest.java ported whole."""

from corenlp_spark.operators.multiword_matcher import MultiWordStringMatcher


def test_exctws_matching():
    m = MultiWordStringMatcher("EXCTWS")
    assert m.find_target_string_offsets(
        "the government Al-Ahram newspaper", "Al-Ahram") == [(15, 23)]
    assert m.find_target_string_offsets(
        "the government Al- Ahram newspaper", "Al-Ahram") == [(15, 24)]
    assert m.find_target_string_offsets(
        "the government Al- Ahram newspaper", "Al -Ahram") == []
    assert m.find_target_string_offsets(
        "the government Al-Ahramnewspaper", "Al -Ahram") == []
    assert m.find_target_string_offsets(
        "the government AlAhram newspaper", "Al -Ahram") == []
    assert m.find_target_string_offsets(
        "the government alahram newspaper", "Al -Ahram") == []
    assert m.find_target_string_offsets(
        "NZ Oil &amp;amp; Gas", "NZ Oil &amp;amp; Gas") == [(0, 20)]


def test_lnrm_matching():
    m = MultiWordStringMatcher("LNRM")
    assert m.find_target_string_offsets(
        "the government Al-Ahram newspaper", "Al-Ahram") == [(15, 23)]
    assert m.find_target_string_offsets(
        "the government Al- Ahram newspaper", "Al-Ahram") == [(15, 24)]
    assert m.find_target_string_offsets(
        "the government Al- Ahram newspaper", "Al -Ahram") == [(15, 24)]
    assert m.find_target_string_offsets(
        "the government Al-Ahramnewspaper", "Al -Ahram") == []
    assert m.find_target_string_offsets(
        "the government AlAhram newspaper", "Al -Ahram") == [(15, 22)]
    assert m.find_target_string_offsets(
        "the government alahram newspaper", "Al -Ahram") == [(15, 22)]
