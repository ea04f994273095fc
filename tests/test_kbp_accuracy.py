"""KBPRelationExtractorTest.java Accuracy tests ported whole."""

from pytest import approx

from corenlp_spark.models.kbp_accuracy import KBPAccuracy


def test_accuracy_simple():
    a = KBPAccuracy()
    a.predict({"a"}, {"a"})
    a.predict({"a"}, set())
    a.predict(set(), {"b"})
    a.predict({"b"}, set())
    a.predict({"b"}, {"b"})
    a.predict({"b"}, {"b"})
    assert a.precision("a") == approx(0.5)
    assert a.recall("a") == approx(1.0)
    assert a.f1("a") == approx(2 * 1.0 * 0.5 / 1.5)
    assert a.precision("b") == approx(2 / 3)
    assert a.recall("b") == approx(2 / 3)
    assert a.precision_micro() == approx(3 / 5)
    assert a.precision_macro() == approx(7 / 12)
    assert a.recall_micro() == approx(3 / 4)
    assert a.recall_macro() == approx(5 / 6)


def test_accuracy_no_relation():
    a = KBPAccuracy()
    a.predict({"a"}, {"a"})
    a.predict({"a"}, {"no_relation"})
    a.predict({"no_relation"}, {"b"})
    a.predict({"b"}, {"no_relation"})
    a.predict({"b"}, {"b"})
    a.predict({"b"}, {"b"})
    assert a.precision("a") == approx(0.5)
    assert a.recall("a") == approx(1.0)
    assert a.precision("b") == approx(2 / 3)
    assert a.recall("b") == approx(2 / 3)
    assert a.precision_micro() == approx(3 / 5)
    assert a.precision_macro() == approx(7 / 12)
    assert a.recall_micro() == approx(3 / 4)
    assert a.recall_macro() == approx(5 / 6)


def test_accuracy_true_negatives():
    a = KBPAccuracy()
    a.predict({"a"}, {"a"})
    a.predict({"a"}, {"no_relation"})
    a.predict({"no_relation"}, {"b"})
    a.predict({"b"}, {"no_relation"})
    a.predict({"b"}, {"b"})
    a.predict({"b"}, {"b"})
    a.predict({"no_relation"}, {"no_relation"})
    a.predict({"no_relation"}, {"no_relation"})
    a.predict({"no_relation"}, {"no_relation"})
    # true negatives change nothing
    assert a.precision_micro() == approx(3 / 5)
    assert a.recall_micro() == approx(3 / 4)
