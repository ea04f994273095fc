"""Sentiment annotator: 5-class surface (SentimentAnnotator analog),
negation via natlog polarity, intensifier scaling."""

import pandas as pd

from corenlp_spark.data.synth import DOCS_SCHEMA
from corenlp_spark.operators.sentiment import (
    label_of, score_sentence, sentiment_docs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [f"s{i}" for i in range(len(texts))],
            "spans": [[{"kind": "text", "text": t, "media_ref": None,
                        "offset": 0}] for t in texts],
        }),
        schema=DOCS_SCHEMA,
    )


def test_kernel_scores():
    assert score_sentence("This movie was great .".split()) > 0
    assert score_sentence("This movie was terrible .".split()) < 0
    # intensifier scales up
    assert score_sentence("very good movie".split()) > \
        score_sentence("good movie".split())
    # lexicon negation window flips
    assert score_sentence("This movie was not good .".split()) < 0
    assert label_of(0.0) == "Neutral"
    assert label_of(2.5) == "Very positive"
    assert label_of(-2.5) == "Very negative"


def test_sentiment_docs_labels(spark):
    out = sentiment_docs(_docs(spark, [
        "This film is absolutely wonderful and the acting is excellent.",
        "The plot was terrible and the ending was awful.",
        "The meeting starts at noon.",
        "The film is not good.",
    ])).collect()
    by_doc = {r.doc_id: r for r in out}
    assert by_doc["s0"].sentiment == "Very positive"
    assert by_doc["s1"].sentiment == "Very negative"
    assert by_doc["s2"].sentiment == "Neutral"
    assert by_doc["s3"].sentiment == "Negative"


def test_polarity_negation_flip(spark):
    """Natlog downward polarity (not just the lexical window) drives the
    flip: 'No critic liked the film' has no negation word adjacent to
    'liked', but the quantifier scope marks it downward."""
    out = {r.doc_id: r for r in sentiment_docs(_docs(spark, [
        "No critic liked the film.",
        "Every critic liked the film.",
    ])).collect()}
    assert out["s0"].score < 0 < out["s1"].score
