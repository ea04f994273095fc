"""DocumentPreprocessorTest.java ported (text mode, custom punct words,
whitespace-with-delimiter mode, boundary-follower edge cases)."""

from corenlp_spark.sources.document_preprocessor import DocumentPreprocessor


def _sents(text, punc=None, whitespace=False):
    dp = DocumentPreprocessor(text)
    if punc is not None:
        dp.set_sentence_final_punc_words(punc)
    if whitespace:
        dp.set_tokenizer_factory(None)
        dp.set_sentence_delimiter("\n")
    return [" ".join(s) for s in dp]


def test_text():
    test = ("This is a test of the preprocessor2.  It should split this "
            "text into sentences.  I like resting my feet on my desk.  "
            "Hopefully the people around my office don't hear me singing "
            "along to my music, and if they do, hopefully they aren't "
            "annoyed.  My test cases are probably terrifying looks into "
            "my psyche.")
    assert _sents(test) == [
        "This is a test of the preprocessor2 .",
        "It should split this text into sentences .",
        "I like resting my feet on my desk .",
        "Hopefully the people around my office do n't hear me singing "
        "along to my music , and if they do , hopefully they are n't "
        "annoyed .",
        "My test cases are probably terrifying looks into my psyche ."]


def test_near_final_punctuation():
    assert _sents("Mount. Annaguan") == ["Mount .", "Annaguan"]


def test_near_final_punctuation2():
    assert _sents("(I lied.)") == ["( I lied . )"]


def test_set_sentence_punct_words():
    test = ("This is a test of the preprocessor2... it should split this "
            "text into sentences? This should be a different sentence.This "
            "should be attached to the previous sentence, though. Calvin "
            "Wilson for St. Louis Post Dispatch called it one of LaBeouf's "
            "best performances.")
    assert _sents(test, punc=[".", "?", "!", "...", "\n"]) == [
        "This is a test of the preprocessor2 ...",
        "it should split this text into sentences ?",
        "This should be a different sentence.This should be attached to "
        "the previous sentence , though .",
        "Calvin Wilson for St. Louis Post Dispatch called it one of "
        "LaBeouf 's best performances ."]


def test_ellipsis_is_not_a_default_boundary():
    """The reference default boundary regex is \\.|[!?]+ — the ellipsis
    token does NOT end a sentence without setSentenceFinalPuncWords."""
    assert len(_sents("the preprocessor2... it should split? Sure.")) == 2


def test_whitespace_tokenization():
    test = ("This is a whitespace tokenized test case . \n  This should "
            "be the second sentence    . \n \n  \n\n  This should be the "
            "third sentence .  \n  This should be one sentence . The "
            "period should not break it . \n This is the fifth sentence , "
            "with a weird period at the end.")
    assert _sents(test, whitespace=True) == [
        "This is a whitespace tokenized test case .",
        "This should be the second sentence .",
        "This should be the third sentence .",
        "This should be one sentence . The period should not break it .",
        "This is the fifth sentence , with a weird period at the end."]
