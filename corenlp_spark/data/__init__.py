from corenlp_spark.data.synth import GOLDEN_SENTENCES, synth_docs  # noqa: F401
