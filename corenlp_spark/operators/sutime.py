"""SUTime subset: document dates + relative/duration temporal expressions.

Behavioral reference (re-expressed):
  - docdate assignment: ``pipeline/DocDateAnnotator.java`` (fixed / derived);
  - temporal normalization to Timex values: ``time/SUTime.java`` — the
    deliberately-reduced scope is absolute dates (done in ner.numeric_pass),
    relative day/week/month/year expressions resolved against the docdate,
    PRESENT/PAST_REF, and ISO-8601 durations ("three years" → P3Y). Timex
    values stay strings (``pipeline/WikidictAnnotator.java:125-140`` consumes
    them as strings — SURVEY.md §1.1).

Narrow mapInPandas; the docdate column is plain Spark SQL.
"""

from __future__ import annotations

import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from corenlp_spark.operators.ner import NUMBER_WORDS

_UNIT = {"day": "D", "days": "D", "week": "W", "weeks": "W",
         "month": "M", "months": "M", "year": "Y", "years": "Y"}
_REF = {"now": "PRESENT_REF", "currently": "PRESENT_REF",
        "recently": "PAST_REF", "formerly": "PAST_REF", "soon": "FUTURE_REF"}


def with_docdate(df: DataFrame, fixed: str | None = None) -> DataFrame:
    """+ docdate column: fixed ISO date, or deterministic per-doc date derived
    from doc_id (2020-01-01 + hash days — the test/synth policy)."""
    if fixed:
        return df.withColumn("docdate", F.lit(fixed))
    return df.withColumn(
        "docdate",
        F.date_format(
            F.date_add(F.lit("2020-01-01").cast("date"),
                       F.pmod(F.xxhash64("doc_id"), F.lit(1461)).cast("int")),
            "yyyy-MM-dd",
        ),
    )


def _resolve(words: list[str], lower: list[str], docdate: datetime.date):
    """Yield (start, end, ner, timex) for relative/duration expressions."""
    n = len(words)
    i = 0
    while i < n:
        w = lower[i]
        if w in _REF:
            yield i, i + 1, "DATE", _REF[w]
            i += 1
            continue
        if w == "today":
            yield i, i + 1, "DATE", docdate.isoformat()
            i += 1
            continue
        if w == "yesterday":
            yield i, i + 1, "DATE", (docdate - datetime.timedelta(days=1)).isoformat()
            i += 1
            continue
        if w == "tomorrow":
            yield i, i + 1, "DATE", (docdate + datetime.timedelta(days=1)).isoformat()
            i += 1
            continue
        if w in ("last", "next", "this") and i + 1 < n and lower[i + 1] in _UNIT:
            unit = _UNIT[lower[i + 1]]
            sign = -1 if w == "last" else (1 if w == "next" else 0)
            if unit == "D":
                d = docdate + datetime.timedelta(days=sign)
                val = d.isoformat()
            elif unit == "W":
                d = docdate + datetime.timedelta(weeks=sign)
                val = f"{d.isocalendar()[0]}-W{d.isocalendar()[1]:02d}"
            elif unit == "M":
                m = docdate.month - 1 + sign
                val = f"{docdate.year + m // 12}-{m % 12 + 1:02d}"
            else:
                val = str(docdate.year + sign)
            yield i, i + 2, "DATE", val
            i += 2
            continue
        # durations: "<number|numword> <unit>" → ISO-8601 P<n><U>
        qty = None
        if w in NUMBER_WORDS:
            qty = NUMBER_WORDS[w]
        elif w.isdigit():
            qty = int(w)
        if qty is not None and i + 1 < n and lower[i + 1] in _UNIT:
            unit = _UNIT[lower[i + 1]]
            yield i, i + 2, "DURATION", f"P{qty}{unit}"
            i += 2
            continue
        i += 1


def sutime_docs(df: DataFrame) -> DataFrame:
    """Resolve relative temporal expressions against the docdate column
    (requires tokens + docdate; overwrites only O-tagged tokens)."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_tokens = []
            for toks, dd in zip(pdf["tokens"], pdf["docdate"]):
                toks = [dict(t) for t in toks]
                docdate = datetime.date.fromisoformat(str(dd))
                words = [t["word"] for t in toks]
                lower = [w.lower() for w in words]
                for s, e, ner, val in _resolve(words, lower, docdate):
                    if all(
                        toks[k].get("ner", "O") in ("O", "NUMBER")
                        or str(toks[k].get("nner", "")).startswith("OFFSET")
                        for k in range(s, e)
                    ):
                        for k in range(s, e):
                            toks[k]["ner"], toks[k]["nner"] = ner, val
                new_tokens.append(toks)
            pdf = pdf.copy()
            pdf["tokens"] = new_tokens
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
