"""Reference-parity gate against SUTimeITest.java.

Parses each dated test method's text + expected TIMEX3 list straight from
the reference source and asserts the kernel reproduces at least the floor
set per method (value + overlapping text + mod).  The floors encode the
census as of r5; raising coverage must never lower them.

The known residue (accepted deviations, see audit_sutime.py):
- testSUTimeResolveTime expects UNresolved composite alt_values
  ("XXXX-WXX-6T12:30", "T09:00 OFFSET P1D") — this engine resolves those
  to concrete datetimes against the docdate, which the sibling methods
  (testSUTimeTime, testSUTime2) grade as correct.
- one testOverlaps case spans a line break ("Jun 18\\nWed") that the
  per-line harness splits.
- "the last week of October" gold is the internal composite
  "PREV_IMMEDIATE P1W INTERSECT XXXX-10"; this engine emits the resolved
  ISO week.

Skips when the reference checkout is absent; standalone goldens live in
test_aux.py.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

JAVA = "/root/reference/itest/src/edu/stanford/nlp/time/SUTimeITest.java"

pytestmark = pytest.mark.skipif(
    not os.path.exists(JAVA), reason="reference checkout not available"
)

#: method → minimum passing expected-timex count (of total at r5)
FLOORS = {
    "testSUTimeDurations": 19,    # /19
    "testSUTimeDurations2": 9,    # /13 (INTERSECT composites)
    "testSUTimeDurations3": 3,    # /4  (range→duration conversion)
    "testSUTime2": 20,            # /20
    "testSUTimeDate": 16,         # /16
    "testSUTimeDate2": 5,         # /5
    "testSUTimeDateTime": 14,     # /15 (composite last-week-of gold)
    "testSUTimeDateTime2": 12,    # /12
    "testSUTimeTime": 6,          # /6
    "testSUTimeSet": 4,           # /4
    "testSUTimeHolidays": 3,      # /3
    "testSUTimeInexactTime": 3,   # /3
    "testSUTimeIso": 11,          # /13 (split "T" token; bare "day")
    "testSUTimeIso2": 2,          # /2
    "testSUIsoWithTimezone": 7,   # /9  (split "T"; IANA-after-clock)
    "testSUTime12AmPm": 11,       # /12 ("hour of 12" phrasing)
    "testSUTimeRangeWithoutRange": 2,  # /2
    "testSUTimeRangeWithRange": 2,     # /3 (range→duration gold)
    "testSUTimeRangeConversion": 15,   # /16
    "testOverlaps": 16,           # /17 (line-split artifact)
}


@pytest.fixture(scope="module")
def census():
    import datetime

    from audit_ptb_goldens import _strip_comments
    from audit_sutime import extract_cases, our_spans, parse_methods

    src = _strip_comments(open(JAVA, encoding="utf-8").read())
    out = {}
    for name, body in parse_methods(src):
        if name not in FLOORS:
            continue
        case = extract_cases(body)
        assert case is not None, name
        test_text, dd, expected = case
        docdate = datetime.date(int(dd[:4]), int(dd[4:6]), int(dd[6:]))
        spans = []
        for line in test_text.split("\n"):
            if line.strip():
                spans.extend(our_spans(line, docdate))
        ok = sum(
            any(v == exp["value"]
                and (st in exp["text"] or exp["text"] in st)
                and (not exp["mod"] or md == exp["mod"])
                for st, _n, v, md in spans)
            for exp in expected
        )
        out[name] = (ok, len(expected))
    return out


@pytest.mark.parametrize("method", sorted(FLOORS))
def test_sutime_reference_floor(census, method):
    ok, total = census[method]
    assert ok >= FLOORS[method], f"{method}: {ok}/{total} < floor {FLOORS[method]}"
