"""HTTP server parity: /annotate, /ping, /shutdown-key semantics
(StanfordCoreNLPServer.java:51-90,447,470-489)."""

import json
import urllib.parse
import urllib.request

import pytest

from corenlp_spark.serve import CoreNLPServer


@pytest.fixture(scope="module")
def server(spark):
    srv = CoreNLPServer(spark)
    key = srv.start()
    yield srv, key
    srv.stop()


def _post(url, text, props=None):
    q = ""
    if props:
        q = "?properties=" + urllib.parse.quote(json.dumps(props))
    req = urllib.request.Request(url + "/annotate" + q,
                                 data=text.encode("utf-8"), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.headers.get_content_type(), r.read().decode("utf-8")


def test_ping(server):
    srv, _ = server
    with urllib.request.urlopen(srv.url + "/ping", timeout=30) as r:
        assert r.read() == b"pong\n"


def test_annotate_json_default(server):
    srv, _ = server
    ctype, body = _post(srv.url, "Barack Obama was born in Hawaii.")
    assert ctype == "application/json"
    doc = json.loads(body)
    sent = doc["sentences"][0]
    words = [t["word"] for t in sent["tokens"]]
    assert words[:2] == ["Barack", "Obama"]
    ners = {t["word"]: t["ner"] for t in sent["tokens"]}
    assert ners["Obama"] == "PERSON" and ners["Hawaii"] in ("LOCATION", "STATE_OR_PROVINCE", "GPE")
    assert any(e["dep"] == "root" for e in sent["basicDependencies"])


def test_annotate_conll_format(server):
    srv, _ = server
    _, body = _post(srv.url, "Cats sleep. Dogs bark.",
                    props={"outputFormat": "conll"})
    blocks = body.split("\n\n")
    assert len(blocks) == 2
    first = blocks[0].splitlines()[0].split("\t")
    assert first[0] == "1" and first[1] == "Cats"


def test_annotate_bad_format(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(srv.url, "x", props={"outputFormat": "nope"})
    assert ei.value.code == 400


def test_shutdown_requires_key(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(srv.url + "/shutdown?key=wrong", timeout=30)
    assert ei.value.code == 403
