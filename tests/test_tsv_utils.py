"""TSVUtilsTest.java + StopListTest.java ported whole."""

from corenlp_spark.sources.tsv_utils import StopList, parse_array


def test_parse_array_trivial():
    assert parse_array("{foo,bar}") == ["foo", "bar"]


def test_parse_array_quote():
    assert parse_array('{foo,",","a,b",bar}') == ["foo", ",", "a,b", "bar"]


def test_parse_array_escape():
    assert parse_array('{foo,"\\"","a\\"b",bar}') == ["foo", '"', 'a"b', "bar"]
    assert parse_array('{foo,\\",bar}') == ["foo", '"', "bar"]
    # the reference's documented quirk: four backslashes collapse to one
    assert parse_array('{"aa\\\\\\\\bb"}') == ["aa\\bb"]
    assert parse_array('{"a""b"}') == ['a"b']


REAL = ('{"<ref name=\\"Dr. Mohmmad Riaz Suddle, Director of the Paksat-IR '
        "programme and current executive member of the Suparco's plan and "
        'research division \\"/>",On,August,11th,",",Paksat-1R,|,\'\','
        "Paksat-IR,'',was,launched,from,Xichang,Satellite,Launch,Center,by,"
        'Suparco,",",making,it,first,satellite,to,be,launched,under,this,'
        "programme,.}")
WANT = (['<ref name="Dr. Mohmmad Riaz Suddle, Director of the Paksat-IR '
         "programme and current executive member of the Suparco's plan and "
         'research division "/>'] +
        ["On", "August", "11th", ",", "Paksat-1R", "|", "''", "Paksat-IR",
         "''", "was", "launched", "from", "Xichang", "Satellite", "Launch",
         "Center", "by", "Suparco", ",", "making", "it", "first",
         "satellite", "to", "be", "launched", "under", "this",
         "programme", "."])


def test_real_sentence():
    got = parse_array(REAL)
    assert len(got) == 31
    assert got == WANT


def test_real_sentence_double_escaped():
    got = parse_array(REAL.replace('\\"', '\\\\"'))
    assert len(got) == 31
    assert got == WANT


def test_stop_list():
    sut = StopList()
    assert sut.contains("and")
    assert "or" in sut
    assert not sut.contains("a")  # the generic table skips index 0
    assert not sut.contains("word")
