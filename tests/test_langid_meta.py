"""language-identifier analog: the reference's own parseLanguage and
meta-HTML vectors (TestHTMLLanguageParser.java) plus the operator
policy contract."""

from pyspark.sql import functions as F

from nutch_spark.functions.langid_meta import (detect_html_language,
                                               parse_language)

# TestHTMLLanguageParser.java:70-96 — all 44 vectors verbatim
PARSE_VECTORS = [
    ("(SCHEME=ISO.639-1) sv", "sv"), ("(SCHEME=RFC1766) sv-FI", "sv"),
    ("(SCHEME=Z39.53) SWE", "sv"), ("EN_US, SV, EN, EN_UK", "en"),
    ("English Swedish", "en"), ("English, swedish", "en"),
    ("English,Swedish", "en"), ("Other (Svenska)", "sv"), ("SE", "se"),
    ("SV", "sv"), ("SV charset=iso-8859-1", "sv"), ("SV-FI", "sv"),
    ("SV; charset=iso-8859-1", "sv"), ("SVE", "sv"), ("SW", "sw"),
    ("SWE", "sv"), ("SWEDISH", "sv"), ("Sv", "sv"), ("Sve", "sv"),
    ("Svenska", "sv"), ("Swedish", "sv"), ("Swedish, svenska", "sv"),
    ("en, sv", "en"), ("sv", "sv"),
    ("sv, be, dk, de, fr, no, pt, ch, fi, en", "sv"), ("sv,en", "sv"),
    ("sv-FI", "sv"), ("sv-SE", "sv"), ("sv-en", "sv"), ("sv-fi", "sv"),
    ("sv-se", "sv"), ("sv; Content-Language: sv", "sv"),
    ("sv_SE", "sv"), ("sve", "sv"),
    ("svenska, swedish, engelska, english", "sv"), ("sw", "sw"),
    ("swe", "sv"), ("swe.SPR.", "sv"), ("sweden", "sv"),
    ("swedish", "sv"), ("swedish,", "sv"),
    ("text/html; charset=sv-SE", "sv"), ("text/html; sv", "sv"),
    ("torp, stuga, uthyres, bed & breakfast", None),
]

# TestHTMLLanguageParser.java:36-45 meta documents
META_DOCS = [
    ('<html lang="fi"><head><title>d1</title></head>'
     "<body>suomalainen</body></html>", "fi"),
    ('<html><head><meta http-equiv="content-language" content="en">'
     "<title>d2</title></head><body>this is english</body></html>",
     "en"),
    ('<html><head><meta name="dc.language" content="en"><title>d3'
     "</title></head><body>this is english</body></html>", "en"),
]


def test_parse_language_reference_vectors():
    for raw, expected in PARSE_VECTORS:
        assert parse_language(raw) == expected, raw


def test_meta_html_reference_docs():
    for html, expected in META_DOCS:
        assert detect_html_language(html.encode()) == expected


def test_precedence_and_fallbacks():
    # html attr beats dc.language beats http-equiv (:196-203)
    html = ('<html lang="sv"><meta name="dc.language" content="en">'
            '<meta http-equiv="content-language" content="fi">')
    assert detect_html_language(html.encode()) == "sv"
    html2 = ('<html><meta name="dc.language" content="en">'
             '<meta http-equiv="content-language" content="fi">')
    assert detect_html_language(html2.encode()) == "en"
    # unresolvable lang attr leaves the slot open for a later element
    html3 = '<html lang="zz-unknown"><body lang="sv">x</body></html>'
    assert detect_html_language(html3.encode()) == "sv"
    # header fallback is RAW, un-normalized (the :131-134 quirk)
    assert detect_html_language(b"<html><body>x</body></html>",
                                "SWEDISH") == "SWEDISH"
    # parse-meta already set wins, raw (:90-96)
    assert detect_html_language(b'<html lang="sv">', None,
                                {"dc.language": "klingon"}) == "klingon"
    assert detect_html_language(b"<p>x</p>") is None


def test_html_language_operator(spark):
    from nutch_spark.operators.parse import html_language

    rows = [
        ("u1", bytearray('<html lang="sv"><body>x</body></html>'
                         .encode()), None, "the of and to in is was"),
        # no declared signal -> header
        ("u2", bytearray(b"<html><body>x</body></html>"), "fi-FI",
         "the of and"),
        # nothing declared -> identify (stopword heuristic -> en)
        ("u3", bytearray(b"<html><body>x</body></html>"), None,
         "the of and to in is was it for on"),
    ]
    df = spark.createDataFrame(
        rows, "url string, html binary, content_language string, "
              "text string")
    out = {r["url"]: r["lang"]
           for r in html_language(df).collect()}
    assert out["u1"] == "sv"
    assert out["u2"] == "fi-FI"          # raw header, reference quirk
    assert out["u3"] == "en"
    # identify-first policy flips u1 to the statistical answer
    out2 = {r["url"]: r["lang"]
            for r in html_language(
                df, policy=("identify", "detect")).collect()}
    assert out2["u3"] == "en"
