"""Property-based round-trip tests for the pure-python codecs
(WARC, BMP/PNM, WAV, Y4M) — no Spark session needed."""

import numpy as np
from hypothesis import given, settings, strategies as st

from nutch_spark.functions import media_codecs as mc
from nutch_spark.functions import warc as W

settings.register_profile("fast", max_examples=30, deadline=None)
settings.load_profile("fast")

url_st = st.from_regex(r"http://[a-z0-9]{1,10}\.test/[a-z0-9/]{0,20}",
                       fullmatch=True)
payload_st = st.binary(min_size=0, max_size=512)

# printable-ASCII, stripped, non-empty: the extractor strips each
# shown line and drops blanks (pdfparse._extract_text.flush), so the
# round-trip identity is defined over this domain (incl. ()\\ escapes)
_pdf_line = (st.text(st.characters(min_codepoint=0x20,
                                   max_codepoint=0x7E),
                     min_size=1, max_size=80)
             .map(str.strip).filter(bool))


@given(st.lists(_pdf_line, min_size=1, max_size=8), st.booleans())
def test_pdf_roundtrip_any_lines(lines, compress):
    from nutch_spark.functions.pdfparse import build_pdf, pdf_extract
    assert pdf_extract(build_pdf(lines,
                                 compress=compress))["text"] \
        == "\n".join(lines)


@given(st.lists(st.tuples(url_st, payload_st), min_size=1, max_size=5),
       st.booleans())
def test_warc_roundtrip_any_payload(recs, gz):
    full = [(u, "2024-01-01T00:00:00Z", p) for u, p in recs]
    got = list(W.iter_warc_records(W.encode_warc(full, gzip_members=gz)))
    assert len(got) == len(full)
    for rec, (u, _d, p) in zip(got, full):
        assert rec["warc-target-uri"] == u
        assert W.http_payload(rec)[1] == p


@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32))
def test_bmp_roundtrip_any_dims(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(mc.decode_bmp(mc.encode_bmp(px)), px)


@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32),
       st.booleans())
def test_pnm_roundtrip_any_dims(w, h, seed, color):
    rng = np.random.default_rng(seed)
    if color:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(mc.decode_pnm(mc.encode_ppm(px)), px)
    else:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(mc.decode_pnm(mc.encode_pgm(px)), px)


@given(st.integers(1, 200), st.sampled_from([8000, 16000, 44100]),
       st.integers(1, 2), st.integers(0, 2**32))
def test_wav_roundtrip_any_signal(n, rate, ch, seed):
    rng = np.random.default_rng(seed)
    sig = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    got_rate, got_ch, out = mc.decode_wav(
        mc.encode_wav(sig, rate, n_channels=ch))
    assert (got_rate, got_ch) == (rate, ch)
    assert np.array_equal(out, sig)


@given(st.integers(1, 10), st.integers(1, 10), st.integers(1, 5),
       st.integers(0, 2**32))
def test_y4m_roundtrip_any_frames(w, h, nf, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(h, w), dtype=np.uint8)
              for _ in range(nf)]
    gw, gh, it = mc.decode_y4m(mc.encode_y4m(frames))
    assert (gw, gh) == (w, h)
    got = list(it)
    assert len(got) == nf
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


@given(st.integers(1, 16), st.integers(1, 16), st.integers(1, 16),
       st.integers(1, 16), st.integers(0, 2**32))
def test_resize_nearest_dims_and_range(w, h, tw, th, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = mc.resize_nearest(px, tw, th)
    assert out.shape == (th, tw)
    # every output pixel is an actual source pixel
    assert set(np.unique(out)) <= set(np.unique(px))


_dmoz_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    max_size=30)
_dmoz_topic = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"),
                           blacklist_characters='"'),
    max_size=20)


@given(st.lists(st.tuples(_dmoz_topic, _dmoz_text, _dmoz_text,
                          _dmoz_text), min_size=1, max_size=8))
def test_dmoz_roundtrip_any_pages(pages):
    """encode_dmoz → iter_dmoz_pages is the identity on any
    (topic, url, title, description) rows, entities included."""
    from nutch_spark.functions import dmoz as D
    assert list(D.iter_dmoz_pages(D.encode_dmoz(pages))) == pages
