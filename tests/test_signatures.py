"""TextProfileSignature parity tests (TextProfileSignature.java:71-149)."""

import hashlib

from nutch_spark.functions.signatures import (
    text_profile,
    text_profile_signature,
)


def test_profile_tokenization():
    # tokens must be longer than min_token_len (strictly), lowercased
    prof = text_profile("aaa BBB cc dddd aaa")
    # cc is len 2, dropped; counts: aaa=2, bbb=1, dddd=1; maxFreq=2
    # QUANT = round(2*0.01)=0 -> <2 and maxFreq>1 -> QUANT=2
    # aaa -> (2//2)*2=2 keep; bbb,dddd -> 0 <2 drop
    assert prof == "aaa 2"


def test_profile_all_below_quant():
    # maxFreq=1 -> QUANT=1, everything kept, sorted by freq desc then
    # insertion order
    prof = text_profile("alpha beta gamma")
    assert prof == "alpha 1\nbeta 1\ngamma 1"


def test_profile_sort_by_freq_desc():
    prof = text_profile("one two two two three three one one one")
    # counts: one=4? (one appears 4x: positions 1, then 3 at end) ->
    # one=4, two=3, three=2; maxFreq=4, QUANT=round(0.04)=0 -> 2
    # one -> 4, two -> 2, three -> 2
    assert prof.splitlines()[0] == "one 4"
    assert set(prof.splitlines()[1:]) == {"two 2", "three 2"}


def test_signature_is_md5_of_profile():
    text = "hello world hello"
    expected = hashlib.md5(text_profile(text).encode()).hexdigest()
    assert text_profile_signature(text) == expected
    assert text_profile_signature(None) is None
    assert text_profile_signature("") is None
