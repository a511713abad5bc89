"""Non-English Snowball stemmers: full-vocabulary parity with the public
Snowball test data the reference validates against
(xapian-data/stemming/{french,german2,russian}/voc.txt + output.txt),
plus embedded spot goldens so the suite still tests without the data."""

from __future__ import annotations

import os

import pytest

from xapian_spark.text.stem import Stemmer

_DATA = "/root/reference/xapian-data/stemming"

SPOT = {
    "french": [
        ("continuité", "continu"),
        ("majestueusement", "majestu"),
        ("jouaient", "jou"),
        ("nationale", "national"),
        ("conditionnel", "conditionnel"),
        ("généralement", "général"),
        ("voyions", "voyion"),
        ("effluves", "effluv"),
    ],
    "german2": [
        ("aufeinander", "aufeinand"),
        ("mädchen", "madch"),
        ("kategorie", "kategori"),
        ("ergebnisse", "ergebnis"),
        ("verständnisvoll", "verstandnisvoll"),
        ("dankbarkeit", "dankbar"),
        ("quae", "quae"),
    ],
    "russian": [
        ("вопросы", "вопрос"),
        ("пример", "пример"),
        ("быстрее", "быстр"),
        ("плохими", "плох"),
    ],
    "danish": [
        ("undersøgelse", "undersøg"),
        ("betydningen", "betydning"),
        ("kommunerne", "kommun"),
    ],
    "norwegian": [
        ("forskjellige", "forskjel"),
        ("hetene", "het"),
        ("bakerst", "bakerst"),
    ],
    "swedish": [
        ("verksamheterna", "verksam"),
        ("skillnaderna", "skillnad"),
        ("flerfullt", "flerfull"),
    ],
}


@pytest.mark.parametrize("lang", sorted(SPOT))
def test_spot_goldens(lang):
    st = Stemmer(lang)
    for word, want in SPOT[lang]:
        assert st(word) == want, (lang, word)


@pytest.mark.parametrize(
    "lang", ["french", "german2", "russian", "danish", "norwegian",
             "swedish", "spanish", "portuguese", "italian", "dutch", "romanian",
             "german", "indonesian", "irish", "basque", "hungarian",
             "finnish", "porter", "lithuanian", "nepali", "lovins",
             "kraaij_pohlmann", "turkish"]
)
def test_full_snowball_vocabulary(lang):
    voc = os.path.join(_DATA, lang, "voc.txt")
    out = os.path.join(_DATA, lang, "output.txt")
    if not os.path.exists(voc):
        pytest.skip("snowball vocabulary not available")
    st = Stemmer(lang)
    # splitlines, not split: porter stems "s" to the EMPTY string
    words = open(voc, encoding="utf-8").read().splitlines()
    wants = open(out, encoding="utf-8").read().splitlines()
    assert len(words) == len(wants)
    bad = [
        (w, st(w), o) for w, o in zip(words, wants) if st(w) != o
    ]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_tamil_smoke():
    """Tamil has no public Snowball vocabulary (xapian-data ships only
    COPYING), so spec-derived spot checks: plural/tense suffixes strip to
    real Tamil stems."""
    st = Stemmer("ta")
    assert st("புத்தகங்கள்") == "புத்தகம்"   # books -> book
    assert st("வீடுகள்") == "வீடு"           # houses -> house
    assert st("படித்தேன்") == "படி"          # I-read -> read
    assert st("செய்கிறான்") == "செய்"        # he-does -> do
    assert st("தமிழ்") == "தமிழ்"            # short word unchanged


def test_earlyenglish_variant():
    """earlyenglish = porter + -est/-eth stripping (earlyenglish.sbl
    Step_1b); no public vocabulary, so algorithmic spot checks."""
    ee, po = Stemmer("earlyenglish"), Stemmer("porter")
    assert ee("loveth") == "love"
    assert po("loveth") == "loveth"
    assert ee("goest") == "go"
    assert po("goest") == "goest"
    # identical away from est/eth
    for w in ("running", "happiness", "relational", "ties"):
        assert ee(w) == po(w)


def test_romanian_voc2():
    """Second Romanian vocabulary (older orthography + punctuation-bearing
    tokens): byte parity too."""
    voc = os.path.join(_DATA, "romanian", "voc2.txt")
    out = os.path.join(_DATA, "romanian", "output2.txt")
    if not os.path.exists(voc):
        pytest.skip("snowball vocabulary not available")
    st = Stemmer("ro")
    words = open(voc, encoding="utf-8").read().splitlines()
    wants = open(out, encoding="utf-8").read().splitlines()
    bad = [(w, st(w), o) for w, o in zip(words, wants) if st(w) != o]
    assert not bad, bad[:5]


def test_aliases_and_none():
    assert Stemmer("fr").language == "french"
    assert Stemmer("ru")("побежали") == Stemmer("russian")("побежали")
    assert Stemmer("none")("running") == "running"
    with pytest.raises(ValueError):
        Stemmer("klingon")
