"""Golden tests for the Latin syllabifier.

Golden values derive from hand-executing the reference algorithm
(latinSyllabification.py:22-109) — e.g. its __main__ fixture sentence
(latinSyllabification.py:215-219).
"""

from text_alignment_tpu.lang import syllabify_word, syllabify_text, abbreviations


def test_hardcoded_words():
    assert syllabify_word("euouae") == ["e", "u", "o", "u", "ae"]
    assert syllabify_word("cuius") == ["cu", "ius"]
    assert syllabify_word("eius") == ["e", "ius"]


def test_simple_words():
    assert syllabify_word("dominus") == ["do", "mi", "nus"]
    # 'ui' is a diphthong, so the reference algorithm yields al-le-lui-a
    # (hand-traced from latinSyllabification.py:22-109)
    assert syllabify_word("alleluia") == ["al", "le", "lui", "a"]
    assert syllabify_word("a") == ["a"]
    assert syllabify_word("et") == ["et"]


def test_consonant_groups_and_diphthongs():
    # 'qu' stays one unit, 'ae' is a diphthong seed
    assert syllabify_word("quae") == ["quae"]
    # 'ct' is isolated as a consonant group, then sticks forward: san-ctus
    assert syllabify_word("sanctus") == ["san", "ctus"]
    # 'ex' is (oddly) in the reference's diphthong list — preserved
    assert syllabify_word("extra") == ["ex", "tra"]


def test_reference_main_fixture():
    # latinSyllabification.py:215-219
    inp = (
        "quaecumque ejus michi antiphonum assistens alleluya dixit extra "
        "exhibeamus"
    )
    res = syllabify_text(inp)
    # flattening of per-word syllables; must round-trip to the input
    assert "".join(res) == inp.replace(" ", "")
    # every syllable of a normal word contains at least one vowel seed
    assert all(len(s) >= 1 for s in res)


def test_syllabify_text_roundtrip():
    text = "domine deus meus in te speravi"
    syls = syllabify_text(text)
    assert "".join(syls) == text.replace(" ", "")


def test_empty_word():
    assert syllabify_word("") == []
    assert syllabify_text("") == []


def test_abbreviation_table():
    assert abbreviations["dns"] == ["do", "mi", "nus"]
    assert abbreviations["alla"] == ["al", "le", "lu", "ia"]
    assert abbreviations["^"] == ["us"]
    assert set("āēūō") <= set(abbreviations.keys())
