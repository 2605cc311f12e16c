"""Unit tests: sentence segmentation + language ID (refs:
``test_data_extract.py:30-57``, ``test_lang.py:10-40``)."""
from text_extraction_system_ray.functions.lang import detect_language
from text_extraction_system_ray.functions.segment import sentence_spans


def test_simple_sentences():
    t = "First sentence here. Second one follows! Third asks? Yes."
    spans = sentence_spans(t)
    assert [t[s:e] for s, e in spans] == [
        "First sentence here.", "Second one follows!", "Third asks?", "Yes."]


def test_abbreviations_not_split():
    t = "Dr. Smith met Mr. Jones. They talked."
    spans = sentence_spans(t)
    assert [t[s:e] for s, e in spans] == ["Dr. Smith met Mr. Jones.",
                                          "They talked."]


def test_decimal_and_lowercase_continuation():
    t = "Pi is 3.14 about. version 2.0 shipped. done deal."
    spans = sentence_spans(t)
    # boundaries only before capitals/non-lowercase
    joined = [t[s:e] for s, e in spans]
    assert "Pi is 3.14 about. version 2.0 shipped. done deal." in " ".join(joined)


def test_initials():
    t = "J. R. Tolkien wrote books. True story."
    spans = sentence_spans(t)
    assert [t[s:e] for s, e in spans] == ["J. R. Tolkien wrote books.",
                                          "True story."]


def test_subrange_offsets_absolute():
    t = "pad pad. Real target sentence. More text."
    spans = sentence_spans(t, 9, 30)
    assert [t[s:e] for s, e in spans] == ["Real target sentence."]


def test_lang_goldens():
    # ref analog: 4 language goldens de/en/ru/uk (test_lang.py:10-40)
    assert detect_language("The quick brown fox jumps over the lazy dog") == "en"
    assert detect_language("Der schnelle braune Fuchs springt über den faulen Hund") == "de"
    assert detect_language("Быстрая лиса прыгает через ленивую собаку") == "ru"
    assert detect_language("Швидка лисиця стрибає через ледачого пса її хвіст") == "uk"
    assert detect_language("Le renard brun saute par dessus le chien paresseux") == "fr"
    assert detect_language("El zorro marrón salta sobre el perro perezoso") == "es"


def test_lang_scripts():
    assert detect_language("これは日本語のテキストです") == "ja"
    assert detect_language("这是中文文本内容") == "zh"
    assert detect_language("한국어 텍스트입니다") == "ko"
    assert detect_language("هذا نص عربي") == "ar"


def test_lang_empty_default():
    assert detect_language("") == "en"
    assert detect_language("12345 !!!") == "en"
