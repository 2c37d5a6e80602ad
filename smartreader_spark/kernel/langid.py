"""Pluggable language identification (the reference's NLP plugin surface).

The reference exposes `Article.LanguageIdentification: Func<string,
string?, string?>` with the default returning the metadata language, and
ships a fastText-backed implementation in a separate package
(/root/reference/src/SmartReader.NaturalLanguageProcessing/NLP.cs:9-33,
`NLP.Enable()` → `LanguageTeller.TellLanguage(text).Language`).

This module provides the same three tiers for `Options.language_
identification` — module-level callables so they pickle cleanly into
Spark executor closures:

* metadata_language      — the reference's default (identity on metadata)
* stopword_language      — dependency-free heuristic (stopword argmax,
                           the same lexicons as functions/textqa.py)
* fasttext_language(...) — factory wrapping a real fastText model when
                           the `fasttext` package + model file exist
                           (import-gated; not available in this sandbox)
"""

from __future__ import annotations

# per-language stopword lexicons — the SINGLE source of truth for every
# consumer: stopword_language below, the Spark-side textqa.STOPWORDS
# (re-exported), the composed pipeline's language-aware quality gate,
# and the DuckDB oracle CTEs (which iterate this dict). ~25 highest-
# frequency function words per language from public frequency lists;
# 13 languages, two non-Latin scripts (Cyrillic, Arabic). Word overlaps
# across languages (que/de/la/…) are intentional — the argmax with the
# lexicographically-greatest tie-break disambiguates, and the tie
# semantics are regression-tested (tests/test_training.py).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "for", "it",
           "as", "with", "was", "on", "are", "be", "this", "by", "at",
           "from", "or", "an", "not", "but", "have"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "del",
           "las", "por", "con", "no", "se", "su", "para", "es", "al",
           "lo", "como", "más", "pero", "sus", "le"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "den", "mit",
           "ein", "eine", "nicht", "auch", "sich", "auf", "für", "als",
           "sie", "es", "an", "werden", "aus", "er", "hat", "dass"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "du", "que", "est",
           "pas", "pour", "dans", "qui", "sur", "au", "plus", "par", "il",
           "ne", "se", "ce", "avec", "son", "mais"),
    "it": ("il", "la", "di", "che", "e", "un", "una", "per", "non",
           "sono", "con", "si", "da", "come", "anche", "più", "ma",
           "dei", "nel", "alla", "questo", "della", "al", "gli", "ha"),
    "pt": ("o", "de", "que", "e", "do", "da", "em", "um", "para", "é",
           "com", "não", "uma", "os", "no", "se", "na", "por", "mais",
           "as", "dos", "como", "mas", "foi", "ao"),
    "nl": ("de", "het", "een", "en", "van", "is", "dat", "op", "te",
           "zijn", "voor", "met", "die", "niet", "aan", "er", "om",
           "ook", "als", "maar", "door", "over", "bij", "naar", "uit"),
    "sv": ("och", "att", "det", "som", "en", "på", "är", "av", "för",
           "med", "till", "den", "har", "de", "inte", "om", "ett",
           "han", "men", "var", "jag", "sig", "från", "vi", "så"),
    "pl": ("nie", "się", "na", "do", "że", "z", "i", "w", "jest", "to",
           "jak", "po", "co", "tak", "za", "od", "ale", "przez", "być",
           "przy", "czy", "tylko", "może", "już", "jego"),
    "tr": ("bir", "ve", "bu", "da", "de", "için", "ile", "olarak", "en",
           "çok", "daha", "olan", "ama", "gibi", "kadar", "sonra",
           "ancak", "her", "ki", "ya", "ne", "var", "iki", "büyük",
           "yeni"),
    "ru": ("и", "в", "не", "на", "что", "с", "он", "как", "это", "по",
           "но", "его", "к", "из", "у", "за", "от", "же", "то", "о",
           "так", "для", "бы", "мы", "или"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
           "ini", "dari", "dalam", "akan", "pada", "juga", "saya",
           "ke", "karena", "oleh", "ada", "mereka", "sudah", "bisa",
           "atau", "tersebut", "sebagai", "telah"),
    "ar": ("في", "من", "على", "أن", "إلى", "عن", "مع", "هذا", "كان",
           "التي", "الذي", "هو", "لا", "ما", "أو", "كل", "لم", "بعد",
           "قد", "غير", "بين", "حتى", "إذا", "هذه", "عند"),
}

_STOPSETS = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}


def metadata_language(text: str, language: str | None) -> str | None:
    """The reference's default: trust the document metadata
    (Article.cs:112 `IdentifyLanguageUsingMetadata`)."""
    return language


def stopword_language(text: str, language: str | None) -> str | None:
    """Heuristic identifier: argmax of stopword hits over the lexicons;
    falls back to the metadata language when nothing matches (a model
    that cannot decide should not erase trusted metadata)."""
    toks = text.lower().split()
    best_lang, best_hits = None, 0
    for lang in sorted(_STOPSETS):
        hits = sum(1 for t in toks if t in _STOPSETS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_lang is not None else language


def fasttext_language(model_path: str):
    """Factory for a fastText-backed identifier (the NLP.cs analog).
    Raises ImportError at construction when the fasttext package is not
    installed — callers fall back to stopword_language explicitly."""
    import fasttext  # noqa: F401  (not present in this sandbox)

    model = fasttext.load_model(model_path)

    def identify(text: str, language: str | None) -> str | None:
        labels, _scores = model.predict(text.replace("\n", " ")[:4096])
        if labels:
            return labels[0].replace("__label__", "")
        return language

    return identify
