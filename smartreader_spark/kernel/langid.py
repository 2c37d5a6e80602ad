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

# per-language stopword lexicons — keep in sync with
# smartreader_spark/functions/textqa.py STOPWORDS (the Spark-side twin)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "del"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu", "den", "mit", "ein"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "du", "que", "est"),
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
