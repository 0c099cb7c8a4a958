"""Context-cue phrase extraction.

The reference parses the VSM's common-sense answer with spaCy dependency
trees to pull out the location noun chunk (visual_search.py:54-112). spaCy
is used when importable; otherwise a lightweight heuristic extracts the
head noun phrase. The context-cue path only triggers when the target-cue
heatmap is weak, so the fallback costs little accuracy.
"""

from __future__ import annotations

import re
from typing import List

try:  # pragma: no cover - environment dependent
    import spacy
    try:
        _NLP = spacy.load("en_core_web_sm")
    except Exception:
        _NLP = None
except Exception:  # pragma: no cover
    spacy = None
    _NLP = None

_STOP_LEADERS = {
    "the", "a", "an", "on", "in", "at", "near", "of", "to", "is", "are",
    "it", "its", "be", "most", "likely", "location", "would",
}


def _spacy_noun_chunks(expression: str) -> List[str]:
    doc = _NLP(expression)

    def traverse(token):
        lo = hi = token.i
        for child in token.children:
            clo, chi = traverse(child)
            lo, hi = min(lo, clo), max(hi, chi)
        return lo, hi

    def chunk_span(token):
        left = [c for c in token.children if c.i < token.i]
        right = [c for c in token.children if c.i > token.i]
        start = end = token.i
        for lc in left[::-1]:
            if lc.dep_ in ("amod", "compound", "poss"):
                start, _ = traverse(lc)
            else:
                break
        for rc in right:
            if rc.dep_ in ("relcl", "prep"):
                _, end = traverse(rc)
            else:
                break
        return start, end

    spans = [chunk_span(t) for t in doc if t.pos_ in ("NOUN", "PRON")]
    spans = sorted(spans, key=lambda s: s[1] - s[0], reverse=True)
    kept = []
    for s in spans:
        if all(min(s[1], k[1]) - max(s[0], k[0]) < 0 for k in kept):
            kept.append(s)
    kept.sort(key=lambda s: s[0])
    return [doc[s[0]:s[1] + 1].text for s in kept]


def _heuristic_noun_chunks(expression: str) -> List[str]:
    """Fallback: strip leading function words; return the remaining phrase
    as one chunk (common case: 'on the kitchen counter')."""
    words = re.findall(r"[A-Za-z0-9'-]+", expression.lower())
    while words and words[0] in _STOP_LEADERS:
        words.pop(0)
    if not words:
        return []
    return [" ".join(words)]


def extract_noun_chunks(expression: str) -> List[str]:
    if _NLP is not None:
        return _spacy_noun_chunks(expression)
    return _heuristic_noun_chunks(expression)
