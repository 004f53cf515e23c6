"""Surface-form normalization shared by the generator, extractor and linker.

Two levels:
  normalize_surface  lowercase + strip punctuation + collapse whitespace
                     -> the mention_id (distinct per raw surface form)
  strip_core         additionally drop decoration tokens (titles, corporate
                     suffixes) -> the linking core used for exact blocking
                     and as the shingle basis for minhash/LSH

Standard entity-resolution practice: decorations ("Dr", "Corp.", "City")
never distinguish entities, so they are removed before similarity; genuine
lexical variation (extended surnames, abbreviated org nouns) is what the
fuzzy minhash path handles.
"""

from __future__ import annotations

# Decoration tokens removed by strip_core. Kept deliberately small + public.
STRIP_TOKENS = frozenset({
    "dr", "mr", "ms", "mrs", "prof", "phd", "md", "jr", "sr",
    "corp", "corporation", "inc", "incorporated", "ltd", "llc", "gmbh",
    "co", "company", "city", "the",
})


def normalize_surface(s: str) -> str:
    out = []
    for ch in s.lower():
        if ch.isalnum():
            out.append(ch)
        elif ch in " .-_":
            out.append(" ")
    return "_".join("".join(out).split())


def strip_core(norm_id: str) -> str:
    toks = [t for t in norm_id.split("_") if t and t not in STRIP_TOKENS]
    return "_".join(toks) if toks else norm_id
