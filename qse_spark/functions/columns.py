"""Reusable native column expressions (JVM-side, codegen-friendly) shared
across operators: surface normalization, decoration stripping, shingling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..textnorm import STRIP_TOKENS


def normalize_surface_col(col):
    """Native twin of textnorm.normalize_surface (ASCII inputs)."""
    lowered = F.lower(col)
    spaced = F.regexp_replace(lowered, r"[ .\-_]+", " ")
    cleaned = F.regexp_replace(spaced, r"[^a-z0-9 ]", "")
    # dropping punctuation can fuse separator runs ('0.:_0' -> '0  0');
    # re-collapse so all three twins (scalar, pandas, native) agree
    collapsed = F.regexp_replace(cleaned, " +", " ")
    return F.regexp_replace(F.trim(collapsed), " ", "_")


def strip_core_col(col):
    """Native twin of textnorm.strip_core."""
    toks = F.split(col, "_")
    stop = F.array(*[F.lit(t) for t in sorted(STRIP_TOKENS)])
    kept = F.filter(toks, lambda t: ~F.array_contains(stop, t)
                    & (t != F.lit("")))
    return F.when(F.size(kept) > 0, F.array_join(kept, "_")).otherwise(col)


def shingles_col(col, n: int = 3):
    """Distinct character n-gram shingles of a string column or
    expression. Pure column API (no F.expr name-string), so it composes
    with higher-order-function lambda variables — linking's block-local
    shingle recomputation maps it over an array of cores. Values are
    bit-identical to the earlier expr-string form."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(0), F.greatest(F.length(c) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(c, i + 1, F.lit(n))))
