"""Text-analysis operators over `documents(doc_id, text, ...)` — language
ID, quality scoring, token counting, fingerprinting. All native Spark SQL
expressions (whole-stage codegen), each with an exact SQL oracle twin in
oracles.py / __spark_entry__.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword gazetteers (public-knowledge function words).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "du", "que", "une"],
}


def _tokens(col):
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def _bpe_est(n_tok, n_chars):
    """BPE-ish subword estimate: ceil(chars/4) bounded below by word
    count (common len/4 heuristic)."""
    return F.greatest(n_tok, F.ceil(n_chars / 4).cast("int"))


def _norm_text():
    """Whitespace-normalized lowercase text — the fingerprint input."""
    return F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))


def _quality_exprs(toks):
    """(n_tok, n_chars, mean_wl, alpha_ratio, score) expression bundle
    over a token-array column plus the `text` column — THE quality
    formulas, shared by the standalone operators and the fused profile()
    so the two cannot drift (review finding: profile used to restate
    them)."""
    n_tok = F.size(toks)
    n_chars = F.length(F.col("text"))
    alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    mean_wl = F.when(n_tok > 0,
                     F.aggregate(toks, F.lit(0),
                                 lambda a, t: a + F.length(t)) / n_tok
                     ).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), n_tok / F.lit(20.0))
    wl_score = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)) \
        .otherwise(F.lit(0.5))
    score = F.round(0.4 * len_score + 0.3 * alpha_ratio + 0.3 * wl_score, 6)
    return n_tok, n_chars, mean_wl, alpha_ratio, score


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_tokens_bpe_est) — whitespace tokens + the
    BPE-ish estimate (_bpe_est)."""
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        _bpe_est(F.size(toks), F.length(F.col("text")))
        .alias("n_tokens_bpe_est"))


def _lang_best(toks_col):
    """Struct(hits, lang) of the winning language for a token-array column:
    argmax of stopword hits, deterministic tie-break by language code
    order (array_max on (hits, lang) structs)."""
    def _hits_for(lang):
        # N.B. a two-arg lambda would make F.filter pass (value, index);
        # build a fresh single-arg closure per language instead.
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        return F.size(F.filter(toks_col, lambda x: F.array_contains(sw, x)))

    hit_cols = [F.struct(_hits_for(lang).alias("hits"),
                         F.lit(lang).alias("lang"))
                for lang in sorted(LANG_STOPWORDS)]
    return F.array_max(F.array(*hit_cols))


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — argmax of stopword hits per language;
    deterministic tie-break by language code order. 'und' when nothing hits."""
    toks = _tokens(F.col("text"))
    return (docs.select("doc_id", toks.alias("t"))
            .withColumn("_b", _lang_best(F.col("t")))
            .select("doc_id",
                    F.when(F.col("_b.hits") > 0, F.col("_b.lang"))
                    .otherwise(F.lit("und")).alias("lang_pred"),
                    F.col("_b.hits").alias("lang_hits")))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_word_len, alpha_ratio, score) —
    simple length/character-class heuristics (_quality_exprs);
    score in [0,1]."""
    n_tok, n_chars, mean_wl, alpha_ratio, score = \
        _quality_exprs(_tokens(F.col("text")))
    return docs.select("doc_id", n_chars.alias("n_chars"),
                       n_tok.alias("n_tokens"),
                       F.round(mean_wl, 6).alias("mean_word_len"),
                       F.round(alpha_ratio, 6).alias("alpha_ratio"),
                       score.alias("score"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — md5 of whitespace-normalized lowercase text (md5 so the
    DuckDB oracle reproduces it bit-for-bit)."""
    return docs.select("doc_id", F.md5(_norm_text()).alias("fp"))


def profile(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_tokens_bpe_est, lang_pred, lang_hits, n_chars,
    mean_word_len, alpha_ratio, score, fp) — the full per-document text
    profile: token counting (token_count), language ID (language_id),
    quality scoring (quality_score) and md5 fingerprinting (fingerprint)
    fused into ONE projection over the corpus.

    At 100 TB this is a single map stage — one scan, zero shuffle — where
    running the four operators separately would scan the corpus four
    times. The component semantics are bit-identical to the standalone
    operators — _quality_exprs / _bpe_est / _norm_text / _lang_best are
    the SAME expression builders both forms call."""
    toks = _tokens(F.col("text"))
    base = docs.select("doc_id", F.col("text"), toks.alias("t"))
    n_tok, n_chars, mean_wl, alpha_ratio, score = \
        _quality_exprs(F.col("t"))
    best = _lang_best(F.col("t"))
    return base.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        _bpe_est(n_tok, n_chars).alias("n_tokens_bpe_est"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("lang_pred"),
        best["hits"].alias("lang_hits"),
        n_chars.alias("n_chars"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        score.alias("score"),
        F.md5(_norm_text()).alias("fp"))


def winnow_fingerprint(docs: DataFrame, k: int = 8, w: int = 4) -> DataFrame:
    """(doc_id, fp) — winnowing document fingerprints (Schleimer et al.,
    SIGMOD'03 rolling-hash fingerprinting): hash every character k-gram of
    the whitespace-normalized lowercase text with xxhash64, slide a window
    of `w` consecutive gram hashes, keep the minimum of each window,
    distinct. Robust to local edits where the whole-document md5
    fingerprint() is not.

    All native expressions, fully per-row (ZERO shuffle — the round-2
    posexplode + partitionBy(doc_id) window formulation moved one row per
    CHARACTER through an exchange to sort grams that were already adjacent
    in the row): `transform(sequence)` builds the gram-hash array in
    place, a second `transform` takes `array_min(slice(...))` per sliding
    window, `array_distinct` dedupes per document (which IS the distinct
    (doc_id, fp) contract), and a single explode emits the fingerprint
    set. Transient memory is ~8 bytes per character for the per-row hash
    array — far cheaper than shuffling the same volume. Docs shorter than
    k chars contribute their single short gram; windows that would run
    past the last gram are dropped (window starts 0..greatest(n_grams-w,
    0), so short docs keep window 0).

    Evaluation-count trap: referencing the gram-hash array from a sibling
    column (`withColumn("hs", ...)` then `slice(hs, ...)` in a second
    projection) lets CollapseProject inline the WHOLE hash-array
    expression into every window position — O(chars^2) hashes per
    document (measured: 467 s for 500 ~300-char docs). Binding it as a
    lambda variable via `transform(array(<hs>), hs -> ...)` forces
    exactly one evaluation per row (same contract as the
    asNondeterministic guard on similarity._ivf_cells_udf);
    tests/test_plans.py::test_winnow_single_hash_array_eval guards it."""
    txt = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    base = docs.select("doc_id", txt.alias("t"))
    hs = (f"transform(sequence(0, greatest(length(t) - {k}, 0)), "
          f"i -> xxhash64(substring(t, i + 1, {k})))")
    fps = (f"element_at(transform(array({hs}), "
           f"hs -> array_distinct(transform("
           f"sequence(0, greatest(size(hs) - {w}, 0)), "
           f"p -> array_min(slice(hs, p + 1, {w}))))), 1)")
    return base.select("doc_id", F.explode(F.expr(fps)).alias("fp"))


# PII patterns — conservative ASCII classes that parse identically in Java
# regex (Spark) and RE2 (DuckDB), so the oracle reproduces the redaction
# bit-for-bit. Order matters: emails first (phone digits can appear in
# local parts), then phones, then bare IPv4s.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\+[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_phone, n_ipv4, text_redacted) — mask emails,
    international-format phone numbers and bare IPv4 addresses with typed
    placeholder tokens, counting each match class before replacement.

    A standard pre-training hygiene pass: all native regexp expressions
    (whole-stage codegen, no UDFs), one projection over the corpus — at
    100 TB this is a pure map stage with zero shuffle."""
    redacted = F.col(text_col)
    counts = []
    for name, rx, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(redacted, F.lit(rx), 0))
            .alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, rx, token)
    return docs.select("doc_id", *counts,
                       redacted.alias("text_redacted"))


def winnow_dup_pairs(docs: DataFrame, k: int = 8, w: int = 4,
                     min_shared: int = 2, max_df: int = 1000) -> DataFrame:
    """(id_a, id_b, shared) — near-duplicate candidate pairs sharing at
    least `min_shared` winnowing fingerprints (the standard use of
    winnowing: SIGMOD'03 applies exactly this inverted-index join to find
    overlapping documents).

    Scale shape: self-join on the fingerprint inverted index — bounded by
    `max_df` (fingerprints appearing in more docs are boilerplate and are
    dropped like stopwords, observable via dropped_fp_report — same
    drops-are-never-silent contract as dedup's dropped_shingle_report),
    so no all-pairs product exists.

    The fingerprint table feeds three plan branches (the df filter and
    both join sides), and its per-character hash-array projection is the
    operator's second-biggest cost — eager localCheckpoint evaluates it
    once (GC-cleaned blocks, the repo-wide pin convention)."""
    fps = winnow_fingerprint(docs, k=k, w=w).localCheckpoint(eager=True)
    dfreq = (fps.groupBy("fp").agg(F.count("*").alias("df"))
             .filter(F.col("df") <= max_df))
    kept = fps.join(dfreq.select("fp"), "fp")
    a = kept.select(F.col("doc_id").alias("id_a"), "fp")
    b = kept.select(F.col("doc_id").alias("id_b"), "fp")
    return (a.join(b, "fp").filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b").agg(F.count("*").alias("shared"))
            .filter(F.col("shared") >= min_shared))


def dropped_fp_report(docs: DataFrame, k: int = 8, w: int = 4,
                      max_df: int = 1000) -> DataFrame:
    """(fp, df) for winnowing fingerprints the `max_df` cap drops from
    winnow_dup_pairs — boilerplate fingerprints must be observable, never
    silent (the contract dropped_shingle_report / dropped_chunk_report /
    dropped_token_report already keep for their caps). df counts DOCS:
    winnow_fingerprint's per-document array_distinct makes (doc_id, fp)
    rows unique."""
    fps = winnow_fingerprint(docs, k=k, w=w)
    return (fps.groupBy("fp").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df))


def stratified_sample(docs: DataFrame, strata_col: str = "lang",
                      cap: int = 100, seed: int = 100) -> DataFrame:
    """Deterministic stratified sample: up to `cap` docs per stratum,
    ranked by md5(doc_id || '#' || seed) — the same seeded-hash ranking
    the QSE sampling operators use (A1), so any SQL engine reproduces the
    exact sample. The balanced-corpus primitive of a training pipeline
    (cap a dominant language / source before mixing).

    One window per stratum partition — scales with the corpus; no global
    sort."""
    from pyspark.sql.window import Window
    rnk = F.row_number().over(
        Window.partitionBy(strata_col)
        .orderBy(F.md5(F.concat_ws("#", F.col("doc_id").cast("string"),
                                   F.lit(str(seed)))), F.col("doc_id")))
    return (docs.withColumn("rnk", rnk)
            .filter(F.col("rnk") <= cap)
            .select("doc_id", F.col(strata_col).alias("stratum"), "rnk"))
