"""S1 parity — N-Triples file source.

The reference streams N-Triples line-at-a-time through NxParser
(`filebased/Parser.java:103-105`) and re-scans the file once per phase.
Here the file is parsed ONCE into the engine's triple table with a single
`spark.read.text` + native regex expressions (splittable text scan, no
Python), and downstream phases share the cached/materialized table instead
of re-scanning (SURVEY §2 S1).

Object-kind tagging mirrors `Parser.extractObjectType`
(`Parser.java:414-429`): typed literal -> its datatype IRI local name,
language-tagged -> langString, plain literal -> string, IRI -> iri.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# <s> <p> <o> .   with o = IRI | literal ("..."[@lang|^^<dtype>]) | bnode
_S = r"^\s*(?:<([^>]*)>|(_:\S+))\s+"
_P = r"<([^>]*)>\s+"
_O = (r"(?:<([^>]*)>|(_:\S+)|\"((?:[^\"\\]|\\.)*)\""
      r"(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)|\^\^<([^>]*)>)?)\s*\.\s*$")
_NT = _S + _P + _O


def write_ntriples(triples: DataFrame, path: str,
                   iri_prefix: str = "http://ex.org/") -> None:
    """S17 sink twin of read_ntriples: serialize a
    (subject, predicate, object, obj_kind) table as N-Triples text.
    All IRI-kind terms get `iri_prefix`; literal kinds render as typed /
    language-tagged literals. Native expressions only, splittable output
    (one shard per partition). Roundtrips through read_ntriples."""
    _XSD = "http://www.w3.org/2001/XMLSchema#"

    def _esc(col):
        # N-Triples ECHAR escapes, backslash first; literal (non-regex)
        # replaces. \n/\r must be escaped or the line-oriented format breaks.
        col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
        col = F.replace(col, F.lit('"'), F.lit('\\"'))
        col = F.replace(col, F.lit("\n"), F.lit("\\n"))
        col = F.replace(col, F.lit("\r"), F.lit("\\r"))
        return F.replace(col, F.lit("\t"), F.lit("\\t"))

    # langString objects arrive as "word@lang" — split at the LAST '@'
    # WITHOUT regex `.` (Java `.` skips U+0085/U+2028/U+2029, silently
    # degrading such payloads to plain strings — round-2 fuzz finding).
    # A langString row with no parsable '@lang' suffix falls back to a
    # plain string literal (never emit the malformed `"..."@` form).
    # Tag grammar = the N-Triples LANGTAG production, the SAME pattern
    # read_ntriples' line regex accepts — a writer/reader grammar mismatch
    # silently drops the whole triple on roundtrip (round-3 review
    # finding: the writer took digit tags like es-419 the reader refused,
    # and accepted spec-invalid trailing hyphens like 'en-').
    _tag = F.substring_index(F.col("object"), "@", -1)
    _has_tag = (F.col("object").contains("@")
                & _tag.rlike(r"^[A-Za-z]+(-[A-Za-z0-9]+)*$"))
    lang_tag = F.when(_has_tag, _tag).otherwise(F.lit(""))
    lang_word = F.col("object").substr(
        F.lit(1), F.length("object") - F.length(_tag) - F.lit(1))
    obj_term = (
        F.when(F.col("obj_kind") == "iri",
               F.concat(F.lit("<" + iri_prefix), F.col("object"), F.lit(">")))
        .when(F.col("obj_kind") == "integer",
              F.concat(F.lit('"'), F.col("object"),
                       F.lit(f'"^^<{_XSD}integer>')))
        .when(F.col("obj_kind") == "date",
              F.concat(F.lit('"'), F.col("object"),
                       F.lit(f'"^^<{_XSD}date>')))
        .when((F.col("obj_kind") == "langString") & (lang_tag != ""),
              F.concat(F.lit('"'), _esc(lang_word), F.lit('"@'), lang_tag))
        .otherwise(F.concat(F.lit('"'), _esc(F.col("object")), F.lit('"'))))
    line = F.concat(F.lit("<" + iri_prefix), F.col("subject"), F.lit("> <"),
                    F.lit(iri_prefix), F.col("predicate"), F.lit("> "),
                    obj_term, F.lit(" ."))
    triples.select(line.alias("value")).write.mode("overwrite").text(path)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples file into (subject, predicate, object, obj_kind)."""
    raw = spark.read.text(path)
    g = [F.regexp_extract("value", _NT, i) for i in range(9)]
    s_iri, s_bn, pred, o_iri, o_bn, o_lit, o_lang, o_dt = (
        g[1], g[2], g[3], g[4], g[5], g[6], g[7], g[8])
    subject = F.when(s_iri != "", s_iri).otherwise(s_bn)
    is_iri_obj = (o_iri != "") | (o_bn != "")
    # undo write-side ECHAR escaping with a correct sequential scan:
    # split on `\\` (escaped backslash) FIRST, so any backslash remaining
    # inside a segment starts a genuine \"/\n/\r/\t escape; unescape those
    # per segment, then rejoin segments with a literal '\'. (A naive
    # replace chain would corrupt `\\n` = escaped-backslash + 'n'.)
    def _unesc_seg(s):
        s = F.replace(s, F.lit('\\"'), F.lit('"'))
        s = F.replace(s, F.lit("\\n"), F.lit("\n"))
        s = F.replace(s, F.lit("\\r"), F.lit("\r"))
        return F.replace(s, F.lit("\\t"), F.lit("\t"))

    o_lit = F.array_join(
        F.transform(F.split(o_lit, r"\\\\"), _unesc_seg), "\\")
    obj = (F.when(o_iri != "", o_iri)
           .when(o_bn != "", o_bn)
           .when(o_lang != "", F.concat(o_lit, F.lit("@"), o_lang))
           .otherwise(o_lit))
    dt_local = F.lower(F.element_at(F.split(o_dt, "#"), -1))
    obj_kind = (F.when(is_iri_obj, F.lit("iri"))
                .when(o_lang != "", F.lit("langString"))
                .when(o_dt == "", F.lit("string"))
                .when(dt_local.isin("int", "integer", "long", "short",
                                    "nonnegativeinteger", "decimal"),
                      F.lit("integer"))
                .when(dt_local.isin("date", "datetime", "gyear"),
                      F.lit("date"))
                .otherwise(F.lit("string")))
    return (raw.filter((F.col("value") != "")
                       & ~F.col("value").startswith("#"))
            .select(subject.alias("subject"), pred.alias("predicate"),
                    obj.alias("object"), obj_kind.alias("obj_kind"))
            .filter(F.col("subject") != ""))
