"""Stage 1 — vectorized mention detection + triple extraction per turn.

The transcript-to-triple front-end the reference does not have (QSE consumes
ready N-Triples, `filebased/Parser.java:103-105`); required by the north
rule: batched Arrow/pandas UDFs, no per-row Python.

Extraction is a deterministic template grammar: each template anchors a
sentence pattern and role-types its capture positions (positional NER), so
the emitted triples and rdf:type assertions are exactly computable — the
synthetic-fixture generator (testdata.py) and this extractor are two
independent implementations of the same grammar, which is what makes the
P/R-vs-gold test exact.

Physical shape: `mapInArrow` over Arrow record batches; inside a batch
every template runs as one RE2 `pc.match_substring` gate + one
`pc.extract_regex` (both C++ over the whole column) — zero per-row Python,
zero pandas materialization (measured 2.8x the pandas-UDF batch it
replaced). The UDF emits RAW surface forms; mention normalization is a
JVM-native projection AFTER the UDF (`functions.columns.
normalize_surface_col`, property-tested against the scalar twin), so in
the fused aggregate path it runs per VOCABULARY row instead of per
occurrence — at 10^12 turns that removes the per-occurrence normalize
entirely from the Python worker. Conversation-salted repartitioning
before the UDF keeps giant conversations from pinning a partition
(SURVEY §4 item 3).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from ..constants import TYPE_PREDICATE
from ..functions.columns import normalize_surface_col

TRIPLE_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("subject", StringType()),
    StructField("predicate", StringType()),
    StructField("object", StringType()),
    StructField("obj_kind", StringType()),
])

_NAME = r"[A-Za-z][A-Za-z .]*?"

# (predicate, needle, regex, subj_class, obj_class, obj_kind)
# `needle` is a literal substring prefilter: the (cheap, C++-level,
# non-regex) `pc.match_substring` gates which rows each template's regex
# actually runs on — an order-of-magnitude cut in regex work per batch.
# obj_kind "iri" objects are mentions; literals pass through. Surfaces are
# emitted RAW — normalization happens JVM-side (see module docstring).
TEMPLATES = [
    ("worksAt", " works at ",
     rf"^({_NAME}) works at ({_NAME})\.$", "Person", "Company", "iri"),
    ("locatedIn", " is located in ",
     rf"^({_NAME}) is located in ({_NAME})\.$", "Company", "City", "iri"),
    ("collaboratesWith", " collaborates with ",
     rf"^({_NAME}) collaborates with ({_NAME})\.$", "Person", "Person", "iri"),
    ("age", " years old",
     rf"^({_NAME}) is (\d+) years old\.$", "Person", None, "integer"),
    ("joinedOn", " joined on ",
     rf"^({_NAME}) joined on (\d{{4}}-\d{{2}}-\d{{2}})\.$",
     "Person", None, "date"),
    ("greeting", " greeted in ",
     rf"^({_NAME}) greeted in ([a-z]{{2}}): \"([a-z]+)\"\.$",
     "Person", None, "langString"),
    ("motto", " motto is ",
     rf"^({_NAME}) motto is \"([a-z ]+)\"\.$", "Company", None, "string"),
    ("contributesTo", " contributes to ",
     rf"^({_NAME}) contributes to ({_NAME})\.$",
     "Person", None, "iri"),  # object stays untyped -> undefined objType
    (TYPE_PREDICATE, " is an employee",
     rf"^({_NAME}) is an employee\.$", "Person", "__EMPLOYEE__", None),
    ("returnedStatus", " returned status ",
     r"^([a-z_]+) returned status (\d+)\.$", "Tool", None, "integer"),
]


def _named(rx: str) -> str:
    """Capturing groups -> named groups g1..gN (pc.extract_regex returns a
    struct keyed by group NAME; RE2 supports (?P<...>) and lazy `*?`).

    Escape-aware: the scan consumes `\\x` pairs and whole `[...]`
    character classes first, so a literal `\\(` or a `[(]` is never
    rewritten (and `\\\\(` — escaped backslash, then a real group —
    is). No current template has a literal paren, but a blind
    `\\((?!\\?)` sub would silently corrupt the first one added."""
    i = 0

    def repl(m):
        nonlocal i
        if m.group(1) is not None:  # escaped char or character class
            return m.group(1)
        i += 1
        return f"(?P<g{i}>"

    return re.sub(r"(\\.|\[(?:\\.|[^\]\\])*\])|\((?!\?)", repl, rx)


_ARROW_TEMPLATES = [(pred, needle, _named(rx), subj_cls, obj_cls, obj_kind)
                    for pred, needle, rx, subj_cls, obj_cls, obj_kind
                    in TEMPLATES]


def _norm_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas twin of textnorm.normalize_surface (ASCII inputs).

    No longer on the extraction hot path (normalization moved to the
    JVM-native normalize_surface_col projection) — kept as the pandas
    member of the three-twin agreement property test
    (tests/test_property.py: scalar == pandas == native column)."""
    u = pd.Series(s.unique())
    normed = (u.str.lower()
              .str.replace(r"[ .\-_]+", " ", regex=True)
              .str.replace(r"[^a-z0-9 ]", "", regex=True)
              # dropping a disallowed char can fuse two separator runs
              # ("0.:_0" -> "0  0"); re-collapse so the result matches the
              # scalar twin's whitespace-split semantics
              .str.replace(r" +", " ", regex=True)
              .str.strip()
              .str.replace(" ", "_", regex=False))
    return s.map(pd.Series(normed.values, index=u.values))


def _extract_table(text: pa.Array,
                   carries: list[tuple[str, pa.Array]]) -> pa.Table | None:
    """text (null-free) -> raw-triple Table with columns
    [*carry names, subject, predicate, object, obj_kind] (surfaces
    unnormalized), or None when nothing matched. Each carry array is
    aligned with `text` and taken at hit indices — the per-turn path
    carries (conv_id, turn_idx), the fused group path carries the
    distinct-text multiplicity. All compute is Arrow C++ kernels; the
    only Python-level loop is over the 10 templates."""
    names = [n for n, _ in carries] + ["subject", "predicate", "object",
                                       "obj_kind"]
    cols: dict[str, list] = {k: [] for k in names}
    # `cur` holds the still-unclaimed rows; `abs_idx` maps cur positions
    # back to the original batch so carry columns stay aligned. Claimed
    # rows are physically compacted out once a template claims >= 1/8 of
    # cur, so later needle gates scan only the shrinking unclaimed
    # remainder instead of the full column per template (round-4 review:
    # full-column gates were ~30% of batch time in the pandas version);
    # the 1/8 threshold amortizes the take-copy against the scans saved.
    cur = text
    abs_idx: np.ndarray | None = None        # None = identity mapping
    alive = np.ones(len(cur), dtype=bool)    # relative to cur
    for pred, needle, rx, subj_cls, obj_cls, obj_kind in _ARROW_TEMPLATES:
        gate = pc.match_substring(cur, needle).to_numpy(
            zero_copy_only=False) & alive
        if not gate.any():
            continue
        sel = np.flatnonzero(gate)
        ext = pc.extract_regex(pc.take(cur, pa.array(sel)), rx)
        valid = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        if not valid.any():
            continue
        rel_hit = sel[valid]
        hidx = rel_hit if abs_idx is None else abs_idx[rel_hit]
        ext = ext.drop_null()
        alive[rel_hit] = False
        claimed = len(cur) - int(alive.sum())
        if claimed * 8 >= len(cur):
            keep = np.flatnonzero(alive)
            cur = pc.take(cur, pa.array(keep))
            abs_idx = keep if abs_idx is None else abs_idx[keep]
            alive = np.ones(len(cur), dtype=bool)
        hidx_pa = pa.array(hidx)
        taken = [(n, pc.take(arr, hidx_pa)) for n, arr in carries]
        s = pc.struct_field(ext, "g1")
        k = len(hidx)

        def emit(subject, predicate, obj, kind):
            for n, arr in taken:
                cols[n].append(arr)
            cols["subject"].append(subject)
            cols["predicate"].append(pa.array([predicate] * k))
            cols["object"].append(obj if isinstance(obj, pa.Array)
                                  else pa.array([obj] * k))
            cols["obj_kind"].append(pa.array([kind] * k))

        if subj_cls:
            emit(s, TYPE_PREDICATE, subj_cls, "iri")
        if pred == TYPE_PREDICATE:  # "<P> is an employee." — extra class
            emit(s, TYPE_PREDICATE, "Employee", "iri")
            continue
        if obj_kind == "iri":
            o = pc.struct_field(ext, "g2")
            if obj_cls:
                emit(o, TYPE_PREDICATE, obj_cls, "iri")
            emit(s, pred, o, "iri")
        elif pred == "greeting":
            word_at_lang = pc.binary_join_element_wise(
                pc.struct_field(ext, "g3"), pc.struct_field(ext, "g2"), "@")
            emit(s, pred, word_at_lang, "langString")
        else:
            emit(s, pred, pc.struct_field(ext, "g2"), obj_kind)
    if not cols["obj_kind"]:
        return None
    return pa.table({k: pa.chunked_array(v) for k, v in cols.items()})


def _raw_iter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for b in batches:
        t = _extract_table(pc.fill_null(b.column("text"), ""),
                           [("conv_id", b.column("conv_id")),
                            ("turn_idx", b.column("turn_idx"))])
        if t is not None:
            yield from t.combine_chunks().to_batches()


def _normalize_triples(raw: DataFrame, lead: tuple[str, ...] = (),
                       trail: tuple[str, ...] = ()) -> DataFrame:
    """JVM-native normalization of the raw-surface triples: subjects are
    always mentions; objects are mentions iff obj_kind == 'iri' and the
    predicate is not rdf:type (type objects are class labels — the same
    rule mentions_from_triples applies). Literals pass through untouched,
    byte-for-byte (the per-turn text-equality invariant). `lead`/`trail`
    are passthrough carry columns (per-turn keys / group multiplicity) —
    ONE definition of the mention-vs-literal rule serves both extraction
    paths (round-4 review)."""
    is_mention_obj = ((F.col("obj_kind") == "iri")
                      & (F.col("predicate") != TYPE_PREDICATE))
    return raw.select(
        *lead,
        normalize_surface_col(F.col("subject")).alias("subject"),
        "predicate",
        F.when(is_mention_obj, normalize_surface_col(F.col("object")))
        .otherwise(F.col("object")).alias("object"),
        "obj_kind", *trail)


def _salted(transcripts: DataFrame, salt: int) -> DataFrame:
    # turn_idx is int32 by the input contract, but tolerate wider ints
    # (e.g. createDataFrame's default int64): the UDF copies the column
    # into TRIPLE_SCHEMA's int32 slot verbatim, and a type mismatch there
    # is a JVM-side ArrowColumnVector crash, not a cast.
    df = transcripts.select("conv_id",
                            F.col("turn_idx").cast("int").alias("turn_idx"),
                            "text")
    if salt > 0:
        n = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(n, "conv_id",
                            F.pmod(F.xxhash64("turn_idx"), F.lit(salt)))
    return df


def extract_triples(transcripts: DataFrame, salt: int = 0) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> raw triples
    with normalized mention ids.

    salt > 0 repartitions by (conv_id, hash(turn_idx) % salt) first so one
    giant conversation spreads over `salt` partitions while staying
    co-locatable by conv_id downstream.
    """
    raw = _salted(transcripts, salt).mapInArrow(_raw_iter, TRIPLE_SCHEMA)
    return _normalize_triples(raw, lead=("conv_id", "turn_idx"))


GROUP_SCHEMA = StructType([
    StructField("subject", StringType()),
    StructField("predicate", StringType()),
    StructField("object", StringType()),
    StructField("obj_kind", StringType()),
    StructField("cnt", LongType()),
])

_GROUP_KEYS = ["subject", "predicate", "object", "obj_kind"]


def _raw_group_iter(batches: Iterator[pa.RecordBatch]
                    ) -> Iterator[pa.RecordBatch]:
    """Per batch: distinct texts first (C++ value_counts — transcripts
    repeat heavily: greetings, tool-status lines, boilerplate), extract
    once per DISTINCT text, weight each emitted triple by the text's
    multiplicity, then hash-aggregate. The regex work (the stage's
    dominant cost) runs per distinct text instead of per turn; on the
    bench corpus (~27% distinct per 64K-row batch) that cuts the Python
    stage ~2-3x. Worst case (all texts distinct) costs one extra C++
    hash aggregation over the text column — noise next to the regexes."""
    for b in batches:
        vc = pc.value_counts(pc.fill_null(b.column("text"), ""))
        t = _extract_table(vc.field("values"), [("cnt", vc.field("counts"))])
        if t is None:
            continue
        # select by NAME before the positional rename: pyarrow's
        # TableGroupBy column order (keys vs "cnt_sum") is an
        # implementation detail that has moved across releases
        g = (t.group_by(_GROUP_KEYS)
             .aggregate([("cnt", "sum")])
             .select(_GROUP_KEYS + ["cnt_sum"])
             .rename_columns(_GROUP_KEYS + ["cnt"]))
        yield from g.combine_chunks().to_batches()


def extract_triple_groups(transcripts: DataFrame, salt: int = 0) -> DataFrame:
    """Fused extraction + distinct-triple aggregation: semantically
    identical to group_triples(extract_triples(x)) but the per-batch
    combine happens INSIDE the Arrow UDF (C++ hash groupby over RAW
    surfaces), so the Arrow channel and the JVM-side hash aggregation see
    vocabulary-bounded batch aggregates instead of one row per triple
    occurrence — and the normalize projection runs on those aggregates,
    i.e. per vocabulary row, not per occurrence. At 10^12 turns this is
    the difference between Arrow-decoding (and normalizing) ~2x10^12 rows
    and decoding per-batch vocabularies. Raw surfaces group slightly wider
    than normalized ids (alias spellings), so the JVM re-aggregation after
    normalization is what collapses them — same final table, proven by
    tests/test_extraction.py fused-vs-composed equality."""
    raw = _salted(transcripts, salt).mapInArrow(_raw_group_iter, GROUP_SCHEMA)
    normed = _normalize_triples(raw, trail=("cnt",))
    return (normed.groupBy("subject", "predicate", "object", "obj_kind")
            .agg(F.sum("cnt").alias("cnt")))


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """Distinct mention ids: all subjects plus IRI objects of non-type
    triples (type objects are class labels, not mentions)."""
    subj = triples.select(F.col("subject").alias("mention_id"))
    obj = (triples
           .filter((F.col("obj_kind") == "iri")
                   & (F.col("predicate") != TYPE_PREDICATE))
           .select(F.col("object").alias("mention_id")))
    return subj.unionByName(obj).distinct()
