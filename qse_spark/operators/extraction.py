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

Physical shape: `mapInPandas` over Arrow batches; inside a batch every
template runs as one vectorized `Series.str.extract` (C regex over the whole
column). Per 10k-row batch that is ~10 C calls, zero per-row Python.
Conversation-salted repartitioning before the UDF keeps giant conversations
from pinning a partition (SURVEY §4 item 3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from ..constants import TYPE_PREDICATE

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
# `needle` is a literal substring prefilter: the (cheap, C-level,
# non-regex) `Series.str.contains` gates which rows each template's regex
# actually runs on — an order-of-magnitude cut in regex work per batch.
# obj_kind "iri" objects are mentions (normalized); literals pass through.
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


def _norm_series(s: pd.Series) -> pd.Series:
    """Vectorized twin of textnorm.normalize_surface (ASCII inputs).

    Mentions repeat heavily (the surface vocabulary is orders of magnitude
    smaller than the corpus), so normalize each DISTINCT surface once and
    map it back — profiling showed the per-occurrence regex chain was ~35%
    of the whole extraction batch."""
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


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    text = pdf["text"].fillna("")
    # `remaining` shrinks as templates claim rows, so each needle gate
    # scans only the still-unmatched suffix of the batch (the gates were
    # ~30% of batch time when run over the full column every template)
    remaining = text
    for pred, needle, rx, subj_cls, obj_cls, obj_kind in TEMPLATES:
        gate = remaining.str.contains(needle, regex=False)
        if not gate.any():
            continue
        ext = remaining[gate].str.extract(rx)
        hit_local = ext[0].notna()
        if not hit_local.any():
            continue
        ext = ext[hit_local]
        remaining = remaining.drop(ext.index)
        sub = pdf.loc[ext.index, ["conv_id", "turn_idx"]].reset_index(drop=True)
        s_norm = _norm_series(ext[0].reset_index(drop=True))

        def emit(subject, predicate, obj, kind):
            out.append(pd.DataFrame({
                "conv_id": sub["conv_id"], "turn_idx": sub["turn_idx"],
                "subject": subject, "predicate": predicate,
                "object": obj, "obj_kind": kind}))

        if subj_cls:
            emit(s_norm, TYPE_PREDICATE, subj_cls, "iri")
        if pred == TYPE_PREDICATE:  # "<P> is an employee." — extra class
            emit(s_norm, TYPE_PREDICATE, "Employee", "iri")
            continue
        if obj_kind == "iri":
            o_norm = _norm_series(ext[1].reset_index(drop=True))
            if obj_cls:
                emit(o_norm, TYPE_PREDICATE, obj_cls, "iri")
            emit(s_norm, pred, o_norm, "iri")
        elif pred == "greeting":
            lang = ext[1].reset_index(drop=True)
            word = ext[2].reset_index(drop=True)
            emit(s_norm, pred, word + "@" + lang, "langString")
        else:
            emit(s_norm, pred, ext[1].reset_index(drop=True), obj_kind)
    if not out:
        return pd.DataFrame({f.name: pd.Series(dtype="object" if f.dataType == StringType() else "int32")
                             for f in TRIPLE_SCHEMA.fields})
    res = pd.concat(out, ignore_index=True)
    res["turn_idx"] = res["turn_idx"].astype("int32")
    return res


def _extract_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _extract_batch(pdf)


def extract_triples(transcripts: DataFrame, salt: int = 0) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> raw triples.

    salt > 0 repartitions by (conv_id, hash(turn_idx) % salt) first so one
    giant conversation spreads over `salt` partitions while staying
    co-locatable by conv_id downstream.
    """
    df = transcripts.select("conv_id", "turn_idx", "text")
    if salt > 0:
        n = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(n, "conv_id",
                            F.pmod(F.xxhash64("turn_idx"), F.lit(salt)))
    return df.mapInPandas(_extract_iter, TRIPLE_SCHEMA)


GROUP_SCHEMA = StructType([
    StructField("subject", StringType()),
    StructField("predicate", StringType()),
    StructField("object", StringType()),
    StructField("obj_kind", StringType()),
    StructField("cnt", LongType()),
])


def _extract_group_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = _extract_batch(pdf)
        g = (rows.groupby(["subject", "predicate", "object", "obj_kind"],
                          sort=False, dropna=False)
             .size().reset_index(name="cnt"))
        g["cnt"] = g["cnt"].astype("int64")
        yield g


def extract_triple_groups(transcripts: DataFrame, salt: int = 0) -> DataFrame:
    """Fused extraction + distinct-triple aggregation: semantically
    identical to group_triples(extract_triples(x)) but the per-batch
    combine happens INSIDE the pandas UDF (C-speed groupby), so the
    Arrow channel and the JVM-side hash aggregation see vocabulary-bounded
    batch aggregates instead of one row per triple occurrence. At 10^12
    turns this is the difference between Arrow-decoding ~2x10^12 rows and
    decoding per-batch vocabularies."""
    df = transcripts.select("conv_id", "turn_idx", "text")
    if salt > 0:
        n = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(n, "conv_id",
                            F.pmod(F.xxhash64("turn_idx"), F.lit(salt)))
    partial = df.mapInPandas(_extract_group_iter, GROUP_SCHEMA)
    return (partial.groupBy("subject", "predicate", "object", "obj_kind")
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
