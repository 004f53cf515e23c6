"""Turtle-subset source: parse .ttl documents into the same
(subject, predicate, object, obj_kind) contract as read_ntriples.

The reference consumes its corpus as line-oriented N-Triples
(`Parser.java:78-90`) but ships Turtle artifacts for validation
(`/root/reference/validation/example/example_data.ttl`,
`example_shapes.ttl`) and emits Turtle shapes
(`TurtlePrettyFormatter.java`) — this reader is what lets the engine load
those files directly. It is a deliberate SUBSET: @prefix/PREFIX
resolution, @base/BASE with simple-concatenation relative-IRI resolution,
`;`/`,` predicate-object lists, typed/lang literals, bare numeric and
boolean literals, `a` as rdf:type, '#' comments (stripped string-aware;
declaration regexes additionally run over string-MASKED text so literal
content can never forge a namespace binding). No collections-as-objects
at the data level, no nested blank-node OBJECTS, no pnames with
undeclared prefixes and no relative IRIs without a declared base (all
skipped with a counter column, never silently mangled), no triple-quoted
strings.

Scale note: Turtle is not line-splittable, so each FILE is one parse task
(wholetext + mapInPandas). That is the right trade for what Turtle holds
here — vocabulary-sized shape/validation documents; a 100 TB corpus
arrives as N-Triples shards or parquet, never as one .ttl.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# prefix label optional: ':Bob' (default-prefix pname) is valid Turtle and
# resolves through the '' key ttl_prefixes registers (round-4 review)
_PNAME = r"(?:[A-Za-z][\w.-]*)?:[\w.-]*"
_IRI_OR_PNAME = re.compile(r"^(?:<([^>]*)>|(" + _PNAME + r"))$")
_LITERAL = re.compile(
    r'^"((?:[^"\\]|\\.)*)"'                      # quoted body (ECHAR-aware)
    r"(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)"         # @lang
    r"|\^\^(?:<([^>]*)>|(" + _PNAME + r")))?$")  # ^^<dt> | ^^p:dt
_ECHAR = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")   # has a URI scheme

_INT_KINDS = {"int", "integer", "long", "short", "nonnegativeinteger",
              "decimal"}
_DATE_KINDS = {"date", "datetime", "gyear"}


class _TokenState:
    """Tracks whether the scan cursor sits inside an <IRI> or a "string"
    (ECHAR-aware) token. feed(ch) advances the state and returns True when
    ch is STRUCTURAL — outside both token kinds — so '.', ';', ',', '[',
    ']' and '#' only act when this returns True. One implementation shared
    by every Turtle scanner here; shapes._parse_ttl_shape_doc reuses it
    via ttl_bracket_end and mask_string_bodies."""
    __slots__ = ("in_iri", "in_str", "esc")

    def __init__(self):
        self.in_iri = self.in_str = self.esc = False

    def feed(self, ch: str) -> bool:
        if self.in_iri:
            self.in_iri = ch != ">"
        elif self.in_str:
            if self.esc:
                self.esc = False
            elif ch == "\\":
                self.esc = True
            else:
                self.in_str = ch != '"'
        elif ch == "<":
            self.in_iri = True
        elif ch == '"':
            self.in_str = True
        else:
            return True
        return False


def mask_string_bodies(doc: str) -> str:
    """Same-length copy of doc with every "string" token (quotes included)
    blanked to spaces; <IRI> tokens left intact. Regexes for declarations
    and shape predicates run over THIS text, so corpus-controlled literal
    content can never forge an @prefix binding or inject sh:path /
    sh:targetClass keys — indices map 1:1 back to the original."""
    out, st = [], _TokenState()
    for ch in doc:
        was = st.in_str
        st.feed(ch)
        out.append(" " if (was or st.in_str) else ch)
    return "".join(out)


def _comment_spans(doc: str) -> list[tuple[int, int]]:
    """(start, end) spans of '#'-to-end-of-line comments (structural '#'
    only: a '#' inside an <IRI> fragment or a "string" body is data)."""
    spans, st = [], _TokenState()
    i, n = 0, len(doc)
    while i < n:
        ch = doc[i]
        if st.feed(ch) and ch == "#":
            j = doc.find("\n", i)
            j = n if j < 0 else j
            spans.append((i, j))
            i = j
            continue
        i += 1
    return spans


def _blank_spans(doc: str, spans: list[tuple[int, int]]) -> str:
    """Same-LENGTH copy of doc with the spans blanked to spaces (newlines
    kept) — the index-preserving twin of span excision, so positions found
    on the blanked text map 1:1 onto the original. Blanked comment text is
    never fed to the token state machine, so a quote or bracket inside a
    comment cannot corrupt later statements, exactly like excision."""
    if not spans:
        return doc
    out = list(doc)
    for a, b in spans:
        for i in range(a, b):
            if out[i] != "\n":
                out[i] = " "
    return "".join(out)


def strip_ttl_comments(doc: str) -> str:
    """Remove '#'-to-end-of-line comments (structural '#' only: a '#'
    inside an <IRI> fragment or a "string" body is data, not a comment).
    Comment text is never fed to the token state machine, so a quote or
    bracket inside a comment cannot corrupt later statements."""
    spans = _comment_spans(doc)
    if not spans:
        return doc
    out, prev = [], 0
    for a, b in spans:
        out.append(doc[prev:a])
        prev = b
    out.append(doc[prev:])
    return "".join(out)


# SPARQL-style declarations are self-delimiting (no '.' terminator), so the
# statement splitter must blank them or they glue onto the next statement
# and silently swallow it. Spans are located on the STRING-MASKED text (a
# literal spanning a whole line can never match) and blanked in the real
# text (same length, indices map 1:1).
_SPARQL_DECL = re.compile(
    r"(?mi)^[ \t]*(?:PREFIX[ \t]+(?:[A-Za-z][\w.-]*)?:[ \t]*<[^>]*>"
    r"|BASE[ \t]+<[^>]*>)[ \t]*\r?$")


def ttl_statements_pos(doc: str) -> list[tuple[int, str]]:
    """Split a Turtle document into top-level (start_offset, statement)
    pairs: a '.' terminates a statement only at bracket depth 0, outside
    <IRI> and "string" tokens, and when followed by whitespace/EOF (so
    decimals never split). '#' comments and dot-less SPARQL-style
    PREFIX/BASE declaration lines are BLANKED first (same-length,
    string-aware) rather than excised, so comments adjacent to statements
    never glue onto or split them AND every offset indexes the original
    document — the coordinate system ttl_prefix_decls shares, which is
    what lets parse_turtle_doc scope prefix re-declarations correctly."""
    doc = _blank_spans(doc, _comment_spans(doc))
    doc = _blank_spans(doc, [m.span() for m in
                             _SPARQL_DECL.finditer(mask_string_bodies(doc))])
    out, start, depth = [], 0, 0
    st = _TokenState()
    for i, ch in enumerate(doc):
        if not st.feed(ch):
            continue
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        elif (ch == "." and depth == 0
              and (i + 1 == len(doc) or doc[i + 1].isspace())):
            seg = doc[start:i]
            stmt = seg.strip()
            if stmt:
                # offset of the statement's FIRST character: leading
                # whitespace (and blanked declarations) in the segment
                # must not pull the offset before a preceding @prefix
                out.append((start + len(seg) - len(seg.lstrip()), stmt))
            start = i + 1
    seg = doc[start:]
    tail = seg.strip()
    if tail:
        out.append((start + len(seg) - len(seg.lstrip()), tail))
    return out


def ttl_statements(doc: str) -> list[str]:
    """Top-level Turtle statements (see ttl_statements_pos)."""
    return [s for _, s in ttl_statements_pos(doc)]


_PREFIX_DECL = re.compile(
    r"(?:@prefix|PREFIX)\s+([A-Za-z][\w.-]*)?:\s*<([^>]*)>")


def ttl_prefix_decls(doc: str) -> list[tuple[int, str, str]]:
    """Position-ordered (offset, prefix, base IRI) for every @prefix /
    SPARQL-style PREFIX declaration ('' for the default prefix). Offsets
    index the original document (comments are BLANKED, not excised) and
    the match text is string-MASKED first, so neither a commented-out
    declaration nor one quoted inside a corpus-controlled literal ever
    registers (literal text forging or overriding a namespace binding was
    a round-4 review finding). Turtle prefix scoping is sequential —
    parse_turtle_doc applies each declaration only to statements that
    START after it, so a re-declared prefix never retroactively rewrites
    earlier statements' IRIs (round-4 review finding)."""
    masked = mask_string_bodies(_blank_spans(doc, _comment_spans(doc)))
    return [(m.start(), m.group(1) or "", m.group(2))
            for m in _PREFIX_DECL.finditer(masked)]


def ttl_prefixes(doc: str) -> dict[str, str]:
    """Document-FINAL {prefix: base IRI} map (last declaration wins).
    Right for single-declaration documents — every reference artifact and
    everything our own writers emit; documents that re-declare a prefix
    need the position-aware ttl_prefix_decls (which parse_turtle_doc
    uses). Shared with shapes._parse_ttl_shape_doc so the data path and
    the shapes-parity path can never drift on prefix resolution."""
    return {p: iri for _, p, iri in ttl_prefix_decls(doc)}


def ttl_base(doc: str) -> str | None:
    """First @base / SPARQL-style BASE declaration's IRI, or None.
    Comment-stripped and string-masked like ttl_prefixes. Subset note:
    one base per document (the reference's artifacts use at most one);
    mid-document re-declarations are not scoped."""
    m = re.search(r"(?:@base|BASE)\s*<([^>]*)>",
                  mask_string_bodies(strip_ttl_comments(doc)))
    return m.group(1) if m else None


def ttl_bracket_end(s: str, i: int, depth: int = 1) -> int:
    """Index just past the ']' that closes the bracket group already
    `depth` deep at s[i]; brackets inside <IRI>/"string" tokens don't
    count (a literal like "see ] in docs" never closes the group).
    Used by shapes._parse_ttl_shape_doc for inline sh:property groups."""
    st = _TokenState()
    n = len(s)
    while i < n and depth:
        ch = s[i]
        if st.feed(ch):
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
        i += 1
    return i


def _split_top(s: str, sep: str) -> list[str]:
    """Split on `sep` at bracket depth 0, outside <IRI>/"string" tokens."""
    out, start, depth = [], 0, 0
    st = _TokenState()
    for i, ch in enumerate(s):
        if not st.feed(ch):
            continue
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _unescape(s: str) -> str:
    # sequential scan: an escaped backslash never re-triggers (same
    # contract as read_ntriples' segment unescape)
    return re.sub(r"\\[\\\"nrt]", lambda m: _ECHAR[m.group(0)], s)


def parse_turtle_doc(doc: str) -> tuple[list[tuple], int]:
    """One Turtle document -> ([(subject, predicate, object, obj_kind)],
    skipped_object_count). Pure function (unit-testable without Spark).
    Prefix bindings are applied SEQUENTIALLY (Turtle scoping): `prefixes`
    accumulates declarations as the statement scan passes their offsets,
    so a re-declaration rebinds only the statements after it."""
    decls = ttl_prefix_decls(doc)
    prefixes: dict[str, str] = {}
    next_decl = 0
    base = ttl_base(doc)

    def resolve(tok: str) -> str | None:
        m = _IRI_OR_PNAME.match(tok)
        if not m:
            return None
        if m.group(1) is not None:
            iri = m.group(1)
            if _ABS_IRI.match(iri):
                return iri
            # scheme-less (relative) IRI: simple concatenation against a
            # declared base; without one it is unresolvable -> skip+count,
            # never emitted verbatim as a corrupt entity id
            return base + iri if base is not None else None
        p, local = m.group(2).split(":", 1)
        ns = prefixes.get(p)
        # undeclared prefix (typo'd pname): unresolvable -> skip + count,
        # never emit the raw pname as a bogus IRI
        return ns + local if ns is not None else None

    rows, skipped = [], 0
    for pos, stmt in ttl_statements_pos(doc):
        while next_decl < len(decls) and decls[next_decl][0] <= pos:
            _, p, iri = decls[next_decl]
            prefixes[p] = iri
            next_decl += 1
        if stmt.startswith(("@prefix", "@base", "PREFIX", "BASE")):
            continue
        parts = stmt.split(None, 1)
        if len(parts) < 2:
            continue
        subj = resolve(parts[0])
        if subj is None:
            skipped += 1          # blank-node subject or unsupported form
            continue
        for po in _split_top(parts[1], ";"):
            toks = po.split(None, 1)
            if len(toks) < 2:
                continue
            pred = (RDF_TYPE if toks[0] == "a" else resolve(toks[0]))
            if pred is None:
                skipped += 1
                continue
            for obj_tok in _split_top(toks[1], ","):
                parsed = _parse_object(obj_tok, resolve)
                if parsed is None:
                    skipped += 1
                    continue
                rows.append((subj, pred, *parsed))
    return rows, skipped


def _parse_object(tok: str, resolve) -> tuple[str, str] | None:
    iri = resolve(tok)
    if iri is not None:
        return iri, "iri"
    m = _LITERAL.match(tok)
    if m:
        body = _unescape(m.group(1))
        if m.group(2):                       # @lang
            return f"{body}@{m.group(2)}", "langString"
        dt = m.group(3) or m.group(4) or ""
        local = dt.rsplit("#", 1)[-1].rsplit(":", 1)[-1].lower()
        if local in _INT_KINDS:
            return body, "integer"
        if local in _DATE_KINDS:
            return body, "date"
        return body, "string"
    if re.match(r"^[+-]?\d+$", tok):
        return tok, "integer"
    if re.match(r"^[+-]?(\d+\.\d*|\.\d+)$", tok):
        return tok, "integer"                # decimal, same kind as NT reader
    if tok in ("true", "false"):
        return tok, "string"
    return None                              # blank node / collection object


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Parse Turtle file(s) into (subject, predicate, object, obj_kind) —
    the read_ntriples contract, so everything downstream (stats kernel,
    shapes, validation) consumes reference-shaped .ttl data unchanged."""
    raw = spark.read.text(path, wholetext=True)

    def _parse(batches):
        for pdf in batches:
            rows = []
            for doc in pdf["value"]:
                r, _ = parse_turtle_doc(doc)
                rows.extend(r)
            yield pd.DataFrame(
                rows, columns=["subject", "predicate", "object", "obj_kind"])

    schema = StructType([StructField("subject", StringType()),
                         StructField("predicate", StringType()),
                         StructField("object", StringType()),
                         StructField("obj_kind", StringType())])
    return raw.mapInPandas(_parse, schema)
