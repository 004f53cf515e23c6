"""Independent SHACL-core mini-validator — the cross-engine check for V2.

pyshacl (the stand-in SURVEY §5.3 names for the reference's Jena run,
`QseSHACLValidator.java:70-134`) is not installable in this environment,
so this module fills the role: a per-focus-node, pure-Python interpreter
of exactly the SHACL-core subset this engine emits (sh:targetClass,
sh:property links, sh:path, sh:minCount 1, sh:maxCount 1, and the
value-type branches — sh:datatype / sh:class / sh:nodeKind sh:IRI,
including sh:or unions with per-VALUE-NODE existential semantics, and
sh:in lists). It consumes the EMITTED shapes TTL artifact
(shapes.write_ttl output) plus a plain data-triple list, and reports
violations in validation_report's row vocabulary so tests can diff the
two engines row-for-row (tests/test_validation.py cross-engine tests).

Deliberately independent of validation.py (the relational Spark plan it
checks) and of shapes.py's renderer structures: constraints are
re-derived from the TTL text and the SHACL spec — the same oracle-twin
policy as goldgen.py / xxh.py. Only the low-level Turtle tokenizer is
shared (sources/turtle), because the semantics under test are the
VALIDATOR's, not the parser's.

Known semantic deltas vs validation_report (both documented, both
excluded by the comparing tests):
- sh:in property shapes: the reference renders the instance-type
  property (and all-branches-pruned properties) as `sh:in (<class>)`
  (ShapesExtractor.java:451-461); strict sh:in membership over rdf:type
  values diverges from the kernel's per-objType model, so in-list shapes
  are validated here (strict membership) but compared separately.
- sh:not wrapper shapes are out of scope (validation.sh_not_report has
  its own oracle-backed check).
"""

from __future__ import annotations

from .sources.turtle import (mask_string_bodies, ttl_prefixes,
                             ttl_statements)

SH = "http://www.w3.org/ns/shacl#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF + "type"
# re-derived from the SHACL/XSD spec, not imported from constants.py:
# obj_kind -> (full datatype IRI, report label). Unknown literal kinds
# fall back to xsd:string, mirroring the reference's Parser.java:424-427
# rule the kernel also applies.
_LIT = {"string": (XSD + "string", "xsd:string"),
        "integer": (XSD + "integer", "xsd:integer"),
        "date": (XSD + "date", "xsd:date"),
        "langString": (RDF + "langString", "rdf:langString")}
_UNDEF = "http://shaclshapes.org/object-type/undefined"


# --------------------------------------------------------------- TTL parsing

def _term(tok: str, prefixes: dict) -> str:
    tok = tok.strip()
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    if ":" in tok:
        p, local = tok.split(":", 1)
        if p in prefixes:
            return prefixes[p] + local
    return tok


def _paren_group(s: str, i: int) -> tuple[str, int]:
    """Body of the ( ... ) group opening at s[i]; returns (body, end)."""
    assert s[i] == "("
    depth, j = 1, i + 1
    while j < len(s) and depth:
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
        j += 1
    return s[i + 1:j - 1], j


def _bracket_group(s: str, i: int) -> tuple[str, int]:
    """Body of the [ ... ] group opening at s[i]; returns (body, end)."""
    assert s[i] == "["
    depth, j = 1, i + 1
    while j < len(s) and depth:
        if s[j] == "[":
            depth += 1
        elif s[j] == "]":
            depth -= 1
        j += 1
    return s[i + 1:j - 1], j


def _pred_value(body: str, pred: str, prefixes: dict) -> list[str]:
    """All IRI/pname objects of `pred` in a (string-masked) body."""
    import re
    sh_pred = _sh_pred_re(pred, prefixes)
    pat = re.compile(sh_pred + r"\s+(<[^>]+>|[A-Za-z][\w.-]*:[\w.-]*)")
    return [_term(m.group(1), prefixes) for m in pat.finditer(body)]


def _pred_int(body: str, pred: str, prefixes: dict) -> int | None:
    import re
    pat = re.compile(_sh_pred_re(pred, prefixes) + r"\s+(\d+)")
    m = pat.search(body)
    return int(m.group(1)) if m else None


def _sh_pred_re(local: str, prefixes: dict) -> str:
    import re
    labels = sorted({p for p, iri in prefixes.items() if iri == SH}
                    | ({"sh"} if not prefixes else set()))
    alts = [re.escape(f"{p}:{local}") for p in labels]
    alts.append(re.escape(f"<{SH}{local}>"))
    return "(?:" + "|".join(alts) + ")"


def _branches(body: str, prefixes: dict) -> list[dict]:
    """Value-type branches declared in one constraint body (no sh:or)."""
    out = []
    for dt in _pred_value(body, "datatype", prefixes):
        out.append({"kind": "datatype", "value": dt})
    for cl in _pred_value(body, "class", prefixes):
        out.append({"kind": "class", "value": cl})
    if not out:
        for nk in _pred_value(body, "nodeKind", prefixes):
            if nk == SH + "IRI":
                out.append({"kind": "iri", "value": None})
    return out


def parse_shapes(doc: str) -> dict:
    """Shapes TTL -> {"nodes": {ns_iri: {"target_class", "props": [...]}},
    "props": {ps_iri: {"path", "min_count", "max_count",
                       "branches": [...], "in": [...] | None}}}."""
    import re
    prefixes = ttl_prefixes(doc)
    iri_or_pname = r"(<[^>]+>|[A-Za-z][\w.-]*:[\w.-]*)"
    nodes: dict[str, dict] = {}
    props: dict[str, dict] = {}
    for stmt in ttl_statements(doc):
        if stmt.startswith(("@prefix", "PREFIX")):
            continue
        m = re.match(iri_or_pname, stmt)
        if not m:
            continue
        subj = _term(m.group(1), prefixes)
        mstmt = mask_string_bodies(stmt)
        types = {_term(t, prefixes) for t in
                 re.findall(r"\ba\s+" + iri_or_pname, mstmt)}
        if SH + "NodeShape" in types:
            tcs = _pred_value(mstmt, "targetClass", prefixes)
            ps_links = re.compile(
                _sh_pred_re("property", prefixes) + r"\s+" + iri_or_pname)
            nodes[subj] = {"target_class": tcs[0] if tcs else None,
                           "props": [_term(t.group(1), prefixes)
                                     for t in ps_links.finditer(mstmt)]}
        if SH + "PropertyShape" in types:
            paths = _pred_value(mstmt, "path", prefixes)
            if not paths:
                continue
            # split out sh:or / sh:in paren groups first so their member
            # constraints are not double-counted as direct ones
            rest, or_members, in_list = mstmt, [], None
            om = re.search(_sh_pred_re("or", prefixes) + r"\s*\(", rest)
            if om:
                body, end = _paren_group(rest, om.end() - 1)
                rest = rest[:om.start()] + rest[end:]
                i = 0
                while i < len(body):
                    if body[i] == "[":
                        mbody, i = _bracket_group(body, i)
                        or_members.extend(_branches(mbody, prefixes))
                    else:
                        i += 1
            im = re.search(_sh_pred_re("in", prefixes) + r"\s*\(", rest)
            if im:
                body, end = _paren_group(rest, im.end() - 1)
                rest = rest[:im.start()] + rest[end:]
                in_list = [_term(t, prefixes) for t in
                           re.findall(iri_or_pname, body)]
            branches = or_members or _branches(rest, prefixes)
            props[subj] = {"path": paths[0],
                           "min_count": _pred_int(rest, "minCount", prefixes),
                           "max_count": _pred_int(rest, "maxCount", prefixes),
                           "branches": branches, "in": in_list}
    return {"nodes": nodes, "props": props}


# --------------------------------------------------------------- validation

def validate(shapes_ttl: str, triples,
             type_predicate: str = RDF_TYPE) -> set[tuple]:
    """Validate data triples [(subject, predicate, object, obj_kind)]
    against an emitted shapes TTL document. Returns rows in
    validation_report's vocabulary:
    (focus, target_class, property, violation, obj_type, cnt) with
    violation in {minCount, maxCount, valueType, inList}; inList rows are
    the strict-sh:in delta validation_report has no counterpart for."""
    shapes = parse_shapes(shapes_ttl)
    types: dict[str, set] = {}
    by_sp: dict[tuple, list] = {}
    for s, p, o, kind in triples:
        if p == type_predicate and kind == "iri":
            types.setdefault(s, set()).add(o)
        by_sp.setdefault((s, p), []).append((o, kind))

    out: set[tuple] = set()
    for ns in shapes["nodes"].values():
        cls = ns["target_class"]
        focus = [s for s, ts in types.items() if cls in ts]
        for ps_iri in ns["props"]:
            ps = shapes["props"].get(ps_iri)
            if ps is None:
                continue
            path = ps["path"]
            for f in focus:
                vals = by_sp.get((f, path), [])
                distinct_objs = {o for o, _ in vals}
                if ps["min_count"] == 1 and not vals:
                    out.add((f, cls, path, "minCount", None, None))
                if ps["max_count"] == 1 and len(distinct_objs) > 1:
                    out.add((f, cls, path, "maxCount", None,
                             len(distinct_objs)))
                if ps["in"] is not None:
                    for o, kind in vals:
                        if o not in ps["in"]:
                            out.add((f, cls, path, "inList", o, None))
                    continue
                if not ps["branches"]:
                    continue
                for o, kind in set(vals):
                    if kind == "iri":
                        ocls = types.get(o, set())
                        ok = any(b["kind"] == "iri" for b in ps["branches"]) \
                            or any(b["kind"] == "class" and b["value"] in ocls
                                   for b in ps["branches"])
                        if not ok:
                            for label in (sorted(ocls) or [_UNDEF]):
                                out.add((f, cls, path, "valueType",
                                         label, None))
                    else:
                        dt_iri, label = _LIT.get(kind, _LIT["string"])
                        ok = any(b["kind"] == "datatype"
                                 and b["value"] == dt_iri
                                 for b in ps["branches"])
                        if not ok:
                            out.add((f, cls, path, "valueType", label, None))
    return out
