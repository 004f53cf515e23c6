"""Shared vocabulary constants.

Mirrors the reference's fixed IRIs (`/root/reference/src/main/java/cs/utils/
Constants.java:12-19`): the type predicate, the undefined-object sentinel,
and the literal datatype labels produced by `Parser.extractObjectType`
(`Parser.java:414-429`).
"""

# The instance-type predicate (reference: rdf:type, or wdt:P31 for wikidata).
TYPE_PREDICATE = "rdf:type"

# Sentinel object-type for IRI objects whose class is unknown
# (`Constants.java:16`, `Parser.java:359-364`).
UNDEFINED_OBJECT_TYPE = "http://shaclshapes.org/object-type/undefined"

# Literal datatype labels keyed by the triple table's `obj_kind` column.
# (`Parser.java:414-429` maps literals to XSD datatype IRIs / rdf:langString.)
OBJ_KIND_IRI = "iri"
LITERAL_DATATYPES = {
    "string": "xsd:string",
    "integer": "xsd:integer",
    "date": "xsd:date",
    "langString": "rdf:langString",
}

# Shape-annotation predicates (`Constants.java:18-19`).
SUPPORT_PRED = "http://shaclshapes.org/support"
CONFIDENCE_PRED = "http://shaclshapes.org/confidence"

# Example-annotation predicate (`ExampleManager.EXAMPLE_IRI`,
# `ShapesExtractor.java:573-615`).
EXAMPLE_PRED = "http://example.org/example"

SHAPES_NAMESPACE = "http://shaclshapes.org/"
SHACL = "http://www.w3.org/ns/shacl#"

# Default pruning grid (`ExperimentsUtil.java:20-46`).
DEFAULT_PRUNING_THRESHOLDS = [(0.25, 1), (0.25, 100), (0.5, 1), (0.5, 100),
                              (0.9, 1), (0.9, 100)]
