"""W3C SPARQL 1.1 query results serialization (JSON + CSV).

A D-SPARQ user drives the engine through a SPARQL endpoint surface; the
wire formats are standardized (SPARQL 1.1 Query Results JSON Format /
CSV-TSV, W3C REC 2013-03-21). The engine's bindings DataFrames carry the
store's lexical term convention (plans/translate.py): IRIs are plain
strings, '_:'-prefixed blank nodes, '"..."@lang' / '"..."^^type' typed
literals, anything else a plain literal — these serializers map that
convention onto the spec's term objects.

Driver-side by design: result SETS are user-facing query answers (LIMITed
or small by construction), not data-scale relations. For data-scale
output the parquet/ORC sinks are the path; these formats exist for
endpoint compatibility.
"""

from __future__ import annotations

import json
import math
import re

from pyspark.sql import DataFrame

_TYPED = re.compile(r'^"(.*)"\^\^(.+)$', re.DOTALL)
_TAGGED = re.compile(r'^"(.*)"@([A-Za-z][A-Za-z0-9-]*)$', re.DOTALL)
_IRI_LIKE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")

# The spec requires 'datatype' to be an ABSOLUTE IRI; the store keeps the
# compact prefixed form, so well-known prefixes expand at serialization
# time (unknown prefixes pass through — the store can't invent a base).
_PREFIX_IRIS = {
    "xsd:": "http://www.w3.org/2001/XMLSchema#",
    "rdf:": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs:": "http://www.w3.org/2000/01/rdf-schema#",
}


def _double_lexical(v: float) -> str:
    """Canonical xsd:double lexical form: repr() covers the finite range,
    but the XSD specials are spelled 'NaN' / 'INF' / '-INF' — Python's
    'nan'/'inf' are not valid xsd:double lexicals and conforming results
    consumers reject them."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "INF" if v > 0 else "-INF"
    return repr(v)


def _expand_datatype(dt: str) -> str:
    for pfx, iri in _PREFIX_IRIS.items():
        if dt.startswith(pfx):
            return iri + dt[len(pfx):]
    return dt


def term_to_json(value: object) -> dict | None:
    """One binding value -> a spec term object (None stays unbound).
    Non-string Python values (aggregate counts, boolean/numeric BIND
    results) carry their XSD datatype and canonical lexical form —
    str(True) would emit the invalid lexical "True"."""
    if value is None:
        return None
    if isinstance(value, bool):
        return {
            "type": "literal",
            "value": "true" if value else "false",
            "datatype": _PREFIX_IRIS["xsd:"] + "boolean",
        }
    if isinstance(value, int):
        return {
            "type": "literal",
            "value": str(value),
            "datatype": _PREFIX_IRIS["xsd:"] + "integer",
        }
    if isinstance(value, float):
        return {
            "type": "literal",
            "value": _double_lexical(value),
            "datatype": _PREFIX_IRIS["xsd:"] + "double",
        }
    s = str(value)
    m = _TYPED.match(s)
    if m:
        return {
            "type": "literal",
            "value": m.group(1),
            "datatype": _expand_datatype(m.group(2)),
        }
    m = _TAGGED.match(s)
    if m:
        return {"type": "literal", "value": m.group(1), "xml:lang": m.group(2)}
    if s.startswith("_:"):
        return {"type": "bnode", "value": s[2:]}
    if _IRI_LIKE.match(s):
        return {"type": "uri", "value": s}
    return {"type": "literal", "value": s}


def results_json(df: DataFrame, limit: int | None = None) -> str:
    """SELECT bindings -> SPARQL 1.1 JSON results document (collects —
    see module docstring for why that is correct here)."""
    rows = df.limit(limit).collect() if limit is not None else df.collect()
    cols = df.columns
    bindings = []
    for r in rows:
        b = {}
        for c in cols:
            t = term_to_json(r[c])
            if t is not None:
                b[c] = t
        bindings.append(b)
    return json.dumps(
        {"head": {"vars": cols}, "results": {"bindings": bindings}},
        ensure_ascii=False,
    )


def ask_json(result: bool) -> str:
    return json.dumps({"head": {}, "boolean": bool(result)})


def results_csv(df: DataFrame, limit: int | None = None) -> str:
    """CSV results per the spec: header of variable names, lexical forms
    (typed/tagged literals reduced to their lexical value), unbound ->
    empty field."""
    import csv
    import io

    rows = df.limit(limit).collect() if limit is not None else df.collect()
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\r\n")
    w.writerow(df.columns)
    for r in rows:
        out = []
        for c in df.columns:
            v = r[c]
            if v is None:
                out.append("")
                continue
            if isinstance(v, bool):
                out.append("true" if v else "false")
                continue
            s = _double_lexical(v) if isinstance(v, float) else str(v)
            m = _TYPED.match(s) or _TAGGED.match(s)
            out.append(m.group(1) if m else s)
        w.writerow(out)
    return buf.getvalue()
