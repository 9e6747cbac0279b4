"""Contract → RDF (Turtle) exporter.

≅ the reference's ``export/rdf_converter.py`` (rdflib-based; rdflib is
unavailable offline so the Turtle is emitted directly): the contract, its
info, servers, models and fields become resources under the ``dc:``
vocabulary, constraints become literal properties.
"""

from __future__ import annotations

from raycontract.contract import DataContractSpecification, Field


def _lit(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    s = str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    return f'"{s}"'


def _field_triples(subject: str, name: str, f: Field, out: list) -> None:
    out.append(f"{subject} a dc:Field ;")
    props = [f'    dc:name {_lit(name)}']
    for attr in ("type", "description", "required", "unique", "pattern", "format",
                 "minLength", "maxLength", "minimum", "maximum", "references",
                 "primaryKey", "pii", "classification"):
        v = getattr(f, attr)
        if v is not None:
            props.append(f"    dc:{attr} {_lit(v)}")
    if f.enum:
        props.append("    dc:enum " + ", ".join(_lit(e) for e in f.enum))
    out.append(" ;\n".join(props) + " .")


def export_rdf(spec: DataContractSpecification) -> str:
    out = [
        "@prefix dc: <https://datacontract.com/ns#> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        "",
        f"<{spec.id}> a dc:DataContract ;",
        f"    dc:dataContractSpecification {_lit(spec.dataContractSpecification or '1.1.0')} ;",
        f"    dc:title {_lit(spec.info.title or '')} ;",
        f"    dc:version {_lit(spec.info.version or '')} .",
        "",
    ]
    for name, srv in spec.servers.items():
        out.append(f"<{spec.id}/servers/{name}> a dc:Server ;")
        props = [f"    dc:name {_lit(name)}"]
        for attr in ("type", "format", "path", "location"):
            v = getattr(srv, attr)
            if v is not None:
                props.append(f"    dc:{attr} {_lit(v)}")
        out.append(" ;\n".join(props) + " .")
        out.append("")
    for mname, model in spec.models.items():
        out.append(f"<{spec.id}/models/{mname}> a dc:Model ;")
        props = [f"    dc:name {_lit(mname)}"]
        if model.description:
            props.append(f"    dc:description {_lit(model.description)}")
        props.append("    dc:fields " + ", ".join(
            f"<{spec.id}/models/{mname}/fields/{fn}>" for fn in model.fields))
        out.append(" ;\n".join(props) + " .")
        out.append("")
        for fn, f in model.fields.items():
            _field_triples(f"<{spec.id}/models/{mname}/fields/{fn}>", fn, f, out)
            out.append("")
    return "\n".join(out)
