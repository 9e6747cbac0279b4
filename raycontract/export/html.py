"""Contract → standalone HTML exporter + multi-contract catalog.

≅ the reference's ``export/html_export.py`` (Jinja-template page per
contract) and ``catalog/catalog.py:13-78`` (glob contracts → per-contract
page + index). Jinja is avoided — the page is rendered directly; styling is
a small embedded stylesheet so the file is self-contained.
"""

from __future__ import annotations

import html as _html
import os
from typing import Iterable

from raycontract.contract import DataContractSpecification, Field

_STYLE = """
body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 60rem;
       color: #1a202c; }
h1 { border-bottom: 2px solid #e2e8f0; padding-bottom: .3rem; }
table { border-collapse: collapse; width: 100%; margin: .8rem 0; }
th, td { border: 1px solid #e2e8f0; padding: .35rem .6rem; text-align: left;
         font-size: .9rem; }
th { background: #f7fafc; }
code { background: #f1f5f9; padding: .1rem .25rem; border-radius: 3px; }
.badge { display: inline-block; background: #edf2f7; border-radius: 3px;
         padding: 0 .35rem; margin-right: .25rem; font-size: .8rem; }
"""


def _esc(v) -> str:
    return _html.escape(str(v)) if v is not None else ""


def _field_rows(prefix: str, f: Field, rows: list) -> None:
    for n, sub in (f.fields or {}).items():
        rows.append((f"{prefix}.{n}", sub))
        _field_rows(f"{prefix}.{n}", sub, rows)
    if f.items is not None:
        rows.append((f"{prefix}[]", f.items))
        _field_rows(f"{prefix}[]", f.items, rows)


def _constraint_badges(f: Field) -> str:
    out = []
    if f.primaryKey:
        out.append('<span class="badge">PK</span>')
    if f.required:
        out.append('<span class="badge">required</span>')
    if f.unique:
        out.append('<span class="badge">unique</span>')
    for label, v in (("pattern", f.pattern), ("format", f.format),
                     ("enum", f.enum), ("min", f.minimum), ("max", f.maximum),
                     ("minLen", f.minLength), ("maxLen", f.maxLength),
                     ("references", f.references)):
        if v is not None:
            out.append(f'<span class="badge">{label}: {_esc(v)}</span>')
    return "".join(out)


def export_html(spec: DataContractSpecification) -> str:
    title = _esc(spec.info.title or spec.id or "Data Contract")
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{title}</title><style>{_STYLE}</style></head><body>",
        f"<h1>{title}</h1>",
        f"<p><code>{_esc(spec.id)}</code> · version {_esc(spec.info.version)}</p>",
    ]
    if spec.info.description:
        parts.append(f"<p>{_esc(spec.info.description)}</p>")
    if spec.servers:
        parts.append("<h2>Servers</h2><table><tr><th>name</th><th>type</th>"
                     "<th>format</th><th>path</th></tr>")
        for n, s in spec.servers.items():
            parts.append(f"<tr><td>{_esc(n)}</td><td>{_esc(s.type)}</td>"
                         f"<td>{_esc(s.format)}</td><td>{_esc(s.path or s.location)}</td></tr>")
        parts.append("</table>")
    for mname, model in spec.models.items():
        parts.append(f"<h2>Model <code>{_esc(mname)}</code></h2>")
        if model.description:
            parts.append(f"<p>{_esc(model.description)}</p>")
        parts.append("<table><tr><th>field</th><th>type</th>"
                     "<th>constraints</th><th>description</th></tr>")
        rows: list = []
        for n, f in model.fields.items():
            rows.append((n, f))
            _field_rows(n, f, rows)
        for name, f in rows:
            parts.append(f"<tr><td><code>{_esc(name)}</code></td><td>{_esc(f.type)}</td>"
                         f"<td>{_constraint_badges(f)}</td>"
                         f"<td>{_esc(f.description)}</td></tr>")
        parts.append("</table>")
    if spec.servicelevels is not None:
        sl = spec.servicelevels
        items = []
        if sl.freshness is not None and sl.freshness.threshold:
            items.append(f"<li>freshness: {_esc(sl.freshness.threshold)} on "
                         f"<code>{_esc(sl.freshness.timestampField)}</code></li>")
        if sl.retention is not None and sl.retention.period:
            items.append(f"<li>retention: {_esc(sl.retention.period)} on "
                         f"<code>{_esc(sl.retention.timestampField)}</code></li>")
        if items:
            parts.append("<h2>Service levels</h2><ul>" + "".join(items) + "</ul>")
    parts.append("</body></html>")
    return "".join(parts)


def build_catalog(contract_files: Iterable[str], out_dir: str) -> list[str]:
    """Per-contract HTML page + index.html (≅ catalog/catalog.py:13-78)."""
    os.makedirs(out_dir, exist_ok=True)
    entries = []
    written = []
    for path in contract_files:
        try:
            spec = DataContractSpecification.from_file(path)
        except Exception as e:
            entries.append((os.path.basename(path), None, f"unparseable: {e}"))
            continue
        name = os.path.splitext(os.path.basename(path))[0] + ".html"
        with open(os.path.join(out_dir, name), "w") as fh:
            fh.write(export_html(spec))
        written.append(os.path.join(out_dir, name))
        entries.append((spec.info.title or spec.id or name, name,
                        f"{len(spec.models)} model(s)"))
    rows = "".join(
        (f"<tr><td><a href='{_esc(link)}'>{_esc(title)}</a></td><td>{_esc(note)}</td></tr>"
         if link else f"<tr><td>{_esc(title)}</td><td>{_esc(note)}</td></tr>")
        for title, link, note in entries)
    index = ("<!doctype html><html><head><meta charset='utf-8'><title>Data Contracts"
             f"</title><style>{_STYLE}</style></head><body><h1>Data Contracts</h1>"
             f"<table><tr><th>contract</th><th></th></tr>{rows}</table></body></html>")
    index_path = os.path.join(out_dir, "index.html")
    with open(index_path, "w") as fh:
        fh.write(index)
    written.append(index_path)
    return written
