"""Breaking-change / changelog diff between two contract versions.

≅ the reference's ``breaking/breaking.py:6-546`` + the severity rule table
``breaking/breaking_rules.py:4-130``: field-by-field old-vs-new comparison,
each change keyed ``<entity>_<prop>_<added|removed|updated>`` and mapped to a
severity (ERROR = breaking, WARNING = potentially breaking, INFO =
non-breaking). ``breaking()`` returns only ERROR/WARNING; ``changelog()``
returns everything.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional

from raycontract.contract import DataContractSpecification, Field, Model


class Severity(str, enum.Enum):
    ERROR = "error"
    WARNING = "warning"
    INFO = "info"


@dataclass
class Change:
    rule: str  # e.g. field_type_updated
    severity: Severity
    model: Optional[str]
    field: Optional[str]
    description: str

    def __str__(self) -> str:
        loc = ".".join(x for x in (self.model, self.field) if x)
        return f"[{self.severity.value}] {self.rule} at {loc}: {self.description}"


# rule → severity table (mirrors breaking_rules.py; unknown rules → INFO)
RULES: dict[str, Severity] = {
    "model_added": Severity.INFO,
    "model_removed": Severity.ERROR,
    "model_type_updated": Severity.ERROR,
    "field_added": Severity.INFO,
    "field_removed": Severity.ERROR,
    "field_type_added": Severity.WARNING,
    "field_type_removed": Severity.WARNING,
    "field_type_updated": Severity.ERROR,
    "field_format_added": Severity.WARNING,
    "field_format_removed": Severity.WARNING,
    "field_format_updated": Severity.ERROR,
    "field_required_updated": Severity.ERROR,
    "field_references_added": Severity.WARNING,
    "field_references_removed": Severity.WARNING,
    "field_references_updated": Severity.WARNING,
    "field_unique_updated": Severity.ERROR,
    "field_pattern_added": Severity.WARNING,
    "field_pattern_removed": Severity.ERROR,
    "field_pattern_updated": Severity.ERROR,
    "field_min_length_added": Severity.WARNING,
    "field_min_length_removed": Severity.WARNING,
    "field_min_length_updated": Severity.ERROR,
    "field_max_length_added": Severity.WARNING,
    "field_max_length_removed": Severity.WARNING,
    "field_max_length_updated": Severity.ERROR,
    "field_minimum_added": Severity.WARNING,
    "field_minimum_removed": Severity.WARNING,
    "field_minimum_updated": Severity.ERROR,
    "field_exclusive_minimum_added": Severity.WARNING,
    "field_exclusive_minimum_removed": Severity.WARNING,
    "field_exclusive_minimum_updated": Severity.ERROR,
    "field_maximum_added": Severity.WARNING,
    "field_maximum_removed": Severity.WARNING,
    "field_maximum_updated": Severity.ERROR,
    "field_exclusive_maximum_added": Severity.WARNING,
    "field_exclusive_maximum_removed": Severity.WARNING,
    "field_exclusive_maximum_updated": Severity.ERROR,
    "field_enum_added": Severity.WARNING,
    "field_enum_removed": Severity.INFO,
    "field_enum_updated": Severity.ERROR,
    "quality_added": Severity.INFO,
    "quality_removed": Severity.WARNING,
    "quality_updated": Severity.WARNING,
}

# (attr on Field, rule prefix) — description/title are INFO-only and matched
# by the default
_FIELD_PROPS = [
    ("type", "field_type"),
    ("format", "field_format"),
    ("references", "field_references"),
    ("pattern", "field_pattern"),
    ("minLength", "field_min_length"),
    ("maxLength", "field_max_length"),
    ("minimum", "field_minimum"),
    ("exclusiveMinimum", "field_exclusive_minimum"),
    ("maximum", "field_maximum"),
    ("exclusiveMaximum", "field_exclusive_maximum"),
    ("enum", "field_enum"),
    ("description", "field_description"),
    ("title", "field_title"),
]


def _sev(rule: str) -> Severity:
    return RULES.get(rule, Severity.INFO)


def _add(changes, rule, model, field, desc):
    changes.append(Change(rule, _sev(rule), model, field, desc))


def _diff_fields(changes, model_name: str, path: str, old: Field, new: Field):
    for attr, prefix in _FIELD_PROPS:
        o, n = getattr(old, attr), getattr(new, attr)
        if o is None and n is not None:
            _add(changes, f"{prefix}_added", model_name, path, f"{attr} added: {n!r}")
        elif o is not None and n is None:
            _add(changes, f"{prefix}_removed", model_name, path, f"{attr} removed (was {o!r})")
        elif o != n and o is not None:
            _add(changes, f"{prefix}_updated", model_name, path,
                 f"{attr} changed from {o!r} to {n!r}")
    # booleans: updated only (matches reference's required/unique rules)
    for attr, rule in (("required", "field_required_updated"),
                      ("unique", "field_unique_updated")):
        if bool(getattr(old, attr)) != bool(getattr(new, attr)):
            _add(changes, rule, model_name, path,
                 f"{attr} changed from {bool(getattr(old, attr))} to {bool(getattr(new, attr))}")
    # quality lists
    if len(old.quality) < len(new.quality):
        _add(changes, "quality_added", model_name, path, "quality check added")
    elif len(old.quality) > len(new.quality):
        _add(changes, "quality_removed", model_name, path, "quality check removed")
    elif [(q.type, q.query) for q in old.quality] != [(q.type, q.query) for q in new.quality]:
        _add(changes, "quality_updated", model_name, path, "quality check updated")
    # nested
    _diff_field_maps(changes, model_name, old.fields, new.fields, prefix=f"{path}.")
    if old.items is not None and new.items is not None:
        _diff_fields(changes, model_name, f"{path}[]", old.items, new.items)


def _diff_field_maps(changes, model_name, old_fields, new_fields, prefix=""):
    for name in old_fields:
        if name not in new_fields:
            _add(changes, "field_removed", model_name, f"{prefix}{name}", "field removed")
    for name, nf in new_fields.items():
        if name not in old_fields:
            _add(changes, "field_added", model_name, f"{prefix}{name}", "field added")
        else:
            _diff_fields(changes, model_name, f"{prefix}{name}", old_fields[name], nf)


def changelog(old: DataContractSpecification, new: DataContractSpecification) -> list[Change]:
    changes: list[Change] = []
    for mname, om in old.models.items():
        if mname not in new.models:
            _add(changes, "model_removed", mname, None, "model removed")
            continue
        nm = new.models[mname]
        if (om.type or "table") != (nm.type or "table"):
            _add(changes, "model_type_updated", mname, None,
                 f"model type changed from {om.type!r} to {nm.type!r}")
        _diff_field_maps(changes, mname, om.fields, nm.fields)
    for mname in new.models:
        if mname not in old.models:
            _add(changes, "model_added", mname, None, "model added")
    return changes


def breaking(old: DataContractSpecification, new: DataContractSpecification) -> list[Change]:
    """ERROR + WARNING changes only (the reference's `breaking` command)."""
    return [c for c in changelog(old, new) if c.severity != Severity.INFO]
