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
    # governance attributes (ref breaking_rules.py:59-66)
    "field_pii_added": Severity.WARNING,
    "field_pii_removed": Severity.ERROR,
    "field_pii_updated": Severity.ERROR,
    "field_classification_added": Severity.WARNING,
    "field_classification_removed": Severity.ERROR,
    "field_classification_updated": Severity.ERROR,
    # key structure (ref :40-51)
    "field_primary_key_added": Severity.WARNING,
    "field_primary_key_removed": Severity.WARNING,
    "field_primary_key_updated": Severity.WARNING,
    # quality (ref :110-114)
    "quality_added": Severity.INFO,
    "quality_removed": Severity.WARNING,
    "quality_updated": Severity.WARNING,
    "quality_type_updated": Severity.WARNING,
    "quality_specification_updated": Severity.WARNING,
    # model/info/terms metadata is INFO via the default
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
    ("pii", "field_pii"),
    ("classification", "field_classification"),
    ("tags", "field_tags"),
    ("example", "field_example"),
    ("primaryKey", "field_primary_key"),
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
    _diff_quality(changes, model_name, path, old.quality, new.quality)
    # nested
    _diff_field_maps(changes, model_name, old.fields, new.fields, prefix=f"{path}.")
    if old.items is not None and new.items is not None:
        _diff_fields(changes, model_name, f"{path}[]", old.items, new.items)


def _diff_quality(changes, model_name, path, old_q, new_q):
    """Quality-list diff with the reference's type/specification granularity
    (breaking_rules.py:110-114)."""
    if len(old_q) < len(new_q):
        _add(changes, "quality_added", model_name, path, "quality check added")
        return
    if len(old_q) > len(new_q):
        _add(changes, "quality_removed", model_name, path, "quality check removed")
        return
    for oq, nq in zip(old_q, new_q):
        if oq.type != nq.type:
            _add(changes, "quality_type_updated", model_name, path,
                 f"quality type changed from {oq.type!r} to {nq.type!r}")
        elif vars(oq) != vars(nq):
            _add(changes, "quality_specification_updated", model_name, path,
                 "quality specification updated")


def _diff_field_maps(changes, model_name, old_fields, new_fields, prefix=""):
    for name in old_fields:
        if name not in new_fields:
            _add(changes, "field_removed", model_name, f"{prefix}{name}", "field removed")
    for name, nf in new_fields.items():
        if name not in old_fields:
            _add(changes, "field_added", model_name, f"{prefix}{name}", "field added")
        else:
            _diff_fields(changes, model_name, f"{prefix}{name}", old_fields[name], nf)


def _diff_plain_dict(changes, entity: str, old: dict, new: dict):
    """INFO-level diff of a metadata dict (reference's info_/contact_/terms_
    extension-key rules, breaking_rules.py:116-130)."""
    for k in old:
        if k not in new:
            _add(changes, f"{entity}_{k}_removed", None, None, f"{entity}.{k} removed")
    for k, v in new.items():
        if k not in old:
            _add(changes, f"{entity}_{k}_added", None, None, f"{entity}.{k} added: {v!r}")
        elif old[k] != v:
            _add(changes, f"{entity}_{k}_updated", None, None,
                 f"{entity}.{k} changed from {old[k]!r} to {v!r}")


def changelog(old: DataContractSpecification, new: DataContractSpecification) -> list[Change]:
    changes: list[Change] = []
    # info / terms metadata (all INFO)
    _diff_plain_dict(changes, "info",
                     {k: v for k, v in vars(old.info).items() if v is not None},
                     {k: v for k, v in vars(new.info).items() if v is not None})
    _diff_plain_dict(changes, "terms", old.terms or {}, new.terms or {})
    for mname, om in old.models.items():
        if mname not in new.models:
            _add(changes, "model_removed", mname, None, "model removed")
            continue
        nm = new.models[mname]
        if (om.type or "table") != (nm.type or "table"):
            _add(changes, "model_type_updated", mname, None,
                 f"model type changed from {om.type!r} to {nm.type!r}")
        if (om.description or None) != (nm.description or None):
            rule = ("model_description_added" if om.description is None else
                    "model_description_removed" if nm.description is None else
                    "model_description_updated")
            _add(changes, rule, mname, None, "model description changed")
        _diff_quality(changes, mname, None, om.quality, nm.quality)
        _diff_field_maps(changes, mname, om.fields, nm.fields)
    for mname in new.models:
        if mname not in old.models:
            _add(changes, "model_added", mname, None, "model added")
    return changes


def breaking(old: DataContractSpecification, new: DataContractSpecification) -> list[Change]:
    """ERROR + WARNING changes only (the reference's `breaking` command)."""
    return [c for c in changelog(old, new) if c.severity != Severity.INFO]
