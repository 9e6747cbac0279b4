"""Execution-plan IR produced by the check compiler.

The reference compiles checks into SodaCL YAML snippets executed by soda-core
(``engines/data_contract_checks.py:12-19`` + ``export/sodacl_converter.py:
15-30``). We compile the same check taxonomy into Arrow-native plan objects:

- ``ConstraintSpec`` — a vectorizable per-column predicate evaluated inside
  ONE ``map_batches`` stats pass (all constraints for all columns at once).
- ``SchemaCheckSpec`` — metadata-only (compare ``ds.schema()``), no scan.
- ``UniqueSpec`` — needs a shuffle (two-stage groupby on the column).
- ``ReferentialSpec`` — semi/anti join child→parent (broadcast or bucketed).
- ``QualitySpec`` — SQL quality check (aggregate fast path or DuckDB fallback).
- ``AggThresholdSpec`` — freshness/retention: global min/max vs now.
- ``ImageSpec`` / ``DriftSpec`` — north-star extensions (actor-pool decode
  conformance; sketch-profile drift vs baseline).

Everything in a plan is small and picklable; plans ship to Ray workers,
contract objects do not.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Optional


@dataclass(frozen=True)
class ConstraintSpec:
    check_key: str
    kind: str  # not_null | min_length | max_length | minimum | maximum |
    #            not_equal | enum | regex | format
    column: str  # TOP-LEVEL column the value lives under (scan pruning key)
    args: tuple = ()  # (value,) or (list,) depending on kind
    # Access path below the top-level column for nested constraints
    # (reference semantics: export/jsonschema_converter.py:34-94 nested
    # properties + engines/fastjsonschema/check_jsonschema.py:87-111):
    # each step is a struct child name, or "[]" = flatten a list level.
    path: tuple = ()


@dataclass(frozen=True)
class SchemaCheckSpec:
    check_key: str
    kind: str  # present | type
    column: str
    expected_type: Optional[str] = None  # serialized arrow type repr


@dataclass(frozen=True)
class UniqueSpec:
    check_key: str
    column: str
    # For binary/content columns: group on a 64-bit content hash first
    # (phash-bucketed path per BASELINE.json north_star), then verify exact.
    by_content_hash: bool = False


@dataclass(frozen=True)
class ReferentialSpec:
    check_key: str
    column: str  # FK column in this model
    parent_model: str
    parent_column: str


@dataclass(frozen=True)
class QualitySpec:
    check_key: str
    query: str  # already {model}/{field}-substituted
    threshold: tuple  # (op, value) op in =,!=,>,>=,<,<=,between,not between
    field: Optional[str] = None


@dataclass(frozen=True)
class AggThresholdSpec:
    """freshness: now - max(ts) < seconds; retention: now - min(ts) < seconds."""

    check_key: str
    kind: str  # freshness | retention
    column: str
    seconds: float
    display: str  # original threshold string for the check name


@dataclass(frozen=True)
class ImageSpec:
    """Pixel-level conformance (north-star extension, BASELINE.json).

    Decode ``bytes_column`` with the vendored codecs, verify decoded
    dimensions == (w,h) columns, format dispatch == fmt column, recomputed
    perceptual hash == phash column, and — when the row carries a lossless
    MASTER of the same image (``master_column``, sniffed format) — PSNR of
    the lossy decode vs the master decode >= min_psnr (the north-star
    "decoded-pixel allclose, PSNR≥40dB for lossy" invariant; real since the
    vendored baseline JPEG codec, ``functions/jpeg.py``). Lossy rows with no
    master are decode/dims/phash-checked only.
    """

    check_key: str
    bytes_column: str = "bytes"
    width_column: str = "w"
    height_column: str = "h"
    fmt_column: str = "fmt"
    phash_column: Optional[str] = "phash"
    id_column: str = "image_id"
    min_psnr: float = 40.0
    master_column: Optional[str] = None


@dataclass(frozen=True)
class DriftSpec:
    """Distribution drift vs a baseline profile (north-star extension)."""

    check_key: str
    column: str
    baseline_path: str  # profile parquet/json produced by `raycontract profile`
    max_ks: float = 0.1  # KS distance threshold for numeric columns
    max_l1: float = 0.2  # total-variation distance for categorical columns


@dataclass
class ModelPlan:
    model_name: str
    path: Optional[str] = None  # resolved data path ({model} templating done)
    format: str = "parquet"
    pk_column: Optional[str] = None  # violation samples carry this id
    schema_checks: list[SchemaCheckSpec] = dc_field(default_factory=list)
    constraints: list[ConstraintSpec] = dc_field(default_factory=list)
    uniques: list[UniqueSpec] = dc_field(default_factory=list)
    referentials: list[ReferentialSpec] = dc_field(default_factory=list)
    qualities: list[QualitySpec] = dc_field(default_factory=list)
    agg_thresholds: list[AggThresholdSpec] = dc_field(default_factory=list)
    image: Optional[ImageSpec] = None
    drifts: list[DriftSpec] = dc_field(default_factory=list)
    row_count_threshold: Optional[tuple] = None  # deprecated root quality subset
    declared_columns: list[str] = dc_field(default_factory=list)

    def scan_columns(self) -> list[str]:
        """Columns the stats pass must read — prune everything else at the
        parquet read (column projection pushdown)."""
        cols: list[str] = []

        def add(c: Optional[str]):
            if c and c not in cols:
                cols.append(c)

        for c in self.constraints:
            add(c.column)
        for a in self.agg_thresholds:
            add(a.column)
        add(self.pk_column)
        return cols


@dataclass
class ValidationPlan:
    checks: list = dc_field(default_factory=list)  # list[Check] (result shells)
    models: dict[str, ModelPlan] = dc_field(default_factory=dict)
