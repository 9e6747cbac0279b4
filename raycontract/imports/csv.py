"""CSV → contract importer.

≅ the reference's ``imports/csv_importer.py:16-67``: sniff the CSV with
Arrow's type-inferring reader and map the inferred Arrow schema to contract
types (shared inverse mapping with the parquet importer).
"""

from __future__ import annotations

import os

import pyarrow.csv as pacsv

from raycontract.contract import DataContractSpecification, Info, Model
from raycontract.imports.parquet import field_from_arrow


def import_csv(path: str, model_name: str | None = None) -> DataContractSpecification:
    table = pacsv.read_csv(path)
    name = model_name or os.path.splitext(os.path.basename(path))[0]
    model = Model(type="table", fields={
        af.name: field_from_arrow(af) for af in table.schema
    })
    return DataContractSpecification(
        dataContractSpecification="1.1.0",
        id=f"imported-{name}",
        info=Info(title=name, version="0.0.1"),
        models={name: model},
    )
