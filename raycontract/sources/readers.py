"""Server → ray.data.Dataset readers.

≅ the reference's DuckDB-view construction per server format
(``engines/soda/connections/duckdb_connection.py:34-66``: json via
read_json_auto with new_line/array delimiter, parquet, csv with
contract-declared column types, delta) — re-expressed as native Ray Data
readers with column pruning pushed to the read. ``{model}`` path templating
≅ ``duckdb_connection.py:36-37``.

Lance note: BASELINE.json names a Lance table; the ``lance`` wheel is not
installable offline (SURVEY.md §7), so ``format: lance`` is read as a
directory of Parquet fragments with the same columnar layout — the reader
dispatch keeps a distinct branch so a real Lance reader can slot in.
"""

from __future__ import annotations

from typing import Optional

import ray.data as rd

from raycontract.contract import Model, Server
from raycontract.types import contract_field_to_arrow


def resolve_path(server: Server, model_name: str) -> str:
    path = server.path or server.location
    if path is None:
        raise ValueError(f"server has no path/location for model {model_name}")
    return path.replace("{model}", model_name)


def read_model(
    server: Server,
    model_name: str,
    model: Optional[Model] = None,
    columns: Optional[list[str]] = None,
    override_num_blocks: Optional[int] = None,
):
    """Build the (lazy) Dataset for one model; prunes to ``columns`` when the
    format supports projection pushdown."""
    path = resolve_path(server, model_name)
    fmt = (server.format or "parquet").lower()
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks

    if fmt in ("parquet", "lance", "delta"):
        return rd.read_parquet(path, columns=columns, **kwargs)
    if fmt == "csv":
        import pyarrow.csv as pacsv

        convert = None
        if model is not None:
            # declared column types ≅ csv_type_converter (ref :53-63)
            try:
                col_types = {n: contract_field_to_arrow(f) for n, f in model.fields.items() if f.type}
                convert = pacsv.ConvertOptions(column_types=col_types)
            except ValueError:
                convert = None
        ds = rd.read_csv(path, convert_options=convert, **kwargs) if convert else rd.read_csv(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if fmt == "json":
        if server.delimiter == "array":
            # a whole-file JSON array is not splittable line-wise; read via
            # pandas on the driver for small files (documented limitation)
            import pandas as pd

            return rd.from_pandas(pd.read_json(path))
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"unsupported server format: {fmt!r}")
