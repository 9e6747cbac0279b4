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

    if fmt in ("parquet", "lance"):
        return rd.read_parquet(path, columns=columns, **kwargs)
    if fmt == "delta":
        # A Delta table directory contains tombstoned/compacted parquet files
        # not in the current snapshot — a bare read_parquet over the directory
        # would double-count rows. Resolve the ACTIVE file list from the
        # _delta_log transaction log (public Delta protocol: ordered JSON
        # commits with add/remove actions, optional parquet checkpoint).
        files = _delta_active_files(path)
        if files is None:
            import logging

            logging.getLogger(__name__).warning(
                "format 'delta' but no _delta_log at %s; reading as plain parquet "
                "(tombstoned files, if any, WILL be double-counted)", path)
            return rd.read_parquet(path, columns=columns, **kwargs)
        return rd.read_parquet(files, columns=columns, **kwargs)
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
            # a whole-file JSON array is not line-splittable; parse it once
            # on the driver with DuckDB's read_json_auto (EXACTLY what the
            # reference does for array JSON, duckdb_connection.py:40-48) and
            # hand the arrow table to Ray — the downstream pipeline is
            # distributed, only the parse is driver-side (documented)
            import duckdb

            con = duckdb.connect()
            t = con.execute(
                "SELECT * FROM read_json_auto(?, format='array')", [path]).arrow()
            con.close()
            return rd.from_arrow(t)
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if fmt == "kafka":
        # The reference's kafka path materializes the topic from `earliest`
        # into a static frame and validates it as a BATCH SNAPSHOT
        # (engines/soda/connections/kafka.py:50-57) — no streaming state.
        # Offline analog: the server path points at an NDJSON topic dump
        # (one message per line), reproducing exactly those semantics.
        ds = rd.read_json(path, **kwargs)
        return ds.select_columns(columns) if columns else ds
    if fmt == "avro":
        # Kafka avro wire format (reference kafka.py:90-95: strip the 5-byte
        # Confluent schema-registry header from each message and decode the
        # avro body with the schema derived FROM THE CONTRACT MODEL). Offline
        # analog: the path points at length-prefixed binary topic-dump files;
        # each file is one read task, the ragged per-message decode runs in
        # an actor pool with the contract-derived decoder compiled once per
        # actor (functions/avro_binary.py).
        if model is None:
            raise ValueError("format 'avro' needs the contract model — it is the schema authority")
        import pyarrow as pa

        from raycontract.export.avro import to_avro_schema

        avro_schema = to_avro_schema(model_name, model)
        try:
            arrow_schema = pa.schema(
                [(n, contract_field_to_arrow(f)) for n, f in model.fields.items()])
        except ValueError:
            arrow_schema = None

        class AvroWireDump:
            def __init__(self):
                from raycontract.functions.avro_binary import compile_decoder

                self.decoder = compile_decoder(avro_schema)

            def __call__(self, batch: "pa.Table") -> "pa.Table":
                from raycontract.functions.avro_binary import (
                    decode_wire_message,
                    iter_frames,
                )

                rows = []
                for blob in batch["bytes"]:
                    for msg in iter_frames(blob.as_py()):
                        rows.append(decode_wire_message(msg, self.decoder))
                return pa.Table.from_pylist(rows, schema=arrow_schema)

        ds = rd.read_binary_files(path, **kwargs).map_batches(
            AvroWireDump, batch_size=1, batch_format="pyarrow", concurrency=(1, 8))
        return ds.select_columns(columns) if columns else ds
    raise ValueError(f"unsupported server format: {fmt!r}")


def _delta_active_files(table_path: str) -> Optional[list[str]]:
    """Snapshot file list from a Delta transaction log, or None if there is
    no ``_delta_log`` directory.

    Implements the minimal public Delta protocol reader: start from the last
    parquet checkpoint named in ``_last_checkpoint`` (if any), then replay the
    ordered JSON commit files, applying ``add`` / ``remove`` actions. The
    reference reads delta through DuckDB's delta scan
    (``engines/soda/connections/duckdb_connection.py:64-66``); semantics here
    are the same snapshot resolution.
    """
    import json
    import os

    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        return None

    active: set[str] = set()
    start_version = -1

    ckpt_info = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(ckpt_info):
        import pyarrow.parquet as pq

        with open(ckpt_info) as f:
            meta = json.load(f)
        v = int(meta["version"])
        parts = int(meta.get("parts", 0) or 0)
        if parts:
            ckpts = [os.path.join(log_dir, f"{v:020d}.checkpoint.{p:010d}.{parts:010d}.parquet")
                     for p in range(1, parts + 1)]
        else:
            ckpts = [os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")]
        for cp in ckpts:
            t = pq.read_table(cp)
            if "add" in t.column_names:
                for a in t.column("add").to_pylist():
                    if a and a.get("path"):
                        active.add(a["path"])
            if "remove" in t.column_names:
                for r in t.column("remove").to_pylist():
                    if r and r.get("path"):
                        active.discard(r["path"])
        start_version = v

    commits = sorted(
        f for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:20].isdigit() and int(f[:20]) > start_version
    )
    for name in commits:
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("path"):
                    active.add(action["add"]["path"])
                elif "remove" in action and action["remove"].get("path"):
                    active.discard(action["remove"]["path"])
    return sorted(os.path.join(table_path, p) for p in active)
