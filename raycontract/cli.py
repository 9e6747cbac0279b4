"""CLI ≅ the reference's ``datacontract`` commands (``cli.py:85-233``):
``test`` (here: validate), ``lint``, plus our ``profile`` and a resumable
``validate-shards`` entry for ``ray job submit`` usage.

Exit code 1 on failed/error runs (≅ test_results_writer.py:44-46).

Usage:
    python -m raycontract.cli validate contract.yaml [--server s] [--junit out.xml]
        [--results results.parquet] [--num-cpus N]
    python -m raycontract.cli lint contract.yaml
    python -m raycontract.cli profile table.parquet --columns a b c --out profile.parquet
    python -m raycontract.cli validate-shards contract.yaml --model m --table DIR
        --results-dir RESULTS --run-id r1 [--num-shards 8]
"""

from __future__ import annotations

import argparse
import sys


def _init_ray(num_cpus):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


INIT_TEMPLATE = """\
dataContractSpecification: 1.1.0
id: my-data-contract-id
info:
  title: My Data Contract
  version: 0.0.1
  description: describe the dataset this contract covers
servers:
  local:
    type: local
    format: parquet
    path: "data/{model}.parquet"
models:
  my_table:
    description: one row per entity
    fields:
      id:
        type: long
        required: true
        unique: true
      name:
        type: string
        minLength: 1
      created_at:
        type: timestamp_ntz
        required: true
"""


def render_export(spec, fmt: str, model: str | None = None,
                  dialect: str | None = None, template: str | None = None) -> str:
    """Single dispatch point for every exporter (≅ exporter_factory.create)."""
    if fmt == "sodacl":
        from raycontract.export.sodacl import export_sodacl

        return export_sodacl(spec)
    if fmt == "avro":
        from raycontract.export.avro import export_avro

        return export_avro(spec)
    if fmt == "jsonschema":
        import json

        from raycontract.export.jsonschema import export_jsonschema

        return json.dumps(export_jsonschema(spec), indent=2)
    if fmt == "sql":
        from raycontract.export.sql import to_sql_ddl

        return to_sql_ddl(spec, dialect=dialect)
    if fmt == "sql-query":
        from raycontract.export.sql import to_sql_query

        m = model or next(iter(spec.models))
        return to_sql_query(spec, m, dialect=dialect or "duckdb")
    if fmt == "odcs":
        from raycontract.export.odcs import export_odcs

        return export_odcs(spec)
    if fmt == "dcs":
        from raycontract.export.dcs import export_dcs_yaml

        return export_dcs_yaml(spec)
    if fmt == "markdown":
        from raycontract.export.markdown import export_markdown

        return export_markdown(spec)
    if fmt == "html":
        from raycontract.export.html import export_html

        return export_html(spec)
    if fmt == "dbt":
        from raycontract.export.dbt import to_dbt_models_yaml

        return to_dbt_models_yaml(spec, dialect=dialect or "duckdb")
    if fmt == "dbt-sources":
        from raycontract.export.dbt import to_dbt_sources_yaml

        return to_dbt_sources_yaml(spec, dialect=dialect or "duckdb")
    if fmt == "dbt-staging-sql":
        from raycontract.export.dbt import to_dbt_staging_sql

        m = model or next(iter(spec.models))
        return to_dbt_staging_sql(spec, m)
    if fmt == "pydantic-model":
        from raycontract.export.pydantic_model import export_pydantic

        return export_pydantic(spec)
    if fmt == "protobuf":
        from raycontract.export.protobuf import export_protobuf

        return export_protobuf(spec)
    if fmt == "spark":
        from raycontract.export.spark import export_spark

        return export_spark(spec)
    if fmt == "bigquery":
        from raycontract.export.bigquery import export_bigquery

        return export_bigquery(spec)
    if fmt == "great-expectations":
        from raycontract.export.great_expectations import export_great_expectations

        return export_great_expectations(spec)
    if fmt == "dbml":
        from raycontract.export.dbml import export_dbml

        return export_dbml(spec, dialect=dialect or "duckdb")
    if fmt == "sqlalchemy":
        from raycontract.export.sqlalchemy_model import export_sqlalchemy

        return export_sqlalchemy(spec)
    if fmt == "go":
        from raycontract.export.golang import export_go

        return export_go(spec)
    if fmt == "terraform":
        from raycontract.export.terraform import export_terraform

        return export_terraform(spec)
    if fmt == "iceberg":
        from raycontract.export.iceberg import export_iceberg

        return export_iceberg(spec, model_name=model)
    if fmt == "rdf":
        from raycontract.export.rdf import export_rdf

        return export_rdf(spec)
    if fmt == "avro-idl":
        from raycontract.export.avro_idl import export_avro_idl

        return export_avro_idl(spec)
    if fmt == "data-caterer":
        from raycontract.export.data_caterer import export_data_caterer

        return export_data_caterer(spec)
    if fmt == "custom":
        from raycontract.export.custom import export_custom

        if not template:
            raise ValueError("--format custom requires --template")
        return export_custom(spec, template)
    raise ValueError(f"unknown export format {fmt!r}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raycontract")
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("validate", help="run all contract checks against the data")
    pv.add_argument("contract")
    pv.add_argument("--server", default=None)
    pv.add_argument("--junit", default=None)
    pv.add_argument("--results", default=None, help="write verdicts parquet here")
    pv.add_argument("--violations", default=None, help="write violation rows parquet here")
    pv.add_argument("--violations-full", default=None,
                    help="ALSO extract EVERY violating row (uncapped streaming pass) "
                         "to this directory as partitioned parquet")
    pv.add_argument("--clean-output", default=None,
                    help="write the rows passing EVERY constraint to this directory "
                         "as partitioned parquet (training-data sink)")
    pv.add_argument("--max-errors", type=int, default=20,
                    help="violation-row cap per check (ref DATACONTRACT_MAX_ERRORS=500)")
    pv.add_argument("--publish", default=None,
                    help="write the Run JSON here (file analog of the reference's "
                         "HTTP publish)")
    pv.add_argument("--num-cpus", type=int, default=None)

    pl = sub.add_parser("lint", help="static checks on the contract itself")
    pl.add_argument("contract")

    pp = sub.add_parser("profile", help="build a baseline profile (drift reference)")
    pp.add_argument("table")
    pp.add_argument("--columns", nargs="*", default=None)
    pp.add_argument("--out", required=True)
    pp.add_argument("--num-cpus", type=int, default=None)

    pe = sub.add_parser("export", help="export the contract to another format")
    pe.add_argument("contract")
    pe.add_argument("--format", required=True, choices=[
        "sodacl", "jsonschema", "avro", "sql", "sql-query", "odcs", "dcs",
        "markdown", "html", "dbt", "dbt-sources", "dbt-staging-sql",
        "pydantic-model", "protobuf", "spark", "bigquery",
        "great-expectations", "dbml", "sqlalchemy", "go", "terraform", "iceberg",
        "rdf", "avro-idl", "data-caterer", "custom"])
    pe.add_argument("--template", default=None,
                    help="jinja template path (required for --format custom)")
    pe.add_argument("--model", default=None,
                    help="model name (required for sql-query/dbt-staging-sql)")
    pe.add_argument("--dialect", default=None, help="SQL dialect override")

    pi = sub.add_parser("import", help="infer a contract from a data file / schema")
    pi.add_argument("--format", required=True,
                    choices=["parquet", "csv", "odcs", "sql", "avro", "jsonschema",
                             "bigquery", "dbt", "unity", "protobuf", "dbml", "spark",
                             "iceberg", "glue"])
    pi.add_argument("--source", required=True)

    pinit = sub.add_parser("init", help="write a starter data contract YAML")
    pinit.add_argument("out", nargs="?", default="datacontract.yaml")

    pcat = sub.add_parser("catalog", help="render an HTML catalog for contract files")
    pcat.add_argument("files", nargs="+")
    pcat.add_argument("--output", default="catalog")

    pb = sub.add_parser("breaking", help="breaking changes between two contract versions")
    pb.add_argument("old")
    pb.add_argument("new")

    pc = sub.add_parser("changelog", help="all changes between two contract versions")
    pd_ = sub.add_parser("diff", help="textual old-vs-new contract diff "
                         "(reference cli.py:433-455: same entries as "
                         "changelog, informational exit code)")
    pd_.add_argument("old"); pd_.add_argument("new")
    pc.add_argument("old")
    pc.add_argument("new")

    ps = sub.add_parser("validate-shards", help="resumable shard-checkpointed validation")
    ps.add_argument("contract")
    ps.add_argument("--model", required=True)
    ps.add_argument("--table", required=True)
    ps.add_argument("--results-dir", required=True)
    ps.add_argument("--run-id", required=True)
    ps.add_argument("--num-shards", type=int, default=8)
    ps.add_argument("--num-cpus", type=int, default=None)

    papi = sub.add_parser("api", help="serve the REST test API "
                          "(reference cli.py:455+ `api`; stdlib http.server "
                          "— POST a contract YAML to /test)")
    papi.add_argument("--port", type=int, default=4242)

    ppub = sub.add_parser("publish", help="publish the resolved contract "
                          "(reference cli.py:328-349 posts to the Data Mesh "
                          "Manager; offline sandbox: a file path target "
                          "writes the resolved JSON, an http(s) target "
                          "POSTs it)")
    ppub.add_argument("contract")
    ppub.add_argument("--target", required=True,
                      help="destination: a .json file path or an http(s) URL")

    args = p.parse_args(argv)

    from raycontract.contract import DataContract
    from raycontract.output import console_table, junit_xml, write_results_parquet

    if args.cmd == "lint":
        run = DataContract(data_contract_file=args.contract).lint()
        print(console_table(run))
        return 0 if run.result.value in ("passed", "warning") else 1

    if args.cmd == "export":
        spec = DataContract(data_contract_file=args.contract).spec
        print(render_export(spec, args.format, model=args.model, dialect=args.dialect,
                            template=getattr(args, "template", None)))
        return 0

    if args.cmd == "import":
        importers = {
            "parquet": "raycontract.imports.parquet:import_parquet",
            "csv": "raycontract.imports.csv:import_csv",
            "odcs": "raycontract.imports.odcs:import_odcs",
            "sql": "raycontract.imports.sql:import_sql",
            "avro": "raycontract.imports.avro:import_avro",
            "jsonschema": "raycontract.imports.jsonschema:import_jsonschema",
            "bigquery": "raycontract.imports.bigquery:import_bigquery",
            "dbt": "raycontract.imports.dbt:import_dbt_manifest",
            "unity": "raycontract.imports.unity:import_unity",
            "protobuf": "raycontract.imports.protobuf:import_protobuf",
            "dbml": "raycontract.imports.dbml:import_dbml",
            "spark": "raycontract.imports.spark:import_spark",
            "iceberg": "raycontract.imports.iceberg:import_iceberg",
            "glue": "raycontract.imports.glue:import_glue",
        }
        import importlib

        mod, fn = importers[args.format].split(":")
        _imp = getattr(importlib.import_module(mod), fn)
        spec = _imp(args.source)
        from raycontract.export.dcs import export_dcs_yaml

        print(export_dcs_yaml(spec))
        return 0

    if args.cmd == "init":
        import os as _os

        if _os.path.exists(args.out):
            print(f"refusing to overwrite existing {args.out}")
            return 1
        with open(args.out, "w") as fh:
            fh.write(INIT_TEMPLATE)
        print(f"wrote {args.out}")
        return 0

    if args.cmd == "api":
        from raycontract.api import main as api_main

        # api.main parses argv positionally: [port]
        return api_main([str(args.port)])

    if args.cmd == "publish":
        import json as _json
        import os

        import yaml as _yaml

        from raycontract.contract import _inline_refs

        with open(args.contract) as fh:
            resolved = _inline_refs(
                _yaml.safe_load(fh),
                base_dir=os.path.dirname(os.path.abspath(args.contract)))
        body = _json.dumps(resolved, indent=2, default=str)
        if args.target.startswith(("http://", "https://")):
            from urllib.request import Request, urlopen

            req = Request(args.target, data=body.encode(),
                          headers={"Content-Type": "application/json"},
                          method="POST")
            with urlopen(req) as resp:  # noqa: S310 (explicit user target)
                print(f"published: HTTP {resp.status}")
            return 0
        with open(args.target, "w") as fh:
            fh.write(body)
        print(f"published: {args.target}")
        return 0

    if args.cmd == "catalog":
        from raycontract.export.html import build_catalog

        written = build_catalog(args.files, args.output)
        for w in written:
            print(w)
        return 0

    if args.cmd in ("breaking", "changelog", "diff"):
        from raycontract.breaking import Severity, breaking as _breaking, changelog as _changelog

        old = DataContract(data_contract_file=args.old).spec
        new = DataContract(data_contract_file=args.new).spec
        changes = _breaking(old, new) if args.cmd == "breaking" else _changelog(old, new)
        for c in changes:
            print(c)
        print(f"{len(changes)} changes")
        if args.cmd == "diff":
            # reference diff (cli.py:433-455) prints the changelog entries
            # without gating the exit code on severity
            return 0
        # exit 1 on breaking (ERROR) changes, like the reference CLI
        return 1 if any(c.severity == Severity.ERROR for c in changes) else 0

    _init_ray(getattr(args, "num_cpus", None))
    import ray

    try:
        if args.cmd == "validate":
            run = DataContract(data_contract_file=args.contract, server=args.server).test(
                max_samples=args.max_errors)
            print(console_table(run))
            if args.junit:
                with open(args.junit, "w") as fh:
                    fh.write(junit_xml(run))
            if args.results:
                write_results_parquet(run, args.results)
            if args.violations:
                from raycontract.output import write_violations_parquet

                write_violations_parquet(run, args.violations)
            if args.publish:
                from raycontract.output import publish_run

                publish_run(run, args.publish)
            if args.violations_full or args.clean_output:
                import os as _os

                from raycontract.compile import compile_contract
                from raycontract.sources.readers import read_model
                from raycontract.stages.violations import extract_clean, extract_violations

                dc = DataContract(data_contract_file=args.contract, server=args.server)
                plan = compile_contract(dc.spec, dc.get_server())
                for model_name, mp2 in plan.models.items():
                    if not mp2.constraints:
                        continue
                    ds = read_model(dc.get_server(), model_name, dc.spec.models.get(model_name))
                    if args.violations_full:
                        n = extract_violations(ds, mp2,
                                               _os.path.join(args.violations_full, model_name))
                        print(f"violations[{model_name}]: {n} rows")
                    if args.clean_output:
                        n = extract_clean(ds, mp2,
                                          _os.path.join(args.clean_output, model_name))
                        print(f"clean[{model_name}]: {n} rows")
            return 0 if run.result.value == "passed" else 1

        if args.cmd == "profile":
            import ray.data as rd

            from raycontract.stages.drift import profile_dataset, save_profile

            ds = rd.read_parquet(args.table, columns=args.columns or None)
            prof = profile_dataset(ds, args.columns)
            save_profile(prof, args.out)
            for col, e in prof.items():
                print(f"{col}: n={e['count']} nulls={e['null_count']} "
                      f"distinct≈{e.get('approx_distinct', float('nan')):.0f} "
                      f"min={e['min']!r} max={e['max']!r}")
            return 0

        if args.cmd == "validate-shards":
            from raycontract.state.lineage import validate_resumable

            run, metrics = validate_resumable(
                args.contract, args.table, args.model, args.results_dir,
                args.run_id, num_shards=args.num_shards)
            print(console_table(run))
            print(f"shards: {metrics['shards']} computed: {metrics['computed']} "
                  f"resumed: {metrics['resumed']}")
            return 0 if run.result.value == "passed" else 1
    finally:
        ray.shutdown()
    return 2


if __name__ == "__main__":
    sys.exit(main())
