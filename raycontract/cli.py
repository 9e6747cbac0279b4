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


def _spec_to_dict(spec) -> dict:
    """Contract spec → plain YAML-able dict (for `import` output)."""

    def field_d(f):
        d = {}
        for k in ("type", "required", "unique", "references", "format", "pattern",
                  "minLength", "maxLength", "minimum", "maximum", "precision", "scale",
                  "description"):
            v = getattr(f, k)
            if v is not None:
                d[k] = v
        if f.fields:
            d["fields"] = {n: field_d(c) for n, c in f.fields.items()}
        if f.items is not None:
            d["items"] = field_d(f.items)
        return d

    return {
        "dataContractSpecification": spec.dataContractSpecification,
        "id": spec.id,
        "info": {"title": spec.info.title, "version": spec.info.version},
        "models": {
            n: {"type": m.type, "fields": {fn: field_d(f) for fn, f in m.fields.items()}}
            for n, m in spec.models.items()
        },
    }


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
    pv.add_argument("--max-errors", type=int, default=20,
                    help="violation-row cap per check (ref DATACONTRACT_MAX_ERRORS=500)")
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
    pe.add_argument("--format", required=True, choices=["sodacl", "jsonschema", "avro"])

    pi = sub.add_parser("import", help="infer a contract from a data file")
    pi.add_argument("--format", required=True, choices=["parquet", "csv", "odcs"])
    pi.add_argument("--source", required=True)

    pb = sub.add_parser("breaking", help="breaking changes between two contract versions")
    pb.add_argument("old")
    pb.add_argument("new")

    pc = sub.add_parser("changelog", help="all changes between two contract versions")
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

    args = p.parse_args(argv)

    from raycontract.contract import DataContract
    from raycontract.output import console_table, junit_xml, write_results_parquet

    if args.cmd == "lint":
        run = DataContract(data_contract_file=args.contract).lint()
        print(console_table(run))
        return 0 if run.result.value in ("passed", "warning") else 1

    if args.cmd == "export":
        spec = DataContract(data_contract_file=args.contract).spec
        if args.format == "sodacl":
            from raycontract.export.sodacl import export_sodacl

            print(export_sodacl(spec))
        elif args.format == "avro":
            from raycontract.export.avro import export_avro

            print(export_avro(spec))
        else:
            import json

            from raycontract.export.jsonschema import export_jsonschema

            print(json.dumps(export_jsonschema(spec), indent=2))
        return 0

    if args.cmd == "import":
        import yaml as _yaml

        if args.format == "parquet":
            from raycontract.imports.parquet import import_parquet as _imp
        elif args.format == "odcs":
            from raycontract.imports.odcs import import_odcs as _imp
        else:
            from raycontract.imports.csv import import_csv as _imp
        spec = _imp(args.source)
        print(_yaml.dump(_spec_to_dict(spec), sort_keys=False))
        return 0

    if args.cmd in ("breaking", "changelog"):
        from raycontract.breaking import Severity, breaking as _breaking, changelog as _changelog

        old = DataContract(data_contract_file=args.old).spec
        new = DataContract(data_contract_file=args.new).spec
        changes = _breaking(old, new) if args.cmd == "breaking" else _changelog(old, new)
        for c in changes:
            print(c)
        print(f"{len(changes)} changes")
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
            if args.violations_full:
                from raycontract.compile import compile_contract
                from raycontract.sources.readers import read_model
                from raycontract.stages.violations import extract_violations

                dc = DataContract(data_contract_file=args.contract, server=args.server)
                plan = compile_contract(dc.spec, dc.get_server())
                for model_name, mp2 in plan.models.items():
                    if not mp2.constraints:
                        continue
                    ds = read_model(dc.get_server(), model_name, dc.spec.models.get(model_name))
                    import os as _os

                    n = extract_violations(ds, mp2,
                                           _os.path.join(args.violations_full, model_name))
                    print(f"violations[{model_name}]: {n} rows")
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
