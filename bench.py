#!/usr/bin/env python
"""Benchmark harness.

Headline: end-to-end contract validation of the north-star image+caption
table (BASELINE.json ``input_hint`` schema, deterministic synthetic,
generated once and cached under /tmp) — stats kernel + caption regex +
uniqueness on image_id + phash-bucketed bytes uniqueness + actor-pool image
decode/phash conformance. Metric = validated images/sec.

Secondary: representative pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "images": N_IMG, "images_per_sec": ...}

``--scaling``: runs the bench twice in fresh processes (num_cpus=8 then 32)
on the same cached input and prints both throughputs + scaling efficiency
(the sandbox substitute for the N vs 4N cluster criterion, see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_IMAGES = int(os.environ.get("RAY_GRAFT_BENCH_N", "1000000"))
IMG_DIR = f"/tmp/raycontract_bench/images_{N_IMAGES}"


def run_bench() -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import logging

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    from raycontract import DataContract
    from raycontract.fixtures import IMAGES_CONTRACT_YAML, write_images_dataset

    # one-time generation (deterministic, cached across runs); the follow-up
    # count() warms the OS page cache so we measure compute, not cold reads
    write_images_dataset(IMG_DIR, N_IMAGES, num_files=64)
    rd.read_parquet(IMG_DIR).count()

    contract = IMAGES_CONTRACT_YAML + f"""
servers:
  local: {{type: local, format: parquet, path: "{IMG_DIR}"}}
"""
    t0 = time.time()
    run = DataContract(data_contract_str=contract).test()
    headline = time.time() - t0
    assert run.result.value in ("passed", "failed"), run.result
    n_checks = len(run.checks)

    from raycontract import entry_queries as q

    queries = {}
    for name, fn in [
        ("contract_orders", q.flagship_contract_orders),
        ("pricing_summary", lambda d: q.pricing_summary_q(d).to_pandas()),
        ("events_hourly", lambda d: q.events_hourly_q(d).to_pandas()),
        ("dedup_exact_documents", lambda d: q.dedup_exact_documents(d).to_pandas()),
        ("minhash_pairs_documents", lambda d: q.minhash_pairs_documents(d).to_pandas()),
        ("knn_cosine_embeddings", lambda d: q.knn_cosine_embeddings(d).to_pandas()),
        ("text_stats_documents", lambda d: q.text_stats_documents(d).to_pandas()),
        ("distinct_counts", q.distinct_counts),
    ]:
        t0 = time.time()
        fn(sf_dir)
        queries[name] = round(time.time() - t0, 3)

    out = {
        "metric": "validated images/sec (end-to-end contract check throughput)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": ncpu,
        "images": N_IMAGES,
        "images_per_sec": round(N_IMAGES / headline, 1),
        "checks": n_checks,
        "run_result": run.result.value,
    }
    ray.shutdown()
    return out


def run_scaling() -> None:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(json.dumps({
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "images_per_sec_8": r_lo["images_per_sec"],
        "images_per_sec_32": r_hi["images_per_sec"],
        "images": r_lo["images"],
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
