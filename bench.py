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
# 256 fragments: fine-grained per-fragment tasks for the read-fused scan
# (64 fragments left 26/30 CPUs idle in the last wave — measured r2)
N_FILES = int(os.environ.get("RAY_GRAFT_BENCH_FILES", "256"))
IMG_DIR = f"/tmp/raycontract_bench/images_{N_IMAGES}_f{N_FILES}"


def _calib_worker(_):
    """One calibration worker: run the REAL per-image kernel (decode → resize
    → batched phash) in a tight loop for a fixed window; returns img/s."""
    import time as _t

    import numpy as _np
    import pyarrow.parquet as _pq

    from raycontract.functions.codecs import _area_resize_gray, decode_image, phash64_batch

    frag = sorted(f for f in os.listdir(IMG_DIR) if f.endswith(".parquet"))[0]
    tbl = _pq.read_table(os.path.join(IMG_DIR, frag)).slice(0, 1024)
    blobs = tbl["bytes"].to_pylist()
    fmts = tbl["fmt"].to_pylist()
    t0 = _t.time()
    cnt = 0
    while _t.time() - t0 < 3.0:
        smalls = [_area_resize_gray(decode_image(b, f), 32) for b, f in zip(blobs, fmts)]
        phash64_batch(_np.stack(smalls))
        cnt += len(blobs)
    return cnt / (_t.time() - t0)


def machine_calibration(nproc: int) -> float:
    """Total kernel img/s the MACHINE can deliver with nproc plain processes
    (no Ray) at this moment. The sandbox is a microVM on a shared host with
    variable CPU steal; this same-moment capacity measurement lets the
    scaling report separate pipeline efficiency from host-noise/bandwidth
    effects (see BASELINE.md)."""
    import multiprocessing as mp

    with mp.Pool(nproc) as pool:
        rates = pool.map(_calib_worker, range(nproc))
    return float(sum(rates))


def run_bench() -> dict:
    # Pin library-internal thread pools to 1: Ray's num_cpus is the unit of
    # parallelism (on a real cluster each worker owns its CPU slot; letting
    # polars/BLAS fan out to every physical core would let the "8 CPU" run
    # silently use 32 and corrupt the scaling measurement).
    for var in ("POLARS_MAX_THREADS", "OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import logging

    import ray

    # log_to_driver=False: worker-side "Failed to hash the schemas" warnings
    # (benign — pandas metadata in the testdata parquet) would spam the bench
    # output at scale; the bench prints exactly one JSON line
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    from raycontract import DataContract
    from raycontract.fixtures import IMAGES_CONTRACT_YAML, write_images_dataset

    # one-time generation (deterministic, cached across runs), then warm the
    # OS page cache by actually reading every byte (count() is metadata-only)
    # so we measure compute + shuffle, not first-touch disk reads
    write_images_dataset(IMG_DIR, N_IMAGES, num_files=N_FILES)
    for f in os.listdir(IMG_DIR):
        with open(os.path.join(IMG_DIR, f), "rb") as fh:
            while fh.read(1 << 24):
                pass

    contract = IMAGES_CONTRACT_YAML + f"""
servers:
  local: {{type: local, format: parquet, path: "{IMG_DIR}"}}
"""
    # warmup validate over ONE fragment: boots Ray workers, compiles pyc,
    # fills the import page cache — so the timed run measures the pipeline,
    # not process-startup storms
    frag = sorted(f for f in os.listdir(IMG_DIR) if f.endswith(".parquet"))[0]
    warm_contract = IMAGES_CONTRACT_YAML + f"""
servers:
  local: {{type: local, format: parquet, path: "{os.path.join(IMG_DIR, frag)}"}}
"""
    DataContract(data_contract_str=warm_contract).test()

    # ~8 blocks per CPU balances dispatch overhead against straggler smoothing
    # (grid-searched in BASELINE.md); 2048-row batches amortize per-batch
    # Python costs at ~4KB/image. Three timed runs, min reported: the shared
    # host's CPU-steal storms inflate single runs up to 3x (BASELINE.md).
    headline_runs = []
    for _ in range(int(os.environ.get("RAY_GRAFT_HEADLINE_REPS", "3"))):
        t0 = time.time()
        run = DataContract(data_contract_str=contract).test(
            override_num_blocks=8 * ncpu, batch_size=2048)
        headline_runs.append(time.time() - t0)
    headline = min(headline_runs)
    assert run.result.value in ("passed", "failed"), run.result
    n_checks = len(run.checks)

    from raycontract import entry_queries as q

    queries = {}
    secondary = [] if os.environ.get("RAY_GRAFT_HEADLINE_ONLY") else [
        ("contract_orders", q.flagship_contract_orders),
        ("pricing_summary", lambda d: q.pricing_summary_q(d).to_pandas()),
        ("events_hourly", lambda d: q.events_hourly_q(d).to_pandas()),
        ("dedup_exact_documents", lambda d: q.dedup_exact_documents(d).to_pandas()),
        ("minhash_pairs_documents", lambda d: q.minhash_pairs_documents(d).to_pandas()),
        ("knn_cosine_embeddings", lambda d: q.knn_cosine_embeddings(d).to_pandas()),
        ("text_stats_documents", lambda d: q.text_stats_documents(d).to_pandas()),
        ("distinct_counts", q.distinct_counts),
        ("asof_join_events_orders", lambda d: q.asof_join_events_orders(d).to_pandas()),
        ("exact_quantiles_totalprice", q.exact_quantiles_totalprice),
        # round-4b representatives: time-RANGE window frames (partition
        # kernel), corpus bigram combiner, exact-quantile bucket assignment
        ("rolling_hour_events", lambda d: q.rolling_hour_events(d).to_pandas()),
        ("bigram_topk_documents", lambda d: q.bigram_topk_documents(d).to_pandas()),
        ("quartile_orders", lambda d: q.quartile_orders(d).to_pandas()),
        # round-5 representatives: span-level dedup (keep-first shuffle of
        # (hash,key) pairs) and the contamination report (broadcast gram set
        # + zero-shuffle scoring)
        ("chunk_dedup_documents", lambda d: q.chunk_dedup_documents(d).to_pandas()),
        ("ngram_contamination_documents",
         lambda d: q.ngram_contamination_documents(d).to_pandas()),
        # round-5c representative: CDC keep-latest (arg-max partials →
        # grouped binary-max fold → broadcast winning-id keep pass)
        ("latest_snapshot_events",
         lambda d: q.latest_snapshot_events(d).to_pandas()),
    ]
    for name, fn in secondary:
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
        "headline_runs_sec": [round(h, 3) for h in headline_runs],
        "checks": n_checks,
        "run_result": run.result.value,
    }
    ray.shutdown()
    # single-process kernel rate at this moment — lets any reader normalize
    # the headline against current host conditions (peak ≈ 4700-5600 img/s)
    out["calib_1proc_img_per_sec"] = round(machine_calibration(1), 1)
    if os.environ.get("RAY_GRAFT_CALIBRATE"):
        # multi-worker machine capacity for the scaling report — EXACTLY ncpu
        # plain processes, so capacity_ratio spans the same 4x worker range
        # as the pipeline configs (the former ncpu-2 calibration compared a
        # 4x pipeline span against a 6->30 = 5x capacity span, biasing
        # scaling_efficiency_vs_machine low by ~20%)
        out["calib_img_per_sec"] = round(machine_calibration(ncpu), 1)
    return out


def run_scaling() -> None:
    """N-vs-4N substitute (see BASELINE.md): fresh processes at num_cpus=8 and
    32 on the same cached input. The sandbox is a microVM on a shared host —
    hypervisor steal adds ±2× run-to-run noise — so configs are interleaved
    (8,32,8,32) and the MIN per config is the steal-free estimate; raw runs
    are reported alongside."""

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), RAY_GRAFT_HEADLINE_ONLY="1",
                   RAY_GRAFT_CALIBRATE="1")
        for attempt in (1, 2):  # one retry for transient ray-session failures
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                                  capture_output=True, text=True,
                                  cwd=os.path.dirname(os.path.abspath(__file__)))
            if proc.returncode == 0:
                return json.loads(proc.stdout.strip().splitlines()[-1])
            sys.stderr.write(f"[scaling] child ncpu={ncpu} attempt {attempt} failed:\n"
                             + proc.stderr[-2000:] + "\n")
        raise RuntimeError(f"bench child failed twice at num_cpus={ncpu}")

    lo, hi = 8, 32
    reps = int(os.environ.get("RAY_GRAFT_SCALING_REPS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))
    sec_lo = min(r["value"] for r in runs_lo)
    sec_hi = min(r["value"] for r in runs_hi)
    n_img = runs_lo[0]["images"]
    thr_lo, thr_hi = n_img / sec_lo, n_img / sec_hi
    eff = (thr_hi / thr_lo) / (hi / lo)
    result = {
        "sec_8": sec_lo, "sec_32": sec_hi,
        "images_per_sec_8": round(thr_lo, 1),
        "images_per_sec_32": round(thr_hi, 1),
        "images": n_img,
        "scaling_efficiency": round(eff, 3),
        "raw_sec_8": [r["value"] for r in runs_lo],
        "raw_sec_32": [r["value"] for r in runs_hi],
    }
    # machine-normalized efficiency: how much of the machine's SAME-MOMENT
    # deliverable kernel capacity (measured with plain processes, no Ray) the
    # pipeline achieves at each size — cancels shared-host CPU steal and
    # memory-bandwidth ceilings that a real 4x-node cluster would not have
    calib_lo = [r["calib_img_per_sec"] for r in runs_lo if "calib_img_per_sec" in r]
    calib_hi = [r["calib_img_per_sec"] for r in runs_hi if "calib_img_per_sec" in r]
    if calib_lo and calib_hi:
        machine_ratio = max(calib_hi) / max(calib_lo)
        result["machine_kernel_img_per_sec_8"] = max(calib_lo)
        result["machine_kernel_img_per_sec_32"] = max(calib_hi)
        result["machine_capacity_ratio"] = round(machine_ratio, 3)
        result["scaling_efficiency_vs_machine"] = round((thr_hi / thr_lo) / machine_ratio, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
