"""Image-conformance stage: actor-pool decode over small Arrow batches.

North-star extension (BASELINE.json north_star): decode each row's ``bytes``
with the vendored codecs, verify decoded dimensions match the declared
``w``/``h`` columns, the format dispatch matches ``fmt``, the recomputed DCT
phash equals the stored ``phash``, and (for lossy formats, when the row
carries a lossless master) PSNR of the lossy decode vs the master decode ≥
min_psnr — REAL since the vendored baseline JPEG codec
(``functions/jpeg.py``); see ``fixtures.make_jpeg_master_rows``.

Scale design: a callable CLASS → ``map_batches(ImageConformance,
concurrency=(1,N), batch_size=small)`` actor pool — decode state (DCT
matrix, codec dispatch) initialized once per actor; batches kept small
because rows are wide (binary payloads); the emitted partial per batch is
tiny (counters + violation ids), never the pixels.
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np
import pyarrow as pa

from raycontract.plans import ImageSpec


class ImageConformance:
    def __init__(self, spec: ImageSpec, max_samples: int = 20):
        # once per actor: codec dispatch + DCT basis warm (module import)
        from raycontract.functions import codecs

        self.codecs = codecs
        self.spec = spec
        self.max_samples = max_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = self.spec
        n = batch.num_rows
        ids = batch[s.id_column].to_pylist()
        blobs = batch[s.bytes_column].to_pylist()
        ws = batch[s.width_column].to_pylist()
        hs = batch[s.height_column].to_pylist()
        fmts = batch[s.fmt_column].to_pylist()
        phashes = batch[s.phash_column].to_pylist() if s.phash_column else [None] * n
        masters = (batch[s.master_column].to_pylist()
                   if s.master_column and s.master_column in batch.column_names
                   else [None] * n)

        counters = {"decode_error": 0, "dim_mismatch": 0, "fmt_mismatch": 0,
                    "phash_mismatch": 0, "psnr_below": 0, "null_bytes": 0}
        samples: list[tuple] = []

        # pass 1 — per-image decode (inherently row-wise) + dim/fmt checks;
        # collect 32×32 grayscales so the DCT phash runs ONCE, batched
        pending: list[int] = []  # indices needing a phash compare
        smalls: list[np.ndarray] = []
        for i in range(n):
            blob, fmt = blobs[i], fmts[i]
            if blob is None:
                counters["null_bytes"] += 1
                self._sample(samples, ids[i], "null bytes")
                continue
            sniffed = self.codecs.sniff_format(blob)
            if fmt is not None and sniffed is not None and sniffed != fmt:
                counters["fmt_mismatch"] += 1
                self._sample(samples, ids[i], f"fmt says {fmt!r}, bytes look like {sniffed!r}")
                continue
            try:
                img = self.codecs.decode_image(blob, fmt or sniffed or "")
            except Exception as e:
                counters["decode_error"] += 1
                self._sample(samples, ids[i], f"decode failed: {e}")
                continue
            ih, iw = img.shape[0], img.shape[1]
            if (ws[i] is not None and iw != ws[i]) or (hs[i] is not None and ih != hs[i]):
                counters["dim_mismatch"] += 1
                self._sample(samples, ids[i], f"decoded {iw}x{ih} != declared {ws[i]}x{hs[i]}")
                continue
            if fmt not in self.codecs.LOSSLESS_FORMATS and masters[i] is not None:
                # lossy path (REAL since the vendored baseline JPEG codec):
                # decoded pixels vs the row's lossless MASTER — the
                # north-star "PSNR≥40dB for lossy" invariant. Runs BEFORE
                # the phash queue so a master failure counts the row once.
                try:
                    mfmt = self.codecs.sniff_format(masters[i]) or ""
                    ref = self.codecs.decode_image(masters[i], mfmt)
                    p = (self.codecs.psnr(img, ref)
                         if ref.shape == img.shape else 0.0)
                except Exception as e:
                    counters["master_decode_error"] = (
                        counters.get("master_decode_error", 0) + 1)
                    self._sample(samples, ids[i], f"master decode failed: {e}")
                    continue
                if p < s.min_psnr:
                    counters["psnr_below"] += 1
                    self._sample(samples, ids[i], f"PSNR {p:.1f} < {s.min_psnr}")
            if phashes[i] is not None:
                pending.append(i)
                smalls.append(self.codecs._area_resize_gray(img, 32))

        # pass 2 — batched DCT phash (bit-identical to the per-image path)
        if pending:
            calc = self.codecs.phash64_batch(np.stack(smalls))
            for idx, ph in zip(pending, calc):
                if int(ph) != phashes[idx]:
                    counters["phash_mismatch"] += 1
                    self._sample(samples, ids[idx], f"phash {int(ph)} != stored {phashes[idx]}")

        payload = pickle.dumps({"rows": n, "counters": counters, "samples": samples})
        return pa.table({"payload": pa.array([payload], type=pa.binary())})

    def _sample(self, samples, id_, reason):
        if len(samples) < self.max_samples:
            samples.append((id_, reason))


def image_conformance_stats(
    ds,
    spec: ImageSpec,
    max_samples: int = 20,
    batch_size: int = 512,
    concurrency=None,
) -> dict[str, Any]:
    if concurrency is None:
        # decode is the CPU-heavy stage: size the pool to most of the cluster
        # (fixed size — autoscaling from 1 ramps too slowly for a batch job)
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, cpus - 2)
    # max_restarts=0: constructor args live in the object store (ray#53727)
    out_ds = ds.map_batches(
        ImageConformance,
        fn_constructor_args=(spec, max_samples),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        max_restarts=0,
    )
    rows = out_ds.take_all()
    agg: dict[str, Any] = {"row_count": 0, "invalid_count": 0, "samples": []}
    counters: dict[str, int] = {}
    for r in rows:
        p = pickle.loads(r["payload"])
        agg["row_count"] += p["rows"]
        for k, v in p["counters"].items():
            counters[k] = counters.get(k, 0) + v
        if len(agg["samples"]) < max_samples:
            agg["samples"].extend(p["samples"][: max_samples - len(agg["samples"])])
    agg["invalid_count"] = sum(counters.values())
    agg.update(counters)
    return agg


def decode_batch_to_pixels(batch: pa.Table, bytes_column: str = "bytes",
                           fmt_column: str = "fmt") -> list[np.ndarray]:
    """Utility for tests / feature-extraction stages: decode a batch's images."""
    from raycontract.functions.codecs import decode_image

    blobs = batch[bytes_column].to_pylist()
    fmts = batch[fmt_column].to_pylist()
    return [decode_image(b, f) for b, f in zip(blobs, fmts)]
