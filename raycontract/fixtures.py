"""Deterministic synthetic fixtures — the north-star image+caption table.

Schema exactly matches BASELINE.json ``input_hint``::

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Generation is a Ray Data pipeline (``ray.data.range(n) → map_batches(GenImages
actor pool) → write_parquet``) with per-row seeded RNG, so any slice of any
scale regenerates identically regardless of parallelism — tests and the
benchmark both build from it (FIXTURES.md F1), and the generated directory of
parquet fragments stands in for the Lance table layout.

``apply_violations`` injects a KNOWN number of violations per check type into
a clean in-memory table (FIXTURES.md: "inject a known set of violations so
expected verdicts and violation rows are computable exactly").
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa

_VOCAB = (
    "amber bridge cloud delta ember forest garden harbor island jungle keel "
    "lantern meadow nectar orchid prairie quarry river summit timber upland "
    "valley willow zephyr basin canyon dune estuary fjord glacier"
).split()

FORMATS = ("png", "bmp", "ppm")


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 9))
    words = [_VOCAB[int(i)] for i in rng.integers(0, len(_VOCAB), n)]
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def make_image_row(idx: int, seed: int = 42, min_dim: int = 8, max_dim: int = 64) -> dict:
    from raycontract.functions.codecs import encode_image, phash64

    rng = np.random.default_rng(np.random.PCG64(seed * 1_000_003 + idx))
    h = int(rng.integers(min_dim, max_dim + 1))
    w = int(rng.integers(min_dim, max_dim + 1))
    # structured pixels (gradient + noise) so phash is non-degenerate
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy * 255 // max(h - 1, 1))[..., None] * np.array([1, 0, 0])
            + (xx * 255 // max(w - 1, 1))[..., None] * np.array([0, 1, 0]))
    noise = rng.integers(0, 64, (h, w, 3))
    img = np.clip(base // 2 + noise, 0, 255).astype(np.uint8)
    fmt = FORMATS[idx % len(FORMATS)]
    return {
        "image_id": f"img-{idx:012d}",
        "bytes": encode_image(img, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": _caption(rng),
        "phash": phash64(img),
    }


IMAGES_SCHEMA = pa.schema([
    pa.field("image_id", pa.string()),
    pa.field("bytes", pa.binary()),
    pa.field("w", pa.int32()),
    pa.field("h", pa.int32()),
    pa.field("fmt", pa.string()),
    pa.field("caption", pa.string()),
    pa.field("phash", pa.int64()),
])


def rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in IMAGES_SCHEMA.names}
    return pa.table(
        {n: pa.array(cols[n], type=IMAGES_SCHEMA.field(n).type) for n in IMAGES_SCHEMA.names}
    )


def make_images_table(n: int, seed: int = 42, **kw) -> pa.Table:
    """Driver-side generation for small test tables."""
    return rows_to_table([make_image_row(i, seed, **kw) for i in range(n)])


class GenImages:
    """Actor-pool batch generator: ray.data.range(n) ids → image rows."""

    def __init__(self, seed: int = 42, min_dim: int = 8, max_dim: int = 64):
        self.seed, self.min_dim, self.max_dim = seed, min_dim, max_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        return rows_to_table(
            [make_image_row(i, self.seed, self.min_dim, self.max_dim) for i in ids]
        )


def write_images_dataset(
    out_dir: str,
    n: int,
    seed: int = 42,
    num_files: int = 32,
    min_dim: int = 8,
    max_dim: int = 64,
    concurrency=(1, 8),
) -> str:
    """Generate the bench/e2e image table in parallel as ``num_files`` parquet
    fragments (Lance-fragment-shaped layout; resumable consumers can shard by
    file)."""
    import ray.data as rd

    if os.path.isdir(out_dir) and any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        return out_dir  # already generated (deterministic → safe to reuse)
    ds = rd.range(n, override_num_blocks=num_files)
    ds = ds.map_batches(
        GenImages,
        fn_constructor_args=(seed, min_dim, max_dim),
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )
    ds.write_parquet(out_dir)
    return out_dir


# ------------------------------------------------------- violation injection


def apply_violations(table: pa.Table, spec: Optional[dict[str, int]] = None) -> tuple[pa.Table, dict]:
    """Mutate a clean images table to inject exactly-counted violations.

    spec keys (each an int count, applied to DISJOINT row ranges so expected
    per-check counts are exact):
      dup_id, null_id, bad_id_format, null_caption, bad_caption,
      wrong_dims, corrupt_bytes, bad_fmt, wrong_phash
    """
    spec = spec or {}
    cols = {n: table[n].to_pylist() for n in table.column_names}
    pos = 1  # row 0 stays clean (dup targets copy it)
    expected: dict[str, int] = {}

    def take(k: str) -> range:
        nonlocal pos
        c = spec.get(k, 0)
        r = range(pos, pos + c)
        pos += c
        expected[k] = c
        return r

    for i in take("dup_id"):
        cols["image_id"][i] = cols["image_id"][0]
    for i in take("null_id"):
        cols["image_id"][i] = None
    for i in take("bad_id_format"):
        cols["image_id"][i] = f"IMG_{i}"
    for i in take("null_caption"):
        cols["caption"][i] = None
    for i in take("bad_caption"):
        cols["caption"][i] = "lowercase start no dot"
    for i in take("wrong_dims"):
        cols["w"][i] = cols["w"][i] + 1
    for i in take("corrupt_bytes"):
        cols["bytes"][i] = cols["bytes"][i][: len(cols["bytes"][i]) // 2]
    for i in take("bad_fmt"):
        cols["fmt"][i] = "gif"
    for i in take("wrong_phash"):
        cols["phash"][i] = cols["phash"][i] + 1
    if pos > table.num_rows:
        raise ValueError("table too small for requested violations")
    out = pa.table({n: pa.array(cols[n], type=table.schema.field(n).type)
                    for n in table.column_names})
    return out, expected


IMAGES_CONTRACT_YAML = """
dataContractSpecification: 1.1.0
id: images
info: {title: Image+caption table, version: 1.0.0}
models:
  images:
    description: North-star Lance-shaped image+caption table (BASELINE.json input_hint)
    primaryKey: [image_id]
    config:
      image: {bytes: bytes, width: w, height: h, fmt: fmt, phash: phash, id: image_id, minPsnr: 40}
    fields:
      image_id: {type: string, required: true, unique: true, pattern: "^img-[0-9]{12}$"}
      bytes: {type: bytes, required: true, unique: true}
      w: {type: int, minimum: 1, maximum: 65536}
      h: {type: int, minimum: 1, maximum: 65536}
      fmt: {type: string, enum: [png, bmp, ppm]}
      caption: {type: string, required: true, pattern: "^[A-Z][a-z ]+\\\\.$", maxLength: 512}
      phash: {type: long}
"""


def make_image_refs_table(images: pa.Table, n_refs: int = 100, dangling: int = 5,
                          seed: int = 7) -> pa.Table:
    """F2 child table: ref_id, image_id (FK, with injected dangling keys), tag."""
    rng = np.random.default_rng(seed)
    ids = images["image_id"].to_pylist()
    picked = [ids[int(i)] for i in rng.integers(0, len(ids), n_refs - dangling)]
    picked += [f"img-9999{i:08d}" for i in range(dangling)]
    tags = [["train", "eval", "holdout"][int(i)] for i in rng.integers(0, 3, n_refs)]
    return pa.table({
        "ref_id": pa.array([f"ref-{i:06d}" for i in range(n_refs)]),
        "image_id": pa.array(picked),
        "tag": pa.array(tags),
    })


def make_jpeg_master_rows(n: int = 240, seed: int = 42) -> pa.Table:
    """Deterministic lossy-conformance corpus: each row is a smooth synthetic
    image stored as baseline JPEG ``bytes`` (vendored codec,
    ``functions/jpeg.py``) alongside its lossless PNG ``master`` — the pair
    the north-star "decoded-pixel PSNR≥40dB for lossy" invariant compares.

    Injected violations (disjoint tail ranges, exact counts for the check):
    - rows n-12..n-9: encoded at quality 8 → PSNR vs master < 40 (psnr_below)
    - rows n-8..n-5:  truncated JPEG bytes (decode_error)
    - rows n-4..n-1:  declared w off by one (dim_mismatch)
    ``phash`` is the hash of the row's DECODED bytes (what the column
    describes), so clean rows phash-match exactly.
    """
    from raycontract.functions.codecs import encode_image, phash64
    from raycontract.functions.jpeg import decode_jpeg, encode_jpeg

    ids, blobs, masters, ws, hs, fmts, phs = [], [], [], [], [], [], []
    for i in range(n):
        rng = np.random.default_rng(np.random.PCG64(seed * 7_000_003 + i))
        h = int(rng.integers(24, 72))
        w = int(rng.integers(24, 72))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        f1, f2 = float(rng.uniform(10, 40)), float(rng.uniform(10, 40))
        img = np.stack([
            128 + 90 * np.sin(xx / f1) * np.cos(yy / f2),
            40 + xx * (180.0 / max(w - 1, 1)),
            220 - yy * (170.0 / max(h - 1, 1)),
        ], axis=-1)
        img = np.clip(img, 0, 255).astype(np.uint8)
        quality = 8 if n - 12 <= i < n - 8 else 90
        # 4:4:4 — chroma subsampling on saturated gradients sits at the
        # 40 dB boundary; the clean rows must clear it with margin
        data = encode_jpeg(img, quality=quality, subsample=False)
        if n - 8 <= i < n - 4:
            data = data[: len(data) // 2]  # truncated → decode_error
            ph = 0
        else:
            ph = phash64(decode_jpeg(data))
        ids.append(f"jpg-{i:012d}")
        blobs.append(data)
        masters.append(encode_image(img, "png"))
        ws.append(w + 1 if i >= n - 4 else w)  # dim_mismatch tail
        hs.append(h)
        fmts.append("jpeg")
        phs.append(ph)
    return pa.table({
        "image_id": pa.array(ids), "bytes": pa.array(blobs, pa.binary()),
        "master": pa.array(masters, pa.binary()),
        "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts), "phash": pa.array(phs, pa.int64()),
    })
