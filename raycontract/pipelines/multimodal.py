"""Multimodal (image/audio/video) batch stages.

Images are real (vendored numpy codecs, raycontract.functions.codecs); audio
and video decode are STUBS behind ``NotImplementedError`` — the codec
libraries aren't in this container — but the Ray-side plumbing (schemas,
actor signature, small-batch sizing for wide binary rows, output layout) is
real and tested, so a proper decoder drops in without touching the pipeline.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


class ImageFeatures:
    """Actor-pool stage: decode → (thumbnail bytes, mean RGB, phash).

    Use ``batch_size`` ≲ 256 — rows are wide (binary payloads); the actor
    holds the codec dispatch + DCT basis once.
    """

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id", thumb: int = 8):
        from raycontract.functions import codecs

        self.codecs = codecs
        self.bytes_col, self.fmt_col, self.id_col, self.thumb = bytes_col, fmt_col, id_col, thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        means, phashes, thumbs, ok = [], [], [], []
        for b, f in zip(blobs, fmts):
            try:
                img = self.codecs.decode_image(b, f)
                m = img.reshape(-1, 3).mean(axis=0)
                small = self.codecs._area_resize_gray(img, self.thumb)
                thumbs.append(small.astype(np.uint8).tobytes())
                means.append([float(x) for x in m])
                phashes.append(self.codecs.phash64(img))
                ok.append(True)
            except Exception:
                thumbs.append(None)
                means.append(None)
                phashes.append(None)
                ok.append(False)
        return pa.table({
            self.id_col: ids,
            "mean_rgb": pa.array(means, type=pa.list_(pa.float64())),
            "phash_calc": pa.array(phashes, type=pa.int64()),
            "thumb_gray": pa.array(thumbs, type=pa.binary()),
            "decoded_ok": pa.array(ok, type=pa.bool_()),
        })


def image_features(ds, bytes_col="bytes", fmt_col="fmt", id_col="image_id",
                   batch_size: int = 256, concurrency=(1, 8)):
    return ds.select_columns([id_col, bytes_col, fmt_col]).map_batches(
        ImageFeatures, fn_constructor_args=(bytes_col, fmt_col, id_col),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


class AudioFeatures:
    """STUB: audio decode/feature-extraction plumbing (no codec lib offline).

    Expected input: (id:string, bytes:binary, codec:string, sample_rate:int32)
    Output: (id, duration_s:float64, rms:float64). ``deterministic_fake=True``
    produces a seeded fake so the pipeline shape is testable end-to-end.
    """

    def __init__(self, id_col: str = "audio_id", bytes_col: str = "bytes",
                 deterministic_fake: bool = False):
        self.id_col, self.bytes_col = id_col, bytes_col
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires an external codec library not available "
                "in this environment; construct with deterministic_fake=True "
                "to exercise the pipeline plumbing"
            )
        blobs = batch[self.bytes_col].to_pylist()
        dur = [len(b) / 32000.0 if b else 0.0 for b in blobs]
        rms = [float(np.frombuffer(b[: len(b) // 2 * 2], dtype=np.int16).astype(np.float64).std())
               if b else 0.0 for b in blobs]
        return pa.table({self.id_col: batch[self.id_col],
                         "duration_s": pa.array(dur, type=pa.float64()),
                         "rms": pa.array(rms, type=pa.float64())})


class VideoFrameSampler:
    """STUB: frame-sampling plumbing for video binary columns (no codec lib).

    Output layout (id, frame_idx:int32, frame_bytes:binary) is the real
    contract; decode raises unless ``deterministic_fake``."""

    def __init__(self, id_col: str = "video_id", bytes_col: str = "bytes",
                 every_n: int = 30, deterministic_fake: bool = False):
        self.id_col, self.bytes_col, self.every_n = id_col, bytes_col, every_n
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decode requires an external codec library not available "
                "in this environment; construct with deterministic_fake=True"
            )
        ids, fidx, frames = [], [], []
        for i, b in zip(batch[self.id_col].to_pylist(), batch[self.bytes_col].to_pylist()):
            n_frames = max(len(b or b"") // 1024, 1)
            for f in range(0, n_frames, self.every_n):
                ids.append(i)
                fidx.append(f)
                frames.append((b or b"")[f * 16 : f * 16 + 64])
        return pa.table({self.id_col: pa.array(ids),
                         "frame_idx": pa.array(fidx, type=pa.int32()),
                         "frame_bytes": pa.array(frames, type=pa.binary())})
