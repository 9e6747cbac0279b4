"""Multimodal (image/audio/video) batch stages.

Images are real (vendored numpy codecs, raycontract.functions.codecs).
Audio is REAL for WAV/PCM (stdlib RIFF decode — duration/rms/peak/zcr/
silence features); compressed audio codecs raise ``NotImplementedError``
(honest: mp3/ogg decoders aren't in this container). Video is REAL for
uncompressed YUV4MPEG2 streams (`functions/video.py`, pure numpy — frame
sampling, per-frame luma stats + phash); compressed video codecs raise
``NotImplementedError`` with the same Ray-side plumbing (schemas, actor
signature, small-batch sizing for wide binary rows), so a proper decoder
drops in without touching the pipeline.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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
        means, thumbs, ok = [], [], []
        smalls32, ok_pos = [], []
        for i, (b, f) in enumerate(zip(blobs, fmts)):
            try:
                img = self.codecs.decode_image(b, f)
                m = img.reshape(-1, 3).mean(axis=0)
                small = self.codecs._area_resize_gray(img, self.thumb)
                thumbs.append(small.astype(np.uint8).tobytes())
                means.append([float(x) for x in m])
                smalls32.append(self.codecs._area_resize_gray(img, 32))
                ok_pos.append(i)
                ok.append(True)
            except Exception:
                thumbs.append(None)
                means.append(None)
                ok.append(False)
        # one batched DCT phash across all decodable images (NOT per row)
        phashes: list = [None] * len(blobs)
        if smalls32:
            for pos, h in zip(ok_pos,
                              self.codecs.phash64_batch(np.stack(smalls32))):
                phashes[pos] = int(h)
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


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM decode (stdlib ``wave`` — a REAL codec, no external
    libs): returns (mono float64 samples in [-1, 1], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(blob)) as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        x = x - 128.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x / float(2 ** (8 * width - 1)), sr


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Inverse of :func:`decode_wav` (16-bit PCM) — used by fixtures/tests."""
    import io
    import wave

    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (x * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class AudioFeatures:
    """Actor-pool stage: audio bytes → features.

    REAL for WAV/PCM (codec 'wav'/'pcm', stdlib decode — no external libs
    needed); compressed codecs (mp3/ogg/flac) raise ``NotImplementedError``
    unless ``deterministic_fake=True`` (honest stub: those decoders aren't
    available offline). Output: (id, duration_s, rms, peak, zcr,
    silence_ratio, sample_rate, decoded_ok).
    """

    def __init__(self, id_col: str = "audio_id", bytes_col: str = "bytes",
                 codec_col: Optional[str] = "codec",
                 deterministic_fake: bool = False, silence_db: float = -40.0):
        self.id_col, self.bytes_col, self.codec_col = id_col, bytes_col, codec_col
        self.fake = deterministic_fake
        self.silence_amp = 10 ** (silence_db / 20.0)

    def _features(self, x: np.ndarray, sr: int) -> dict:
        n = x.size
        if n == 0:
            return {"duration_s": 0.0, "rms": 0.0, "peak": 0.0, "zcr": 0.0,
                    "silence_ratio": 1.0, "sample_rate": sr}
        rms = float(np.sqrt(np.mean(x * x)))
        zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
        return {
            "duration_s": n / sr,
            "rms": rms,
            "peak": float(np.max(np.abs(x))),
            "zcr": zc,  # zero crossings per sample
            "silence_ratio": float(np.mean(np.abs(x) < self.silence_amp)),
            "sample_rate": sr,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        codecs = (batch[self.codec_col].to_pylist()
                  if self.codec_col and self.codec_col in batch.column_names
                  else ["wav"] * len(blobs))
        rows = []
        ok = []
        for b, codec in zip(blobs, codecs):
            c = (codec or "wav").lower()
            try:
                if b is None:
                    raise ValueError("null audio payload")
                if c in ("wav", "wave", "pcm", "pcm16"):
                    x, sr = decode_wav(b)
                elif self.fake:
                    rng = np.random.default_rng(len(b))
                    x, sr = rng.standard_normal(1600) * 0.1, 16000
                else:
                    raise NotImplementedError(
                        f"audio codec {c!r} needs an external decoder not "
                        "available offline (WAV/PCM is fully supported)")
                rows.append(self._features(x, sr))
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                rows.append({"duration_s": 0.0, "rms": 0.0, "peak": 0.0,
                             "zcr": 0.0, "silence_ratio": 1.0, "sample_rate": 0})
                ok.append(False)
        return pa.table({
            self.id_col: batch[self.id_col],
            "duration_s": pa.array([r["duration_s"] for r in rows], type=pa.float64()),
            "rms": pa.array([r["rms"] for r in rows], type=pa.float64()),
            "peak": pa.array([r["peak"] for r in rows], type=pa.float64()),
            "zcr": pa.array([r["zcr"] for r in rows], type=pa.float64()),
            "silence_ratio": pa.array([r["silence_ratio"] for r in rows], type=pa.float64()),
            "sample_rate": pa.array([r["sample_rate"] for r in rows], type=pa.int32()),
            "decoded_ok": pa.array(ok, type=pa.bool_()),
        })


def audio_features(ds, id_col="audio_id", bytes_col="bytes", codec_col="codec",
                   batch_size: int = 128, concurrency=(1, 8)):
    """Actor-pool audio feature pipeline (small batches: wide binary rows)."""
    cols = [id_col, bytes_col] + ([codec_col] if codec_col else [])
    return ds.select_columns(cols).map_batches(
        AudioFeatures, fn_constructor_args=(id_col, bytes_col, codec_col),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


class VideoFrameSampler:
    """Actor-pool stage: sample every ``every_n``-th frame of each video.

    REAL for uncompressed YUV4MPEG2 streams (codec ``'y4m'``, or sniffed by
    magic — :mod:`raycontract.functions.video`, pure numpy); compressed
    codecs (h264/vp9/av1/...) raise ``NotImplementedError`` unless
    ``deterministic_fake=True`` (honest stub: no codec libs offline).

    Output per sampled frame: (id, frame_idx:int32, w:int32, h:int32,
    mean_luma:float64, frame_phash:int64, frame_bytes:binary = raw luma
    plane, decoded_ok:bool). Use small ``batch_size`` — video rows are the
    widest payloads in the engine.
    """

    def __init__(self, id_col: str = "video_id", bytes_col: str = "bytes",
                 every_n: int = 30, deterministic_fake: bool = False,
                 codec_col: Optional[str] = "codec"):
        from raycontract.functions import codecs, video

        self.id_col, self.bytes_col, self.every_n = id_col, bytes_col, every_n
        self.codec_col = codec_col
        self.fake = deterministic_fake
        self.video = video
        self.codecs = codecs

    def _emit(self, out: dict, vid, idx: int, w: int, h: int,
              luma: Optional[np.ndarray], blob: bytes, ok: bool) -> None:
        out["id"].append(vid)
        out["frame_idx"].append(idx)
        out["w"].append(w)
        out["h"].append(h)
        if luma is not None:
            out["mean_luma"].append(float(luma.mean()))
            small = self.codecs._area_resize_gray(luma[..., None].repeat(3, -1), 32)
            out["frame_phash"].append(int(self.codecs.phash64_batch(small[None])[0]))
            out["frame_bytes"].append(luma.tobytes())
        else:
            out["mean_luma"].append(0.0)
            out["frame_phash"].append(0)
            out["frame_bytes"].append(blob)
        out["decoded_ok"].append(ok)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        codecs_ = (batch[self.codec_col].to_pylist()
                   if self.codec_col and self.codec_col in batch.column_names
                   else [None] * len(blobs))
        out: dict = {k: [] for k in ("id", "frame_idx", "w", "h", "mean_luma",
                                     "frame_phash", "frame_bytes", "decoded_ok")}
        for vid, b, codec in zip(batch[self.id_col].to_pylist(), blobs, codecs_):
            c = (codec or "").lower()
            if not c and b is not None and b.startswith(b"YUV4MPEG2"):
                c = "y4m"
            if c in ("y4m", "yuv4mpeg2", "raw"):
                try:
                    frames, _fps, _cs = self.video.decode_y4m(b)
                except Exception:
                    self._emit(out, vid, 0, 0, 0, None, b or b"", False)
                    continue
                lumas = frames if frames.ndim == 3 else frames[..., 0]
                for f in range(0, lumas.shape[0], self.every_n):
                    self._emit(out, vid, f, lumas.shape[2], lumas.shape[1],
                               lumas[f], b"", True)
            elif self.fake:
                n_frames = max(len(b or b"") // 1024, 1)
                for f in range(0, n_frames, self.every_n):
                    self._emit(out, vid, f, 0, 0, None,
                               (b or b"")[f * 16: f * 16 + 64], False)
            else:
                raise NotImplementedError(
                    f"video codec {c or 'unknown'!r} needs an external decoder "
                    "not available offline (uncompressed YUV4MPEG2 is fully "
                    "supported; or construct with deterministic_fake=True)")
        return pa.table({
            self.id_col: pa.array(out["id"]),
            "frame_idx": pa.array(out["frame_idx"], type=pa.int32()),
            "w": pa.array(out["w"], type=pa.int32()),
            "h": pa.array(out["h"], type=pa.int32()),
            "mean_luma": pa.array(out["mean_luma"], type=pa.float64()),
            "frame_phash": pa.array(out["frame_phash"], type=pa.int64()),
            "frame_bytes": pa.array(out["frame_bytes"], type=pa.binary()),
            "decoded_ok": pa.array(out["decoded_ok"], type=pa.bool_()),
        })


def video_frame_features(ds, id_col="video_id", bytes_col="bytes",
                         codec_col="codec", every_n: int = 30,
                         batch_size: int = 16, concurrency=(1, 8)):
    """Actor-pool video frame-sampling pipeline.

    ``batch_size`` defaults tiny: a 10 s 640×360 y4m clip is ~100 MB, so a
    16-row batch already carries ~1.6 GB — at 100 TB the knob that matters
    is rows-per-batch × concurrency fitting the worker heap.
    """
    cols = [id_col, bytes_col] + ([codec_col] if codec_col else [])
    return ds.select_columns(cols).map_batches(
        VideoFrameSampler,
        fn_constructor_args=(id_col, bytes_col, every_n, False, codec_col),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


class PixelHash:
    """Actor-pool stage: decode → canonical hash of the RAW PIXEL BUFFER
    (dims header + RGB bytes). Two images that decode to identical pixels
    get the same hash even when their container bytes differ (png vs bmp vs
    ppm re-encodings, compression-level changes) — the duplicates byte-level
    exact dedup can NEVER see. Decode is inherently per-image Python (the
    vendored codecs are numpy-per-image); the md5 is noise next to it.

    Emits ``(id, pixel_hash int64, decoded_ok)`` — the hash is the first 8
    bytes of the md5, plenty below birthday risk at 10^12 rows for
    GROUPING (verify candidate groups with a full-hash or pixel compare
    before destructive drops at that scale).
    """

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        import hashlib

        from raycontract.functions import codecs

        self.codecs = codecs
        self.md5 = hashlib.md5
        self.bytes_col, self.fmt_col, self.id_col = bytes_col, fmt_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        hashes: list = []
        ok: list = []
        for b, f in zip(blobs, fmts):
            try:
                img = self.codecs.decode_image(b, f)
                d = self.md5(np.asarray(img.shape, dtype=np.int64).tobytes()
                             + np.ascontiguousarray(img).tobytes()).digest()
                hashes.append(int.from_bytes(d[:8], "big", signed=True))
                ok.append(True)
            except Exception:
                hashes.append(None)
                ok.append(False)
        return pa.table({self.id_col: batch[self.id_col],
                         "pixel_hash": pa.array(hashes, pa.int64()),
                         "decoded_ok": pa.array(ok, pa.bool_())})


def pixel_dedup_stats(ds, bytes_col: str = "bytes", fmt_col: str = "fmt",
                      id_col: str = "image_id", batch_size: int = 256,
                      concurrency=(1, 8)):
    """Pixel-exact image dedup summary: decode on the actor pool, hash the
    canonical pixel buffer, keep-min-id per hash. Returns
    ``(n_rows, n_decoded, n_distinct_pixels, n_dup_rows)`` — one row.

    Scale shape: after the decode stage only slim ``(hash, min_id, count)``
    partials move (one row per distinct hash per block — the adaptive
    ``smallagg`` fold; distributed groupby beyond 2M partials). Undecodable
    rows are excluded from the dedup universe and counted separately.
    """
    from raycontract.pipelines.smallagg import groupby_agg

    hashed = ds.select_columns([id_col, bytes_col, fmt_col]).map_batches(
        PixelHash, fn_constructor_args=(bytes_col, fmt_col, id_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch["pixel_hash"]))
        n_bad = batch.num_rows - t.num_rows
        h = np.asarray(t["pixel_hash"])
        uniq, inv = (np.unique(h, return_inverse=True) if len(h)
                     else (np.empty(0, np.int64), np.empty(0, np.int64)))
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # ride the undecodable count along as a sentinel-hash row so ONE
        # fold carries both (no second pass over the decode output)
        if n_bad:
            uniq = np.r_[uniq, np.int64(-(2 ** 63))]
            cnt = np.r_[cnt, np.int64(n_bad)]
        return pa.table({"h": pa.array(uniq), "n": pa.array(cnt)})

    import ray as _ray

    tabs = [pa.table(t) for t in _ray.get(
        groupby_agg(hashed.map_batches(partial, batch_format="pyarrow"),
                    ["h"], {"n": "sum"}).to_arrow_refs()) if t.num_rows]
    if not tabs:
        z = pa.array([0], pa.int64())
        return pa.table({"n_rows": z, "n_decoded": z,
                         "n_distinct_pixels": z, "n_dup_rows": z})
    folded = pa.concat_tables(tabs)
    h = np.asarray(folded["h"], dtype=np.int64)
    n = np.asarray(folded["n"], dtype=np.int64)
    bad_mask = h == np.int64(-(2 ** 63))
    n_bad = int(n[bad_mask].sum())
    n = n[~bad_mask]
    n_decoded = int(n.sum())
    n_distinct = int(len(n))
    return pa.table({
        "n_rows": pa.array([n_decoded + n_bad], pa.int64()),
        "n_decoded": pa.array([n_decoded], pa.int64()),
        "n_distinct_pixels": pa.array([n_distinct], pa.int64()),
        "n_dup_rows": pa.array([n_decoded - n_distinct], pa.int64()),
    })
