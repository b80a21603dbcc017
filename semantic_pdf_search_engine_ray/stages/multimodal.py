"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The reference's analog surface is the PDF-bytes path: raw uploaded bytes
held as an opaque blob (`/root/reference/src/bin/app/types.rs:12`
``id -> Vec<u8>``), decoded lazily per request by a process-wide native
library handle (`bin/app/pdf.rs:8-18` ``PDFIUM: OnceLock`` — the
stateful-decoder-per-process pattern this module reproduces as an actor
pool).

Decode paths, auto-selected per payload:
- PNG payloads (signature-detected) decode REALLY via the pure-stdlib
  codec in functions/png.py (chunk parse -> zlib inflate -> scanline
  unfilter) — no imaging library required.
- PIL, when present, handles the general formats (import-try).
- Anything else falls back to the clearly-marked deterministic fake so
  the Ray-side plumbing (schema contract, small batch sizing for large
  payloads, actor ``__init__`` holding decoder state, output layout)
  stays testable in any environment.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

DECODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("payload_sha256", pa.string()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("decoder", pa.string()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def attach_png_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, ...) -> (doc_id, payload): a REAL deterministic PNG per
    doc (dims and fill pixel are pinned functions of doc_id, mirrored by
    the SQL oracle), exercising the actual encode path."""
    from semantic_pdf_search_engine_ray.functions.png import encode_png

    ids = batch.column("doc_id").to_pylist()
    payloads = []
    for d in ids:
        w = d % 21 + 4
        h = d % 13 + 4
        fill = (d * 7) % 256
        payloads.append(encode_png(w, h, bytes([fill]) * (w * h * 3)))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class ImageStatsStage:
    """Actor-pool stage: (doc_id, payload) -> (doc_id, width, height,
    channels, mean_pixel). Fully REAL: every payload is chunk-parsed,
    zlib-inflated and scanline-unfiltered by functions/png.py; the mean
    covers every decoded sample, so a decode bug cannot pass the
    oracle."""

    def __init__(self):
        from semantic_pdf_search_engine_ray.functions.png import decode_png

        self._decode = decode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        ws, hs, chs, means = [], [], [], []
        for p in batch.column("payload").to_pylist():
            w, h, ch, pix = self._decode(p)
            ws.append(w)
            hs.append(h)
            chs.append(ch)
            means.append(int(sum(pix) // len(pix)) if pix else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "channels": pa.array(chs, type=pa.int64()),
                "mean_pixel": pa.array(means, type=pa.int64()),
            }
        )


def attach_wav_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, ...) -> (doc_id, payload): a REAL deterministic PCM WAV
    per doc (length and every sample are pinned functions of doc_id,
    mirrored by the SQL oracle), exercising the actual RIFF encode
    path. Sample rule: n = 160 + doc_id % 40 samples at 8 kHz,
    s[i] = (doc_id*31 + i*17) % 2048 - 1024."""
    from semantic_pdf_search_engine_ray.functions.wav import encode_wav

    ids = batch.column("doc_id").to_pylist()
    payloads = []
    for d in ids:
        n = 160 + d % 40
        samples = [(d * 31 + i * 17) % 2048 - 1024 for i in range(n)]
        payloads.append(encode_wav(8000, samples))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class AudioFeaturesStage:
    """Actor-pool stage: (doc_id, payload WAV bytes) -> integer-exact
    clip features. Fully REAL: every payload is RIFF-chunk-walked and
    PCM-unpacked by functions/wav.py; features cover every sample, so a
    decode bug cannot pass the oracle. Integer outputs only — a
    distributed run and the SQL oracle agree bit-for-bit."""

    def __init__(self):
        from semantic_pdf_search_engine_ray.functions.wav import (
            audio_features,
            decode_wav,
        )

        self._decode = decode_wav
        self._features = audio_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        cols: dict[str, list] = {
            "sample_rate": [], "n_samples": [], "duration_ms": [],
            "peak": [], "energy": [], "zero_crossings": [],
        }
        for p in batch.column("payload").to_pylist():
            rate, samples = self._decode(p)
            feats = self._features(rate, samples)
            cols["sample_rate"].append(rate)
            for k in ("n_samples", "duration_ms", "peak", "energy",
                      "zero_crossings"):
                cols[k].append(feats[k])
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             **{k: pa.array(v, type=pa.int64()) for k, v in cols.items()}}
        )


def attach_frames_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, ...) -> (doc_id, payload): a deterministic multi-frame
    FRM1 container per doc whose frames are REAL PNGs (dims and fill are
    pinned functions of (doc_id, frame_idx), mirrored by the SQL
    oracle). n_frames = 6 + doc_id % 5."""
    from semantic_pdf_search_engine_ray.functions.frames import pack_frames
    from semantic_pdf_search_engine_ray.functions.png import encode_png

    ids = batch.column("doc_id").to_pylist()
    payloads = []
    for d in ids:
        frames = []
        for j in range(6 + d % 5):
            w = (d + j) % 9 + 2
            h = (d * 3 + j) % 7 + 2
            fill = (d * 11 + j * 29) % 256
            frames.append(encode_png(w, h, bytes([fill]) * (w * h * 3)))
        payloads.append(pack_frames(frames))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class VideoFrameSampleStage:
    """Actor-pool stage: (doc_id, payload frame container) -> one row
    per SAMPLED frame (every ``step``-th, frame 0 always included), each
    sampled frame REALLY decoded by the PNG codec. This is the video
    analog of batched inference preprocessing: never decode all frames,
    only the sampled ones — the container parse reads length prefixes
    and SKIPS unsampled frame bytes.

    Output: (doc_id, frame_idx, n_frames, width, height, mean_pixel),
    one row per sampled frame — a flat_map-shaped batch transform."""

    def __init__(self, step: int = 2):
        from semantic_pdf_search_engine_ray.functions.frames import (
            unpack_frames,
        )
        from semantic_pdf_search_engine_ray.functions.png import decode_png

        self._unpack = unpack_frames
        self._decode = decode_png
        self._step = step

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, idxs, totals, ws, hs, means = [], [], [], [], [], []
        for doc_id, p in zip(batch.column("doc_id").to_pylist(),
                             batch.column("payload").to_pylist()):
            frames = self._unpack(p)
            for j in range(0, len(frames), self._step):
                w, h, _ch, pix = self._decode(frames[j])
                out_ids.append(doc_id)
                idxs.append(j)
                totals.append(len(frames))
                ws.append(w)
                hs.append(h)
                means.append(int(sum(pix) // len(pix)) if pix else 0)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int64()),
                "n_frames": pa.array(totals, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "mean_pixel": pa.array(means, type=pa.int64()),
            }
        )


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, payload binary): stands in for reading
    a real image/audio column; UTF-8 bytes of the text play the blob."""
    payloads = [t.encode("utf-8") for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class ImageDecodeStage:
    """Actor-pool stage: (doc_id, payload) -> DECODED_SCHEMA rows.

    ``__init__`` binds the decoder once per actor (the PDFIUM OnceLock
    pattern). With no imaging library present, dimensions are a
    deterministic pure function of payload size (SQL-checkable); a real
    decoder slots into ``_decode_real``.

    Batch sizing: callers pass a SMALL ``batch_size`` (default config 32)
    — payload batches are large; batch x concurrency must fit the worker
    heap (100 TB rule from the project brief).
    """

    def __init__(self):
        from semantic_pdf_search_engine_ray.functions.png import decode_png

        self._decode_png = decode_png
        try:  # pragma: no cover - PIL not in this container
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def _decode_real(self, payload: bytes) -> tuple[int, int]:
        """Real decode: pure-stdlib PNG codec for PNG payloads; PIL for
        general formats when installed. Raises on undecodable input —
        the caller decides whether to fall back."""
        if payload[:8] == _PNG_SIG:
            w, h, _ch, _pix = self._decode_png(payload)
            return w, h
        if self._pil:  # pragma: no cover - PIL not in this container
            import io

            import PIL.Image

            with PIL.Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height
        raise NotImplementedError(
            "non-PNG payload and PIL is not available in this container"
        )

    def _decode_fake(self, payload: bytes) -> tuple[int, int]:
        n = len(payload)
        return n % 640 + 16, (n // 7) % 480 + 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_bytes, digests, ws, hs, decs = [], [], [], [], []
        for p in payloads:
            n_bytes.append(len(p))
            digests.append(hashlib.sha256(p).hexdigest())
            # PNG: always real. Other formats: try PIL when present, but
            # fall back to the deterministic fake on ANY decode failure —
            # a non-image payload must never crash the stage (and keeps
            # the fake-path oracle valid in PIL-equipped environments).
            if p[:8] == _PNG_SIG:
                try:
                    w, h = self._decode_real(p)
                    decs.append("png")
                except Exception:
                    # corrupt/truncated PNG: degrade, don't kill the task
                    w, h = self._decode_fake(p)
                    decs.append("fake")
            elif self._pil:  # pragma: no cover - PIL absent here
                try:
                    w, h = self._decode_real(p)
                    decs.append("pil")
                except Exception:
                    w, h = self._decode_fake(p)
                    decs.append("fake")
            else:
                w, h = self._decode_fake(p)
                decs.append("fake")
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "payload_sha256": pa.array(digests, type=pa.string()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "decoder": pa.array(decs, type=pa.string()),
            }
        )
