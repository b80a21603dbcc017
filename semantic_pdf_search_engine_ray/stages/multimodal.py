"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The reference's analog surface is the PDF-bytes path: raw uploaded bytes
held as an opaque blob (`/root/reference/src/bin/app/types.rs:12`
``id -> Vec<u8>``), decoded lazily per request by a process-wide native
library handle (`bin/app/pdf.rs:8-18` ``PDFIUM: OnceLock`` — the
stateful-decoder-per-process pattern this module reproduces as an actor
pool).

The image/audio decode libraries are NOT in this container, so the
decode kernel is a clearly-marked deterministic fake behind an
import-try; everything Ray-side — schema contract, small batch sizing
for large payloads, actor ``__init__`` holding decoder state, output
layout — is real and tested. Swapping in PIL/ffmpeg touches only
``_decode_real``.
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
        try:  # pragma: no cover - PIL not in this container
            import PIL.Image  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def _decode_real(self, payload: bytes) -> tuple[int, int]:
        raise NotImplementedError(
            "real image decode requires PIL; not available in this "
            "container — fake decode path is active"
        )

    def _decode_fake(self, payload: bytes) -> tuple[int, int]:
        n = len(payload)
        return n % 640 + 16, (n // 7) % 480 + 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_bytes, digests, ws, hs = [], [], [], []
        for p in payloads:
            n_bytes.append(len(p))
            digests.append(hashlib.sha256(p).hexdigest())
            w, h = self._decode_fake(p)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "payload_sha256": pa.array(digests, type=pa.string()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "decoder": pa.array(
                    ["fake"] * len(ids), type=pa.string()
                ),
            }
        )
