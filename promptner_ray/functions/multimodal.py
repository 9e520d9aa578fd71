"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with a
``media_type`` string; decode / resize / frame-sample run as actor-pool
``map_batches`` stages.  The actual codec libraries (PIL/ffmpeg/librosa)
are NOT in this container, so the decode step is STUBBED: ``MediaFeatures``
tries the real import in ``__init__`` (once per actor) and, absent it,
falls back to a clearly-marked deterministic fake decoder.  Everything
Ray-side — schema, batch flow, actor signature, output layout — is real
and tested; only the pixel/sample math is fake.

``attach_payload_batch`` synthesizes payloads from the documents table
(payload = utf-8 bytes of ``text``) so byte-level plumbing (octet lengths,
content hashes) has a SQL oracle.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, media_type, payload: binary)."""
    payloads = [
        t.encode("utf-8") for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "media_type": pa.array(
                ["application/x-synth"] * len(batch), type=pa.string()
            ),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: (width, height) from the
    content hash.  Replaced wholesale by the real codec when available."""
    h = hashlib.md5(payload).digest()
    return (
        int.from_bytes(h[0:2], "big") % 1920 + 1,
        int.from_bytes(h[2:4], "big") % 1080 + 1,
    )


class MediaFeatures:
    """Actor-pool stage: binary payload → feature row.

    Real-decoder wiring happens ONCE per actor in ``__init__``; per-batch
    work is ``__call__``.  ``resize``/``frame_sample`` document the
    intended real operators and raise until a codec library is present.
    """

    def __init__(self) -> None:
        try:  # pragma: no cover - PIL not present in this container
            import PIL.Image  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False

    def decode(self, payload: bytes) -> tuple[int, int]:
        if self._real:  # pragma: no cover
            raise NotImplementedError(
                "real image decode: PIL present but codec path intentionally "
                "unimplemented in-sandbox; swap _fake_decode for "
                "PIL.Image.open(io.BytesIO(payload)).size"
            )
        return _fake_decode(payload)

    def resize(self, payload: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError(
            "resize requires an image codec (not in this container); the "
            "stage contract is payload→payload at (w,h)"
        )

    def frame_sample(self, payload: bytes, every_n: int) -> list[bytes]:
        raise NotImplementedError(
            "frame sampling requires a video codec (not in this container)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_bytes = [len(p) for p in payloads]
        fps = [hashlib.md5(p).hexdigest() for p in payloads]
        dims = [self.decode(p) for p in payloads]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pa.array(n_bytes, type=pa.int64()),
                "fp": pa.array(fps, type=pa.string()),
                "width": pa.array([d[0] for d in dims], type=pa.int32()),
                "height": pa.array([d[1] for d in dims], type=pa.int32()),
            }
        )


def media_features(docs, batch_size: int = 64, concurrency: int = 2):
    """documents → media feature table via the actor-pool decode stage.

    Small ``batch_size`` by design: batch × payload size must fit the
    worker heap once payloads are real images (SURVEY.md §7.3 wide rows).
    """
    payloads = docs.map_batches(attach_payload_batch, batch_format="pyarrow")
    return payloads.map_batches(
        MediaFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
