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


def media_dedup(docs, batch_size: int = 64, concurrency: int = 2):
    """documents → (fp, doc_id=keeper, n_dups): exact dedup over the
    media payload fingerprint — byte-identical assets (re-hosted
    images, mirrored files) collapse to one keeper per md5, the
    standard first pass of any multimodal ingestion pipeline.

    The fingerprints come through the ACTOR-POOL feature stage (so this
    exercises the binary-payload plumbing end to end), then the same
    map-side-combine → int64-digest-routed grouped Min/Sum plan as
    ``dedup.exact_dedup`` — the exchange moves one row per distinct
    asset per block, never payload bytes."""
    from ..shuffle import hash_grouped, sized_partitions

    parts = sized_partitions(docs.count(), None)
    feats = media_features(
        docs, batch_size=batch_size, concurrency=concurrency
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "fp": pa.array([], type=pa.string()),
                    "fp_key": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_dups": pa.array([], type=pa.int64()),
                }
            )
        out = t.select(["fp", "doc_id"]).group_by(["fp"]).aggregate(
            [("doc_id", "min"), ([], "count_all")]
        )
        fps = out.column("fp").to_pylist()
        return pa.table(
            {
                "fp": out.column("fp"),
                "fp_key": pa.array(
                    [int(f[:16], 16) - (1 << 63) for f in fps],
                    type=pa.int64(),
                ),
                "doc_id": out.column("doc_id_min"),
                "n_dups": out.column("count_all").cast(pa.int64()),
            }
        )

    return hash_grouped(
        feats.map_batches(partial, batch_format="pyarrow"),
        ["fp"],
        [("doc_id", "min"), ("n_dups", "sum")],
        rename={"doc_id_min": "doc_id", "n_dups_sum": "n_dups"},
        hash_cols=["fp_key"],
        num_partitions=parts,
    )
