"""Multimodal (image/audio/video) plumbing over opaque binary columns.

The container ships no codec libraries, so the *decode kernel* is a
clearly marked stub — but the Ray-side plumbing is real and tested:
binary payload column + typed metadata, actor-pool ``map_batches``
with small batches (large payloads!), deterministic fake feature
extraction so oracles can verify the dataflow end to end.

Swap ``DecoderStub`` for a real codec (PIL / ffmpeg / torchaudio) by
implementing ``_decode_real`` — signature and batch layout stay put.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Payloads this large would dominate worker heaps; keep batches small.
RECOMMENDED_BATCH_SIZE = 64


def to_payload(batch: pa.Table, *, source_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Wrap a column as an opaque binary payload with typed metadata —
    the schema shape real image/audio ingestion would use."""
    payload = batch.column(source_col).cast(pa.binary())
    return pa.table(
        {
            id_col: batch.column(id_col),
            "payload": payload,
            "media_type": pa.array(["application/octet-stream"] * batch.num_rows),
        }
    )


class FrameSampler:
    """Actor-pool frame-sampling stage: treat the opaque payload as a
    sequence of fixed-size frames and keep every ``every``-th one — the
    video-pipeline pattern (decode -> sample frames -> featurize) with
    a deterministic byte-slicing fake standing in for the codec.  Emits
    per-doc frame counts and the first sampled frame's content hash so
    an oracle can verify the sampling arithmetic and byte slicing
    end to end."""

    def __init__(self, every: int = 4, frame_bytes: int = 256):
        self.every = every
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        fb = self.frame_bytes
        payloads = batch.column("payload").to_pylist()
        n_frames = []
        n_sampled = []
        first_md5 = []
        for p in payloads:
            nf = len(p) // fb
            n_frames.append(nf)
            n_sampled.append(0 if nf == 0 else (nf - 1) // self.every + 1)
            first_md5.append(
                hashlib.md5(bytes(p[:fb]).hex().encode("ascii")).hexdigest()
                if nf > 0
                else None
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_frames": pa.array(n_frames, pa.int64()),
                "n_sampled": pa.array(n_sampled, pa.int64()),
                "first_frame_md5": pa.array(first_md5, pa.string()),
            }
        )


class DecoderStub:
    """Actor-pool decode stage.  ``__init__`` is where a real codec
    would be loaded once per actor; ``__call__`` decodes per batch.

    mode="fake" (default): deterministic metadata extraction so the
    pipeline is testable without codecs.  mode="real": raises with a
    clear message — the sandbox has no image/audio libraries.
    """

    def __init__(self, mode: str = "fake", frame_bytes: int = 256):
        self.mode = mode
        self.frame_bytes = frame_bytes
        if mode == "real":
            self._codec = self._load_codec()

    def _load_codec(self):
        try:
            import PIL.Image  # noqa: F401 — not shipped in this container

            return PIL.Image
        except ImportError as e:
            raise NotImplementedError(
                "real decode needs an image codec (e.g. pillow); this "
                "container ships none — use mode='fake' for the plumbing"
            ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("real decode path is stubbed in this environment")
        n_bytes = pc.cast(pc.binary_length(batch.column("payload")), pa.int64())
        n_frames = pc.cast(
            pc.floor(pc.divide(pc.cast(n_bytes, pa.float64()), float(self.frame_bytes))),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": n_bytes,
                "n_frames": n_frames,
            }
        )
