"""Multimodal binary-column plumbing: decode / feature-extract actor stages.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages — the DCNN
sliding-window classifier pattern (``seagrass_lib.py:696-761``: model
loaded once, 256-px blocks, ``batch_size=256``) grafted onto web payloads.

The decode libraries (PIL/ffmpeg/etc.) are NOT in this container, so the
decode kernel is STUBBED: ``DecodeStage`` does real Ray-side plumbing
(schema, batching, actor state, output layout) with a deterministic fake
decoder; swap ``_decode_payload`` for a real one in production. Payload
sniffing (magic bytes) and byte-level features are real.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<html": "html",
    b"%PDF": "pdf",
}


def sniff_type(payload: bytes) -> str:
    if not payload:
        return "empty"
    for magic, name in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


def _decode_payload(payload: bytes, target_size: tuple[int, int]) -> np.ndarray:
    """STUB decoder: deterministic fake 'image' derived from payload bytes.

    Raises ``NotImplementedError`` for real media types to make the stub
    boundary explicit; html/unknown payloads produce a deterministic
    byte-histogram 'thumbnail' so the pipeline plumbing is exercised
    end-to-end with real shapes.
    """
    kind = sniff_type(payload)
    if kind in ("png", "jpeg", "gif", "riff", "pdf"):
        raise NotImplementedError(
            f"real {kind} decode requires an image library not present in "
            "this environment — production swaps _decode_payload"
        )
    h, w = target_size
    b = np.frombuffer(payload[: h * w] or b"\x00", dtype=np.uint8)
    out = np.zeros(h * w, dtype=np.uint8)
    out[: len(b)] = b[: h * w]
    return out.reshape(h, w)


class DecodeStage:
    """Actor-pool stage: binary payload -> fixed-shape 'thumbnail' tensor +
    metadata columns. State (decoder config) built once per actor.

    Output schema: input columns + ``media_type:string``,
    ``payload_bytes:int64``, ``thumb:fixed_size_list<uint8>[h*w]``.
    Use small ``batch_size`` (payloads are wide rows) — the caller sizes
    batch x concurrency to worker heap (SURVEY.md §4 memory row).
    """

    def __init__(self, payload_col: str = "html", target_size: tuple[int, int] = (8, 8)):
        self.payload_col = payload_col
        self.target_size = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        kinds = [sniff_type(p or b"") for p in payloads]
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        h, w = self.target_size
        thumbs = np.zeros((len(payloads), h * w), dtype=np.uint8)
        for i, p in enumerate(payloads):
            try:
                thumbs[i] = _decode_payload(p or b"", self.target_size).ravel()
            except NotImplementedError:
                pass  # real media: stub leaves zeros; production decodes
        return (
            batch.append_column("media_type", pa.array(kinds, pa.string()))
            .append_column("payload_bytes", pa.array(sizes, pa.int64()))
            .append_column(
                "thumb",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(thumbs.ravel(), pa.uint8()), h * w
                ),
            )
        )


def decode_media(
    ds: ray.data.Dataset,
    payload_col: str = "html",
    target_size: tuple[int, int] = (8, 8),
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 512,
) -> ray.data.Dataset:
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"payload_col": payload_col, "target_size": target_size},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.5,
    )
