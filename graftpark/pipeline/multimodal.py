"""Multimodal columns: opaque binary payloads + typed metadata.

Design per the training-data-pipeline brief: image/audio/video content
is carried as an opaque ``binary`` column plus typed metadata columns;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` UDFs so the *Spark-side plumbing* — schema,
partitioning, UDF signature, batch shape — is real and tested.

The actual codecs (PIL/libav/librosa) are NOT in this container, so the
decode step is gated behind an import-try and falls back to a
clearly-marked **deterministic fake decoder** (seeded from the payload
bytes) with identical array shapes/dtypes. Swapping in a real codec
changes one function (`_decode_pixels` / `_decode_samples`), nothing in
the dataflow.

All per-row work is vectorized per Arrow batch; no per-row Python UDFs
(BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: canonical multimodal schema (metadata travels beside the payload)
BLOB_SCHEMA = (
    "doc_id long, kind string, data binary, width int, height int, sample_rate int"
)


def attach_blobs(documents: DataFrame, doc_id: str = "doc_id", content: str = "content") -> DataFrame:
    """Deterministic synthetic multimodal table from the documents table.

    The utf-8 bytes of ``content`` become the opaque payload; metadata
    is derived deterministically (so tests and oracles can replay it).
    Stand-in for reading real image/audio bytes from object storage.
    """
    n = F.length(F.col(content))
    return documents.select(
        F.col(doc_id).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col(doc_id), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(content), "utf-8").alias("data"),
        (F.pmod(n, F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(n, F.lit(48)) + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
    )


# ---------------------------------------------------------------- decoders

def _decode_pixels(data: bytes, width: int, height: int):
    """Decode payload → uint8 pixel array (height, width).

    Tries a real codec first; otherwise a DETERMINISTIC FAKE: pixels are
    a byte-tiling of the payload. Same shape/dtype contract as a real
    grayscale decode, so downstream plumbing is exercised faithfully.
    """
    import numpy as np

    try:  # pragma: no cover - codec not present in this container
        from PIL import Image  # noqa: F401
        import io

        img = Image.open(io.BytesIO(data)).convert("L").resize((width, height))
        return np.asarray(img, dtype=np.uint8)
    except Exception:
        buf = np.frombuffer(data, dtype=np.uint8)
        need = width * height
        if len(buf) == 0:
            buf = np.zeros(1, dtype=np.uint8)
        reps = -(-need // len(buf))
        return np.tile(buf, reps)[:need].reshape(height, width)


def _decode_samples(data: bytes, sample_rate: int):
    """Decode payload → int16 mono samples. Deterministic fake: the
    payload bytes reinterpreted as little-endian int16 (real decoder
    would go through libav/librosa here)."""
    import numpy as np

    buf = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    return buf if len(buf) else np.zeros(1, dtype="<i2")


# ---------------------------------------------------------------- operators

def blob_meta(blobs: DataFrame) -> DataFrame:
    """Payload metadata — pure JVM columns, no UDF: size + sha256 (the
    per-row content invariant, BASELINE.json input_hint)."""
    return blobs.select(
        "doc_id",
        "kind",
        F.length("data").alias("n_bytes"),
        F.sha2("data", 256).alias("sha256"),
    )


def image_features(blobs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, mean_pixel, p95_pixel, width, height) via an
    Arrow-batched decode → vectorized feature pass."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                px = _decode_pixels(r.data, int(r.width), int(r.height))
                rows.append((r.doc_id, len(r.data), float(px.mean()),
                             float(np.percentile(px, 95)), int(r.width), int(r.height)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "mean_pixel", "p95_pixel", "width", "height"]
            )

    return blobs.mapInPandas(
        fn,
        schema="doc_id long, n_bytes long, mean_pixel double, p95_pixel double, width int, height int",
    )


def resize_images(blobs: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of the decoded pixel grid, re-emitted as a
    binary payload with updated metadata (shape contract of a real
    thumbnailing stage)."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                px = _decode_pixels(r.data, int(r.width), int(r.height))
                yi = np.linspace(0, px.shape[0] - 1, out_h).round().astype(int)
                xi = np.linspace(0, px.shape[1] - 1, out_w).round().astype(int)
                small = px[np.ix_(yi, xi)]
                rows.append((r.doc_id, "image", small.tobytes(), out_w, out_h))
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "data", "width", "height"])

    return blobs.mapInPandas(
        fn, schema="doc_id long, kind string, data binary, width int, height int"
    )


def audio_features(blobs: DataFrame) -> DataFrame:
    """(doc_id, n_samples, duration_s, rms) from the decoded samples."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                s = _decode_samples(r.data, int(r.sample_rate)).astype(np.float64)
                rows.append((r.doc_id, len(s), len(s) / float(r.sample_rate),
                             float(np.sqrt(np.mean(s * s)))))
            yield pd.DataFrame(rows, columns=["doc_id", "n_samples", "duration_s", "rms"])

    return blobs.mapInPandas(
        fn, schema="doc_id long, n_samples long, duration_s double, rms double"
    )


def sample_frames(blobs: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Frame sampling: one output row per sampled frame (video payloads
    are sliced at fixed strides — the fake stand-in for keyframe
    extraction; 1→N row fan-out exercises the real batch shape)."""

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                data = r.data
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    rows.append((r.doc_id, i, data[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return blobs.mapInPandas(fn, schema="doc_id long, frame_idx int, frame binary")
