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

    Metadata derives from the BYTE length of the payload (not the
    character length of the source string) so it agrees with
    ``octet_length``-based oracles on non-ASCII content too.
    """
    n = F.length(F.encode(F.col(content), "utf-8"))
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


_IMG_COLS = ["doc_id", "n_bytes", "mean_pixel", "p95_pixel", "width", "height"]


def image_features(blobs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, mean_pixel, p95_pixel, width, height) via an
    Arrow-batched decode → vectorized feature pass.

    The ``kind = 'image'`` filter runs BEFORE the UDF (pushed to the
    scan — non-image payload bytes never ship through Arrow). Decode is
    inherently per-item; the feature math (means via one
    ``np.add.reduceat`` over the concatenated pixels) is vectorized
    across the batch. p95 uses numpy's linear-interpolation percentile,
    reproduced by DuckDB's ``quantile_cont`` in the oracle.
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=_IMG_COLS)
                continue
            arrays = [
                _decode_pixels(r.data, int(r.width), int(r.height))
                for r in pdf.itertuples(index=False)
            ]
            lens = np.asarray([a.size for a in arrays], dtype=np.int64)
            flat = np.concatenate([a.ravel() for a in arrays]).astype(np.float64)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            means = np.add.reduceat(flat, starts) / lens
            p95 = np.asarray([np.percentile(a, 95) for a in arrays])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": pdf["data"].map(len).to_numpy(dtype=np.int64),
                    "mean_pixel": means,
                    "p95_pixel": p95,
                    "width": pdf["width"].to_numpy(),
                    "height": pdf["height"].to_numpy(),
                }
            )

    return blobs.where(F.col("kind") == "image").mapInPandas(
        fn,
        schema="doc_id long, n_bytes long, mean_pixel double, p95_pixel double, width int, height int",
    )


def _nn_indices(n_in: int, n_out: int):
    """Nearest-neighbor sample indices: round-half-up of
    ``i * (n_in-1) / (n_out-1)`` in EXACT integer math — deterministic
    and replicable in plain SQL (no float rounding-mode dependence,
    unlike ``np.linspace().round()``'s round-half-even)."""
    import numpy as np

    if n_out <= 1:
        return np.zeros(max(n_out, 0), dtype=np.int64)
    i = np.arange(n_out, dtype=np.int64)
    return (2 * i * (n_in - 1) + (n_out - 1)) // (2 * (n_out - 1))


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
                px = _decode_pixels(r.data, int(r.width), int(r.height))
                yi = _nn_indices(px.shape[0], out_h)
                xi = _nn_indices(px.shape[1], out_w)
                small = px[np.ix_(yi, xi)]
                rows.append((r.doc_id, "image", small.tobytes(), out_w, out_h))
            yield pd.DataFrame(rows, columns=["doc_id", "kind", "data", "width", "height"])

    return blobs.where(F.col("kind") == "image").mapInPandas(
        fn, schema="doc_id long, kind string, data binary, width int, height int"
    )


_AUD_COLS = ["doc_id", "n_samples", "duration_s", "rms"]


def audio_features(blobs: DataFrame) -> DataFrame:
    """(doc_id, n_samples, duration_s, rms) from the decoded samples.

    ``kind = 'audio'`` filter pushed before the UDF; RMS is one
    ``np.add.reduceat`` over the concatenated squared samples.
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=_AUD_COLS)
                continue
            arrays = [
                _decode_samples(r.data, int(r.sample_rate)).astype(np.float64)
                for r in pdf.itertuples(index=False)
            ]
            lens = np.asarray([len(a) for a in arrays], dtype=np.int64)
            flat = np.concatenate(arrays)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            rms = np.sqrt(np.add.reduceat(flat * flat, starts) / lens)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_samples": lens,
                    "duration_s": lens / pdf["sample_rate"].to_numpy(dtype=np.float64),
                    "rms": rms,
                }
            )

    return blobs.where(F.col("kind") == "audio").mapInPandas(
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
                data = r.data
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    rows.append((r.doc_id, i, data[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return blobs.where(F.col("kind") == "video").mapInPandas(
        fn, schema="doc_id long, frame_idx int, frame binary"
    )
