"""Multimodal opaque-blob columns: image/audio/video payloads ride as
``binary`` columns with a typed metadata struct; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` stages.

The reference pipeline ingests OCR'd pages (the image decode happened
upstream, code/python/ocr_agent_8_29.py:21-27); this module gives the
engine the blob-side plumbing a 100 TB training-data pipeline needs:
schema, partition-friendly layout, batched Python decode hooks. Real
codecs (PIL/ffmpeg) are not available in this environment, so
``decode_image_features`` ships a clearly-marked deterministic fake
(``fake=True``) used by tests/oracles, and raises NotImplementedError
otherwise — the Spark-side contract (schema, batch shape, partition
behavior) is real and tested either way.

Scale notes: blobs should live in their own parquet column chunk
(they do — parquet is columnar), so metadata-only queries never read
payload bytes; decode stages are narrow maps — partition by content
hash upstream if blob sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

BLOB_FEATURES_SCHEMA = "doc_id long, source string, n_bytes long, checksum string"
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, feat array<float>"
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct. Here
    the payload is the UTF-8 encoding of the text column (a stand-in
    for image bytes); production ingest reads real files via
    ``spark.read.format("binaryFile")``."""
    content = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("format"),
        F.octet_length(content).alias("n_bytes"),
    )
    return df.withColumn("content", content).withColumn("meta", meta)


def blob_features(df: DataFrame) -> DataFrame:
    """Per-blob features via mapInPandas: byte length + md5 checksum.
    Runs on raw bytes — no codec needed."""
    import pandas as pd  # noqa: F401

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": pdf["content"].map(len),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select("doc_id", "source", "content").mapInPandas(
        feats, schema=BLOB_FEATURES_SCHEMA
    )


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image blobs → (width, height, channels, feature vector).

    ``fake=True``: deterministic pseudo-decode (dims from header
    bytes; feature = 8-bin byte histogram, L1-normalized) so the
    pipeline shape is testable without codecs. ``fake=False`` requires
    PIL, which is not shipped here."""
    if not fake:
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "real image decode requires PIL/pillow (not available in this "
                "environment); use fake=True for the deterministic test decode"
            ) from e

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(blob)
                if not b:
                    rows.append((doc_id, 0, 0, 0, [0.0] * 8))
                    continue
                a = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(a >> 5, minlength=8).astype("float64")
                feat = (hist / hist.sum()).astype("float32")
                rows.append((doc_id, 1 + int(b[0]) % 64, 1 + int(b[-1]) % 64, 3, list(feat)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_channels", "feat"]
            )

    return df.select("doc_id", "content").mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, content binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame binary"
AUDIO_FEATURES_SCHEMA = "doc_id long, n_windows int, rms array<float>"


def _require(module: str, purpose: str, fake: bool) -> None:
    if fake:
        return
    import importlib

    try:  # pragma: no cover - environment-dependent
        importlib.import_module(module)
    except ImportError as e:
        raise NotImplementedError(
            f"real {purpose} requires {module} (not available in this "
            "environment); use fake=True for the deterministic test path"
        ) from e


def resize_images(
    df: DataFrame, target_w: int = 8, target_h: int = 8, fake: bool = False
) -> DataFrame:
    """Resize image blobs to (target_w, target_h). Fake path: strided
    byte subsample to exactly ``target_w*target_h`` bytes (pad with 0)
    — deterministic, preserves the 1-row→1-row contract and the
    binary-out schema a real PIL resize would produce."""
    _require("PIL", "image resize", fake)
    n_out = target_w * target_h

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                a = np.frombuffer(bytes(blob), dtype=np.uint8)
                if a.size == 0:
                    out = np.zeros(n_out, dtype=np.uint8)
                else:
                    idx = (np.arange(n_out) * a.size) // n_out
                    out = a[idx]
                rows.append((doc_id, target_w, target_h, out.tobytes()))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "content"])

    return df.select("doc_id", "content").mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every_n: int = 4,
    max_frames: int = 8,
    fps: int = 24,
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: one blob row → ≤max_frames frame rows (the
    UDTF-shaped stage a video pipeline needs). Fake path: treat the
    blob as fixed-size frames and keep every ``every_n``-th; timestamps
    derive from the frame index at ``fps``. Real path would wrap
    pyav/ffmpeg with the same output schema."""
    _require("av", "video frame sampling", fake)

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(blob)
                n_frames = max(len(b) // frame_bytes, 0)
                kept = range(0, n_frames, every_n)
                for out_idx, i in enumerate(kept):
                    if out_idx >= max_frames:
                        break
                    rows.append(
                        (
                            doc_id,
                            i,
                            (i * 1000) // fps,
                            b[i * frame_bytes : (i + 1) * frame_bytes],
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "ts_ms", "frame"])

    return df.select("doc_id", "content").mapInPandas(sample, schema=FRAMES_SCHEMA)


def extract_audio_features(
    df: DataFrame, window: int = 64, fake: bool = False
) -> DataFrame:
    """Windowed RMS over audio blobs (fake path: bytes as u8 samples)
    — the feature-extraction stage shape for audio; real path would
    decode via soundfile/librosa into the same (n_windows, rms[])."""
    _require("soundfile", "audio decode", fake)

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                a = np.frombuffer(bytes(blob), dtype=np.uint8).astype("float64")
                if a.size == 0:
                    rows.append((doc_id, 0, []))
                    continue
                n_win = (a.size + window - 1) // window
                pad = np.zeros(n_win * window)
                pad[: a.size] = a
                rms = np.sqrt((pad.reshape(n_win, window) ** 2).mean(axis=1))
                rows.append((doc_id, n_win, list(rms.astype("float32"))))
            yield pd.DataFrame(rows, columns=["doc_id", "n_windows", "rms"])

    return df.select("doc_id", "content").mapInPandas(feats, schema=AUDIO_FEATURES_SCHEMA)
