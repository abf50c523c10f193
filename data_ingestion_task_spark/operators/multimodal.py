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
