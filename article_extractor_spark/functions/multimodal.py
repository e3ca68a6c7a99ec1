"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; the heavy steps (decode, resize, frame-sample) run as
Arrow-batched ``mapInPandas`` stages.  The real codec libraries are not
available in this container, so the decode kernel is STUBBED — but the
Spark-side contract (schema, pruning, batch shape, partitioning) is real
and tested:

- ``media_features``: deterministic fake "decode" producing byte-count,
  content digest, and fake dimensions — fully reproducible, so it has an
  exact SQL oracle.
- ``decode_image`` / ``sample_frames``: the genuine kernels, gated
  behind import-try; raise ``NotImplementedError`` here.

At 100 TB the binary column dominates IO; every entry point prunes to
exactly (id, payload) before the Arrow exchange so Parquet never
materializes unused columns (check ReadSchema in .explain).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in for an image decode: dimensions derive
    from the byte length (stable across engines/runs)."""
    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    return n, digest, 1 + n % 640, 1 + (n * 7) % 480


def _feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for batch in batches:
        feats = [_fake_decode(p or b"") for p in batch["payload"]]
        out = pd.DataFrame(
            feats, columns=["n_bytes", "digest", "width", "height"]
        )
        out.insert(0, "doc_id", batch["doc_id"].values)
        yield out


def media_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    Prunes to (id, payload) first so only those columns cross the
    JVM→Python boundary.
    """
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    pruned = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )
    return pruned.mapInPandas(_feature_batches, schema=MEDIA_FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/benchmarks: treats each document's UTF-8
    bytes as an opaque media payload (the container has no image data;
    the plumbing is identical)."""
    return docs.select(
        F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def has_image_codec() -> bool:
    """Capability probe: True when Pillow is importable.  The decode
    kernel activates automatically when a codec lib is dropped into the
    environment — no code change needed (tests skip-unless-codec)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - environment-dependent
        return False


def _decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:  # pragma: no cover - needs codec lib
    import io

    from PIL import Image

    for batch in batches:
        rows = []
        for payload in batch["payload"]:
            try:
                img = Image.open(io.BytesIO(payload or b""))
                rows.append((img.width, img.height, img.mode, True))
            except Exception:  # noqa: BLE001 - bad bytes → row, not crash
                rows.append((None, None, None, False))
        out = pd.DataFrame(
            rows, columns=["width", "height", "mode", "decode_ok"]
        )
        out.insert(0, "doc_id", batch["doc_id"].values)
        yield out


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode (Pillow kernel), gated on ``has_image_codec``.

    Identical Spark plumbing to ``media_features`` — prune to
    (doc_id, payload), one Arrow-batched mapInPandas stage, bad bytes
    become ``decode_ok=false`` rows instead of task deaths.  This
    container ships no codec libs, so the call raises
    ``NotImplementedError`` here; installing Pillow activates it with
    no code change (tests/test_pipeline_queries.py documents the gate).
    """
    if not has_image_codec():
        raise NotImplementedError(
            "image decode requires Pillow; container has no codec libs — "
            "use media_features() for the tested plumbing"
        )
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    pruned = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )
    return pruned.mapInPandas(_decode_batches, schema=DECODED_IMAGE_SCHEMA)


def sample_frames(
    df: DataFrame, payload_col: str = "payload", every_n: int = 30
) -> DataFrame:
    """Video frame sampling stub (no video libs in container)."""
    raise NotImplementedError(
        "frame sampling requires a video codec; plumbing mirrors "
        "media_features()"
    )
