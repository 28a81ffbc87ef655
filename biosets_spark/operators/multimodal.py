"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

No reference counterpart (BASELINE.json extension surface). Design:

- payload: plain ``binary`` column (Parquet BYTE_ARRAY — splittable,
  column-pruned, predicate-skipped like any other column);
- metadata: sibling struct column ``{modality, mime, width, height,
  duration_ms, sample_rate}`` so filters (e.g. width > 512) push down
  WITHOUT touching the (huge) payload bytes;
- compute: decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` generators — the decode libraries
  (PIL/librosa/av) are NOT in this container, so the decode body is a
  stub: it either raises NotImplementedError (real mode) or produces a
  deterministic fake (test mode). The Spark-side plumbing — schemas,
  batch iteration, partition sizing — is real and tested.

Scale note: payload columns dominate I/O. Keep them in their own
parquet column (never inside a struct with hot columns), set
``spark.sql.files.maxPartitionBytes`` so a partition holds a bounded
number of payloads, and always select metadata-only projections when
the query doesn't decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import col, lit

MEDIA_META_TYPE = T.StructType([
    T.StructField("modality", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def attach_media_metadata(
    df: DataFrame,
    payload_col: str,
    modality: str,
    mime: str,
    meta_col: str = "media_meta",
) -> DataFrame:
    """Attach the typed metadata struct for an opaque payload column."""
    return df.withColumn(
        meta_col,
        F.struct(
            lit(modality).alias("modality"),
            lit(mime).alias("mime"),
            lit(None).cast("int").alias("width"),
            lit(None).cast("int").alias("height"),
            lit(None).cast("long").alias("duration_ms"),
            lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _decode_image(payload: bytes, fake: bool):
    if fake:
        # deterministic fake: "decode" = payload length pseudo-pixels
        return (len(payload) % 640 + 1, len(payload) % 480 + 1)
    raise NotImplementedError(
        "image decode requires PIL/opencv which are not installed in this "
        "environment; pass fake_decode=True for the deterministic stub"
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake_decode: bool = True,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract pipeline over binary image payloads.

    Real plumbing: Arrow-batched mapInPandas with an explicit output
    schema; the decode call itself is stubbed (see module docstring).
    Output: (id, width, height, n_bytes, phash64) — phash is a
    deterministic content hash standing in for a perceptual hash.
    """
    import hashlib

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("phash64", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, nb, ph = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                w, h = _decode_image(raw, fake_decode)
                ids.append(i)
                ws.append(w)
                hs.append(h)
                nb.append(len(raw))
                ph.append(int.from_bytes(hashlib.md5(raw).digest()[:8], "big", signed=True))
            yield pd.DataFrame({id_col: ids, "width": ws, "height": hs, "n_bytes": nb, "phash64": ph})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    fake_decode: bool = True,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    'frame' (stub: every n-th kilobyte becomes a fake frame key).
    Demonstrates the 1->N mapInPandas expansion shape used by real
    frame extraction."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_key", T.StringType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, fns, fks = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if not fake_decode:
                    raise NotImplementedError("video decode requires pyav; not installed")
                raw = bytes(payload) if payload is not None else b""
                for fn in range(max(1, len(raw) // every_n_bytes)):
                    ids.append(i)
                    fns.append(fn)
                    fks.append(hashlib.md5(raw[fn * every_n_bytes:(fn + 1) * every_n_bytes]).hexdigest()[:12])
            yield pd.DataFrame({id_col: ids, "frame_no": fns, "frame_key": fks})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=out_schema)
