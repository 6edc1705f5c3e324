"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators. The decode kernels themselves are STUBBED
(this environment has no image/audio libraries): ``fake=True`` (default)
substitutes a deterministic md5-derived kernel so the Spark-side
contract — schema, batching, partitioning, UDF signature — is fully
real and tested; ``fake=False`` raises NotImplementedError at the exact
line where a real libjpeg/ffmpeg call plugs in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_decode(payload: bytes, dims: int) -> list:
    h = hashlib.md5(payload).digest()
    return [round(h[i % len(h)] / 255.0, 6) for i in range(dims)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dims: int = 4,
    fake: bool = True,
) -> DataFrame:
    """binary payload -> feature vector (e.g. a CNN embedding). Arrow
    batches in, Arrow batches out; one Python worker per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            if not fake:
                raise NotImplementedError(
                    "plug a real decoder here (PIL/torchvision/ffmpeg)"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "features": payloads.map(lambda b: _fake_decode(bytes(b), dims)),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("src_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """'image' payload -> resized payload + typed metadata struct. The
    fake kernel produces a deterministic width×height byte raster by
    cyclic sampling of the source bytes (shape-correct, contract-real);
    a real one decodes + resamples via PIL/libvips at the marked line."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        for pdf in batches:
            ids, blobs, metas = [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise NotImplementedError("plug PIL/libvips resampling here")
                b = bytes(payload)
                blobs.append(bytes(b[i % len(b)] for i in range(n_out)))
                ids.append(int(did))
                metas.append(
                    {"width": width, "height": height, "src_bytes": len(b)}
                )
            yield pd.DataFrame({"doc_id": ids, "resized": blobs, "meta": metas})

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 4,
    fake: bool = True,
) -> DataFrame:
    """'video' payload -> sampled frames (1→N rows per input). The fake
    kernel slices the payload; a real one seeks keyframes via ffmpeg."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise NotImplementedError("plug ffmpeg frame sampling here")
                b = bytes(payload)
                for i, start in enumerate(range(0, len(b), every_n_bytes)):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(b[start : start + every_n_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)
