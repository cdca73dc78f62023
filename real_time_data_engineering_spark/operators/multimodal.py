"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for 100 TB multimodal pipelines: the media payload is an
opaque ``binary`` column that never deserializes JVM-side; all
decode/feature work happens in Arrow-batched ``mapInPandas`` so bytes
move Spark→Python once per batch, not per row. Partitioning guidance:
media tables are partitioned by (kind, date) and bucketed by media_id
so joins against metadata/caption tables co-locate.

The actual codec work (JPEG decode, resample, frame extraction) needs
PIL/ffmpeg/librosa — not in this container — so the decode kernels are
STUBS behind import-tries with a deterministic fake used by tests; the
Spark-side plumbing (schemas, batch iteration, UDF signatures, column
pruning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feature_vec", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_image(payload: bytes, fmt: str):  # pragma: no cover - stub
    """Real decode path (PIL). Unavailable in this container → the
    deterministic fake below stands in; the UDF plumbing is identical."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow; deterministic fake used in tests"
        ) from e
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payload.

    ``mapInPandas`` receives column-pruned batches — selecting only
    (media_id, kind, payload) upstream means the scan never reads
    ``meta`` (check ReadSchema in the plan).

    The batch fn is deliberately self-contained (no module-global
    references): cloudpickle then ships it by value, so executors need
    no PYTHONPATH access to this package — required on a real cluster
    unless the wheel is shipped with --py-files.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # byte work runs in numpy (np.frombuffer view, int64 reductions)
        # — the shape the REAL codec kernel keeps: per payload, sums are
        # exact-int accumulation with ONE float64 division at the end,
        # so the fake stays oracle-checkable byte-for-byte while the
        # hot loop never iterates Python ints.
        import numpy as np

        def stats(p):
            if not p:
                return 0, 0, 0.0, [0.0] * dim
            arr = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
            n = len(arr)
            total = int(arr.sum())
            vec = [int(arr[j::dim].sum()) / n for j in range(dim)]
            return n, total % 2**31, total / n, vec

        for pdf in it:
            cols = [stats(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series([c[0] for c in cols], dtype="int64"),
                    "checksum": pd.Series([c[1] for c in cols], dtype="int64"),
                    "mean_byte": pd.Series([c[2] for c in cols], dtype="float64"),
                    "feature_vec": [c[3] for c in cols],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: utf-8 text bytes as payload.

    Gives tests a real binary column with knowable properties; the
    production path swaps this for `spark.read.format('binaryFile')`
    or a parquet table of blobs.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


FRAME_BYTES = 256  # fake-codec frame granule (real path: decoder-determined)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling over the opaque payload — Spark plumbing
    real (Arrow-batched ``mapInPandas``, pruned input, one output row
    per sampled frame), codec stubbed: the real path seeks keyframes
    with ffmpeg bindings (absent in this container); the deterministic
    stand-in treats the payload as a stream of ``FRAME_BYTES``-sized
    frames and emits every ``every_n``-th one. Output contract
    (media_id, kind, frame_idx, n_frames, frame payload) is what the
    real decoder fills identically.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb = FRAME_BYTES

        def frames(p):
            if not p:
                return []
            n_frames = len(p) // fb
            return [
                (f, n_frames, p[f * fb : (f + 1) * fb]) for f in range(0, n_frames, every_n)
            ]

        for pdf in it:
            out_id, out_kind, out_idx, out_n, out_frame = [], [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                for f, n_frames, frame in frames(payload):
                    out_id.append(mid)
                    out_kind.append(kind)
                    out_idx.append(f)
                    out_n.append(n_frames)
                    out_frame.append(frame)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "kind": pd.Series(out_kind, dtype="object"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "n_frames": pd.Series(out_n, dtype="int32"),
                    "frame": pd.Series(out_frame, dtype="object"),
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return media.select("media_id", "kind", "payload").mapInPandas(batches, out_schema)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image resize over the opaque payload column — Spark plumbing real
    (Arrow-batched mapInPandas, pruned input, fixed output contract),
    pixel kernel stubbed: the real path decodes with PIL and
    nearest-neighbor-resamples; this container lacks codecs, so a
    deterministic byte-resampler stands in (index-scaled selection —
    same shape, same batch mechanics, knowable output).

    Output rows keep (media_id, kind), carry the resized payload of
    exactly width*height bytes, and rewrite meta to the new dims.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        target = width * height
        sel = np.arange(target, dtype=np.int64)

        def fake_resize(p):
            if not p:
                return b""
            # index-scaled selection, vectorized: (i·n)//target per
            # output byte — identical bytes to the scalar formulation
            return np.frombuffer(p, dtype=np.uint8)[(sel * len(p)) // target].tobytes()

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": pdf["payload"].map(fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return media.select("media_id", "kind", "payload").mapInPandas(batches, out_schema)
