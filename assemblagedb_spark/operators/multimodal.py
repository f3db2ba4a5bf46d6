"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The 100 TB training-pipeline pattern: media lives in a BINARY column (or a
path column resolved lazily), typed metadata travels alongside in a struct,
and every transform is an Arrow-batched function over ``mapInPandas`` so
bytes stream through Python in columnar batches without JVM round-trips
per row.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
container, so the decode kernels are stubbed: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded by the payload hash) produces stable dimensions/frames.
Everything around the stub — schemas, batch iteration, partitioning
controls, UDF signatures — is real and tested; swapping in a real codec is
a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_channels int, sha256 string"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder: dimensions derived from the payload hash.
    Replace with PIL.Image.open when the codec is available."""
    h = hashlib.sha256(payload or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 3
    return width, height, channels


try:  # real codec, used automatically when the environment provides it
    from PIL import Image as _PILImage  # type: ignore

    HAS_IMAGE_CODEC = True
except ImportError:  # this container ships no image codec
    _PILImage = None
    HAS_IMAGE_CODEC = False


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    """(width, height, channels) of an encoded image payload.

    With ``fake=True``: the deterministic stub (payload-hash-derived dims) —
    what the harness gates use for replayability. Otherwise decodes with PIL
    when importable (``HAS_IMAGE_CODEC``); raises ``NotImplementedError`` in
    codec-less environments like this container.
    """
    if fake:
        return _fake_decode(payload)
    if HAS_IMAGE_CODEC:
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands())
    raise NotImplementedError(
        "no image codec in this environment — use fake=True or install PIL"
    )


def media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a media table from a text corpus (payload = utf-8 bytes):
    the harness stand-in for an ingested image dataset — schema and byte
    handling identical to the real thing."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )


def image_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Partitioning note for scale: media payloads are large — repartition so a
    batch of rows fits executor memory (``spark.sql.execution.arrow.
    maxRecordsPerBatch`` bounds rows/batch; set it with ``batch_hint``).
    """
    if batch_hint:
        media.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_hint)
        )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, c = decode_image(data, fake=True)
                rows.append(
                    (media_id, w, h, c, hashlib.sha256(data).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels", "sha256"]
            )

    return media.select("media_id", "payload").mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize transform shape: payload -> payload (stubbed as identity +
    metadata rewrite; a real impl decodes, resizes, re-encodes in the same
    Arrow batch loop)."""

    def resize(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta_mime"] = "image/fake"
            pdf["width"] = width
            pdf["height"] = height
            yield pdf[["media_id", "payload", "meta_mime", "width", "height"]]

    return media.select("media_id", "payload").mapInPandas(
        resize, "media_id long, payload binary, meta_mime string, width int, height int"
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: emit one row per sampled frame —
    the (media_id, frame_idx) exploded shape downstream training pipelines
    expect. The stub samples byte windows; a real impl samples decoded
    frames at timestamps."""

    def sample(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    # a MISSING payload samples nothing — unlike an empty
                    # payload, which keeps its designed minimum one frame
                    continue
                data = bytes(payload)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    window = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    # fingerprint the LOWERCASE-HEX rendering of the window,
                    # not the raw bytes: the portable exact form (an SQL
                    # oracle cannot slice or sha256 BLOBs, and a byte window
                    # of UTF-8 text is not generally a valid string)
                    rows.append(
                        (media_id, i,
                         hashlib.sha256(window.hex().encode()).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha256"])

    return media.select("media_id", "payload").mapInPandas(sample, FRAME_SAMPLE_SCHEMA)
