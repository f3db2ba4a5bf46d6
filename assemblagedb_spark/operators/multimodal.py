"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The 100 TB training-pipeline pattern: media lives in a BINARY column (or a
path column resolved lazily), typed metadata travels alongside in a struct,
and every transform is an Arrow-batched function over ``mapInPandas`` so
bytes stream through Python in columnar batches without JVM round-trips
per row.

Codec status: ``decode_image`` — the (width, height, channels) metadata
path every gate and feature extractor here uses — is REAL for PNG, GIF
and JPEG payloads via a pure-stdlib header parser (the same lazy-header
read PIL's ``Image.open`` performs for ``.width``/``.height``: pixels are
never decoded for dimension extraction). Pixel-level transforms are REAL
for PNG (functions/png.py: full encode/decode/resize), baseline JPEG
(functions/jpeg.py: pure-numpy FDCT/Huffman codec) and uncompressed
YUV4MPEG2 video (functions/y4m.py: container parse + per-frame luma) —
each gate-checked end to end against arithmetic DuckDB oracles. PIL /
ffmpeg, when the environment ships them, extend coverage to the
remaining compressed formats (12-bit/arithmetic JPEG, H.26x video);
``fake=True`` selects the deterministic payload-hash stub kept for the
replayable text-payload harness tables.
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


try:  # optional wider-format codec, used when the environment provides it
    from PIL import Image as _PILImage  # type: ignore

    HAS_IMAGE_CODEC = True
except ImportError:  # this container ships no PIL; header parser still works
    _PILImage = None
    HAS_IMAGE_CODEC = False


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type -> band count, matching len(PIL.Image.getbands()):
# 0 gray 'L'=1, 2 truecolor 'RGB'=3, 3 palette 'P'=1, 4 'LA'=2, 6 'RGBA'=4
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG start-of-frame markers (baseline through lossless, arithmetic
# variants) — the segment carrying dimensions and component count
_JPEG_SOF = frozenset(
    range(0xC0, 0xCF + 1)
) - {0xC4, 0xC8, 0xCC}  # exclude DHT, JPG extension, DAC


def _header_decode(payload: bytes) -> tuple[int, int, int] | None:
    """Pure-stdlib (width, height, channels) from PNG/GIF/JPEG headers —
    exactly the metadata PIL's lazy ``Image.open`` reads for
    ``.width``/``.height``/``getbands()`` without ever decoding pixels
    (the cheap-dimension-extraction pattern production data pipelines
    use at scan time). Returns ``None`` for unrecognized or truncated
    payloads; band counts mirror PIL's mode mapping so answers are
    identical whichever path serves them."""
    import struct

    if payload[:8] == _PNG_MAGIC:
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", payload[16:24])
        ch = _PNG_CHANNELS.get(payload[25])
        return (w, h, ch) if ch else None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            return None
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, 1  # PIL opens GIF in palette mode 'P' — one band
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i, n = 2, len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                return None  # marker desync: not a parseable JPEG
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 >= n:
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h, payload[i + 9]  # components = bands
            i += 2 + seg_len
        return None
    return None


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    """(width, height, channels) of an encoded image payload.

    With ``fake=True``: the deterministic stub (payload-hash-derived dims) —
    what the harness gates use for replayability. Otherwise the stdlib
    header parser decodes PNG/GIF/JPEG directly (no pixel decode — the
    same lazy read PIL performs for these fields); PIL, when importable
    (``HAS_IMAGE_CODEC``), covers any remaining container formats.
    Raises ``NotImplementedError`` only for payloads neither path
    recognizes."""
    if fake:
        return _fake_decode(payload)
    dims = _header_decode(payload or b"")
    if dims is not None:
        return dims
    if HAS_IMAGE_CODEC:
        import io

        with _PILImage.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands())
    raise NotImplementedError(
        "unrecognized image payload (not PNG/GIF/JPEG) and no wider codec "
        "in this environment — install PIL for other container formats"
    )


def png_media_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, kind, payload): a media table whose payloads are REAL
    PNG signatures + IHDR chunks, constructed JVM-side from the row id
    (width = 16 + id % 240, height = 16 + (id * 7) % 240, color type
    cycling through the five PNG types). The bytes are genuinely parsed
    back by :func:`decode_image`'s header path — engine-built payloads
    in, parser-extracted dimensions out — so an oracle predicting the
    dimensions arithmetically pins the parser, not a stub. Pure binary
    concat/unhex projection: zero Python, zero shuffle."""
    cts = "element_at(array(0, 2, 3, 4, 6), CAST(pmod({id}, 5) AS INT) + 1)"
    payload = (
        "concat("
        "unhex('89504E470D0A1A0A'), "            # PNG signature
        "unhex('0000000D49484452'), "            # IHDR length + type
        "unhex(lpad(hex(16 + pmod({id}, 240)), 8, '0')), "
        "unhex(lpad(hex(16 + pmod({id} * 7, 240)), 8, '0')), "
        "unhex(concat('08', lpad(hex(" + cts + "), 2, '0'), '000000')), "
        "unhex('00000000'))"                     # CRC (not read by header)
    ).format(id=id_col)
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.expr(payload).alias("payload"),
    )


def decode_image_features(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction: (media_id, width, height,
    n_channels) via :func:`decode_image` with ``fake=False`` — the
    production path (header parser, PIL fallback) over Arrow batches.
    Unrecognized payloads surface as NULL dims rather than failing the
    batch (scan-time tolerance a 100 TB ingest needs)."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    # OSError covers PIL.UnidentifiedImageError (its
                    # subclass) when the wider-codec fallback is present;
                    # ValueError covers malformed recognized formats
                    w, h, c = decode_image(
                        bytes(payload) if payload is not None else b""
                    )
                except (NotImplementedError, ValueError, OSError):
                    w = h = c = None
                rows.append((media_id, w, h, c))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_channels"]
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, "media_id long, width int, height int, n_channels int"
    )


def wav_encode(samples, sample_rate: int) -> bytes:
    """Encode a mono int16 sample array as a RIFF/WAVE payload — the
    stdlib ``wave`` module writes the real container (PCM 16-bit), no
    third-party codec needed."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes):
    """(sample_rate, n_channels, samples int16 array) of a RIFF/WAVE
    payload via the stdlib ``wave`` reader — the REAL audio decode path
    (16-bit PCM; the reader raises ``wave.Error`` on non-WAV bytes)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got width {w.getsampwidth()}"
            )
        frames = w.readframes(w.getnframes())
        return (
            w.getframerate(),
            w.getnchannels(),
            np.frombuffer(frames, dtype="<i2"),
        )


def _parallel_ids(docs: "DataFrame", id_col: str) -> "DataFrame":
    """Spread the bare id column across the session's full parallelism
    before a payload-builder kernel. Synthetic media corpora inherit the
    input file's split count — one split for a small parquet — which
    would serialize the codec work no matter how many cores exist; at
    100 TB the same holds whenever per-row compute, not scan bytes, is
    the bottleneck. Only the id column (a long per row) crosses the
    exchange: payloads are built AFTER it, so the media plans' property
    that payload bytes never cross the network is preserved
    (tests/test_plan_properties.py pins exactly this shape)."""
    sc = docs.sparkSession.sparkContext
    return docs.select(F.col(id_col)).repartition(sc.defaultParallelism)


def synthetic_wav_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, payload): REAL RIFF/WAVE payloads built per row in the
    Arrow kernel — n_samples = 64 + id % 129, sample_rate = 8000 +
    (id % 3)·4000, sample(t) = ((id·31 + t·7) mod 65536) − 32768 — an
    audio corpus whose waveform is a pure function of the id, so a SQL
    oracle can predict any sample statistic the decode path extracts."""
    import numpy as np
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for mid in ids:
                mid = int(mid)
                n = 64 + mid % 129
                t = np.arange(n, dtype=np.int64)
                samples = ((mid * 31 + t * 7) % 65536) - 32768
                payloads.append(
                    wav_encode(samples, 8000 + (mid % 3) * 4000)
                )
            yield pd.DataFrame(
                {"media_id": ids.astype("int64"), "payload": payloads}
            )

    return _parallel_ids(docs, id_col).mapInPandas(
        build, "media_id long, payload binary"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """(media_id, sample_rate, n_channels, n_samples, abs_sum): the REAL
    audio decode path over Arrow batches — container parsed, PCM frames
    materialized, an exact integer waveform statistic emitted (abs_sum =
    Σ|sample|, the replayable stand-in for RMS energy, which a SQL
    oracle cannot compute exactly in floats)."""
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import wave

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    sr, ch, samples = wav_decode(bytes(payload))
                except (wave.Error, ValueError, EOFError):
                    # NULL or unparseable payload -> NULL stats, not a
                    # dead task (the same scan-time tolerance as
                    # decode_image_features)
                    rows.append((media_id, None, None, None, None))
                    continue
                rows.append(
                    (media_id, sr, ch, len(samples),
                     int(abs(samples.astype("int64")).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_channels",
                         "n_samples", "abs_sum"],
            )

    return media.select("media_id", "payload").mapInPandas(
        extract,
        "media_id long, sample_rate int, n_channels int, "
        "n_samples long, abs_sum long",
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


def resize_images(
    media: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Resize transform: payload -> payload.

    ``codec="png"`` is the REAL lossless pixel path: each payload decodes
    with the stdlib PNG codec (functions/png.py), resizes by the exact
    nearest-neighbor integer map, and re-encodes — decode, transform,
    re-encode inside one Arrow batch loop, the shape every pixel-level
    training transform takes at scale. ``codec="jpeg"`` is the REAL lossy
    path through the pure-numpy baseline codec (functions/jpeg.py,
    quality 50 re-encode). ``codec="fake"`` keeps the identity-payload
    stub for other media formats and for the replayable text-payload
    harness tables."""

    def resize_fake(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta_mime"] = "image/fake"
            pdf["width"] = width
            pdf["height"] = height
            yield pdf[["media_id", "payload", "meta_mime", "width", "height"]]

    def resize_png(batches):
        import pandas as pd

        from assemblagedb_spark.functions.png import (
            png_decode,
            png_encode,
            resize_nearest,
        )

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    arr = resize_nearest(
                        png_decode(bytes(payload)),
                        width=width, height=height,
                    )
                    resized = png_encode(arr)
                except ValueError:
                    # NULL or non-PNG payload passes through as a NULL
                    # payload row — schema kept, task alive
                    resized = None
                out.append((media_id, resized, "image/png", width, height))
            yield pd.DataFrame(
                out,
                columns=["media_id", "payload", "meta_mime", "width", "height"],
            )

    def resize_jpeg(batches):
        import pandas as pd

        from assemblagedb_spark.functions.jpeg import jpeg_decode, jpeg_encode
        from assemblagedb_spark.functions.png import resize_nearest

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    arr = resize_nearest(
                        jpeg_decode(bytes(payload)),
                        width=width, height=height,
                    )
                    resized = jpeg_encode(arr, quality=50)
                except ValueError:
                    # NULL or non-JPEG payload passes through as a NULL
                    # payload row — schema kept, task alive
                    resized = None
                out.append((media_id, resized, "image/jpeg", width, height))
            yield pd.DataFrame(
                out,
                columns=["media_id", "payload", "meta_mime", "width", "height"],
            )

    kernel = {"fake": resize_fake, "png": resize_png, "jpeg": resize_jpeg}[codec]
    return media.select("media_id", "payload").mapInPandas(
        kernel,
        "media_id long, payload binary, meta_mime string, width int, height int",
    )


def synthetic_png_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, payload): REAL grayscale PNG payloads built per row in
    the Arrow kernel — W = 8 + id % 9, H = 8 + (id·3) % 9, pixel(x, y) =
    (x + 7y + id) % 256 — i.e. an image corpus whose pixel content is a
    pure function of the id, so a SQL oracle can predict any pixel
    statistic downstream transforms produce. The payloads are genuine
    zlib-compressed PNGs (functions/png.py), not header shells."""
    import numpy as np
    import pandas as pd

    from assemblagedb_spark.functions.png import png_encode

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for mid in ids:
                mid = int(mid)
                w, h = 8 + mid % 9, 8 + (mid * 3) % 9
                arr = (
                    (np.arange(w)[None, :] + 7 * np.arange(h)[:, None] + mid)
                    % 256
                ).astype(np.uint8)
                payloads.append(png_encode(arr))
            yield pd.DataFrame(
                {"media_id": ids.astype("int64"), "payload": payloads}
            )

    return _parallel_ids(docs, id_col).mapInPandas(
        build, "media_id long, payload binary"
    )


def pixel_sums(media: DataFrame) -> DataFrame:
    """(media_id, pixel_sum): sum of all decoded pixel values per payload
    — the integer pixel statistic the resize gate compares against its
    arithmetic oracle (REAL decode path, no stub)."""
    import pandas as pd

    from assemblagedb_spark.functions.png import png_decode

    def sums(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    s = int(png_decode(bytes(payload)).sum())
                except ValueError:
                    s = None  # NULL/undecodable -> NULL stat, task alive
                rows.append((media_id, s))
            yield pd.DataFrame(rows, columns=["media_id", "pixel_sum"])

    return media.select("media_id", "payload").mapInPandas(
        sums, "media_id long, pixel_sum long"
    )


def synthetic_jpeg_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, payload): REAL baseline JPEG payloads built per row in
    the Arrow kernel — block-flat images W = 8·(1 + id%3), H = 8·(1 +
    (id÷3)%3) whose 8×8 block at (bx, by) is the flat value
    (id + 13·bx + 29·by) mod 256. Each block is DC-only under the FDCT,
    so the decoded image is an exact closed-form function of the id
    (functions/jpeg.py determinism contract: DC = 8d snapped before
    rounding) while the stream still exercises DC differential coding,
    multi-category Huffman symbols, byte stuffing and block tiling —
    genuine entropy-coded T.81 streams, not header shells. Odd ids emit
    PROGRESSIVE (SOF2) streams, even ids baseline — both carry identical
    quantized coefficients, so one arithmetic oracle pins BOTH decode
    paths."""
    import numpy as np
    import pandas as pd

    from assemblagedb_spark.functions.jpeg import (
        jpeg_encode,
        jpeg_encode_progressive,
    )

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        ones = np.ones((8, 8), dtype=np.int64)
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for mid in ids:
                mid = int(mid)
                bw, bh = 1 + mid % 3, 1 + (mid // 3) % 3
                vals = (
                    mid
                    + 13 * np.arange(bw)[None, :]
                    + 29 * np.arange(bh)[:, None]
                ) % 256
                img = np.kron(vals, ones).astype(np.uint8)
                enc = jpeg_encode_progressive if mid % 2 else jpeg_encode
                payloads.append(enc(img, quality=50))
            yield pd.DataFrame(
                {"media_id": ids.astype("int64"), "payload": payloads}
            )

    return _parallel_ids(docs, id_col).mapInPandas(
        build, "media_id long, payload binary"
    )


def jpeg_pixel_stats(media: DataFrame) -> DataFrame:
    """(media_id, width, height, pixel_sum) via the REAL baseline JPEG
    decoder (Huffman → dequant → IDCT, functions/jpeg.py) — the integer
    pixel statistics the lossy-codec gate compares against its
    arithmetic oracle. NULL/undecodable payloads yield NULL stats, task
    alive."""
    import pandas as pd

    from assemblagedb_spark.functions.jpeg import jpeg_decode

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    arr = jpeg_decode(bytes(payload))
                    rows.append(
                        (media_id, int(arr.shape[1]), int(arr.shape[0]),
                         int(arr.astype("int64").sum()))
                    )
                except ValueError:
                    rows.append((media_id, None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixel_sum"]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, "media_id long, width int, height int, pixel_sum long"
    )


def synthetic_y4m_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, payload): genuine YUV4MPEG2 Cmono streams — T = 1+id%4
    frames of W = 8+id%5 × H = 8+(id·3)%5 with luma(x, y, t) =
    (x + 3y + 7t + id) mod 256 — a video corpus whose every pixel is a
    pure function of the id, so a SQL oracle can predict any per-frame
    statistic downstream sampling produces."""
    import numpy as np
    import pandas as pd

    from assemblagedb_spark.functions.y4m import y4m_encode

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for mid in ids:
                mid = int(mid)
                t, w, h = 1 + mid % 4, 8 + mid % 5, 8 + (mid * 3) % 5
                frames = (
                    np.arange(w)[None, None, :]
                    + 3 * np.arange(h)[None, :, None]
                    + 7 * np.arange(t)[:, None, None]
                    + mid
                ) % 256
                payloads.append(y4m_encode(frames.astype(np.uint8)))
            yield pd.DataFrame(
                {"media_id": ids.astype("int64"), "payload": payloads}
            )

    return _parallel_ids(docs, id_col).mapInPandas(
        build, "media_id long, payload binary"
    )


def sample_video_frames(
    media: DataFrame, every_n: int = 2, max_frames: int = 8
) -> DataFrame:
    """REAL animation/video frame sampling: sniff each payload's magic
    and parse it as a YUV4MPEG2 container (functions/y4m.py) or an
    animated GIF (functions/gif.py — LZW decode + disposal compositing),
    take every ``every_n``-th frame up to ``max_frames``, and emit
    (media_id, frame_idx, width, height, luma_sum) — the exploded
    (media, frame) shape a training pipeline feeds to a vision encoder,
    with frame boundaries from each container's own geometry rather than
    the byte-window stride of the :func:`sample_frames` stub. GIF luma is
    the BT.601 integer approximation (299R + 587G + 114B) ÷ 1000, which
    is exactly the gray value for grayscale palettes. NULL/unparseable
    payloads sample nothing (missing media has no frames); the task
    stays alive."""
    import pandas as pd

    from assemblagedb_spark.functions.gif import gif_decode
    from assemblagedb_spark.functions.y4m import y4m_decode

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                try:
                    if data[:9] == b"YUV4MPEG2":
                        luma, w, h, t = y4m_decode(data)
                    elif data[:4] == b"GIF8":
                        rgb, w, h, t = gif_decode(data)
                        rgb = rgb.astype(np.int64)
                        luma = (
                            299 * rgb[..., 0]
                            + 587 * rgb[..., 1]
                            + 114 * rgb[..., 2]
                        ) // 1000
                    else:
                        continue
                except ValueError:
                    continue
                for idx in range(0, t, every_n):
                    if idx // every_n >= max_frames:
                        break
                    rows.append(
                        (media_id, idx, w, h,
                         int(luma[idx].astype("int64").sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "luma_sum"],
            )

    return media.select("media_id", "payload").mapInPandas(
        sample,
        "media_id long, frame_idx int, width int, height int, luma_sum long",
    )


def synthetic_gif_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(media_id, payload): genuine animated GIF89a streams — T = 1+id%3
    full-canvas frames of W = 6+id%5 × H = 6+(id·7)%5 grayscale pixels
    luma(x, y, t) = (x + 5y + 11t + id) mod 256, LZW-compressed against
    the global 256-gray palette — an animation corpus whose every pixel
    is a pure function of the id, so a SQL oracle can predict any
    per-frame statistic downstream sampling produces."""
    import numpy as np
    import pandas as pd

    from assemblagedb_spark.functions.gif import gif_encode

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            payloads = []
            for mid in ids:
                mid = int(mid)
                t, w, h = 1 + mid % 3, 6 + mid % 5, 6 + (mid * 7) % 5
                frames = (
                    np.arange(w)[None, None, :]
                    + 5 * np.arange(h)[None, :, None]
                    + 11 * np.arange(t)[:, None, None]
                    + mid
                ) % 256
                payloads.append(gif_encode(frames.astype(np.uint8)))
            yield pd.DataFrame(
                {"media_id": ids.astype("int64"), "payload": payloads}
            )

    return _parallel_ids(docs, id_col).mapInPandas(
        build, "media_id long, payload binary"
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
