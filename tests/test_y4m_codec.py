"""Pins for the pure-stdlib YUV4MPEG2 codec (functions/y4m.py)."""

import numpy as np
import pytest

from assemblagedb_spark.functions.y4m import y4m_decode, y4m_encode


def test_mono_roundtrip_exact():
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, size=(4, 9, 13), dtype=np.uint8)
    luma, w, h, t = y4m_decode(y4m_encode(frames))
    assert (w, h, t) == (13, 9, 4)
    assert (luma == frames).all()


def test_single_frame_and_1x1():
    frames = np.array([[[200]]], dtype=np.uint8)
    luma, w, h, t = y4m_decode(y4m_encode(frames))
    assert (w, h, t) == (1, 1, 1)
    assert luma[0, 0, 0] == 200


def test_c420_foreign_stream_skips_chroma_exactly():
    # hand-build a C420 stream: luma plane + half-size chroma; the parser
    # must step over chroma bytes to land on the next FRAME marker
    w, h = 4, 2
    luma0 = np.arange(w * h, dtype=np.uint8)
    luma1 = luma0[::-1].copy()
    chroma = bytes(range(w * h // 2))  # 2 quarter-size planes
    payload = (
        b"YUV4MPEG2 W4 H2 F30:1 Ip A1:1 C420jpeg\n"
        + b"FRAME\n" + luma0.tobytes() + chroma
        + b"FRAME\n" + luma1.tobytes() + chroma
    )
    luma, got_w, got_h, t = y4m_decode(payload)
    assert (got_w, got_h, t) == (4, 2, 2)
    assert (luma[0].ravel() == luma0).all()
    assert (luma[1].ravel() == luma1).all()


def test_default_chroma_is_420jpeg_when_c_absent():
    w, h = 2, 2
    luma = np.full((h, w), 9, dtype=np.uint8)
    payload = (
        b"YUV4MPEG2 W2 H2 F25:1\n"
        + b"FRAME\n" + luma.tobytes() + bytes(w * h // 2)
    )
    got, _, _, t = y4m_decode(payload)
    assert t == 1 and (got[0] == 9).all()


def test_frame_parameters_on_frame_line_are_tolerated():
    # the spec allows FRAME-level parameters: "FRAME Xparam\n"
    luma = np.full((2, 2), 7, dtype=np.uint8)
    payload = b"YUV4MPEG2 W2 H2 F25:1 Cmono\n" + b"FRAME Xfoo\n" + luma.tobytes()
    got, _, _, t = y4m_decode(payload)
    assert t == 1 and (got[0] == 7).all()


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"RIFF....", "not a YUV4MPEG2"),
        (b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n\x00\x00\x00", "truncated"),
        (b"YUV4MPEG2 W2 H2 Cmono\nGRAME\n\x00\x00\x00\x00", "FRAME marker"),
        (b"YUV4MPEG2 W2 H2 C422\nFRAME\n" + bytes(8), "unsupported y4m chroma"),
        (b"YUV4MPEG2 F25:1 Cmono\nFRAME\n", "missing W/H"),
        (b"YUV4MPEG2 W2 H2 Cmono\n", "zero frames"),
    ],
)
def test_refusals(payload, msg):
    with pytest.raises(ValueError, match=msg):
        y4m_decode(payload)
