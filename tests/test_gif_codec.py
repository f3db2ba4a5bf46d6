"""Pins for the pure-stdlib GIF codec (functions/gif.py).

Layers: LZW exactness across every code-width boundary and dictionary
reset; lossless container roundtrip (static + animated); foreign-stream
features our encoder never emits (interlace, transparency, disposal 2,
local color tables), hand-assembled byte by byte; refusals."""

import struct

import numpy as np
import pytest

from assemblagedb_spark.functions.gif import (
    _block_split,
    gif_decode,
    gif_encode,
    lzw_decode,
    lzw_encode,
)


# ---------------------------------------------------------------------------
# LZW layer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "min_code,n",
    [(2, 40), (8, 300), (8, 3000), (8, 20000), (4, 9000)],
)
def test_lzw_roundtrip_across_width_boundaries(min_code, n):
    # 20000 random 8-bit symbols grow the dictionary past 4096 and force
    # a CLEAR + full width reset; the smaller cases cross 512/1024/2048
    rng = np.random.RandomState(min_code * 1000 + n)
    seq = rng.randint(0, 1 << min_code, size=n).tolist()
    assert lzw_decode(lzw_encode(seq, min_code), min_code, n) == seq


def test_lzw_repetitive_kwkwk_and_deep_dictionary():
    seq = [5] * 4000 + [1, 2, 3] * 2000 + [7] * 1000
    assert lzw_decode(lzw_encode(seq, 8), 8, len(seq)) == seq


def test_lzw_truncated_stream_raises():
    enc = lzw_encode(list(range(100)), 8)
    with pytest.raises(ValueError, match="ended at"):
        lzw_decode(enc[: len(enc) // 2], 8, 100)


# ---------------------------------------------------------------------------
# container roundtrip (our own streams are lossless for grayscale)
# ---------------------------------------------------------------------------


def test_static_roundtrip_exact():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(11, 17), dtype=np.uint8)
    frames, w, h, t = gif_decode(gif_encode(img))
    assert (w, h, t) == (17, 11, 1)
    assert (frames[0] == img[:, :, None]).all()


def test_animated_roundtrip_exact():
    rng = np.random.RandomState(2)
    anim = rng.randint(0, 256, size=(4, 9, 13), dtype=np.uint8)
    frames, w, h, t = gif_decode(gif_encode(anim))
    assert (w, h, t) == (13, 9, 4)
    for i in range(4):
        assert (frames[i] == anim[i][:, :, None]).all()


def test_header_parser_agrees_with_full_decode():
    from assemblagedb_spark.operators.multimodal import decode_image

    img = np.full((7, 21), 9, dtype=np.uint8)
    payload = gif_encode(img)
    w, h, c = decode_image(payload)
    frames, fw, fh, _ = gif_decode(payload)
    assert (w, h) == (fw, fh) == (21, 7)


# ---------------------------------------------------------------------------
# foreign-stream features, hand-assembled
# ---------------------------------------------------------------------------


def _screen(w, h, gct_gray=True, bg=0):
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7 if gct_gray else 0x77, bg, 0)
    if gct_gray:
        for v in range(256):
            out += bytes((v, v, v))
    return out


def _image_block(img, left=0, top=0, interlace=False, lct=None):
    h, w = img.shape
    flags = 0x40 if interlace else 0
    out = bytearray(b"\x2c")
    if lct is not None:
        bits = max(0, (len(lct) - 1).bit_length() - 1)
        flags |= 0x80 | bits
        out += struct.pack("<HHHHB", left, top, w, h, flags)
        for r, g, b in lct + [(0, 0, 0)] * ((2 << bits) - len(lct)):
            out += bytes((r, g, b))
    else:
        out += struct.pack("<HHHHB", left, top, w, h, flags)
    rows = img
    if interlace:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        rows = img[order]  # stream carries rows in pass order
    out.append(8)
    out += _block_split(lzw_encode(rows.ravel(), 8))
    return out


def _gce(disposal=0, transparent=None, delay=0):
    packed = (disposal << 2) | (1 if transparent is not None else 0)
    return b"\x21\xf9" + _block_split(
        struct.pack("<BHB", packed, delay, transparent or 0)
    )


def test_interlaced_stream_deinterlaces():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(16, 5), dtype=np.uint8)
    payload = bytes(_screen(5, 16) + _image_block(img, interlace=True) + b"\x3b")
    frames, _, _, t = gif_decode(payload)
    assert t == 1
    assert (frames[0] == img[:, :, None]).all()


def test_transparency_composites_over_previous_frame():
    base = np.full((4, 4), 200, dtype=np.uint8)
    overlay = np.full((4, 4), 30, dtype=np.uint8)
    overlay[0, :] = 99  # index 99 declared transparent
    payload = bytes(
        _screen(4, 4)
        + _gce()
        + _image_block(base)
        + _gce(transparent=99)
        + _image_block(overlay)
        + b"\x3b"
    )
    frames, _, _, t = gif_decode(payload)
    assert t == 2
    assert (frames[1][0, :] == 200).all()  # transparent row shows frame 1
    assert (frames[1][1:] == 30).all()


def test_disposal_2_restores_background_rect():
    # frame 1 draws a 2x2 patch at (1,1) with disposal 2; frame 2 draws
    # elsewhere — the patch must be back to the background color
    patch = np.full((2, 2), 50, dtype=np.uint8)
    other = np.full((1, 1), 70, dtype=np.uint8)
    payload = bytes(
        _screen(4, 4, bg=255)
        + _gce(disposal=2)
        + _image_block(patch, left=1, top=1)
        + _gce()
        + _image_block(other)
        + b"\x3b"
    )
    frames, _, _, t = gif_decode(payload)
    assert t == 2
    assert (frames[0][1:3, 1:3] == 50).all()
    assert (frames[0][0, 0] == 255).all()  # background is the bg index color
    assert (frames[1][1:3, 1:3] == 255).all()  # restored
    assert (frames[1][0, 0] == 70).all()


def test_local_color_table_overrides_global():
    img = np.zeros((2, 2), dtype=np.uint8)  # index 0 everywhere
    lct = [(255, 0, 0)] + [(0, 0, 0)] * 1  # 2-entry local table: red
    payload = bytes(_screen(2, 2) + _image_block(img, lct=lct) + b"\x3b")
    frames, _, _, _ = gif_decode(payload)
    assert (frames[0] == np.array([255, 0, 0], dtype=np.uint8)).all()


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"\x89PNG\r\n\x1a\n", "not a GIF"),
        (
            bytes(_screen(2, 2) + _gce(disposal=3)
                  + _image_block(np.zeros((2, 2), dtype=np.uint8)) + b"\x3b"),
            "disposal method 3",
        ),
        (
            bytes(_screen(2, 2, gct_gray=False)
                  + _image_block(np.zeros((2, 2), dtype=np.uint8)) + b"\x3b"),
            "without any color table",
        ),
        (bytes(_screen(2, 2)) + b"\x3b", "zero image blocks"),
    ],
)
def test_refusals(payload, msg):
    with pytest.raises(ValueError, match=msg):
        gif_decode(payload)


def test_gce_scope_is_one_image_block():
    # GIF89a: a GCE applies to exactly the NEXT image; frame 2 has no
    # GCE so it must render opaque and leave the canvas in place even
    # though frame 1's GCE declared transparency and disposal 2
    f1 = np.full((3, 3), 40, dtype=np.uint8)
    f2 = np.full((3, 3), 99, dtype=np.uint8)  # 99 was transparent in f1's GCE
    f3 = np.full((3, 3), 70, dtype=np.uint8)
    payload = bytes(
        _screen(3, 3, bg=255)
        + _gce(disposal=2, transparent=99)
        + _image_block(f1)
        + _image_block(f2)  # no GCE of its own
        + _image_block(f3)
        + b"\x3b"
    )
    frames, _, _, t = gif_decode(payload)
    assert t == 3
    assert (frames[1] == 99).all()  # fully opaque, not transparent
    assert (frames[2] == 70).all()  # disposal 0 inherited, not 2


def test_truncated_streams_raise_value_error():
    # the Arrow kernels catch ValueError only; struct.error/IndexError
    # escaping would kill the Spark task
    for payload in [
        b"GIF89a\x01\x00",                      # truncated screen descriptor
        b"GIF89a",                               # header only
        bytes(_screen(2, 2)) + b"\x21",          # extension introducer, no label
    ]:
        with pytest.raises(ValueError):
            gif_decode(payload)


def test_frame_rect_past_logical_screen_is_clipped():
    # Real-world GIFs sometimes declare an image rect extending past the
    # logical screen; renderers clip. A 4x4 frame at (2,2) on a 4x4 screen
    # must composite its top-left 2x2 into the canvas corner, not raise.
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    payload = bytes(
        _screen(4, 4, bg=255) + _image_block(img, left=2, top=2) + b"\x3b"
    )
    frames, w, h, t = gif_decode(payload)
    assert (w, h, t) == (4, 4, 1)
    assert (frames[0][2:, 2:, 0] == img[:2, :2]).all()
    assert (frames[0][:2, :, 0] == 255).all()  # untouched background


def test_frame_rect_fully_outside_screen_is_a_noop_frame():
    img = np.full((2, 2), 7, dtype=np.uint8)
    payload = bytes(
        _screen(3, 3, bg=255) + _image_block(img, left=5, top=5) + b"\x3b"
    )
    frames, _, _, t = gif_decode(payload)
    assert t == 1
    assert (frames[0] == 255).all()
