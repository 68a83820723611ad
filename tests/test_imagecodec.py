"""Exact-fidelity pins for the dependency-free BMP/PPM codecs.

These unit tests carry the parts of codec correctness the distributed
oracle row (image_decode_stats) cannot see: the synthetic corpus is
row-invariant, so BMP's bottom-up flip and per-row layouts are pinned
HERE with arbitrary (y-varying) arrays and hand-built reference bytes.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datafusion_uba_spark.operators import imagecodec as ic


def _arr(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (7, 4), (16, 33), (5, 64)])
def test_bmp_roundtrip_exact(h, w):
    a = _arr(h, w, seed=h * 100 + w)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(a)), a)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 33)])
def test_ppm_roundtrip_exact(h, w):
    a = _arr(h, w, seed=h * 100 + w)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(a)), a)


def test_bmp_layout_bottom_up_bgr_padded():
    # 2x1 image: encode by hand and compare byte-for-byte. Top row red,
    # bottom row blue. BMP stores BOTTOM-UP and BGR with rows padded to
    # 4 bytes (1 px * 3 B -> stride 4).
    a = np.array([[[255, 0, 0]], [[0, 0, 255]]], dtype=np.uint8)
    data = ic.encode_bmp(a)
    offset = struct.unpack_from("<I", data, 10)[0]
    assert offset == 54
    rows = data[offset:]
    assert len(rows) == 8  # 2 rows * stride 4
    assert rows[0:4] == bytes([255, 0, 0, 0])  # bottom row first: blue, BGR
    assert rows[4:8] == bytes([0, 0, 255, 0])  # then top row: red, BGR
    assert np.array_equal(ic.decode_bmp(data), a)


def test_bmp_top_down_negative_height():
    # decoder must honor biHeight < 0 = top-down row order
    a = _arr(4, 3, seed=9)
    data = bytearray(ic.encode_bmp(a))
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    offset = struct.unpack_from("<I", data, 10)[0]
    stride = (3 * 3 + 3) & ~3
    body = np.frombuffer(bytes(data[offset:]), dtype=np.uint8).reshape(4, stride)
    flipped = body[::-1].tobytes()
    top_down = bytes(data[:offset]) + flipped
    assert np.array_equal(ic.decode_bmp(top_down), a)


def test_ppm_header_comments_and_whitespace():
    a = _arr(2, 3, seed=1)
    raw = ic.encode_ppm(a)
    body = raw.split(b"\n", 3)[3]
    commented = b"P6\n# a comment\n 3   2\n# another\n255\n" + body
    assert np.array_equal(ic.decode_ppm(commented), a)


def test_decode_image_sniffs_codec():
    a = _arr(3, 3, seed=2)
    c1, d1 = ic.decode_image(ic.encode_bmp(a))
    c2, d2 = ic.decode_image(ic.encode_ppm(a))
    assert (c1, c2) == ("bmp", "ppm")
    assert np.array_equal(d1, a) and np.array_equal(d2, a)


def test_reject_malformed():
    a = _arr(2, 2)
    bmp, ppm = ic.encode_bmp(a), ic.encode_ppm(a)
    with pytest.raises(ValueError, match="magic"):
        ic.decode_image(b"GIF89a....")
    with pytest.raises(ValueError, match="truncated"):
        ic.decode_bmp(bmp[:-3])
    with pytest.raises(ValueError, match="truncated"):
        ic.decode_ppm(ppm[:-3])
    # 8-bit palette BMPs and 16-bit PPMs are out of scope: loud errors
    crooked = bytearray(bmp)
    struct.pack_into("<H", crooked, 28, 8)
    with pytest.raises(ValueError, match="unsupported"):
        ic.decode_bmp(bytes(crooked))
    with pytest.raises(ValueError, match="maxval"):
        ic.decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))


def test_synth_generator_matches_closed_form():
    # the distributed oracle replays this formula; pin it here too
    from datafusion_uba_spark.operators.multimodal import (
        IMG_H_BASE,
        IMG_H_MOD,
        IMG_W_BASE,
        IMG_W_MOD,
        _synth_rgb,
    )

    for did in (0, 1, 7, 96, 97, 500):
        a = _synth_rgb(did)
        w, h = IMG_W_BASE + did % IMG_W_MOD, IMG_H_BASE + did % IMG_H_MOD
        assert a.shape == (h, w, 3)
        for x in (0, w - 1):
            for c in range(3):
                assert a[0, x, c] == (did * 7 + 13 * x + 11 * c) % 256
        # row-invariant by construction
        assert np.array_equal(a[0], a[h - 1])


def test_resize_nearest_integer_map():
    # 4x4 -> 2x2 with max_side=2: src index = dst*4//2 = {0, 2}
    a = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = ic.resize_nearest(a, 2)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, a[[0, 2]][:, [0, 2]])


def test_resize_nearest_aspect_and_no_upscale():
    a = _arr(10, 40, seed=3)
    out = ic.resize_nearest(a, 20)
    # long side 40 -> 20, short side 10*20//40 = 5
    assert out.shape == (5, 20, 3)
    small = _arr(4, 6, seed=4)
    assert ic.resize_nearest(small, 32) is small or np.array_equal(
        ic.resize_nearest(small, 32), small
    )
    with pytest.raises(ValueError, match="positive"):
        ic.resize_nearest(a, 0)


def test_resize_nearest_min_one_pixel():
    a = _arr(1, 100, seed=5)
    out = ic.resize_nearest(a, 10)
    # h = 1*10//100 = 0 -> clamped to 1
    assert out.shape == (1, 10, 3)


def test_resize_then_reencode_roundtrip():
    a = _arr(33, 47, seed=6)
    out = ic.resize_nearest(a, 16)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(out)), out)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(out)), out)


def test_ppm_stream_roundtrip_mixed_sizes():
    frames = [_arr(2, 3, seed=1), _arr(4, 2, seed=2), _arr(1, 5, seed=3)]
    out = ic.decode_ppm_stream(ic.encode_ppm_stream(frames))
    assert len(out) == 3
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_ppm_stream_rejects_malformed():
    frames = [_arr(2, 2, seed=4)]
    raw = ic.encode_ppm_stream(frames)
    with pytest.raises(ValueError, match="truncated"):
        ic.decode_ppm_stream(raw[:-2])
    with pytest.raises(ValueError, match="magic"):
        ic.decode_ppm_stream(raw + b"XX" + raw)
    with pytest.raises(ValueError, match="empty"):
        ic.decode_ppm_stream(b"")
