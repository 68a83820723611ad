"""WAV/RIFF-PCM codec unit pins + the audio decode pipeline."""

import numpy as np
import pytest

from datafusion_uba_spark.operators import audiocodec, multimodal


def test_wav_roundtrip_exact_mono_and_stereo():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 4):
        samples = rng.integers(-32768, 32767, size=(321, ch), dtype=np.int16)
        payload = audiocodec.encode_wav(samples, 16000)
        rate, back = audiocodec.decode_wav(payload)
        assert rate == 16000
        assert back.dtype == np.int16 and back.shape == (321, ch)
        assert np.array_equal(back, samples)
    # 1-D input becomes (n, 1)
    flat = rng.integers(-100, 100, size=17, dtype=np.int16)
    rate, back = audiocodec.decode_wav(audiocodec.encode_wav(flat, 8000))
    assert back.shape == (17, 1) and np.array_equal(back[:, 0], flat)


def test_wav_header_bytes_are_canonical():
    """Pin the exact RIFF layout so any independent WAV reader accepts
    the output: magic, chunk ids, fmt fields, sizes."""
    samples = np.arange(4, dtype=np.int16).reshape(2, 2)
    p = audiocodec.encode_wav(samples, 8000)
    assert p[0:4] == b"RIFF" and p[8:12] == b"WAVE"
    assert p[12:16] == b"fmt "
    import struct

    fmt_size = struct.unpack_from("<I", p, 16)[0]
    assert fmt_size == 16
    audio_format, ch, rate, byte_rate, align, bits = struct.unpack_from(
        "<HHIIHH", p, 20
    )
    assert (audio_format, ch, rate, bits) == (1, 2, 8000, 16)
    assert align == 4 and byte_rate == 8000 * 4
    assert p[36:40] == b"data"
    assert struct.unpack_from("<I", p, 40)[0] == 8  # 2 frames * 2ch * 2B
    # riff_size covers everything after the first 8 bytes
    assert struct.unpack_from("<I", p, 4)[0] == len(p) - 8


def test_wav_decode_skips_unknown_chunks_and_odd_padding():
    """A LIST chunk (odd size, so with a pad byte) between fmt and data
    must be skipped — decoders that assume data follows fmt break on
    real-world files."""
    import struct

    samples = np.array([[-5], [7], [2048]], dtype=np.int16)
    canonical = audiocodec.encode_wav(samples, 24000)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    info = b"INFOx"  # 5 bytes: odd, needs a pad byte
    extra = struct.pack("<4sI", b"LIST", len(info)) + info + b"\x00"
    body = fmt_chunk + extra + data_chunk
    hacked = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    rate, back = audiocodec.decode_wav(hacked)
    assert rate == 24000 and np.array_equal(back, samples)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        audiocodec.decode_wav(b"not a wav at all")
    # non-PCM format code refused
    samples = np.zeros((4, 1), dtype=np.int16)
    p = bytearray(audiocodec.encode_wav(samples, 8000))
    p[20] = 3  # IEEE float format code
    with pytest.raises(ValueError, match="16-bit PCM"):
        audiocodec.decode_wav(bytes(p))
    # truncated data chunk
    with pytest.raises(ValueError, match="truncated"):
        audiocodec.decode_wav(audiocodec.encode_wav(samples, 8000)[:-3])


def test_encode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="sample_rate"):
        audiocodec.encode_wav(np.zeros((2, 1), dtype=np.int16), 0)
    with pytest.raises(ValueError, match="int16 range"):
        audiocodec.encode_wav(np.array([40000]), 8000)
    with pytest.raises(ValueError, match="shape"):
        audiocodec.encode_wav(np.zeros((2, 2, 2), dtype=np.int16), 8000)


def test_audio_decode_stats_closed_form(spark):
    """End-to-end: synth → WAV encode → chunk-walk decode → stats match
    a direct numpy replay of the generator."""
    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    got = {
        r["doc_id"]: r.asDict()
        for r in multimodal.audio_decode_roundtrip(df).collect()
    }
    for did in range(6):
        arr = multimodal._synth_audio_samples(did).astype(np.int64)
        rate = multimodal.AUDIO_RATES[did % len(multimodal.AUDIO_RATES)]
        row = got[did]
        assert row["sample_rate"] == rate
        assert row["n_channels"] == arr.shape[1]
        assert row["n_samples"] == arr.shape[0]
        assert row["duration_us"] == arr.shape[0] * 1_000_000 // rate
        assert row["sum_ch0"] == arr[:, 0].sum()
        assert row["sum_all"] == arr.sum()
        assert row["abs_sum_all"] == np.abs(arr).sum()
