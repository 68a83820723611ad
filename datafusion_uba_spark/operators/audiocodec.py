"""Dependency-free WAV (RIFF PCM) audio codec.

Completes the multimodal codec family (operators.imagecodec's BMP/PPM,
r10) with the audio leg: the container ships no torchaudio/soundfile,
but canonical 16-bit PCM WAV is simple enough to encode/decode exactly
with struct + numpy alone — real RIFF chunk structure, real fmt
fields, real interleaved little-endian samples. It slots into the same
Arrow ``mapInPandas`` plumbing in operators.multimodal. Reference
parity: the reference has no multimodal surface at all — this family
is part of the training-data-pipeline extension the brief asks for
beyond reference coverage.

Format notes (public spec — Microsoft/IBM RIFF WAVE, 1991):
- File = ``RIFF`` chunk: b"RIFF" + <u32 riff_size = filesize-8> +
  b"WAVE", then a sequence of sub-chunks, each b"<4-byte id>" +
  <u32 size> + payload (+ 1 pad byte if size is odd — RIFF word
  alignment).
- ``fmt `` sub-chunk (PCM): u16 audio_format=1, u16 n_channels,
  u32 sample_rate, u32 byte_rate = rate*block_align, u16 block_align
  = n_channels*bits/8, u16 bits_per_sample. Decoders must SKIP
  unknown chunks (LIST, fact, cue ...) rather than assume data
  follows fmt immediately.
- ``data`` sub-chunk: interleaved frames, little-endian signed 16-bit
  for bits=16.
"""

from __future__ import annotations

import struct

import numpy as np


def _check_samples(samples: np.ndarray) -> np.ndarray:
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(
            f"expected (n,) or (n, channels) samples, got shape {arr.shape}"
        )
    if arr.dtype != np.int16:
        info = np.iinfo(np.int16)
        if arr.min(initial=0) < info.min or arr.max(initial=0) > info.max:
            raise ValueError("samples out of int16 range")
        arr = arr.astype(np.int16)
    return np.ascontiguousarray(arr)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as a canonical
    16-bit PCM WAV file (RIFF + fmt + data)."""
    arr = _check_samples(samples)
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    n, ch = arr.shape
    block_align = ch * 2
    data = arr.tobytes()  # C-order = interleaved frames, LE on all
    # platforms numpy supports here (int16 is '<i2' by construction)
    if arr.dtype.byteorder == ">":  # pragma: no cover - defensive
        data = arr.byteswap().tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data) + len(data) % 2)
    out = bytearray()
    out += struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE")
    out += struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
    out += struct.pack("<4sI", b"data", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        out += b"\x00"
    return bytes(out)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM WAV file to (sample_rate, (n, channels)
    int16 array). Walks the RIFF chunk sequence, skipping unknown
    chunks (with odd-size padding), so files carrying LIST/fact/cue
    chunks decode correctly."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            if fmt is not None:
                break  # canonical order; anything after data is ignored
        pos += 8 + size + size % 2  # odd sizes carry a pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit PCM supported (format={audio_format}, bits={bits})"
        )
    if ch < 1 or block_align != ch * 2:
        raise ValueError(f"inconsistent fmt: channels={ch}, align={block_align}")
    n = len(data) // block_align
    arr = np.frombuffer(
        data[: n * block_align], dtype="<i2"
    ).reshape(n, ch)
    return rate, arr.astype(np.int16)
