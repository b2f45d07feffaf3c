"""Unit tests for the dependency-free PPM/WAV codecs (q113's real
encode/decode pair): round-trip values, header validation, and
malformed-input rejection — spark-free, so failures localize."""

from __future__ import annotations

import pytest

from warcraider_spark.operators.multimodal import (
    SAMPLE_RATE,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
)


def test_ppm_roundtrip():
    b = encode_ppm(37)
    meta = decode_ppm(b)
    assert (meta["width"], meta["height"]) == (37 % 64 + 8, 37 % 48 + 8)
    assert meta["maxval"] == 255
    assert meta["n_units"] == meta["width"] * meta["height"]
    assert meta["mean_val"] == 37 % 256


def test_wav_roundtrip():
    b = encode_wav(123, 4567)
    meta = decode_wav(b)
    assert meta["n_units"] == 4567 % 2000 + 100
    assert meta["sample_rate"] == SAMPLE_RATE
    assert meta["n_channels"] == 1
    assert meta["mean_val"] == pytest.approx(123 % 1000 * 16)  # RMS of a constant


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"GIF89a....")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 5)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"\x00" * 64)
    # valid RIFF wrapper but non-PCM format code
    import struct

    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36, b"WAVE", b"fmt ", 16, 3, 1, 8000, 16000, 2, 16, b"data", 0,
    )
    with pytest.raises(ValueError, match="not PCM"):
        decode_wav(hdr)


def test_png_roundtrip_exact_pixels():
    """Encoder/decoder agree byte-exactly and every one of the five PNG
    scanline filter types is exercised (encoder cycles them per row)."""
    from warcraider_spark.operators.multimodal import (
        _img_dims,
        _png_pixel,
        decode_png,
        encode_png,
    )

    for doc_id in (0, 13, 100, 255):
        meta = decode_png(encode_png(doc_id))
        w, h = _img_dims(doc_id)
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["filters_seen"] == "0,1,2,3,4"
        expect = sum(
            _png_pixel(doc_id, x, y, c)
            for x in range(w)
            for y in range(h)
            for c in range(3)
        )
        assert meta["pixel_sum"] == expect


def test_png_rejects_corruption():
    from warcraider_spark.operators.multimodal import decode_png, encode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF....")
    blob = bytearray(encode_png(42))
    blob[20] ^= 0x01  # flip a bit inside IHDR data → CRC must catch it
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(blob))


def test_wav_square_fft_dominant_bin():
    """numpy FFT finds the analytic fundamental for the whole-period
    square wave, for a spread of periods and lengths."""
    from warcraider_spark.operators.multimodal import (
        _n_samples,
        analyze_wav_spectrum,
        encode_wav_square,
    )

    for doc_id, n_chars in ((0, 100), (13, 999), (77, 1500), (299, 2098)):
        meta = analyze_wav_spectrum(encode_wav_square(doc_id, n_chars))
        period = 2 * (doc_id % 40 + 2)
        n = _n_samples(n_chars)
        n_fft = period * (n // period)
        amp = doc_id % 900 * 16 + 16
        assert meta["n_samples"] == n_fft
        assert meta["dominant_bin"] == n_fft // period, (doc_id, meta)
        assert meta["energy"] == n_fft * amp * amp


def test_ppm_stream_parser_rejects_bad_frame():
    from warcraider_spark.operators.multimodal import (
        encode_ppm_stream,
        sample_ppm_stream,
    )

    stream = encode_ppm_stream(5)
    meta = sample_ppm_stream(stream)
    assert meta["n_frames"] == 5 % 12 + 3
    # corrupt the second frame's magic
    second = stream.index(b"P6", 2)
    bad = stream[:second] + b"XX" + stream[second + 2 :]
    with pytest.raises(ValueError, match="bad frame magic"):
        sample_ppm_stream(bad)
