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


# ---------------------------------------------------------------------------
# Baseline JPEG (functions/jpeg.py) — the last entropy-coded image format
# ---------------------------------------------------------------------------


def test_jpeg_dc_quantization_matches_integer_formula_exhaustively():
    """Every gray value 0..255 as a constant block: the float fDCT +
    guarded rounding must reproduce decoded = clamp(2*half_away((v-128)/2)
    + 128) — the exact formula the q164 DuckDB oracle replays."""
    import numpy as np

    from warcraider_spark.functions.jpeg import decode_jpeg_pixels, encode_jpeg_pixels

    for v in range(256):
        px = np.full((8, 8), v, dtype=float)
        dec = decode_jpeg_pixels(encode_jpeg_pixels(px))
        d = v - 128
        s = (abs(d) + 1) // 2 * (1 if d >= 0 else -1)
        expect = min(max(2 * s + 128, 0), 255)
        assert (dec == expect).all(), (v, int(dec[0, 0]), expect)


def test_jpeg_analytic_images_roundtrip():
    from warcraider_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        jpeg_block_value,
        jpeg_dims,
    )

    for doc_id in (0, 7, 42, 53, 119):
        payload = encode_jpeg_gray(doc_id)
        assert payload[:3] == b"\xff\xd8\xff" and payload[-2:] == b"\xff\xd9"
        st = decode_jpeg_gray(payload)
        w, h = jpeg_dims(doc_id)
        assert (st["width"], st["height"]) == (w, h)
        exp = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                d = jpeg_block_value(doc_id, bx, by) - 128
                s = (abs(d) + 1) // 2 * (1 if d >= 0 else -1)
                exp += 64 * min(max(2 * s + 128, 0), 255)
        assert st["pixel_sum"] == exp, doc_id


def test_jpeg_general_content_ac_paths():
    """Random blocks with a unit quant table exercise the full AC pipeline
    (run lengths, ZRL, EOB, magnitude categories, byte stuffing): the
    round-trip error is bounded by DCT float rounding only."""
    import numpy as np

    from warcraider_spark.functions.jpeg import decode_jpeg_pixels, encode_jpeg_pixels

    rng = np.random.RandomState(7)
    for _ in range(10):
        px = rng.randint(0, 256, size=(16, 24)).astype(float)
        dec = decode_jpeg_pixels(encode_jpeg_pixels(px, qtable=[1] * 64))
        assert np.abs(dec - px).max() <= 2


def test_jpeg_decoder_rejects_corruption():
    import pytest as _pytest

    from warcraider_spark.functions.jpeg import decode_jpeg_pixels, encode_jpeg_gray

    good = encode_jpeg_gray(3)
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"\x00\x01" + good[2:])
    # progressive SOF2 must be refused, not mis-decoded
    bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg_pixels(bad)
