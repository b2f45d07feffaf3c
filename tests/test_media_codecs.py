"""Unit tests for the dependency-free PPM/WAV codecs (q171's real
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
    + 128) — the exact formula the q034 DuckDB oracle replays."""
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
    # a baseline scan mislabeled SOF2 is ill-formed (progressive DC
    # scans require Se=0, G.1.1.1), not silently mis-decoded
    bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError, match="progressive"):
        decode_jpeg_pixels(bad)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF (functions/mp4.py — q035's real mux/demux pair)
# ---------------------------------------------------------------------------


def _mk_frames(doc_id: int, n: int):
    from warcraider_spark.functions.jpeg import encode_jpeg_gray, jpeg_dims

    w, h = jpeg_dims(doc_id)
    return [encode_jpeg_gray(doc_id + 12 * f) for f in range(n)], w, h


def test_mp4_roundtrip_single_chunk():
    from warcraider_spark.functions.mp4 import demux_mp4, mux_mjpeg_mp4

    frames, w, h = _mk_frames(7, 4)
    info = demux_mp4(mux_mjpeg_mp4(frames, w, h, delta_ms=40))
    assert info["brand"] == "isom"
    assert info["handler"] == "vide"
    assert info["codec"] == "jpeg"
    assert (info["width"], info["height"]) == (w, h)
    assert info["timescale"] == 1000 and info["duration"] == 4 * 40
    assert info["sample_deltas"] == [40] * 4
    assert info["samples"] == frames  # byte-exact sample extraction


def test_mp4_multi_chunk_stsc_resolution():
    """samples_per_chunk=2 with an odd frame count forces two stsc runs
    and a short final chunk — the general §8.7.4 resolution path."""
    from warcraider_spark.functions.mp4 import demux_mp4, mux_mjpeg_mp4

    frames, w, h = _mk_frames(13, 5)
    payload = mux_mjpeg_mp4(frames, w, h, delta_ms=33, samples_per_chunk=2)
    info = demux_mp4(payload)
    assert info["n_samples"] == 5
    assert info["samples"] == frames
    assert info["duration"] == 5 * 33


def test_mp4_largesize_and_to_eof_boxes():
    """Demuxer handles 64-bit largesize and size==0 (extends to EOF)."""
    import struct

    from warcraider_spark.functions.mp4 import demux_mp4, mux_mjpeg_mp4

    frames, w, h = _mk_frames(2, 2)
    payload = mux_mjpeg_mp4(frames, w, h)
    # rewrite ftyp with a 64-bit largesize header (shifts mdat by 8 — so
    # patch stco too: single chunk, offset field at a known layout)
    ftyp_size = struct.unpack(">I", payload[0:4])[0]
    ftyp = payload[:ftyp_size]
    rest = payload[ftyp_size:]
    big_ftyp = struct.pack(">I", 1) + b"ftyp" + struct.pack(">Q", 8 + len(ftyp)) + ftyp[8:]
    shifted = big_ftyp + rest
    # fix the single stco offset (+8)
    co = shifted.rfind(b"stco")
    (old_off,) = struct.unpack(">I", shifted[co + 12 : co + 16])
    shifted = shifted[: co + 12] + struct.pack(">I", old_off + 8) + shifted[co + 16 :]
    info = demux_mp4(shifted)
    assert info["samples"] == frames
    # size==0 moov: moov is the last top-level box, so "to EOF" is legal
    moov_at = payload.rfind(b"moov") - 4
    zeroed = payload[:moov_at] + struct.pack(">I", 0) + payload[moov_at + 4 :]
    assert demux_mp4(zeroed)["samples"] == frames


def test_mp4_frame_stats_integer_exact():
    from warcraider_spark.functions.mp4 import mp4_frame_stats, mux_mjpeg_mp4

    d, nf = 9, 3
    frames, w, h = _mk_frames(d, nf)
    stats = mp4_frame_stats(mux_mjpeg_mp4(frames, w, h, delta_ms=40))

    def dec(v):
        dd = v - 128
        s = (abs(dd) + 1) // 2 * (1 if dd >= 0 else -1)
        return min(max(2 * s + 128, 0), 255)

    wb, hb = w // 8, h // 8
    exp = sum(
        64 * dec((d + 12 * f + 5 * bx + 11 * by) % 256)
        for f in range(nf)
        for bx in range(wb)
        for by in range(hb)
    )
    assert stats["pixel_sum"] == exp
    assert stats["n_frames"] == nf and stats["duration_ms"] == nf * 40


def test_mp4_rejects_corruption():
    import pytest as _pytest

    from warcraider_spark.functions.mp4 import demux_mp4, mux_mjpeg_mp4

    frames, w, h = _mk_frames(1, 2)
    payload = mux_mjpeg_mp4(frames, w, h)
    with _pytest.raises(ValueError, match="no moov"):
        demux_mp4(payload[: payload.rfind(b"moov") - 4])
    with _pytest.raises(ValueError, match="corrupt box"):
        demux_mp4(b"\x00\x00\x00\x03xxxx")


def test_decode_media_sniffs_and_dispatches_real_codecs():
    """q033's modality-generic path: magic-byte sniffing routes to the
    real JPEG/WAV/MP4 decoders; features come from the bitstream."""
    from warcraider_spark.functions.jpeg import encode_jpeg_gray, jpeg_dims
    from warcraider_spark.functions.mp4 import mux_mjpeg_mp4
    from warcraider_spark.operators.multimodal import decode_media

    # JPEG: dims from the SOF header, mean from the decoded plane
    d = 9
    m = decode_media(encode_jpeg_gray(d))
    w, h = jpeg_dims(d)
    assert m["detected"] == "jpeg"
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, 1)
    assert m["n_units"] == w * h and m["content_milli"] is not None

    # WAV: sample count from the data chunk, RMS of a constant = amp
    m = decode_media(encode_wav(123, 4567))
    assert m["detected"] == "wav"
    assert m["n_units"] == 4567 % 2000 + 100
    assert m["content_milli"] == 123 * 16 * 1000

    # MP4: frame count from the stsz sample table, dims from stsd
    d = 14
    w, h = jpeg_dims(d)
    frames = [encode_jpeg_gray(d + 12 * f) for f in range(3)]
    m = decode_media(mux_mjpeg_mp4(frames, w, h))
    assert m["detected"] == "mp4"
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, 3)
    assert m["n_units"] == 3 * w * h

    # unknown magic → honest opaque fallback (byte stats only)
    m = decode_media(b"\x00\x01\x02 not a known container")
    assert m["detected"] == "opaque"
    assert m["n_units"] == 25 and m["content_milli"] is None


def test_progressive_equals_baseline_exhaustive():
    """The 4-scan progression transmits every bit of every quantized
    coefficient, so progressive decode must EQUAL baseline decode —
    checked on content exercising every progressive path: long EOBRUNs
    (flat images), mid-scan EOBRUN flush, ZRL in first and refinement
    scans, heavy refinement traffic, and random planes."""
    import numpy as np

    from warcraider_spark.functions.jpeg import (
        QTABLE,
        count_jpeg_scans,
        decode_jpeg_pixels,
        encode_jpeg_pixels,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(0xBEEF)
    cases = [
        np.full((80, 80), 137),                      # EOBRUN over 100 blocks
        np.full((48, 48), 128),                      # + sparse spikes below
        (np.arange(64)[None, :] * 2 + np.arange(64)[:, None]) % 256,
    ]
    cases[1][::7, ::5] = 255
    busy = np.full((64, 64), 90)
    busy[24:32, 24:32] = rng.randint(0, 256, size=(8, 8))
    cases.append(busy)
    for _ in range(25):
        hh, ww = rng.randint(1, 6) * 8, rng.randint(1, 6) * 8
        cases.append(rng.randint(0, 256, size=(hh, ww)))
    for px in cases:
        prog_bytes = encode_jpeg_progressive(px, QTABLE)
        assert count_jpeg_scans(prog_bytes) == 4
        base = decode_jpeg_pixels(encode_jpeg_pixels(px, QTABLE))
        prog = decode_jpeg_pixels(prog_bytes)
        assert (base == prog).all()
    # lossless path (unit quant) reproduces input bits exactly
    px = rng.randint(0, 256, size=(16, 24))
    unit = [1] * 64
    prog = decode_jpeg_pixels(encode_jpeg_progressive(px, unit))
    base = decode_jpeg_pixels(encode_jpeg_pixels(px, unit))
    assert (prog == base).all()


def test_progressive_rejects_malformed():
    import numpy as np
    import pytest

    from warcraider_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg_progressive,
    )

    good = encode_jpeg_progressive(np.full((16, 16), 100))
    with pytest.raises(ValueError):
        decode_jpeg_pixels(good[:40])  # truncated before any scan
    bad = bytearray(good)
    bad[3] = 0x00  # turn APP0 into an invalid 0xFF00 marker sequence
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(bad))


def test_restart_markers_and_parallel_segment_decode():
    """DRI/RSTn: monolithic decode of a restart stream equals the
    no-restart decode, and independent per-segment decode reassembles to
    the identical plane — the parallel-decode correctness contract."""
    import numpy as np

    from warcraider_spark.functions.jpeg import (
        QTABLE,
        decode_jpeg_pixels,
        decode_jpeg_segment,
        encode_jpeg_pixels,
        split_jpeg_restart_segments,
    )

    rng = np.random.RandomState(11)
    for shape, dri in [((64, 96), 16), ((40, 40), 7), ((16, 16), 4)]:
        px = rng.randint(0, 256, size=shape)
        pay = encode_jpeg_pixels(px, QTABLE, restart_interval=dri)
        mono = decode_jpeg_pixels(pay)
        assert (mono == decode_jpeg_pixels(encode_jpeg_pixels(px, QTABLE))).all()
        info = split_jpeg_restart_segments(pay)
        assert info["restart_interval"] == dri
        wb = info["width"] // 8
        out = np.zeros((info["height"], info["width"]), dtype=np.int64)
        for first, n, s, e in info["segments"]:
            blocks = decode_jpeg_segment(info["header"], pay[s:e], n)
            for j in range(n):
                by, bx = divmod(first + j, wb)
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blocks[j]
        assert (out == mono).all()
    # a stream without DRI refuses to split
    import pytest

    plain = encode_jpeg_pixels(rng.randint(0, 256, size=(16, 16)), QTABLE)
    with pytest.raises(ValueError, match="DRI"):
        split_jpeg_restart_segments(plain)


def test_png_pixel_decode_and_box_pyramid():
    """decode_png_pixels returns the exact analytic pixel grid, its sum
    agrees with decode_png, and the 2x2 box-filter halving matches the
    per-pixel floor formula the q044 oracle replays."""
    import numpy as np

    from warcraider_spark.operators.multimodal import (
        _img_dims,
        _png_pixel,
        decode_png,
        decode_png_pixels,
        encode_png,
    )

    for doc_id in (0, 7, 55):  # odd and even dims both covered
        payload = encode_png(doc_id)
        w, h, raw = decode_png_pixels(payload)
        assert (w, h) == _img_dims(doc_id)
        a = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
        expect = np.fromfunction(
            lambda y, x, c: (doc_id + x + 2 * y + c) % 256, (h, w, 3), dtype=np.int64
        )
        assert (a == expect).all()
        assert int(a.sum()) == decode_png(payload)["pixel_sum"]
        ev = a[: h // 2 * 2, : w // 2 * 2]
        l1 = (ev[0::2, 0::2] + ev[0::2, 1::2] + ev[1::2, 0::2] + ev[1::2, 1::2]) // 4
        for yy in (0, h // 2 - 1):
            for xx in (0, w // 2 - 1):
                for cc in range(3):
                    s = sum(
                        _png_pixel(doc_id, 2 * xx + dx, 2 * yy + dy, cc)
                        for dx in (0, 1)
                        for dy in (0, 1)
                    )
                    assert l1[yy, xx, cc] == s // 4
