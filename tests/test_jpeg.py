"""Roundtrip tests for the pure-numpy baseline JPEG codec
(extensions/jpeg.py) — the encoder exists precisely so the decoder's
full surface (interleaved MCUs, chroma upsampling, restart resync,
odd dimensions, grayscale) is testable without libjpeg in the
container. No Spark session needed: the codec is plain Python/numpy,
exercised through the same decode_media dispatch mapInPandas uses."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_etl_project_spark.extensions.jpeg import (
    decode_jpeg, encode_jpeg_baseline)
from pyspark_etl_project_spark.extensions.multimodal import decode_media

RNG = np.random.default_rng(7)


def _roundtrip(w, h, pixels, **kw):
    enc = encode_jpeg_baseline(pixels, w, h, **kw)
    out = decode_jpeg(enc)
    assert (out["width"], out["height"]) == (w, h)
    got = np.frombuffer(out["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    want = np.frombuffer(pixels, np.uint8).reshape(h, w, 3).astype(int)
    if kw.get("grayscale"):
        want = (0.299 * want[..., 0] + 0.587 * want[..., 1]
                + 0.114 * want[..., 2]).round().astype(int)[..., None] \
            .repeat(3, -1)
    return int(np.abs(got - want).max())


def test_roundtrip_exact_on_solid_color():
    assert _roundtrip(8, 8, bytes([100, 150, 200] * 64)) == 0


def test_roundtrip_random_image_within_dct_rounding():
    px = RNG.integers(0, 256, size=(24, 16, 3), dtype=np.uint8).tobytes()
    assert _roundtrip(16, 24, px) <= 3


def test_roundtrip_non_multiple_of_8_dims():
    px = RNG.integers(0, 256, size=(10, 13, 3), dtype=np.uint8).tobytes()
    assert _roundtrip(13, 10, px) <= 3


def test_roundtrip_grayscale():
    assert _roundtrip(8, 8, bytes([100, 150, 200] * 64), grayscale=True) <= 1


def test_subsampled_420_exact_on_flat_chroma():
    """With constant chroma, 4:2:0 averaging+upsampling loses nothing;
    odd dimensions exercise the padded-MCU crop."""
    assert _roundtrip(32, 32, bytes([100, 150, 200] * 1024),
                      subsample=True) <= 1
    assert _roundtrip(13, 10, bytes([10, 220, 70] * 130), subsample=True) <= 1
    # Full-resolution luma detail must survive 4:2:0 untouched.
    v = RNG.integers(0, 256, size=(16, 16), dtype=np.uint8)
    lum = np.stack([v, v, v], axis=-1)
    assert _roundtrip(16, 16, lum.tobytes(), subsample=True) <= 3


def test_restart_markers_are_decode_invariant():
    """RSTn resync must not change a single pixel vs the same image
    encoded without restarts — and must decode at several intervals."""
    px = RNG.integers(0, 256, size=(24, 40, 3), dtype=np.uint8).tobytes()
    base = decode_jpeg(encode_jpeg_baseline(px, 40, 24))
    for interval in (1, 2, 3):
        rst = decode_jpeg(encode_jpeg_baseline(px, 40, 24,
                                               restart_interval=interval))
        assert rst["pixels"] == base["pixels"]


def test_decode_media_dispatches_jpeg():
    enc = encode_jpeg_baseline(bytes([9, 99, 199] * 64), 8, 8)
    out = decode_media(enc, "image/jpeg")
    assert out["width"] == 8 and len(out["pixels"]) == 8 * 8 * 3


def test_progressive_decode_matches_baseline_bit_for_bit():
    """Progressive transmission is lossless given equal coefficients:
    decoding the SOF2 scan script must reproduce EXACTLY the pixels of
    decoding the baseline encoding — across odd dims, grayscale, and a
    1x1 edge case."""
    from pyspark_etl_project_spark.extensions.jpeg import (
        encode_jpeg_progressive)

    for (w, h), gray in [((16, 16), False), ((13, 9), False),
                         ((24, 17), False), ((1, 1), False),
                         ((8, 8), True), ((32, 32), True)]:
        px = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        base = decode_jpeg(encode_jpeg_baseline(px, w, h, quant=1,
                                                grayscale=gray))
        prog = decode_jpeg(encode_jpeg_progressive(px, w, h, quant=1,
                                                   grayscale=gray))
        assert (prog["width"], prog["height"]) == (w, h)
        assert prog["pixels"] == base["pixels"]


def test_progressive_eobrun_and_refinement_paths():
    """A smooth gradient drives long accumulated EOBRUNs (mostly-zero
    AC bands); coarse quantization drives the newly-nonzero insertion
    path of AC refinement. Both must still match baseline exactly."""
    from pyspark_etl_project_spark.extensions.jpeg import (
        encode_jpeg_progressive)

    w, h = 40, 24
    grad = np.zeros((h, w, 3), np.uint8)
    for yy in range(h):
        grad[yy, :, :] = yy * 5
    for px, quant in ((grad.tobytes(), 1),
                      (RNG.integers(0, 256, size=(h, w, 3),
                                    dtype=np.uint8).tobytes(), 16)):
        base = decode_jpeg(encode_jpeg_baseline(px, w, h, quant=quant))
        prog = decode_jpeg(encode_jpeg_progressive(px, w, h, quant=quant))
        assert prog["pixels"] == base["pixels"]


def test_lossless_sof3_still_raises():
    """Non-DCT SOF types must still fail loudly, not mis-decode."""
    enc = bytearray(encode_jpeg_baseline(bytes([1, 2, 3] * 64), 8, 8))
    idx = bytes(enc).find(b"\xFF\xC0")
    enc[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(enc))


def test_non_jpeg_payload_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"P6 1 1 255\nabc")


# --- PNG codec (extensions/png.py) -----------------------------------------

def test_png_roundtrip_exercises_all_filters():
    """Row-cycled filters mean a >=5-row image hits every unfilter
    path; lossless roundtrip must be byte-exact."""
    from pyspark_etl_project_spark.extensions.png import (
        decode_png, encode_png)

    w, h = 7, 9
    px = bytes((i * 37 + (i // 3) * 11) % 256 for i in range(w * h * 3))
    out = decode_png(encode_png(px, w, h))
    assert (out["width"], out["height"]) == (w, h)
    assert out["pixels"] == px


def test_png_crc_corruption_is_loud():
    import pytest

    from pyspark_etl_project_spark.extensions.png import (
        decode_png, encode_png)

    payload = bytearray(encode_png(b"\x01\x02\x03" * 4, 2, 2))
    # Flip a byte inside the IDAT chunk body (after sig+IHDR chunk).
    payload[8 + 25 + 12] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_unsupported_variants_raise_precisely():
    import struct
    import zlib

    import pytest

    from pyspark_etl_project_spark.extensions.png import decode_png

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    rgba = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
    with pytest.raises(NotImplementedError, match="color type=6"):
        decode_png(rgba)
    bad_il = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 2))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bad_il)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"BM123456")


def test_png_adam7_roundtrip_exact():
    """Adam7-interlaced encode/decode is byte-exact across shapes that
    exercise empty passes (1x1, single row/column) and partial passes
    (odd dims). Per-pass filter cycling hits every unfilter path in
    the interlaced walk too."""
    import numpy as np

    from pyspark_etl_project_spark.extensions.png import (
        decode_png, encode_png)

    rng = np.random.default_rng(11)
    for w, h in [(16, 16), (13, 9), (1, 1), (7, 3), (8, 1), (1, 9),
                 (33, 21)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        out = decode_png(encode_png(px, w, h, interlace=True))
        assert (out["width"], out["height"]) == (w, h)
        assert out["pixels"] == px


# --- WAV codec (extensions/multimodal.py) ----------------------------------

def test_wav_roundtrip_stereo_signed():
    from pyspark_etl_project_spark.extensions.multimodal import (
        _decode_wav, encode_wav)

    samples = [0, -1, 32767, -32768, 123, -456]  # stereo interleaved
    wav = _decode_wav(encode_wav(samples, 2, 16000))
    assert wav["sample_rate"] == 16000
    assert wav["n_channels"] == 2
    assert wav["samples"] == samples


def test_wav_skips_ancillary_chunks_and_rejects_non_pcm():
    import struct

    import pytest

    from pyspark_etl_project_spark.extensions.multimodal import (
        _decode_wav, encode_wav)

    base = encode_wav([5, 7], 1, 8000)
    # Inject a LIST chunk (odd length -> exercises word alignment)
    # between WAVE and fmt.
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    payload = base[:12] + extra + base[12:]
    payload = payload[:4] + struct.pack(
        "<I", len(payload) - 8) + payload[8:]
    wav = _decode_wav(payload)
    assert wav["samples"] == [5, 7]

    mutable = bytearray(base)
    mutable[20] = 3  # audio format IEEE float
    with pytest.raises(NotImplementedError, match="PCM16"):
        _decode_wav(bytes(mutable))
    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"nonsense")


# --- Y4M video codec (extensions/multimodal.py) -----------------------------

def test_y4m_roundtrip_c420_multiframe():
    from pyspark_etl_project_spark.extensions.multimodal import (
        _decode_y4m, encode_y4m)

    w, h = 6, 4
    f1 = (bytes(range(w * h)), bytes(range(6)), bytes(range(10, 16)))
    f2 = (bytes(reversed(range(w * h))), bytes(6), bytes(b"\xff" * 6))
    vid = _decode_y4m(encode_y4m([f1, f2], w, h))
    assert (vid["width"], vid["height"], vid["n_frames"]) == (w, h, 2)
    assert vid["frames"] == [f1, f2]


def test_y4m_frame_params_and_c444_and_errors():
    import pytest

    from pyspark_etl_project_spark.extensions.multimodal import (
        _decode_y4m, encode_y4m)

    # C444: full-size chroma planes.
    w, h = 2, 2
    f = (b"\x01\x02\x03\x04", b"\x05\x06\x07\x08", b"\x09\x0a\x0b\x0c")
    vid = _decode_y4m(encode_y4m([f], w, h, chroma="444"))
    assert vid["frames"] == [f]
    # Parameters after FRAME are legal and skipped.
    base = encode_y4m([f], w, h, chroma="444")
    patched = base.replace(b"FRAME\n", b"FRAME Ixyz\n")
    assert _decode_y4m(patched)["frames"] == [f]
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        _decode_y4m(b"RIFF....")
    with pytest.raises(NotImplementedError, match="C411"):
        _decode_y4m(b"YUV4MPEG2 W4 H4 C411\n")
    with pytest.raises(ValueError, match="truncated"):
        _decode_y4m(b"YUV4MPEG2 W4 H4\nFRAME\n\x00\x01")
