"""Real multimodal codecs: netpbm/BMP image decode, WAV audio decode.

Round-trip tests are Spark-free (pure numpy/stdlib); one kernel test
drives :func:`extract_media_features` end-to-end over a mixed table.
"""

import numpy as np
import pytest

from search_engine_spark.pipeline.multimodal import (
    _fake_features,
    decode_audio,
    decode_image,
    encode_bmp24,
    encode_netpbm,
    encode_wav,
    media_features,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


# ------------------------------------------------------------------ netpbm


def test_pgm_binary_roundtrip():
    img = _rng().integers(0, 256, size=(5, 9), dtype=np.uint8)
    out = decode_image(encode_netpbm(img))
    assert out.shape == (5, 9)
    np.testing.assert_array_equal(out, img)


def test_ppm_binary_roundtrip():
    img = _rng(1).integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_netpbm(img)), img)


def test_ppm_16bit_roundtrip():
    img = _rng(2).integers(0, 65536, size=(3, 2, 3), dtype=np.uint16)
    out = decode_image(encode_netpbm(img))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_pgm_ascii_with_comments():
    payload = b"P2\n# a comment\n3 2 # trailing\n255\n0 1 2\n10 20 30\n"
    np.testing.assert_array_equal(
        decode_image(payload), np.array([[0, 1, 2], [10, 20, 30]], dtype=np.uint8)
    )


def test_ppm_ascii():
    payload = b"P3 2 1 255  1 2 3  4 5 6"
    np.testing.assert_array_equal(
        decode_image(payload), np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    )


def test_netpbm_truncated_header_raises():
    with pytest.raises(ValueError):
        decode_image(b"P5\n3")


# ------------------------------------------------------------------ bmp


def test_bmp24_roundtrip_with_row_padding():
    # width 3 -> 9-byte rows pad to 12: exercises the stride math
    img = _rng(3).integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_bmp24(img)), img)


def test_bmp24_topdown_negative_height():
    img = _rng(4).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp24(img))
    import struct

    struct.pack_into("<i", blob, 22, -2)  # same pixel data, top-down flag
    np.testing.assert_array_equal(decode_image(bytes(blob)), img[::-1])


def test_bmp8_palette():
    import struct

    # 2x2 8-bit image, 2-color palette (blue, red), bottom-up rows pad to 4
    pal = struct.pack("<BBBB", 255, 0, 0, 0) + struct.pack("<BBBB", 0, 0, 255, 0)
    body = bytes([0, 1, 0, 0]) + bytes([1, 0, 0, 0])  # rows bottom-up
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 8 + 8, 0, 0, 14 + 40 + 8)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8, 0, 0, 2, 0)
    img = decode_image(hdr + dib + pal + body)
    # palette entries are BGRX: entry0 = blue, entry1 = red
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0])  # top row = second body row
    np.testing.assert_array_equal(img[0, 1], [0, 0, 255])
    np.testing.assert_array_equal(img[1, 0], [0, 0, 255])
    np.testing.assert_array_equal(img[1, 1], [255, 0, 0])


def test_bmp_compressed_raises():
    blob = bytearray(encode_bmp24(np.zeros((1, 1, 3), dtype=np.uint8)))
    import struct

    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_image(bytes(blob))


# ------------------------------------------------------------------ wav


def test_wav_mono_roundtrip():
    samples = (_rng(5).integers(-1000, 1000, size=64)).astype(np.int16)
    out, rate = decode_audio(encode_wav(samples, rate=8000))
    assert rate == 8000 and out.shape == (64, 1)
    np.testing.assert_array_equal(out[:, 0], samples)


def test_wav_stereo_roundtrip():
    samples = (_rng(6).integers(-1000, 1000, size=(32, 2))).astype(np.int16)
    out, rate = decode_audio(encode_wav(samples, rate=44100))
    assert rate == 44100
    np.testing.assert_array_equal(out, samples)


def test_wav_garbage_raises():
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFFxxxxWAVEjunk")


# ------------------------------------------------------------------ dispatch


def test_library_formats_still_raise():
    for magic in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0jfif", b"GIF89a"):
        with pytest.raises(NotImplementedError):
            decode_image(magic + b"\x00" * 32)


def test_media_features_kinds_and_values():
    img = np.full((2, 4), 10, dtype=np.uint8)
    kind, vec = media_features(encode_netpbm(img))
    assert kind == "image"
    assert vec[:3].tolist() == [2.0, 4.0, 1.0]
    assert vec[3] == 10.0 and vec[4] == 0.0 and vec[7] == 255.0

    kind, vec = media_features(encode_wav(np.zeros(16, dtype=np.int16), rate=8000))
    assert kind == "audio"
    assert vec[0] == 16.0 and vec[2] == 8000.0 and vec[7] == 16.0 / 8000.0

    opaque = b"\x89PNG not decodable here"
    kind, vec = media_features(opaque)
    assert kind == "opaque"
    np.testing.assert_array_equal(vec, _fake_features(opaque))


def test_malformed_payloads_fall_back_to_opaque():
    """One corrupt blob must NEVER fail a batch: every malformed payload
    routes to the opaque sha256 path (the extract_media_features
    contract), whatever exception the codec layer raises internally."""
    import struct

    bad_bmp = bytearray(encode_bmp24(np.zeros((1, 1, 3), dtype=np.uint8)))
    struct.pack_into("<H", bad_bmp, 28, 8)  # claim 8-bit but no palette -> idx >= ncolors
    cases = {
        "sub-header": b"hi",  # stdlib chunk parser raises bare EOFError
        "riff-junk": b"RIFF\x04\x00\x00\x00WAVE",
        "odd-pcm": encode_wav(np.zeros(4, dtype=np.int16))[:-1],  # truncated sample
        "netpbm-trunc": b"P5\n3",
        "bmp-bad-palette": bytes(bad_bmp),
        "bmp-trunc": b"BM" + b"\x00" * 10,
    }
    for name, payload in cases.items():
        kind, vec = media_features(payload)
        assert kind == "opaque", name
        np.testing.assert_array_equal(vec, _fake_features(payload))


def test_decode_audio_rejects_truncated_pcm():
    blob = encode_wav(np.zeros(4, dtype=np.int16))
    with pytest.raises(NotImplementedError):
        decode_audio(blob[:-1])
    with pytest.raises(NotImplementedError):
        decode_audio(b"hi")


def test_extract_media_features_kernel(spark):
    from search_engine_spark.pipeline.multimodal import extract_media_features

    rows = [
        (1, bytearray(encode_netpbm(np.full((3, 3, 3), 7, dtype=np.uint8)))),
        (2, bytearray(encode_wav(np.arange(10, dtype=np.int16)))),
        (3, bytearray(b"opaque payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in extract_media_features(df).collect()}
    assert got[1]["kind"] == "image" and got[1]["features"][3] == 7.0
    assert got[2]["kind"] == "audio" and got[2]["features"][0] == 10.0
    assert got[3]["kind"] == "opaque" and len(got[3]["features"]) == 8
    assert all(got[i]["n_bytes"] == len(rows[i - 1][1]) for i in (1, 2, 3))
