"""Real codec-free decoders (pipeline/multimodal.py): BMP / PPM / PGM image
decode and WAV PCM audio decode, implemented from the published container
specs in pure numpy. Test containers are constructed INDEPENDENTLY of the
decoder — struct-packed per spec for BMP/netpbm, stdlib ``wave`` writer for
WAV — so round-trips validate the parser, not a shared encoder."""

import io
import struct
import wave

import numpy as np
import pytest

from guava_probably_spark.pipeline.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    decode_resize_features,
)


def _bmp24(img: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal spec-built 24-bit BMP writer (BITMAPFILEHEADER +
    BITMAPINFOHEADER, BGR, 4-byte row stride, bottom-up unless top_down)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    order = img if top_down else img[::-1]
    for r in order:
        line = r[:, ::-1].tobytes()  # RGB → BGR
        rows.append(line + b"\x00" * (stride - len(line)))
    pix = b"".join(rows)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return hdr + dib + pix


def test_bmp24_roundtrip_bottom_up_and_top_down():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_bmp24(img)), img)
    assert np.array_equal(decode_image(_bmp24(img, top_down=True)), img)


def test_bmp32_and_gray8_palette():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    # 32-bit BGRA, bottom-up, no padding needed
    pix = b"".join(
        bytes([p[2], p[1], p[0], 255]) for r in img[::-1] for p in r
    )
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 32, 0, len(pix), 0, 0, 0, 0)
    assert np.array_equal(decode_image(hdr + dib + pix), img)
    # 8-bit with identity grayscale palette
    gray = rng.integers(0, 256, size=(3, 6), dtype=np.uint8)
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    stride = (6 + 3) // 4 * 4
    pix8 = b"".join(bytes(r) + b"\x00" * (stride - 6) for r in gray[::-1])
    off = 54 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pix8), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, 6, 3, 1, 8, 0, len(pix8), 0, 0, 256, 0)
    out = decode_image(hdr + dib + pal + pix8)
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))


def test_pnm_roundtrip_with_comment():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    p6 = b"P6\n# a comment\n5 3\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(p6), img)
    gray = rng.integers(0, 256, size=(2, 4), dtype=np.uint8)
    p5 = b"P5 4 2 255 " + gray.tobytes()
    assert np.array_equal(decode_image(p5), np.repeat(gray[:, :, None], 3, axis=2))


def test_unsupported_formats_raise_by_name():
    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="MP3"):
        decode_audio(b"ID3\x04" + b"\x00" * 16)
    with pytest.raises(ValueError, match="truncated"):
        decode_image(_bmp24(np.zeros((4, 4, 3), dtype=np.uint8))[:-5])
    with pytest.raises(NotImplementedError):
        decode_image(b"GPMMwhatever")  # fake container without fake=True


def _wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Stdlib wave writer — independent of our RIFF parser."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1] if samples.ndim == 2 else 1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_wav_pcm_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(10)
    mono = rng.integers(-32768, 32767, size=500, dtype=np.int16)
    pcm, rate = decode_audio(_wav(mono, rate=8000))
    assert rate == 8000 and pcm.shape == (500, 1)
    assert np.array_equal(pcm[:, 0], mono)
    stereo = rng.integers(-32768, 32767, size=(300, 2), dtype=np.int16)
    pcm2, rate2 = decode_audio(_wav(stereo, rate=44100))
    assert rate2 == 44100 and pcm2.shape == (300, 2)
    assert np.array_equal(pcm2, stereo)


def test_distributed_real_decode(spark):
    """Real BMP and WAV payloads through the Arrow-batched mapInPandas
    stages (fake=False): the distributed result equals the local decode."""
    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8) for i in range(20)}
    img_rows = [(i, bytearray(_bmp24(v, top_down=bool(i % 2)))) for i, v in imgs.items()]
    df = spark.createDataFrame(img_rows, "id long, payload binary").repartition(4)
    got = {r.id: r for r in decode_resize_features(df, h=4, w=4).collect()}
    assert len(got) == 20
    from guava_probably_spark.pipeline.multimodal import resize_image

    for i, v in imgs.items():
        px = resize_image(v, 4, 4).astype(np.int64)
        assert got[i].px_sum == int(px.sum()) and got[i].px_sq_sum == int((px * px).sum())

    waves = {i: rng.integers(-1000, 1000, size=64 + i, dtype=np.int16) for i in range(20)}
    wav_rows = [(i, bytearray(_wav(v))) for i, v in waves.items()]
    adf = spark.createDataFrame(wav_rows, "id long, payload binary").repartition(4)
    agot = {r.id: r for r in audio_features(adf).collect()}
    for i, v in waves.items():
        assert agot[i].n_samples == len(v)
        assert agot[i].amp_sum == int(np.abs(v.astype(np.int64)).sum())
