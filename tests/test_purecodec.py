"""Always-on REAL media decode (VERDICT r12 #6).

tests/test_multimodal_real_codecs.py loud-skips wherever PIL/ffmpeg
are absent — including this container — so until now no CI run
executed a real decode. The vendored pure-stdlib codecs
(operators/purecodec.py) close that: every test here runs everywhere,
and each drives a REAL format decode (PNG scanline-filter
reconstruction, RIFF/WAVE PCM, YUV4MPEG2 frame parsing) through the
same mapInPandas operators the fake stubs test — one per modality:
image, audio, video.
"""

from __future__ import annotations

import hashlib
import wave

import numpy as np
import pytest

from nt_data_pipelines_spark.operators import multimodal as M
from nt_data_pipelines_spark.operators.purecodec import (
    decode_png,
    decode_wav,
    decode_y4m,
    encode_png,
    encode_wav,
    encode_y4m,
    resize_nearest,
    to_gray,
)


# ---------------------------------------------------------------- PNG


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_color_type(channels, filter_type):
    """Encoding under each of the five scanline filters and decoding
    must reproduce the pixels exactly — proves every filter inverse
    (None/Sub/Up/Average/Paeth) on every supported color type."""
    rng = np.random.RandomState(channels * 10 + filter_type)
    arr = rng.randint(0, 256, size=(7, 5, channels), dtype=np.uint8)
    data = encode_png(arr, filter_type=filter_type)
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (5, 7, channels)
    np.testing.assert_array_equal(out, arr)


def test_png_decode_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a not a png")


def test_png_decode_matches_pil_when_present():
    """Cross-decoder differential: PIL and the vendored decoder must
    agree pixel-for-pixel (only runs where PIL exists)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
    data = encode_png(arr, filter_type=4)
    with PIL_Image.open(io.BytesIO(data)) as im:
        pil_px = np.asarray(im.convert("RGB"))
    np.testing.assert_array_equal(pil_px, arr)


def test_resize_images_png_branch_always_on(spark):
    """REAL decode -> luma -> nearest resize through the Spark
    operator, pixel values asserted by hand."""
    # 2x2 RGB: red, green / blue, white
    arr = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    payload = encode_png(arr, filter_type=2)
    df = spark.createDataFrame(
        [(1, payload, "image/png", len(payload), hashlib.sha256(payload).hexdigest())],
        "media_id long, payload binary, media_type string, n_bytes long, sha string",
    )
    row = M.resize_images(df, width=4, height=4, decode_stub="png").collect()[0]
    assert (row["width"], row["height"], row["n_bytes"]) == (4, 4, 16)
    got = np.frombuffer(bytes(row["payload"]), dtype=np.uint8).reshape(4, 4)
    # ITU-R 601 luma: R->76, G->150, B->29, W->255; center-sampled
    # nearest-neighbor doubles each source pixel into a 2x2 block
    want = np.array(
        [
            [76, 76, 150, 150],
            [76, 76, 150, 150],
            [29, 29, 255, 255],
            [29, 29, 255, 255],
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(got, want)


def test_resize_nearest_downsample_identity_cases():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    np.testing.assert_array_equal(resize_nearest(g, 4, 4), g)  # no-op
    # 4x4 -> 2x2 center sampling picks rows/cols 1 and 3
    np.testing.assert_array_equal(resize_nearest(g, 2, 2), g[np.ix_([1, 3], [1, 3])])


def test_to_gray_weights():
    px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], dtype=np.uint8)
    np.testing.assert_array_equal(to_gray(px)[0], [76, 150, 29])


# ---------------------------------------------------------------- WAV


def test_wav_roundtrip_16bit():
    rng = np.random.RandomState(11)
    x = rng.uniform(-0.9, 0.9, size=800)
    rate, y = decode_wav(encode_wav(x, 8000))
    assert rate == 8000
    # half an lsb of quantization + the 32767-encode/32768-decode
    # scale asymmetry (|x| <= 0.9 adds at most 0.9 lsb)
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_wav_decode_8bit_and_stereo_downmix():
    import io

    # 8-bit unsigned stereo, hand-written with the stdlib writer
    left = np.array([0, 64, 127, -128], dtype=np.int16)
    right = np.array([0, 0, 127, -128], dtype=np.int16)
    inter = np.empty(8, dtype=np.uint8)
    inter[0::2] = (left + 128).astype(np.uint8)
    inter[1::2] = (right + 128).astype(np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(1)
        wf.setframerate(4000)
        wf.writeframes(inter.tobytes())
    rate, y = decode_wav(buf.getvalue())
    assert rate == 4000
    want = ((left / 128.0) + (right / 128.0)) / 2.0
    np.testing.assert_allclose(y, want, rtol=0, atol=1e-12)


def test_audio_features_wav_branch_always_on(spark):
    """REAL RIFF/WAVE decode through the Spark operator: RMS and
    zero-crossing rate of a synthesized sine match numpy computed on
    the same quantized samples, and duration comes from the file's
    own declared sample rate (not the operator default)."""
    rate = 8000
    t = np.arange(rate // 2)  # half a second
    x = 0.5 * np.sin(2 * np.pi * 440 * t / rate)
    payload = encode_wav(x, rate)
    df = spark.createDataFrame(
        [(7, payload, "audio/wav", len(payload), hashlib.sha256(payload).hexdigest())],
        "media_id long, payload binary, media_type string, n_bytes long, sha string",
    )
    row = M.audio_features(df, decode_stub="wav").collect()[0]
    _, q = decode_wav(payload)  # the quantized ground truth
    assert row["n_samples"] == len(t)
    assert row["duration_s"] == pytest.approx(0.5)
    assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(q * q))), rel=1e-12)
    zc = float(np.mean(np.signbit(q[1:]) != np.signbit(q[:-1])))
    assert row["zero_crossing_rate"] == pytest.approx(zc, rel=1e-12)
    # a 440 Hz sine crosses zero ~880 times/s -> rate ~0.11
    assert 0.09 < row["zero_crossing_rate"] < 0.13


# ---------------------------------------------------------------- Y4M


def test_y4m_roundtrip():
    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, size=(6, 8), dtype=np.uint8) for _ in range(4)]
    w, h, got = decode_y4m(encode_y4m(frames))
    assert (w, h, len(got)) == (8, 6, 4)
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_y4m_rejects_bad_magic_and_chroma():
    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"RIFF....")
    hdr = b"YUV4MPEG2 W4 H4 F30:1 C444\nFRAME\n" + bytes(48)
    with pytest.raises(NotImplementedError, match="C444"):
        decode_y4m(hdr)


def test_sample_frames_y4m_branch_always_on(spark):
    """REAL YUV4MPEG2 parse through the Spark operator: 10-frame clip
    sampled to 4 greyscale-PNG frames whose decoded pixels equal the
    source luma planes at the sampled indices. Ceil stride
    (ceil(10/4) = 3) spans the WHOLE clip — frames 0,3,6,9 including
    the tail — where a floor stride would return only a prefix."""
    frames = [np.full((4, 6), 10 * i, dtype=np.uint8) for i in range(10)]
    payload = encode_y4m(frames)
    df = spark.createDataFrame(
        [(3, payload, "video/y4m", len(payload), hashlib.sha256(payload).hexdigest())],
        "media_id long, payload binary, media_type string, n_bytes long, sha string",
    )
    rows = (
        M.sample_frames(df, max_frames=4, decode_stub="y4m")
        .orderBy("frame_index")
        .collect()
    )
    assert [r["frame_index"] for r in rows] == [0, 1, 2, 3]
    for i, r in enumerate(rows):
        w, h, ch, px = decode_png(bytes(r["frame_payload"]))
        assert (w, h, ch) == (6, 4, 1)
        np.testing.assert_array_equal(px[:, :, 0], frames[3 * i])


def test_png_decode_detects_corruption_via_crc():
    """A single flipped IDAT byte must raise loudly, never decode to
    wrong pixels (zlib often still inflates corrupt streams)."""
    rng = np.random.RandomState(21)
    arr = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_png(arr, filter_type=1))
    idat_at = bytes(data).index(b"IDAT")
    data[idat_at + 10] ^= 0xFF  # flip a byte inside the IDAT payload
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(data))
