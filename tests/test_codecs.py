"""Real pure-numpy codecs (PPM/PGM/BMP images, WAV PCM16 audio) — byte
round-trips plus the actor-pool stages running over REAL payloads."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from recon_ray.functions.multimodal import (
    MM_BATCH_SIZE,
    AudioFrameSampler,
    ImageFeatureExtractor,
    ImageResizer,
    NetpbmBackend,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    encode_wav,
    synthetic_real_media_table,
)

B = NetpbmBackend()


def _img(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(
        np.uint8
    )


def test_ppm_round_trip():
    img = _img(13, 7)
    out = B.decode_image(encode_ppm(img), "ppm", 13, 7)
    np.testing.assert_array_equal(out, img)


def test_pgm_round_trip_grayscale_to_rgb():
    g = _img(9, 11)[:, :, 0]
    out = B.decode_image(encode_pgm(g), "pgm", 9, 11)
    assert out.shape == (9, 11, 3)
    np.testing.assert_array_equal(out[:, :, 0], g)
    np.testing.assert_array_equal(out[:, :, 1], g)


@pytest.mark.parametrize("w", [5, 6, 7, 8])  # all 4 row-padding cases
def test_bmp_round_trip_row_padding(w):
    img = _img(4, w, seed=w)
    out = B.decode_image(encode_bmp(img), "bmp", 4, w)
    np.testing.assert_array_equal(out, img)


def test_ppm_header_with_comment():
    img = _img(2, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    np.testing.assert_array_equal(B.decode_image(payload, "ppm", 2, 3), img)


def test_dim_metadata_mismatch_raises():
    img = _img(4, 4)
    with pytest.raises(ValueError):
        B.decode_image(encode_ppm(img), "ppm", 8, 4)


def test_unknown_format_still_raises():
    # mp4 stays behind the seam; jpeg is now REAL, so corrupt jpeg
    # bytes are a data error, not a missing-codec error
    with pytest.raises(NotImplementedError):
        B.decode_image(b"\x00\x00\x00 ftypmp42", "mp4", 4, 4)
    with pytest.raises(ValueError):
        B.decode_image(b"\xff\xd8jpegbytes", "jpeg", 4, 4)


def test_wav_round_trip():
    wave = np.sin(np.linspace(0, 20, 480)).astype(np.float32)
    out = B.decode_audio(encode_wav(wave), "wav", -1)
    assert out.shape == wave.shape
    # int16 quantization + the 32767-encode / 32768-decode PCM convention
    np.testing.assert_allclose(out, wave, atol=2.0 / 32768)


def test_stages_over_real_payloads():
    media = synthetic_real_media_table(16, seed=5)
    ds = rd.from_arrow(media)
    imgs = ds.filter(lambda r: r["kind"] == "image")

    feats = (
        imgs.map_batches(
            ImageFeatureExtractor,
            fn_constructor_kwargs={"backend": NetpbmBackend()},
            batch_format="pyarrow",
            batch_size=MM_BATCH_SIZE,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    meta = media.to_pandas().set_index("media_id")
    assert len(feats) == (meta["kind"] == "image").sum()
    # real decode → channel means must equal the means of the raw pixels
    row = feats.iloc[0]
    payload = meta.loc[row["media_id"], "payload"]
    fmt = meta.loc[row["media_id"], "format"]
    img = B.decode_image(payload, fmt, -1, -1)
    np.testing.assert_allclose(
        row["channel_mean"], [img[..., c].mean() for c in range(3)]
    )

    resized = (
        imgs.map_batches(
            ImageResizer,
            fn_constructor_kwargs={"target": (8, 8),
                                   "backend": NetpbmBackend()},
            batch_format="pyarrow",
            batch_size=MM_BATCH_SIZE,
            concurrency=2,
        )
        .to_pandas()
    )
    assert (resized["width"] == 8).all() and (resized["height"] == 8).all()
    assert all(len(p) == 8 * 8 * 3 for p in resized["payload"])

    rms = (
        ds.filter(lambda r: r["kind"] == "audio")
        .map_batches(
            AudioFrameSampler,
            fn_constructor_kwargs={"frame": 64, "backend": NetpbmBackend()},
            batch_format="pyarrow",
            batch_size=MM_BATCH_SIZE,
            concurrency=2,
        )
        .to_pandas()
    )
    assert len(rms) == (meta["kind"] == "audio").sum()
    assert all(len(e) >= 1 for e in rms["frame_rms"])


def test_truncated_netpbm_raises_not_hangs():
    for bad in (b"P6\n12", b"P6\n# only a comment", b"P6\n3 2", b"P6"):
        with pytest.raises(ValueError):
            B.decode_image(bad, "ppm", -1, -1)


def test_audio_spectrogram_pure_tone():
    """A pure sine at bin-aligned frequency concentrates power in that
    rfft bin: f = 1000 Hz at rate 16000 with frame 256 → bin 16."""
    from recon_ray.functions.multimodal import (AudioSpectrogram,
                                                NetpbmBackend, encode_wav)
    import pyarrow as pa

    rate, frame, freq = 16000, 256, 1000
    t = np.arange(rate) / rate  # 1 second
    wave = np.sin(2 * np.pi * freq * t).astype(np.float32) * 0.5
    tbl = pa.table(
        {"media_id": pa.array([0], pa.int64()),
         "kind": ["audio"], "format": ["wav"],
         "payload": pa.array([encode_wav(wave, rate)], pa.binary()),
         "width": pa.array([-1], pa.int32()),
         "height": pa.array([-1], pa.int32()),
         # duration_ms * 16 must cover the full second of samples
         "duration_ms": pa.array([rate // 16], pa.int32())}
    )
    stage = AudioSpectrogram(frame=frame, backend=NetpbmBackend())
    out = stage(tbl)
    assert out.column("dominant_bin").to_pylist() == [freq * frame // rate]
    spec = np.array(out.column("spectrum").to_pylist()[0])
    assert len(spec) == frame // 2 + 1
    # the tone bin dominates; the Hann window leaks ~25% power into the
    # two ADJACENT bins, so exclude 15..17 from the leakage check
    assert spec[16] > spec[15] > 0 and spec[16] > spec[17] > 0
    assert spec[16] > 100 * np.delete(spec, [15, 16, 17]).max()


def test_image_phash_neardup_pairs_distributed():
    """dHash near-dup: a one-pixel perturbation keeps Hamming small, a
    different random image lands far; banded LSH over partitions finds
    exactly the near pair."""
    from recon_ray.functions.multimodal import (ImagePHash, MEDIA_SCHEMA,
                                                NetpbmBackend, encode_ppm,
                                                image_neardup_pairs)
    import pyarrow as pa

    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    near = base.copy()
    near[5, 5] = 255 - near[5, 5]  # one pixel flipped
    far = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)

    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i, img in enumerate([base, near, far]):
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["format"].append("ppm")
        rows["payload"].append(encode_ppm(img))
        rows["width"].append(24)
        rows["height"].append(24)
        rows["duration_ms"].append(-1)
    # plus an audio row that must be filtered out, not crash the decode
    rows["media_id"].append(3)
    rows["kind"].append("audio")
    rows["format"].append("wav")
    rows["payload"].append(b"RIFFxxxxWAVE")
    rows["width"].append(-1)
    rows["height"].append(-1)
    rows["duration_ms"].append(10)
    tbl = pa.table(rows, schema=MEDIA_SCHEMA)

    # sanity: direct hash distances
    st = ImagePHash(backend=NetpbmBackend())
    hashes = st(tbl.slice(0, 3)).column("phash").to_pylist()
    from recon_ray.functions.dedup import hamming64
    assert hamming64(hashes[0], hashes[1]) <= 6
    assert hamming64(hashes[0], hashes[2]) > 6

    ds = rd.from_arrow(tbl).repartition(3)
    pairs = image_neardup_pairs(ds, max_hamming=6, backend=NetpbmBackend())
    assert list(map(tuple, pairs[["a", "b"]].itertuples(index=False))) == [
        (0, 1)
    ]


# ---------------------------------------------------------------------------
# Y4M video container
# ---------------------------------------------------------------------------


def test_y4m_c444_round_trip_and_seek():
    """Planes survive C444 encode→decode exactly, and frame k is read by
    direct seek (verified by decoding frames out of order)."""
    from recon_ray.functions.multimodal import Y4MBackend, encode_y4m

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (5, 12, 16, 3)).astype(np.uint8)
    payload = encode_y4m(frames, fps_num=30, colorspace="C444")
    be = Y4MBackend()
    assert be.video_frame_count(payload, "y4m") == 5
    for k in (4, 0, 2):  # out-of-order access must not matter
        got = be.decode_video_planes(payload, k)
        assert np.array_equal(got, frames[k])


def test_y4m_probe_header_fields():
    from recon_ray.functions.multimodal import encode_y4m, probe_y4m

    frames = np.zeros((2, 8, 10, 3), dtype=np.uint8)
    p = probe_y4m(encode_y4m(frames, fps_num=24, fps_den=1,
                             colorspace="C444"))
    assert (p["width"], p["height"], p["n_frames"]) == (10, 8, 2)
    assert p["fps_num"] == 24 and p["colorspace"] == "C444"


def test_y4m_c420_chroma_subsample_upsample():
    """C420: luma survives exactly; constant chroma survives the 2x2
    box subsample/upsample exactly too."""
    from recon_ray.functions.multimodal import Y4MBackend, encode_y4m

    h, w = 8, 12
    frames = np.zeros((1, h, w, 3), dtype=np.uint8)
    frames[0, ..., 0] = np.arange(h * w).reshape(h, w) % 256
    frames[0, ..., 1] = 77
    frames[0, ..., 2] = 200
    payload = encode_y4m(frames, colorspace="C420jpeg")
    got = Y4MBackend().decode_video_planes(payload, 0)
    assert np.array_equal(got[..., 0], frames[0, ..., 0])
    assert (got[..., 1] == 77).all() and (got[..., 2] == 200).all()


def test_y4m_rgb_conversion_and_frame_api():
    """decode_video_frame returns RGB; rgb→ycbcr→rgb round-trips within
    the conversion's quantization error (≤ 2 per channel)."""
    from recon_ray.functions.multimodal import (Y4MBackend, encode_y4m,
                                                rgb_to_ycbcr, ycbcr_to_rgb)

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (6, 9, 3)).astype(np.uint8)
    back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 2

    payload = encode_y4m(rgb_to_ycbcr(rgb)[None, ...], colorspace="C444")
    frame = Y4MBackend().decode_video_frame(payload, "y4m", 6, 9, 0)
    assert np.abs(frame.astype(int) - rgb.astype(int)).max() <= 2


def test_y4m_corrupt_and_range_errors():
    import pytest as _pytest

    from recon_ray.functions.multimodal import Y4MBackend, encode_y4m

    frames = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    payload = encode_y4m(frames, colorspace="C444")
    be = Y4MBackend()
    with _pytest.raises(IndexError):
        be.decode_video_planes(payload, 2)
    with _pytest.raises(ValueError):
        be.decode_video_planes(payload[:-5], 1)  # truncated frame data
    with _pytest.raises(ValueError):
        be.decode_video_frame(b"nope" + payload, "y4m", 4, 4, 0)


def test_video_sampler_uses_container_frame_count():
    """VideoFrameSampler must trust the Y4M-probed frame count over the
    duration-derived guess (duration_ms deliberately lies here)."""
    from recon_ray.functions.multimodal import (MEDIA_SCHEMA, Y4MBackend,
                                                VideoFrameSampler,
                                                encode_y4m)

    frames = np.full((7, 6, 8, 3), 128, dtype=np.uint8)
    tbl = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["video"]),
            "format": pa.array(["y4m"]),
            "payload": pa.array([encode_y4m(frames)], pa.binary()),
            "width": pa.array([8], pa.int32()),
            "height": pa.array([6], pa.int32()),
            "duration_ms": pa.array([100000], pa.int32()),  # lies: 3000 frames
        },
        schema=MEDIA_SCHEMA,
    )
    out = VideoFrameSampler(stride=2, backend=Y4MBackend())(tbl)
    assert out.column("frame_idx").to_pylist() == [[0, 2, 4, 6]]


# ---------------------------------------------------------------------------
# PNG (stdlib zlib + numpy, all five scanline filters)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filter_id", [0, 1, 2, 3, 4])
def test_png_round_trip_every_filter(filter_id):
    from recon_ray.functions.multimodal import decode_png, encode_png

    rng = np.random.RandomState(10 + filter_id)
    for h, w in [(1, 1), (3, 7), (33, 17)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img, filter_id)), img)


def test_png_gray_rgba_palette_paths():
    """Hand-built color-type 0 / 6 / 3 payloads decode to the expected
    RGB expansion (the encoder only writes type 2 — these exercise the
    reader's other branches)."""
    import zlib

    from recon_ray.functions.multimodal import (_png_chunk, _PNG_SIG,
                                                decode_png)

    def build(w, h, color, raw_rows, extra=b""):
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, color, 0, 0, 0]))
        return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + extra
                + _png_chunk(b"IDAT", zlib.compress(raw_rows))
                + _png_chunk(b"IEND", b""))

    # grayscale 2x2, filter 0
    g = build(2, 2, 0, b"\x00\x05\x09" + b"\x00\x11\x22")
    assert np.array_equal(decode_png(g)[:, :, 0], [[5, 9], [17, 34]])
    assert np.array_equal(decode_png(g)[..., 0], decode_png(g)[..., 2])
    # RGBA 1x2: alpha dropped
    ra = build(2, 1, 6, b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 0]))
    assert decode_png(ra).tolist() == [[[1, 2, 3], [4, 5, 6]]]
    # palette 1x2
    plte = _png_chunk(b"PLTE", bytes([10, 20, 30, 40, 50, 60]))
    pal = build(2, 1, 3, b"\x00\x01\x00", extra=plte)
    assert decode_png(pal).tolist() == [[[40, 50, 60], [10, 20, 30]]]


def test_png_rejects_corruption_and_unsupported():
    from recon_ray.functions.multimodal import decode_png, encode_png

    img = np.zeros((4, 4, 3), np.uint8)
    p = bytearray(encode_png(img, 2))
    p[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(p))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNX" + bytes(16))


def test_png_backend_dispatch_and_channel_sums(ray_session):
    """Real PNGs through the ImageChannelSums actor stage: sums equal
    the source image's sums for every filter id."""
    from recon_ray.functions.multimodal import (MEDIA_SCHEMA,
                                                ImageChannelSums,
                                                NetpbmBackend, encode_png)

    rng = np.random.RandomState(3)
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    want = []
    for i in range(5):
        img = rng.randint(0, 256, (12, 9, 3), dtype=np.uint8)
        want.append(img.reshape(-1, 3).sum(axis=0))
        rows["media_id"].append(i)
        rows["kind"].append("image")
        rows["format"].append("png")
        rows["payload"].append(encode_png(img, filter_id=i))
        rows["width"].append(9)
        rows["height"].append(12)
        rows["duration_ms"].append(-1)
    out = (
        rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))
        .map_batches(ImageChannelSums, batch_format="pyarrow",
                     batch_size=4, concurrency=1,
                     fn_constructor_kwargs={"backend": NetpbmBackend()})
        .to_pandas().sort_values("media_id")
    )
    got = out[["r_sum", "g_sum", "b_sum"]].to_numpy()
    assert np.array_equal(got, np.array(want))


# ---------------------------------------------------------------------------
# GIF (GIF89a): longhand LZW — variable code width with the early-change
# off-by-one, dictionary resets at 4096, KwKwK case.
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_stress():
    from recon_ray.functions.multimodal import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0)
    for mcs in (2, 3, 4, 8):
        for n in (1, 2, 7, 300, 20000, 60000):
            idx = rng.integers(0, 1 << mcs, n).astype(np.uint8)
            assert np.array_equal(
                _lzw_decode(_lzw_encode(idx, mcs), mcs, n), idx), \
                (mcs, n)
    # KwKwK stressors: constant runs and short cycles
    for pat in (np.zeros(30000, np.uint8),
                np.tile(np.arange(4, dtype=np.uint8), 8000)):
        assert np.array_equal(
            _lzw_decode(_lzw_encode(pat, 2), 2, len(pat)), pat)


def test_gif_roundtrip_and_backend():
    from recon_ray.functions.multimodal import (NetpbmBackend,
                                                decode_gif, encode_gif)

    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    img = pal[rng.integers(0, 16, (24, 32))]
    g = encode_gif(img)
    assert g[:6] == b"GIF89a" and g[-1] == 0x3B
    assert np.array_equal(decode_gif(g)[0], img)
    # animation: full-replacement frames round-trip in order
    frames = pal[rng.integers(0, 16, (5, 20, 16))]
    assert np.array_equal(decode_gif(encode_gif(frames)), frames)
    # 256-color and 2-color edges
    img2 = np.arange(256, dtype=np.uint8).repeat(3).reshape(16, 16, 3)
    assert np.array_equal(decode_gif(encode_gif(img2))[0], img2)
    img3 = np.zeros((8, 8, 3), np.uint8)
    assert np.array_equal(decode_gif(encode_gif(img3))[0], img3)
    # backend dispatch decodes the first frame
    be = NetpbmBackend()
    assert np.array_equal(be.decode_image(g, "gif", 24, 32), img)
    # scope guards
    with pytest.raises(ValueError):
        encode_gif(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + bytes(20))


# ---------------------------------------------------------------------------
# Baseline JPEG (pure-numpy T.81) — encoder + decoder
# ---------------------------------------------------------------------------


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def _smooth_rgb(h: int, w: int, seed: int = 3) -> np.ndarray:
    x = np.linspace(0, 1, w)[None, :]
    y = np.linspace(0, 1, h)[:, None]
    img = np.stack([120 + 80 * np.sin(3 * y + x + seed),
                    100 + 60 * np.cos(2 * y - x),
                    90 + 70 * np.sin(4 * x * y)], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_jpeg_round_trip_psnr():
    from recon_ray.functions.multimodal import decode_jpeg, encode_jpeg

    img = _smooth_rgb(48, 64)
    for q, sub, floor in [(95, "444", 40.0), (90, "444", 38.0),
                          (75, "444", 33.0), (90, "420", 33.0)]:
        out = decode_jpeg(encode_jpeg(img, q, sub))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert _psnr(out, img) > floor, (q, sub)
    # deterministic bytes
    assert encode_jpeg(img, 90) == encode_jpeg(img, 90)


def test_jpeg_gray_and_odd_dims():
    from recon_ray.functions.multimodal import decode_jpeg, encode_jpeg

    g = _smooth_rgb(17, 23)[:, :, 0]  # dims not multiples of 8
    out = decode_jpeg(encode_jpeg(g, 95))
    assert out.shape == (17, 23)
    assert _psnr(out, g) > 40.0
    rgb = _smooth_rgb(21, 19)
    out = decode_jpeg(encode_jpeg(rgb, 95, "420"))  # odd dims + 420
    assert out.shape == (21, 19, 3)
    assert _psnr(out, rgb) > 33.0


def test_jpeg_restart_markers():
    from recon_ray.functions.multimodal import decode_jpeg, encode_jpeg

    img = _smooth_rgb(40, 56)
    plain = decode_jpeg(encode_jpeg(img, 92))
    for dri in (1, 2, 5):
        b = encode_jpeg(img, 92, restart_interval=dri)
        assert b"\xff\xdd" in b  # DRI marker present
        out = decode_jpeg(b)
        # restart markers change the bitstream layout, not the content
        assert np.array_equal(out, plain)


def test_jpeg_block_constant_exact():
    """Constant 8x8 blocks with even offsets survive quality-50
    quantization EXACTLY (DC-only, q0 = 16) — the invariant the
    media_image_jpeg_channels oracle relies on."""
    from recon_ray.functions.multimodal import decode_jpeg, encode_jpeg

    blockmap = (3 * (np.arange(24)[:, None] // 8)
                + np.arange(24)[None, :] // 8)
    for i in range(4):
        vb = (128 + 2 * (((i * 7 + np.arange(9) * 13) % 61) - 30)
              ).astype(np.uint8)
        img = np.repeat(vb[blockmap][..., None], 3, axis=2)
        for dri in (0, 2):
            out = decode_jpeg(encode_jpeg(img, 50, "444",
                                          restart_interval=dri))
            assert np.array_equal(out, img)


def test_jpeg_backend_dispatch_and_scope():
    from recon_ray.functions.multimodal import (NetpbmBackend,
                                                decode_jpeg,
                                                encode_jpeg)

    be = NetpbmBackend()
    img = _smooth_rgb(16, 16)
    for fmt in ("jpeg", "jpg"):
        out = be.decode_image(encode_jpeg(img, 95), fmt, 16, 16)
        assert out.shape == (16, 16, 3)
    # grayscale scan meets the 3-channel backend contract
    out = be.decode_image(encode_jpeg(img[:, :, 0], 95), "jpeg", -1, -1)
    assert out.shape == (16, 16, 3)
    assert (out[..., 0] == out[..., 1]).all()
    # SOF2 is now SUPPORTED (round-5 seam close) — but a baseline file
    # with its marker flipped to SOF2 is a MALFORMED progressive stream
    # (full-band interleaved AC scan, illegal per T.81 G): clear error
    b = bytearray(encode_jpeg(img, 95))
    b[b.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))
    # lossless/arithmetic SOF markers still raise behind the seam
    b2 = bytearray(encode_jpeg(img, 95))
    b2[b2.index(b"\xff\xc0") + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(b2))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_progressive_jpeg_matches_baseline_decode():
    """Progressive (SOF2) encode of an image reconstructs BIT-IDENTICAL
    pixels to the baseline encode at the same quality: both quantize to
    the same coefficients, so any divergence is a scan-decoding bug
    (DC first/refine, AC band first/refine, EOBRUN, correction bits)."""
    import numpy as np

    from recon_ray.functions.multimodal import (decode_jpeg, encode_jpeg,
                                                encode_jpeg_progressive)

    rng = np.random.RandomState(7)
    g = np.linspace(0, 255, 64 * 48).reshape(48, 64).astype(np.uint8)
    cases = [
        g,                                                  # EOB-heavy
        rng.randint(0, 256, (40, 56)).astype(np.uint8),    # dense AC
        np.full((24, 24), 128, np.uint8),                  # pure EOBRUN
        np.stack([g, np.roll(g, 7, 1), 255 - g], axis=-1),  # RGB
        rng.randint(0, 256, (33, 41, 3)).astype(np.uint8),  # odd dims
        rng.randint(0, 256, (5, 9, 3)).astype(np.uint8),   # < one MCU
    ]
    for img in cases:
        for q in (50, 75, 90):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(base, prog), (img.shape, q)


def test_progressive_jpeg_is_sof2():
    """The progressive payload really is SOF2 (the baseline decoder of
    round 4 would have raised on it), and a custom scan script also
    round-trips."""
    import numpy as np

    from recon_ray.functions.multimodal import (decode_jpeg, encode_jpeg,
                                                encode_jpeg_progressive)

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (26, 30, 3)).astype(np.uint8)
    payload = encode_jpeg_progressive(img, quality=75)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    # custom script: single-level (no successive approximation) bands
    scans = [(None, 0, 0, 0, 0),
             (0, 1, 20, 0, 0), (0, 21, 63, 0, 0),
             (1, 1, 63, 0, 0), (2, 1, 63, 0, 0)]
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=75,
                                               scans=scans))
    base = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.array_equal(base, prog)
