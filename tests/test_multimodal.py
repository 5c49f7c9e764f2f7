"""Built-in codec round-trips and the real image/audio decode stages."""

import numpy as np
import pyarrow as pa
import pytest

from doppel_speller_ray.functions import codecs
from doppel_speller_ray.sources.fixtures import make_media
from doppel_speller_ray.stages.multimodal import (
    AudioFrameSampleStage,
    ImageDecodeStage,
    ImageFeatureStage,
    decode_image_payload,
    decode_images,
)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # cover every BMP row-padding case
def test_bmp_round_trip_padding(w):
    rng = np.random.default_rng(w)
    img = rng.integers(0, 256, size=(3, w, 3)).astype(np.uint8)
    payload = codecs.encode_bmp(img)
    assert codecs.sniff(payload) == "bmp"
    np.testing.assert_array_equal(codecs.decode_bmp(payload), img)


def test_ppm_round_trip_and_comments():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(7, 5, 3)).astype(np.uint8)
    payload = codecs.encode_ppm(img)
    assert codecs.sniff(payload) == "ppm"
    np.testing.assert_array_equal(codecs.decode_ppm(payload), img)
    # header comments are legal PPM
    commented = b"P6\n# a comment\n5 7\n# another\n255\n" + img.tobytes()
    np.testing.assert_array_equal(codecs.decode_ppm(commented), img)


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_round_trip(channels):
    rng = np.random.default_rng(3)
    samples = rng.integers(-30000, 30000,
                           size=(100, channels)).astype(np.int16)
    payload = codecs.encode_wav_pcm16(samples, 8000)
    assert codecs.sniff(payload) == "wav"
    out, rate = codecs.decode_wav_pcm16(payload)
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)


def test_resize_nearest_hand_case():
    # 2×2 → 4×4 nearest: each source pixel becomes a 2×2 block
    img = np.arange(4, dtype=np.uint8).reshape(2, 2, 1)
    up = codecs.resize_nearest(img, 4, 4)
    expected = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    np.testing.assert_array_equal(up, expected)
    # identity resize is exact
    np.testing.assert_array_equal(codecs.resize_nearest(img, 2, 2), img)


def test_decode_image_payload_routes_by_magic():
    img = np.full((4, 4, 3), 9, np.uint8)
    for enc, fmt in [(codecs.encode_bmp, "bmp"), (codecs.encode_ppm, "ppm")]:
        decoded, got_fmt = decode_image_payload(enc(img))
        assert got_fmt == fmt
        np.testing.assert_array_equal(decoded, img)
    assert decode_image_payload(b"not an image at all") is None


def test_image_decode_stage_real_pixels():
    # 2×2 source resized to 4×4 must equal the hand-computable upsample —
    # proves the stage decodes the actual payload, not a stub.
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    batch = pa.table({"media_id": pa.array([0], pa.int64()),
                      "payload": pa.array([codecs.encode_bmp(img)], pa.binary())})
    out = ImageDecodeStage(target=(4, 4), strict=True)(batch)
    assert out["codec"].to_pylist() == ["bmp"]
    pix = np.asarray(out["pixels"].combine_chunks().values).reshape(4, 4, 3)
    expected = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    np.testing.assert_array_equal(pix, expected)


def test_image_decode_stage_strict_vs_stub():
    bad = pa.table({"payload": pa.array([b"garbage-payload-xx"], pa.binary())})
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(bad)
    out = ImageDecodeStage(strict=False)(bad)  # observable fallback
    assert out["codec"].to_pylist() == ["stub"]


def test_audio_stage_real_wav_frames():
    # constant-amplitude signal → per-frame mean = value/32768, std = 0
    samples = np.full(1600, 16384, np.int16)
    batch = pa.table({"payload": pa.array(
        [codecs.encode_wav_pcm16(samples, 16000)], pa.binary())})
    out = AudioFrameSampleStage(n_frames=4, strict=True)(batch)
    assert out["codec"].to_pylist() == ["wav"]
    assert out["sample_rate"].to_pylist() == [16000]
    frames = np.asarray(out["frames"].combine_chunks().values)
    np.testing.assert_allclose(frames[0::2], 0.5, atol=1e-6)   # means
    np.testing.assert_allclose(frames[1::2], 0.0, atol=1e-6)   # stds
    with pytest.raises(NotImplementedError):
        AudioFrameSampleStage(strict=True)(
            pa.table({"payload": pa.array([b"junkjunkjunkjunk"], pa.binary())}))


def test_media_fixture_decodes_end_to_end(ray_session):
    import ray.data as rd

    table, truth = make_media(n=9, seed=5)
    images = table.filter(pa.compute.field("kind") != "wav")
    ds = rd.from_arrow(images)
    decoded = decode_images(ds, target=(8, 8), concurrency=2, strict=True)
    feats = decoded.map_batches(ImageFeatureStage, batch_format="pyarrow",
                                concurrency=2)
    rows = {r["media_id"]: r for r in feats.take_all()}
    assert len(rows) == len(images)
    # spot-check one decode against ground truth through the Dataset path
    mid = images["media_id"][0].as_py()
    dec_rows = {r["media_id"]: r for r in decoded.take_all()}
    pix = np.asarray(dec_rows[mid]["pixels"]).reshape(8, 8, 3)
    np.testing.assert_array_equal(
        pix, codecs.resize_nearest(truth[mid], 8, 8))

    audio = table.filter(pa.compute.field("kind") == "wav")
    out = rd.from_arrow(audio).map_batches(
        AudioFrameSampleStage, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"n_frames": 4, "strict": True}).take_all()
    assert all(r["codec"] == "wav" for r in out)
    assert len(out) == len(audio)


def test_image_neardup_pipeline_e2e(ray_session):
    """Full image-dedup pipeline over REAL encoded payloads: planted
    duplicate images (base + small noise) must pair up via decode →
    feature-embed → embedding-LSH near-dup; distinct base colors must not.
    """
    import ray.data as rd

    from doppel_speller_ray.stages.embed import embedding_neardup_lsh

    rng = np.random.default_rng(17)
    # 6 well-separated base colors; each gets one noisy near-dup copy.
    palette = [(200, 30, 30), (30, 200, 30), (30, 30, 200),
               (200, 200, 30), (200, 30, 200), (30, 200, 200)]
    rows = []
    for b, color in enumerate(palette):
        base = np.clip(np.full((16, 16, 3), color, np.int16)
                       + rng.integers(-8, 9, (16, 16, 3)), 0, 255).astype(np.uint8)
        dup = np.clip(base.astype(np.int16)
                      + rng.integers(-3, 4, (16, 16, 3)), 0, 255).astype(np.uint8)
        for j, img in enumerate((base, dup)):
            enc = codecs.encode_bmp if (b + j) % 2 == 0 else codecs.encode_ppm
            rows.append({"media_id": b * 2 + j, "payload": enc(img)})
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
        "payload": pa.array([r["payload"] for r in rows], pa.binary())}))
    emb = decode_images(ds, target=(16, 16), concurrency=2, strict=True) \
        .map_batches(ImageFeatureStage, batch_format="pyarrow", concurrency=2)
    pairs = embedding_neardup_lsh(emb, threshold=0.98, id_col="media_id",
                                  n_planes=8, n_tables=8).take_all()
    got = {(min(p["left_id"], p["right_id"]), max(p["left_id"], p["right_id"]))
           for p in pairs}
    expected = {(b * 2, b * 2 + 1) for b in range(len(palette))}
    assert got == expected


def test_y4m_round_trip_gray_exact():
    rng = np.random.default_rng(8)
    luma = rng.integers(0, 256, size=(5, 6, 9, 1)).astype(np.uint8)
    frames = np.repeat(luma, 3, axis=-1)  # gray → exact BT.601 round-trip
    payload = codecs.encode_y4m(frames, (30, 1))
    assert codecs.sniff(payload) == "y4m"
    out, fps = codecs.decode_y4m(payload)
    assert fps == (30, 1)
    np.testing.assert_array_equal(out, frames)


def test_y4m_mono_and_color_tolerance():
    rng = np.random.default_rng(9)
    mono = rng.integers(0, 256, size=(3, 4, 4, 1)).astype(np.uint8)
    out, _ = codecs.decode_y4m(codecs.encode_y4m(mono, colorspace="Cmono"))
    np.testing.assert_array_equal(out, np.repeat(mono, 3, axis=-1))
    color = rng.integers(0, 256, size=(2, 4, 4, 3)).astype(np.uint8)
    out2, _ = codecs.decode_y4m(codecs.encode_y4m(color))
    # full-range BT.601 through uint8 quantisation: small bounded error
    assert np.abs(out2.astype(int) - color.astype(int)).max() <= 32


def test_video_frame_sample_stage_real(ray_session):
    import ray.data as rd

    from doppel_speller_ray.stages.multimodal import VideoFrameSampleStage

    table, truth = make_media(n=8, seed=21, kinds_cycle=("y4m", "wav"),
                              video_frames=10)
    videos = table.filter(pa.compute.field("kind") == "y4m")
    out = rd.from_arrow(videos).map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"n_frames": 4, "thumb": (4, 4), "strict": True},
    ).take_all()
    assert len(out) == len(videos)
    rows = {r["media_id"]: r for r in out}
    mid = videos["media_id"][0].as_py()
    r = rows[mid]
    assert r["codec"] == "y4m" and r["n_total_frames"] == 10 and r["fps_num"] == 25
    # first sampled frame (index 0) must equal the ground-truth thumbnail
    got = np.asarray(r["frames"], np.float32).reshape(4, 4, 4, 3)[0]
    expected = codecs.resize_nearest(truth[mid][0], 4, 4).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, expected, atol=1e-6)

    # strict mode rejects non-video payloads
    from doppel_speller_ray.stages.multimodal import VideoFrameSampleStage as V
    bad = pa.table({"payload": pa.array([b"not a video 1234"], pa.binary())})
    with pytest.raises(NotImplementedError):
        V(strict=True)(bad)
    stub = V(strict=False)(bad).to_pylist()[0]
    assert stub["codec"] == "stub" and stub["n_total_frames"] == 0


def test_corrupt_sniffed_payloads_fall_back_not_crash():
    """Payloads whose magic sniffs as a known format but whose body is
    truncated/corrupt must fall back to the stub in non-strict mode and
    raise in strict mode — never crash the non-strict path."""
    from doppel_speller_ray.stages.multimodal import VideoFrameSampleStage

    corrupt = {
        "bmp": b"BM" + bytes(20),                 # truncated BMP header
        "ppm": b"P6\n4 4\n255\n" + bytes(3),      # body shorter than 4*4*3
        "wav": b"RIFF\x00\x00\x00\x00WAVEjunk",   # no fmt/data chunks
        "y4m": b"YUV4MPEG2 W4 H4",                # header missing newline
    }
    img = pa.table({"payload": pa.array([corrupt["bmp"], corrupt["ppm"]],
                                        pa.binary())})
    assert ImageDecodeStage(strict=False)(img)["codec"].to_pylist() == ["stub"] * 2
    with pytest.raises(Exception):
        ImageDecodeStage(strict=True)(img)

    aud = pa.table({"payload": pa.array([corrupt["wav"]], pa.binary())})
    assert AudioFrameSampleStage(strict=False)(aud)["codec"].to_pylist() == ["stub"]
    with pytest.raises(Exception):
        AudioFrameSampleStage(strict=True)(aud)

    vid = pa.table({"payload": pa.array([corrupt["y4m"]], pa.binary())})
    assert VideoFrameSampleStage(strict=False)(vid)["codec"].to_pylist() == ["stub"]
    with pytest.raises(Exception):
        VideoFrameSampleStage(strict=True)(vid)
