"""Audio/video multimodal stages: real Ray actor-pool plumbing over
binary payload columns, deterministic stand-in codecs at the documented
swap points."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydal.ops.multimodal import (AudioFeatures, VideoFrameSample,
                                   decode_audio, decode_video_frames,
                                   encode_fake_pcm, encode_fake_video)


def _clips(n=6, rate=8000):
    rows = []
    for i in range(n):
        t = np.arange(rate // 2) / rate
        freq = 200.0 * (i + 1)
        s = 0.5 * np.sin(2 * np.pi * freq * t)
        rows.append({"clip_id": f"c{i}",
                     "audio": encode_fake_pcm(s, rate=rate)})
    return rows


def _videos(n=4):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(n):
        frames = rng.integers(0, 255, (12, 32, 48), dtype=np.uint8)
        rows.append({"clip_id": f"v{i}",
                     "video": encode_fake_video(frames, fps=6)})
    return rows


class TestCodecs:
    def test_pcm_round_trip(self):
        s = np.sin(np.linspace(0, 20, 1000))
        out, rate = decode_audio(encode_fake_pcm(s, rate=22050))
        assert rate == 22050
        np.testing.assert_allclose(out, s, atol=1 / 32767)

    def test_video_round_trip_and_seek(self):
        frames = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
        buf = encode_fake_video(frames, fps=2)
        all_f, fps = decode_video_frames(buf)
        np.testing.assert_array_equal(all_f, frames)
        sel, _ = decode_video_frames(buf, indices=[0, 4])
        np.testing.assert_array_equal(sel, frames[[0, 4]])

    def test_unknown_payload_raises_swap_point(self):
        with pytest.raises(NotImplementedError):
            decode_audio(b"RIFF....WAVE")
        with pytest.raises(NotImplementedError):
            decode_video_frames(b"\x00\x00\x00 ftypmp4")


class TestStages:
    def test_audio_features_actor_pool(self, ray_session):
        import ray.data

        ds = ray.data.from_items(_clips())
        out = ds.map_batches(AudioFeatures, batch_format="pyarrow",
                             concurrency=2, batch_size=3).to_pandas()
        assert len(out) == 6
        assert {"duration_sec", "rms", "zero_crossings",
                "band_0"} <= set(out.columns)
        # 0.5-amplitude sine: rms = 0.5/sqrt(2)
        assert out["rms"].iloc[0] == pytest.approx(0.3535, abs=2e-3)
        # higher-frequency clips cross zero more often
        zc = out.sort_values("clip_id")["zero_crossings"].to_numpy()
        assert (np.diff(zc) > 0).all()

    def test_video_frame_sample_actor_pool(self, ray_session):
        import ray.data

        ds = ray.data.from_items(_videos())
        out = ds.map_batches(VideoFrameSample,
                             fn_constructor_kwargs={"k": 4},
                             batch_format="pyarrow",
                             concurrency=2, batch_size=2).to_pandas()
        assert len(out) == 16           # 4 clips × 4 sampled frames
        assert out["frame_index"].max() <= 11
        # fingerprints only — no pixel column leaves the stage
        assert "video" not in out.columns
        # deterministic: same input → same phash set
        out2 = ds.map_batches(VideoFrameSample,
                              fn_constructor_kwargs={"k": 4},
                              batch_format="pyarrow",
                              concurrency=2, batch_size=2).to_pandas()
        assert sorted(out["phash"]) == sorted(out2["phash"])

    def test_frame_dedup_shape(self, ray_session):
        """Sampled-frame fingerprints feed the existing hamming near-dup
        machinery: duplicate clips collide on every frame phash."""
        import ray.data

        vids = _videos(2)
        dup = [vids[0], dict(vids[0], clip_id="v0_copy"), vids[1]]
        ds = ray.data.from_items(dup)
        out = ds.map_batches(VideoFrameSample,
                             fn_constructor_kwargs={"k": 3},
                             batch_format="pyarrow",
                             concurrency=2).to_pandas()
        a = set(out[out.clip_id == "v0"]["phash"])
        b = set(out[out.clip_id == "v0_copy"]["phash"])
        c = set(out[out.clip_id == "v1"]["phash"])
        assert a == b
        assert a != c


class TestEdgeCases:
    def test_top_bit_hashes_stay_distinct(self):
        # frames whose 8x8 bit patterns differ only in bit 63 must not
        # collide (two's-complement reinterpretation, not offset)
        a = np.zeros((8, 8), np.uint8)
        a[0, 0] = 255          # top-left block above mean → bit 63 set
        a[7, :] = 200
        b = a.copy()
        b[0, 0] = 0            # clear bit 63 only
        ha = VideoFrameSample._ahash64(a)
        hb = VideoFrameSample._ahash64(b)
        assert ha != hb

    def test_tiny_frames_hash_without_warnings(self):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            h = VideoFrameSample._ahash64(
                np.arange(24, dtype=np.uint8).reshape(4, 6))
        assert isinstance(h, int)

    def test_zero_frame_video_emits_no_rows(self, ray_session):
        import ray.data

        empty = encode_fake_video(np.zeros((0, 16, 16), np.uint8))
        ds = ray.data.from_items(
            [{"clip_id": "e", "video": empty}] + _videos(1))
        out = ds.map_batches(VideoFrameSample, batch_format="pyarrow",
                             concurrency=1).to_pandas()
        assert set(out["clip_id"]) == {"v0"}

    def test_probe_video_swap_point(self):
        from raydal.ops.multimodal import probe_video

        with pytest.raises(NotImplementedError):
            probe_video(b"\x00\x00\x00 ftypmp4.....")
        n, fps = probe_video(encode_fake_video(
            np.zeros((3, 4, 4), np.uint8), fps=7))
        assert (n, fps) == (3, 7)
