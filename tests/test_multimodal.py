"""Audio/video multimodal stages: real Ray actor-pool plumbing over
binary payload columns, deterministic stand-in codecs at the documented
swap points."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from raydal.ops.multimodal import (AudioFeatures, VideoFrameSample,
                                   decode_audio, decode_video_frames,
                                   encode_fake_pcm, encode_fake_video,
                                   probe_video)


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
        # non-WAV, non-FPCM audio (e.g. an mp3 frame header) and
        # non-AVI, non-FVID video (an mp4 ftyp box) hit the swap point
        with pytest.raises(NotImplementedError):
            decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 32)
        with pytest.raises(NotImplementedError):
            decode_video_frames(b"\x00\x00\x00 ftypmp4")
        # malformed WAV routes to the real reader: decode error
        with pytest.raises(ValueError):
            decode_audio(b"RIFF\x04\x00\x00\x00WAVE")


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


class TestRealWav:
    """From-scratch RIFF/WAVE reader vs stdlib ``wave`` (independent
    public encoder) — the real-audio side of the swap point."""

    def _stdlib_wav(self, raw, width, ch, rate=22050):
        import io
        import wave

        bio = io.BytesIO()
        w = wave.open(bio, "wb")
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(raw)
        w.close()
        return bio.getvalue()

    def test_stdlib_wave_parity_16bit(self):
        rng = np.random.default_rng(7)
        v = rng.integers(-32768, 32768, 400).astype("<i2")
        s, rate = decode_audio(self._stdlib_wav(v.tobytes(), 2, 1))
        assert rate == 22050
        np.testing.assert_allclose(s, v.astype(np.float64) / 32768.0)

    def test_stdlib_wave_parity_8_24_32bit(self):
        rng = np.random.default_rng(8)
        from raydal.io.wav import decode_wav

        u8 = rng.integers(0, 256, 100).astype(np.uint8)
        s, _ = decode_wav(self._stdlib_wav(u8.tobytes(), 1, 1))
        np.testing.assert_allclose(
            s, (u8.astype(np.float64) - 128.0) / 128.0)

        v24 = rng.integers(-(1 << 23), 1 << 23, 100).astype(np.int64)
        raw = np.empty((100, 3), np.uint8)
        raw[:, 0] = v24 & 0xFF
        raw[:, 1] = (v24 >> 8) & 0xFF
        raw[:, 2] = (v24 >> 16) & 0xFF
        s, _ = decode_wav(self._stdlib_wav(raw.tobytes(), 3, 1))
        np.testing.assert_allclose(s, v24 / float(1 << 23))

        v32 = rng.integers(-(1 << 31), 1 << 31, 100).astype("<i4")
        s, _ = decode_wav(self._stdlib_wav(v32.tobytes(), 4, 1))
        np.testing.assert_allclose(s, v32 / float(1 << 31))

    def test_stereo_averages_to_mono(self):
        left = np.full(50, 16384, "<i2")
        right = np.full(50, -16384, "<i2")
        inter = np.empty(100, "<i2")
        inter[0::2] = left
        inter[1::2] = right
        s, _ = decode_audio(self._stdlib_wav(inter.tobytes(), 2, 2))
        np.testing.assert_allclose(s, 0.0, atol=1e-12)

    def test_encode_wav_round_trip_and_stdlib_cross_read(self):
        import io
        import wave

        from raydal.io.wav import decode_wav, encode_wav

        rng = np.random.default_rng(9)
        v = rng.integers(-32768, 32768, 777).astype(np.int16)
        buf = encode_wav(v, 16000, bits=16)
        s, rate = decode_wav(buf)
        assert rate == 16000
        np.testing.assert_allclose(s, v / 32768.0)
        w = wave.open(io.BytesIO(buf))
        assert (w.getnframes(), w.getframerate(),
                w.getsampwidth()) == (777, 16000, 2)
        back = np.frombuffer(w.readframes(777), "<i2")
        np.testing.assert_array_equal(back, v)

    def test_float_and_extensible_formats(self):
        import struct

        from raydal.io.wav import decode_wav

        rng = np.random.default_rng(10)
        v = rng.standard_normal(64)
        for bits, fmt in ((32, "<f4"), (64, "<f8")):
            payload = v.astype(fmt).tobytes()
            hdr = (b"WAVEfmt "
                   + struct.pack("<IHHIIHH", 16, 3, 1, 8000,
                                 8000 * bits // 8, bits // 8, bits)
                   + b"data" + struct.pack("<I", len(payload)))
            buf = (b"RIFF" + struct.pack("<I", len(hdr) + len(payload))
                   + hdr + payload)
            s, _ = decode_wav(buf)
            np.testing.assert_allclose(s, v.astype(fmt).astype("f8"))
        # WAVE_FORMAT_EXTENSIBLE wrapping PCM16
        v16 = rng.integers(-32768, 32768, 128).astype("<i2")
        guid = (struct.pack("<H", 1)
                + bytes.fromhex("000000001000800000aa00389b71"))
        f = (struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
             + struct.pack("<HHI", 22, 16, 4) + guid)
        hdr = (b"WAVEfmt " + struct.pack("<I", len(f)) + f
               + b"data" + struct.pack("<I", len(v16.tobytes())))
        buf = (b"RIFF" + struct.pack("<I", len(hdr) + 256) + hdr
               + v16.tobytes())
        s, rate = decode_wav(buf)
        assert rate == 16000
        np.testing.assert_allclose(s, v16 / 32768.0)

    def test_compressed_tag_rejected(self):
        # perceptual codecs (here MPEG-in-WAV, tag 0x0055) stay out of
        # scope; the formerly-rejected tag 0x0002 is now a real decoder
        import struct

        from raydal.io.wav import decode_wav

        hdr = (b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 0x55, 1, 8000, 8000, 1, 4)
               + b"data" + struct.pack("<I", 4))
        buf = b"RIFF" + struct.pack("<I", len(hdr) + 4) + hdr + b"\0" * 4
        with pytest.raises(ValueError, match="format tag"):
            decode_wav(buf)

    def test_audio_features_over_real_wav(self, ray_session):
        """AudioFeatures runs unchanged over real WAV payloads."""
        import ray.data

        from raydal.io.wav import encode_wav

        rate = 8000
        t = np.arange(rate // 2) / rate
        rows = [{"clip_id": f"w{i}",
                 "audio": encode_wav(
                     0.5 * np.sin(2 * np.pi * 200.0 * (i + 1) * t),
                     rate)} for i in range(4)]
        out = (ray.data.from_items(rows)
               .map_batches(AudioFeatures, batch_format="pyarrow",
                            concurrency=2, batch_size=2).to_pandas())
        assert len(out) == 4
        assert out["rms"].iloc[0] == pytest.approx(0.3535, abs=2e-3)
        zc = out.sort_values("clip_id")["zero_crossings"].to_numpy()
        assert (np.diff(zc) > 0).all()


class TestRealAvi:
    """MJPEG-in-AVI container: idx1-seek + from-scratch JPEG decode."""

    def _frames(self, n=12, h=48, w=64):
        base = np.add.outer(np.arange(h), np.arange(w)).astype(np.float64)
        return np.stack([(base * (i + 1) * 0.4) % 200 + 20
                         for i in range(n)]).astype(np.uint8)

    def test_probe_and_decode_psnr(self):
        from raydal.io.avi import encode_avi_mjpeg

        frames = self._frames()
        avi = encode_avi_mjpeg(frames, fps=8, quality=95)
        n, fps = probe_video(avi)
        assert (n, fps) == (12, 8.0)
        dec, fps2 = decode_video_frames(avi)
        assert dec.shape == frames.shape and fps2 == 8.0
        for i in range(12):
            mse = np.mean((frames[i].astype(np.float64)
                           - dec[i].astype(np.float64)) ** 2)
            assert 10 * np.log10(255 ** 2 / mse) >= 40.0

    def test_idx1_seek_matches_full_decode(self):
        from raydal.io.avi import encode_avi_mjpeg

        avi = encode_avi_mjpeg(self._frames(), fps=8, quality=95)
        full, _ = decode_video_frames(avi)
        sel, _ = decode_video_frames(avi, indices=[0, 5, 11])
        np.testing.assert_array_equal(sel, full[[0, 5, 11]])

    def test_movi_scan_fallback_without_idx1(self):
        import struct

        from raydal.io.avi import encode_avi_mjpeg

        avi = encode_avi_mjpeg(self._frames(), fps=8, quality=95)
        full, _ = decode_video_frames(avi)
        cut = avi[:avi.rfind(b"idx1")]
        noidx = b"RIFF" + struct.pack("<I", len(cut) - 8) + cut[8:]
        sel, _ = decode_video_frames(noidx, indices=[0, 5, 11])
        np.testing.assert_array_equal(sel, full[[0, 5, 11]])

    def test_rgb_frames_gray_conversion(self):
        from raydal.io.avi import decode_avi_frames, encode_avi_mjpeg

        f = self._frames(3)
        rgb = np.stack([np.dstack([x, x // 2, 255 - x]) for x in f])
        avi = encode_avi_mjpeg(rgb, fps=10, quality=95)
        color, _ = decode_avi_frames(avi, indices=[1], gray=False)
        assert color.shape == (1, 48, 64, 3)
        g, _ = decode_avi_frames(avi, indices=[1])
        # gray = BT.601 luma of the color decode, CopyWords rounding
        y = np.floor(0.299 * color[0, ..., 0] + 0.587 * color[0, ..., 1]
                     + 0.114 * color[0, ..., 2] + 0.5).astype(np.uint8)
        np.testing.assert_array_equal(g[0], y)

    def test_video_frame_sample_over_real_avi(self, ray_session):
        """VideoFrameSample seeks + JPEG-decodes only sampled frames of
        real AVI payloads; duplicate clips collide on every phash."""
        import ray.data

        from raydal.io.avi import encode_avi_mjpeg

        base = self._frames(10, 32, 40)
        rows = [{"clip_id": f"a{i}",
                 "video": encode_avi_mjpeg(
                     np.roll(base[:, ::(1 if i % 2 == 0 else -1)],
                             i * 9, axis=2), fps=5)}
                for i in range(3)]
        rows.append(dict(rows[0], clip_id="a0_copy"))
        out = (ray.data.from_items(rows)
               .map_batches(VideoFrameSample,
                            fn_constructor_kwargs={"k": 4},
                            batch_format="pyarrow",
                            concurrency=2, batch_size=2).to_pandas())
        assert len(out) == 16
        a = set(out[out.clip_id == "a0"]["phash"])
        assert a == set(out[out.clip_id == "a0_copy"]["phash"])
        assert a != set(out[out.clip_id == "a1"]["phash"])


class TestAviAudioTrack:
    """PCM 'auds' stream in AVI: decode_audio extracts the audio track
    of a video container; VideoFrameSample/AudioFeatures both run on
    the SAME payload."""

    def _clip(self):
        from raydal.io.avi import encode_avi_mjpeg

        base = np.add.outer(np.arange(32), np.arange(40)) \
            .astype(np.float64)
        frames = np.stack([(base * (i + 1) * 0.5) % 220 + 10
                           for i in range(8)]).astype(np.uint8)
        t = np.arange(8000) / 8000.0
        audio = 0.5 * np.sin(2 * np.pi * 300 * t)
        return encode_avi_mjpeg(frames, fps=4, audio=audio,
                                audio_rate=8000), audio

    def test_audio_extraction_exact(self):
        avi, audio = self._clip()
        s, rate = decode_audio(avi)
        assert rate == 8000 and len(s) == 8000
        q = np.clip(np.round(audio * 32767), -32768, 32767) / 32768.0
        np.testing.assert_allclose(s, q)

    def test_video_stream_unaffected_by_audio_chunks(self):
        avi, _ = self._clip()
        from raydal.ops.multimodal import probe_video

        n, fps = probe_video(avi)
        assert (n, fps) == (8, 4.0)
        frames, _ = decode_video_frames(avi, indices=[0, 7])
        assert frames.shape == (2, 32, 40)

    def test_both_stages_on_one_payload(self, ray_session):
        import ray.data

        avi, _ = self._clip()
        rows = [{"clip_id": "av0", "video": avi, "audio": avi}]
        vf = (ray.data.from_items(rows)
              .map_batches(VideoFrameSample,
                           fn_constructor_kwargs={"k": 2},
                           batch_format="pyarrow",
                           concurrency=1).to_pandas())
        assert len(vf) == 2
        af = (ray.data.from_items(rows)
              .map_batches(AudioFeatures, batch_format="pyarrow",
                           concurrency=1).to_pandas())
        assert len(af) == 1
        assert af["duration_sec"].iloc[0] == 1.0
        assert af["rms"].iloc[0] > 0.3

    def test_no_audio_stream_raises(self):
        from raydal.io.avi import encode_avi_mjpeg, extract_avi_audio

        avi = encode_avi_mjpeg(
            np.zeros((2, 16, 16), np.uint8), fps=2)
        with pytest.raises(ValueError, match="no audio"):
            extract_avi_audio(avi)


class TestContainerStrictness:
    def test_wav_riff_size_includes_odd_payload_pad(self):
        """Strict RIFF parsers trust the container size field: the
        odd-payload pad byte must be counted inside it."""
        import struct

        from raydal.io.wav import encode_wav

        v = np.array([0.1, -0.2, 0.3], np.float64)   # 3×1 byte = odd
        buf = encode_wav(v, 8000, bits=8)
        riff_size = struct.unpack_from("<I", buf, 4)[0]
        assert len(buf) == 8 + riff_size   # no bytes outside RIFF

    def test_avi_no_video_frames_with_indices_raises(self):
        import struct

        from raydal.io.avi import decode_avi_frames

        # minimal AVI: hdrl with avih only, empty movi, no frames
        avih = (b"avih" + struct.pack("<I", 56) + struct.pack(
            "<14I", 33333, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
        hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
        movi = b"LIST" + struct.pack("<I", 4) + b"movi"
        body = b"AVI " + hdrl + movi
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="no video frames"):
            decode_avi_frames(buf, indices=[0])
