"""Native codec round-trips: write mp4 with our encoder, read back with our decoder
(and cross-check with cv2's independent ffmpeg build when available)."""
import os

import numpy as np
import pytest

from prisma_tpu.io.video import VideoReader, VideoWriter, get_video_data

RNG = np.random.default_rng(3)


def _gradient_frames(n, h, w):
    frames = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        r = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
        g = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
        b = np.full((h, w), (i * 37) % 256, dtype=np.uint8)
        frames.append(np.stack([r, g, b], axis=-1))
    return frames


def test_roundtrip_rgb(tmp_path):
    path = str(tmp_path / "t.mp4")
    frames = _gradient_frames(10, 48, 64)
    w = VideoWriter(64, 48, 24.0, filename=path, async_encode=True)
    for f in frames:
        w.write(f)
    w.close()

    r = VideoReader(path)
    assert (r.width, r.height) == (64, 48)
    assert r.num_frames == 10
    assert abs(r.fps - 24.0) < 1e-6
    decoded = list(r)
    assert len(decoded) == 10
    # crf=15 is visually lossless; smooth gradients should come back close
    for orig, dec in zip(frames, decoded):
        assert np.abs(orig.astype(int) - dec.astype(int)).mean() < 4.0
    r.close()


def test_get_video_data(tmp_path):
    path = str(tmp_path / "t.mp4")
    w = VideoWriter(32, 32, 12.5, filename=path)
    for f in _gradient_frames(5, 32, 32):
        w.write(f)
    w.close()
    width, height, fps, n = get_video_data(path)
    assert (width, height, n) == (32, 32, 5)
    assert abs(fps - 12.5) < 0.02


def test_odd_dims_rounded_even(tmp_path):
    path = str(tmp_path / "odd.mp4")
    w = VideoWriter(63, 47, 24.0, filename=path)
    assert (w.width, w.height) == (64, 48)  # 2*round(63/2)=64, 2*round(47/2)=48
    for f in _gradient_frames(3, 47, 63):
        w.write(f)
    w.close()
    r = VideoReader(path)
    assert (r.width, r.height) == (64, 48)
    r.close()


def test_gray_and_rgba_formats(tmp_path):
    path = str(tmp_path / "g.mp4")
    w = VideoWriter(32, 32, 24.0, filename=path, async_encode=False)
    w.write(np.full((32, 32), 128, np.uint8))            # gray
    w.write(np.full((32, 32, 4), 128, np.uint8))         # rgba
    w.write(np.full((32, 32, 3), 300, np.uint16))        # rgb48
    w.close()
    r = VideoReader(path)
    assert r.num_frames == 3
    frames = list(r)
    assert len(frames) == 3
    assert abs(int(frames[0][16, 16, 0]) - 128) <= 3


def test_batched_prefetch_reader(tmp_path):
    path = str(tmp_path / "b.mp4")
    w = VideoWriter(32, 32, 24.0, filename=path)
    frames = _gradient_frames(11, 32, 32)
    for f in frames:
        w.write(f)
    w.close()
    r = VideoReader(path)
    batches = list(r.batches(4, pad_to_full=True))
    assert [b[0].shape[0] for b in batches] == [4, 4, 4]
    assert [b[1] for b in batches] == [4, 4, 3]
    # padded tail repeats the last frame
    np.testing.assert_array_equal(batches[-1][0][2], batches[-1][0][3])
    r.close()


def test_cv2_cross_check(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "x.mp4")
    frames = _gradient_frames(6, 40, 56)
    w = VideoWriter(56, 40, 24.0, filename=path)
    for f in frames:
        w.write(f)
    w.close()
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        pytest.skip("cv2 lacks ffmpeg video IO")
    ok, bgr = cap.read()
    assert ok
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    assert np.abs(rgb.astype(int) - frames[0].astype(int)).mean() < 4.0
    cap.release()


def test_missing_file_raises():
    with pytest.raises(IOError):
        VideoReader("/nonexistent/nope.mp4")


def test_extract_and_make_video_roundtrip(tmp_path):
    """extract_frames_from_video / make_video (reference io.py ffmpeg helpers,
    native here): dump frames, invert option, re-encode to a video."""
    import cv2
    from prisma_tpu.io.video import (VideoReader, VideoWriter,
                                     extract_frames_from_video, make_video)

    src = str(tmp_path / "src.mp4")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    w = VideoWriter(48, 32, 24.0, filename=src)
    for i in range(6):
        w.write(np.roll(base, i * 3, axis=1))
    w.close()

    frames_dir = str(tmp_path / "frames")
    n = extract_frames_from_video(src, frames_dir, extension="png")
    assert n == 6
    files = sorted(os.listdir(frames_dir))
    assert files[0] == "001.png" and len(files) == 6

    inv_dir = str(tmp_path / "inv")
    extract_frames_from_video(src, inv_dir, extension="png", invert=True)
    a = cv2.imread(os.path.join(frames_dir, "001.png"))
    b = cv2.imread(os.path.join(inv_dir, "001.png"))
    np.testing.assert_array_equal(b, 255 - a)

    half_dir = str(tmp_path / "half")
    assert extract_frames_from_video(src, half_dir, fps=12.0) == 3

    out = str(tmp_path / "rebuilt.mp4")
    make_video(out, frames_dir, fps=24)
    r = VideoReader(out)
    assert (r.width, r.height, r.num_frames) == (48, 32, 6)
    r.close()


@pytest.mark.parametrize("preset", ["ultrafast", "veryfast"])
def test_preset_roundtrip(tmp_path, preset, monkeypatch):
    # The x264 preset knob (production encode-throughput lever) must keep
    # crf-15 fidelity; also exercises the PRISMA_X264_PRESET env default.
    frames = _gradient_frames(8, 48, 64)
    path = str(tmp_path / f"{preset}.mp4")
    w = VideoWriter(64, 48, 24.0, filename=path, preset=preset)
    for f in frames:
        w.write(f)
    w.close()
    decoded = list(VideoReader(path))
    assert len(decoded) == 8
    for orig, dec in zip(frames, decoded):
        assert np.abs(orig.astype(int) - dec.astype(int)).mean() < 4.0

    monkeypatch.setenv("PRISMA_X264_PRESET", preset)
    path2 = str(tmp_path / f"env_{preset}.mp4")
    w = VideoWriter(64, 48, 24.0, filename=path2)  # preset=None -> env
    for f in frames:
        w.write(f)
    w.close()
    assert len(list(VideoReader(path2))) == 8


def test_segment_pool_matches_serial(tmp_path):
    """SegmentedVideoWriter with a worker pool (workers=3) produces the same
    video as the serial writer: each segment is encoded by its own x264
    instance from a fixed frame range, so parallelism cannot change content.
    (mp4s compare by decoded content — the in-process x264 bitstream caveat
    of tests/test_resume.py.)"""
    from prisma_tpu.io.video import SegmentedVideoWriter

    frames = _gradient_frames(14, 48, 64)  # 3 full segments + a 2-frame tail

    def encode(name, workers):
        path = str(tmp_path / name)
        wr = SegmentedVideoWriter(64, 48, 24.0, filename=path,
                                  segment_frames=4, workers=workers)
        for f in frames:
            wr.write(f)
        wr.close()
        r = VideoReader(path)
        decoded = list(r)
        n = r.num_frames
        r.close()
        return n, decoded

    n1, serial = encode("serial.mp4", 1)
    n3, pooled = encode("pooled.mp4", 3)
    assert n1 == n3 == 14
    # same decoded-content criterion as tests/test_resume.py /
    # test_multiband.py: x264 emits occasionally different bitstreams for
    # identical input within one process; small mean, bounded excursions
    for a, b in zip(serial, pooled):
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.mean() < 1.0 and d.max() <= 32, (d.mean(), d.max())
