"""Frame-index resume for video bands (SURVEY.md §5 failure/resume).

Criterion (VERDICT item 7): interrupt a video run at frame N, re-run, and the
output folder matches an uninterrupted run. Both runs write the same
fixed-size mp4 segments + value ledger, so every computed value is identical.

Comparison contract: all DATA files (CSVs, ledgers, PNGs, metadata) must be
byte-identical — they capture the device compute exactly. The mp4 streams are
compared by DECODED CONTENT: x264 emits occasionally different (but
equivalent-quality) bitstreams for bit-identical YUV input within one process
(verified by checksumming the YUV planes fed to the encoder), so byte-stable
H.264 files are not achievable by any x264-based pipeline, the reference
included. The codec layer still minimizes variation (bit-exact swscale,
single-thread encoder ownership, normalized FP state — see CLAUDE.md
"Determinism"), and isolated runs are byte-identical in practice.
"""

import gc
import os
import shutil

import numpy as np
import pytest

from prisma_tpu.bands import depth_anything_band, depth_base
from prisma_tpu.runtime.config import RuntimeConfig
from tests.test_flow_raft_band import _make_folder

RT = dict(random_weights=True, compute_dtype="float32", batch_size=3,
          segment_frames=4)


def _clone_folder(src: str, dst_parent, name: str) -> str:
    """Byte-identical copy of an input folder (golden and crashy runs must
    see the SAME input bytes; re-encoding the input twice can differ)."""
    dst = str(dst_parent / name / "seq")
    shutil.copytree(src, dst)
    return dst


def _decode_frames(path):
    from prisma_tpu.io.video import VideoReader
    r = VideoReader(path)
    frames = [f for f in r]
    r.close()
    return frames


def _assert_folders_equivalent(golden: str, crashy: str, video_tol: int = 12):
    gb = _folder_bytes(golden)
    cb = _folder_bytes(crashy)
    assert set(gb) == set(cb)
    for name in sorted(gb):
        if gb[name] == cb[name]:
            continue
        # x264 bitstream variation: mp4s compare by decoded content
        assert name.endswith(".mp4"), f"{name} differs after resume"
        gf = _decode_frames(os.path.join(golden, name))
        cf = _decode_frames(os.path.join(crashy, name))
        assert len(gf) == len(cf), f"{name}: frame count differs"
        for i, (a, b) in enumerate(zip(gf, cf)):
            assert a.shape == b.shape, f"{name}[{i}]: geometry differs"
            d = int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max())
            assert d <= video_tol, f"{name}[{i}]: decoded diff {d}"


def _run(folder, runtime):
    # img_size=126 -> 9x9 ViT grid: fast compile
    return depth_anything_band.run(folder, encoder="vits", img_size=126,
                                   runtime=runtime)


def _folder_bytes(folder):
    out = {}
    for root, _dirs, files in os.walk(folder):
        for f in sorted(files):
            p = os.path.join(root, f)
            out[os.path.relpath(p, folder)] = open(p, "rb").read()
    return out


def test_resume_byte_identical(tmp_path):
    monkeypatch = pytest.MonkeyPatch()
    golden = _make_folder(tmp_path / "golden", frames=10, w=64, h=48)
    crashy = _clone_folder(golden, tmp_path, "crashy")

    _run(golden, RuntimeConfig(**RT))

    # crash after 2 batches (6 of 10 frames; 1 complete 4-frame segment)
    real_make_step = depth_base.make_step
    calls = {"n": 0}

    def failing_make_step(*args, **kwargs):
        step = real_make_step(*args, **kwargs)

        def wrapped(frames, *a, **kw):
            if calls["n"] >= 2:
                raise KeyboardInterrupt("simulated kill")
            calls["n"] += 1
            return step(frames, *a, **kw)

        return wrapped

    monkeypatch.setattr(depth_base, "make_step", failing_make_step)
    with pytest.raises(KeyboardInterrupt):
        _run(crashy, RuntimeConfig(**RT))
    monkeypatch.undo()
    gc.collect()  # release the interrupted segment writer (closes its file)

    seg_dir = os.path.join(crashy, "depth_anything.mp4.segments")
    assert os.path.isdir(seg_dir), "interrupted run should leave segments"
    from prisma_tpu.io.video import SegmentedVideoWriter
    done = SegmentedVideoWriter.completed_frames(
        os.path.join(crashy, "depth_anything.mp4"), 4)
    assert done == 4

    _run(crashy, RuntimeConfig(**RT))
    assert not os.path.isdir(seg_dir)

    _assert_folders_equivalent(golden, crashy)


def test_no_resume_when_disabled(tmp_path):
    folder = _make_folder(tmp_path / "plain", frames=5, w=64, h=48)
    rt = RuntimeConfig(**{**RT, "segment_frames": 0})
    io = _run(folder, rt)
    assert os.path.exists(io.output)
    assert not os.path.isdir(io.output + ".segments")


def test_mask_band_resume_byte_identical(tmp_path, monkeypatch):
    """Same criterion for the mask band (mp4 segments; PNGs are idempotent).

    The test_scale shrink rides the fixture monkeypatch (active for the WHOLE
    test — golden, crashy, and resume runs must all use the same budget); the
    crash injector gets a private instance so undo() removes only it.
    """
    from prisma_tpu.bands import mask_band
    from prisma_tpu.models import solov2

    # orchestration under test, not SOLOv2 numerics: shrink the (1333, 800)
    # budget so the CPU pass stays fast
    real_scale = solov2.test_scale
    monkeypatch.setattr(
        solov2, "test_scale",
        lambda h, w, long_edge=160, short_edge=96: real_scale(
            h, w, long_edge, short_edge))
    monkeypatch = pytest.MonkeyPatch()  # private: crash injector only

    rt = dict(random_weights=True, compute_dtype="float32", batch_size=2,
              segment_frames=2)
    golden = _make_folder(tmp_path / "golden", frames=5, w=64, h=48)
    crashy = _clone_folder(golden, tmp_path, "crashy")

    mask_band.run(golden, subpath="mask", runtime=RuntimeConfig(**rt))

    real = mask_band._make_step
    calls = {"n": 0}

    def failing(*args, **kwargs):
        step = real(*args, **kwargs)

        def wrapped(frames, *a, **kw):
            if calls["n"] >= 1:
                raise KeyboardInterrupt("simulated kill")
            calls["n"] += 1
            return step(frames, *a, **kw)

        return wrapped

    monkeypatch.setattr(mask_band, "_make_step", failing)
    with pytest.raises(KeyboardInterrupt):
        mask_band.run(crashy, subpath="mask", runtime=RuntimeConfig(**rt))
    monkeypatch.undo()
    gc.collect()

    assert os.path.isdir(os.path.join(crashy, "mask.mp4.segments"))
    mask_band.run(crashy, subpath="mask", runtime=RuntimeConfig(**rt))
    assert not os.path.isdir(os.path.join(crashy, "mask.mp4.segments"))

    _assert_folders_equivalent(golden, crashy)


def test_flow_band_resume_byte_identical(tmp_path):
    """Same criterion for flow bands: all segmented videos + max-disp ledger
    resume at the common last complete segment."""
    monkeypatch = pytest.MonkeyPatch()  # see note in test_resume_byte_identical
    from prisma_tpu.bands import flow_base, flow_gmflow_band

    rt = dict(random_weights=True, compute_dtype="float32", batch_size=2,
              segment_frames=2)
    golden = _make_folder(tmp_path / "golden", frames=7, w=48, h=32)
    crashy = _clone_folder(golden, tmp_path, "crashy")

    flow_gmflow_band.run(golden, backwards=True, runtime=RuntimeConfig(**rt))

    real = flow_base.make_flow_step
    calls = {"n": 0}

    def failing(*args, **kwargs):
        step = real(*args, **kwargs)

        def wrapped(frames):
            if calls["n"] >= 3:
                raise KeyboardInterrupt("simulated kill")
            calls["n"] += 1
            return step(frames)

        return wrapped

    monkeypatch.setattr(flow_base, "make_flow_step", failing)
    with pytest.raises(KeyboardInterrupt):
        flow_gmflow_band.run(crashy, backwards=True, runtime=RuntimeConfig(**rt))
    monkeypatch.undo()
    gc.collect()

    assert os.path.isdir(os.path.join(crashy, "flow_gmflow.mp4.segments"))
    flow_gmflow_band.run(crashy, backwards=True, runtime=RuntimeConfig(**rt))

    _assert_folders_equivalent(golden, crashy)
