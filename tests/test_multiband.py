"""Fused single-decode multi-band pipeline (bands/multiband.py).

Golden criterion (VERDICT r4 item 1): `process.py` driving mask + depth +
flow through ONE decode of rgba.mp4 must produce outputs identical to the
sequential per-band path — data files byte-identical, mp4s identical by
decoded content (same x264 caveat as tests/test_resume.py).
"""

import json
import os
import shutil

import numpy as np
import pytest

from tests.test_resume import _decode_frames, _folder_bytes


def _make_video(path, frames=6, w=96, h=64):
    from prisma_tpu.io.video import VideoWriter
    wr = VideoWriter(w, h, 24.0, filename=path)
    for i in range(frames):
        yy, xx = np.mgrid[0:h, 0:w]
        f = np.stack([(xx * 2 + i * 10) % 256, (yy * 3) % 256,
                      (xx + yy + i * 5) % 256], -1).astype(np.uint8)
        wr.write(f)
    wr.close()


def _assert_equivalent(fused_dir, seq_dir):
    fb = _folder_bytes(fused_dir)
    sb = _folder_bytes(seq_dir)
    assert set(fb) == set(sb), (
        f"inventory differs: only-fused={sorted(set(fb) - set(sb))} "
        f"only-seq={sorted(set(sb) - set(fb))}")
    for name in sorted(fb):
        if fb[name] == sb[name]:
            continue
        if name.endswith("metadata.json"):
            assert json.loads(fb[name]) == json.loads(sb[name])
            continue
        # x264 bitstream variation: mp4s compare by decoded content. The
        # device outputs are proven identical by the byte-identical CSVs and
        # PNGs above; the encoder's in-process nondeterminism is small in
        # MEAN (a few hundredths) with occasional ~20-level single-pixel
        # excursions at crf 15 — a real content bug (wrong batch grouping)
        # shows structured diffs with mean >> 1.
        assert name.endswith(".mp4"), f"{name} differs between paths"
        gf = _decode_frames(os.path.join(fused_dir, name))
        cf = _decode_frames(os.path.join(seq_dir, name))
        assert len(gf) == len(cf), f"{name}: frame count differs"
        for i, (a, b) in enumerate(zip(gf, cf)):
            assert a.shape == b.shape, f"{name}[{i}]: geometry differs"
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.mean() < 1.5 and d.max() <= 40, (
                f"{name}[{i}]: decoded diff mean {d.mean():.3f} "
                f"max {int(d.max())}")


@pytest.mark.slow
def test_fused_matches_sequential(tmp_path, monkeypatch):
    """The default process.py video pipeline (fused) == --sequential_bands,
    file by file, across mask+depth+flow with backwards/mask flow outputs
    and segmented writers."""
    from prisma_tpu.cli.process import main
    from prisma_tpu.models import solov2
    real_scale = solov2.test_scale
    monkeypatch.setattr(
        solov2, "test_scale",
        lambda h, w, long_edge=160, short_edge=96: real_scale(
            h, w, long_edge, short_edge))

    os.makedirs(tmp_path / "a")
    os.makedirs(tmp_path / "b")
    clip_a = str(tmp_path / "a" / "clip.mp4")
    clip_b = str(tmp_path / "b" / "clip.mp4")
    _make_video(clip_a)
    shutil.copy(clip_a, clip_b)

    common = ["--random_weights", "--encoder", "vits", "--batch", "2",
              "--dtype", "float32", "--depth_size", "126",
              "--flow_backwards", "--flow_mask", "--segment_frames", "4"]
    # both paths must DECODE the same rgba bytes (x264's in-process bitstream
    # variation would otherwise leak ±1 LSB into the band inputs and the
    # min/max CSV floats): build the rgba folder once, clone it, and let each
    # path's rgba step skip over the existing file
    main(["-i", clip_a, "--mask", "none", "--depth", "none",
          "--flow", "none"])
    shutil.copytree(tmp_path / "a" / "clip", tmp_path / "b" / "clip")

    fused_dir = main(["-i", clip_a] + common)
    seq_dir = main(["-i", clip_b, "--sequential_bands"] + common)

    files = sorted(os.listdir(fused_dir))
    for expected in ["mask.mp4", "mask", "depth_anything.mp4",
                     "depth_anything_min.csv", "depth_anything_max.csv",
                     "flow_gmflow.mp4", "flow_gmflow.csv",
                     "flow_gmflow_bwd.mp4", "flow_gmflow_mask.mp4",
                     "flow_gmflow_mask_bwd.mp4"]:
        assert expected in files, f"{expected} missing from {files}"
    _assert_equivalent(fused_dir, seq_dir)


def test_fused_skips_existing_band(tmp_path, monkeypatch, capsys):
    """A band whose output exists is skipped inside the fused pipeline (the
    sequential drivers' FileExistsError contract) while the others run."""
    from prisma_tpu.bands import multiband
    from prisma_tpu.models import solov2
    real_scale = solov2.test_scale
    monkeypatch.setattr(
        solov2, "test_scale",
        lambda h, w, long_edge=160, short_edge=96: real_scale(
            h, w, long_edge, short_edge))
    from prisma_tpu.runtime.config import RuntimeConfig

    clip = str(tmp_path / "clip.mp4")
    _make_video(clip, frames=3)
    # pre-existing mask output (video input -> mask.mp4 target)
    open(str(tmp_path / "mask.mp4"), "wb").close()
    runtime = RuntimeConfig(random_weights=True, compute_dtype="float32",
                            batch_size=2, segment_frames=0, overwrite=False)
    ran = multiband.run_fused(
        clip, runtime, mask_on=True,
        depth_band="depth_anything",
        depth_build={"encoder": "vits", "img_size": 126},
        flow_band=None)
    assert ran["mask_mmdet"] is False
    assert ran["depth_anything"] is True
    assert "skipping" in capsys.readouterr().out
    assert os.path.exists(str(tmp_path / "depth_anything.mp4"))


@pytest.mark.slow
def test_fused_resume_byte_identical(tmp_path, monkeypatch):
    """Kill the fused pipeline mid-run, re-run, and the folder matches an
    uninterrupted fused run: all bands resume at the MIN of their completed
    segment boundaries (multiband's shared-reader resume), and every data
    file is byte-identical (mp4s by decoded content, as in test_resume)."""
    import gc

    from prisma_tpu.bands import depth_base, multiband
    from prisma_tpu.models import solov2
    from prisma_tpu.runtime.config import RuntimeConfig
    real_scale = solov2.test_scale
    monkeypatch.setattr(
        solov2, "test_scale",
        lambda h, w, long_edge=160, short_edge=96: real_scale(
            h, w, long_edge, short_edge))

    os.makedirs(tmp_path / "g")
    clip = str(tmp_path / "g" / "clip.mp4")
    _make_video(clip, frames=8, w=64, h=48)
    # build the rgba folder once and clone it (both runs decode the same
    # bytes); run_fused operates on the PRISMA folder directly
    from prisma_tpu.cli.process import main
    main(["-i", clip, "--mask", "none", "--depth", "none", "--flow", "none"])
    golden = str(tmp_path / "g" / "clip")
    crashy = str(tmp_path / "crashy")
    shutil.copytree(golden, crashy)

    rt = dict(random_weights=True, compute_dtype="float32", batch_size=2,
              segment_frames=2)
    kw = dict(mask_on=True, mask_sdf=True, mask_subpath="mask",
              depth_band="depth_anything",
              depth_build={"encoder": "vits", "img_size": 126},
              flow_band="flow_gmflow")

    multiband.run_fused(golden, RuntimeConfig(**rt), **kw)

    # crash after 2 batches (4 of 8 frames; 2 complete 2-frame segments for
    # mask/depth, 1 for flow)
    real_make_step = depth_base.make_step
    calls = {"n": 0}

    def failing_make_step(*args, **kwargs):
        step = real_make_step(*args, **kwargs)

        def wrapped(frames, *a, **k):
            if calls["n"] >= 2:
                raise KeyboardInterrupt("simulated kill")
            calls["n"] += 1
            return step(frames, *a, **k)

        return wrapped

    monkeypatch.setattr(depth_base, "make_step", failing_make_step)
    with pytest.raises(KeyboardInterrupt):
        multiband.run_fused(crashy, RuntimeConfig(**rt), **kw)
    monkeypatch.setattr(depth_base, "make_step", real_make_step)
    gc.collect()  # release interrupted segment writers (close their files)

    from prisma_tpu.io.video import SegmentedVideoWriter
    assert SegmentedVideoWriter.completed_frames(
        os.path.join(crashy, "depth_anything.mp4"), 2) == 4
    flow_done = SegmentedVideoWriter.completed_frames(
        os.path.join(crashy, "flow_gmflow.mp4"), 2)
    assert flow_done == 2  # flow wrote 3 pair-frames -> 1 complete segment

    multiband.run_fused(crashy, RuntimeConfig(**rt), **kw)
    for leftover in ("depth_anything.mp4.segments", "flow_gmflow.mp4.segments",
                     "mask.mp4.segments"):
        assert not os.path.isdir(os.path.join(crashy, leftover))
    _assert_equivalent(golden, crashy)
