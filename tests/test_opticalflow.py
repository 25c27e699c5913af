"""Analyze-video pipeline tests: DB generation, resume, cancel."""

import cv2
import numpy as np
import pytest

from polychase_tpu.engine.gftt import GFTTOptions
from polychase_tpu.engine.opticalflow import (
    IMAGE_SKIPS,
    FrameNotProvidedError,
    VideoInfo,
    generate_optical_flow_database,
    rgb_to_gray,
)
from polychase_tpu.io.database import Database


def make_clip(rng, n=12, h=120, w=160):
    base = rng.integers(0, 255, (h + 40, w + 60)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 1.5)
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    frames = []
    for t in range(n):
        crop = base[10 + t : 10 + t + h, 20 + 2 * t : 20 + 2 * t + w]
        frames.append(np.stack([crop] * 3, axis=-1))
    return frames


def test_rgb_to_gray_matches_opencv(rng):
    img = rng.integers(0, 255, (32, 40, 3)).astype(np.uint8)
    golden = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    ours = rgb_to_gray(img)
    assert np.abs(ours.astype(int) - golden.astype(int)).max() <= 1


def test_generate_database(tmp_path, rng):
    frames = make_clip(rng)
    info = VideoInfo(width=160, height=120, first_frame=0, num_frames=10)
    db_path = str(tmp_path / "flow.db")
    progress = []

    generate_optical_flow_database(
        info,
        lambda fid: frames[fid] if 0 <= fid < len(frames) else None,
        lambda p, msg: progress.append((p, msg)) or True,
        db_path,
        GFTTOptions(min_distance=7),
    )

    assert progress[-1] == (1.0, "Done")
    db = Database(db_path)
    # Every frame got keypoints
    for f in range(10):
        kps = db.read_keypoints(f)
        assert kps.shape[0] > 10
    # Pair flows exist along the skip pattern
    for f in range(10):
        expected = {
            f + s for s in IMAGE_SKIPS if 0 <= f + s < 10
        }
        got = set(db.find_optical_flows_from_image(f))
        assert got == expected
    # Flow correctness: frame f→f+1 should be ≈ (-2, -1) (the crop pans)
    flow = db.read_image_pair_flow(3, 4)
    kps3 = db.read_keypoints(3)
    delta = flow.tgt_kps - kps3[flow.src_kps_indices]
    med = np.median(delta, axis=0)
    np.testing.assert_allclose(med, [-2.0, -1.0], atol=0.1)
    db.close()


def test_resume_skips_existing(tmp_path, rng):
    frames = make_clip(rng)
    info = VideoInfo(160, 120, 0, 6)
    db_path = str(tmp_path / "flow.db")

    calls = []

    def accessor(fid):
        calls.append(fid)
        return frames[fid]

    generate_optical_flow_database(info, accessor, None, db_path)
    n_first = len(calls)
    # The gray-frame LRU decodes each frame exactly once on the first run.
    assert n_first == 6
    calls.clear()
    generate_optical_flow_database(info, accessor, None, db_path)
    # Second run finds keypoints and all pair flows in the DB and never
    # touches the accessor.
    assert len(calls) == 0


def test_cancel(tmp_path, rng):
    frames = make_clip(rng)
    info = VideoInfo(160, 120, 0, 10)
    db_path = str(tmp_path / "flow.db")
    seen = []

    def cb(p, msg):
        seen.append(msg)
        return len(seen) < 3

    generate_optical_flow_database(info, lambda f: frames[f], cb, db_path)
    assert seen[-1] == "Cancelled"
    db = Database(db_path)
    assert db.read_keypoints(5).shape[0] == 0
    db.close()


def test_missing_frame_raises(tmp_path):
    info = VideoInfo(160, 120, 0, 4)
    with pytest.raises(FrameNotProvidedError):
        generate_optical_flow_database(
            info, lambda f: None, None, str(tmp_path / "flow.db")
        )


def test_chained_skip_fan_analyze_parity(tmp_path, rng, monkeypatch):
    """Chained skip initialization (POLYCHASE_LK_CHAIN, single-device)
    must produce per-pair flows equivalent to the independent solves:
    the seed only moves the start of the iteration, the converged
    optimum is the same (within the f16 transfer rounding)."""
    monkeypatch.setenv("POLYCHASE_SHARD_ANALYZE", "0")
    frames = make_clip(rng)
    info = VideoInfo(width=160, height=120, first_frame=0, num_frames=10)

    def generate(path):
        generate_optical_flow_database(
            info,
            lambda fid: frames[fid] if 0 <= fid < len(frames) else None,
            None,
            path,
            GFTTOptions(min_distance=7),
        )
        return Database(path)

    from polychase_tpu.engine.lk import chain_engages

    monkeypatch.setenv("POLYCHASE_LK_CHAIN", "1")
    assert chain_engages([-2, -1, 1, 2, 4, 8])
    db_c = generate(str(tmp_path / "chain.db"))
    monkeypatch.setenv("POLYCHASE_LK_CHAIN", "0")
    assert not chain_engages([-2, -1, 1, 2, 4, 8])
    db_u = generate(str(tmp_path / "plain.db"))

    agree = total = 0
    for f in range(10):
        np.testing.assert_array_equal(
            db_c.read_keypoints(f), db_u.read_keypoints(f)
        )
        for s in IMAGE_SKIPS:
            if not (0 <= f + s < 10):
                continue
            fc = db_c.read_image_pair_flow(f, f + s)
            fu = db_u.read_image_pair_flow(f, f + s)
            # status sets may differ on marginal features; the shared
            # survivors must land on the same optimum
            ic = {int(i): k for i, k in zip(fc.src_kps_indices, fc.tgt_kps)}
            iu = {int(i): k for i, k in zip(fu.src_kps_indices, fu.tgt_kps)}
            shared = set(ic) & set(iu)
            total += max(len(ic), len(iu))
            agree += len(shared)
            d = np.array([ic[i] - iu[i] for i in shared])
            if len(shared):
                assert np.median(np.linalg.norm(d, axis=1)) < 0.05
    assert agree / total > 0.97, (agree, total)
    db_c.close()
    db_u.close()


def test_chained_cancel_and_resume(tmp_path, rng, monkeypatch):
    """Cancel mid-run and resume with the CHAINED dispatch active
    (single-device routing): partially-written fans must resume to the
    exact full result set without re-decoding completed frames."""
    monkeypatch.setenv("POLYCHASE_SHARD_ANALYZE", "0")
    monkeypatch.setenv("POLYCHASE_LK_CHAIN", "1")
    from polychase_tpu.engine.lk import chain_engages

    assert chain_engages([-2, -1, 1, 2, 4, 8])
    frames = make_clip(rng)
    info = VideoInfo(160, 120, 0, 10)
    db_path = str(tmp_path / "flow.db")

    seen = []

    def cb(p, msg):
        seen.append(msg)
        return len(seen) < 4

    generate_optical_flow_database(
        info, lambda f: frames[f], cb, db_path, GFTTOptions(min_distance=7)
    )
    assert seen[-1] == "Cancelled"

    generate_optical_flow_database(
        info, lambda f: frames[f], None, db_path,
        GFTTOptions(min_distance=7),
    )
    db = Database(db_path)
    for f in range(10):
        assert db.read_keypoints(f).shape[0] > 10
        expected = {f + s for s in IMAGE_SKIPS if 0 <= f + s < 10}
        assert set(db.find_optical_flows_from_image(f)) == expected
    db.close()


def test_fused_gftt_prep_parity(tmp_path, rng, monkeypatch):
    """The fused prep+GFTT program (POLYCHASE_GFTT_PREP_FUSED, default
    on) must produce a bit-identical database to the split dispatches:
    the detection math is the same traced code on the same f32 input,
    only the dispatch granularity changes."""
    frames = make_clip(rng, n=6)
    info = VideoInfo(frames[0].shape[1], frames[0].shape[0], 0, len(frames))

    def run(flag):
        monkeypatch.setenv("POLYCHASE_GFTT_PREP_FUSED", flag)
        path = str(tmp_path / f"fused_{flag}.db")
        generate_optical_flow_database(
            info, lambda fid: frames[fid], None, path
        )
        db = Database(path)
        kps = {i: db.read_keypoints(i) for i in range(len(frames))}
        flows = {}
        for i in range(len(frames)):
            for j in db.find_optical_flows_from_image(i):
                flows[(i, j)] = db.read_image_pair_flow(i, j)
        db.close()
        return kps, flows

    kps_split, flows_split = run("0")
    kps_fused, flows_fused = run("1")
    assert set(kps_split) == set(kps_fused)
    for i in kps_split:
        np.testing.assert_array_equal(kps_fused[i], kps_split[i])
    assert set(flows_split) == set(flows_fused)
    for key in flows_split:
        a, b = flows_fused[key], flows_split[key]
        np.testing.assert_array_equal(a.src_kps_indices, b.src_kps_indices)
        np.testing.assert_array_equal(a.tgt_kps, b.tgt_kps)
        np.testing.assert_array_equal(a.flow_errors, b.flow_errors)
