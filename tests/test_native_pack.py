"""Bit-parity of the fused C chunk packer (native/bvh.cc
``pack_track_chunk``) against the numpy ``pack_chunk`` semantics in
engine/tracker._track_chunked_scan (fused-meta packed-index format)."""

import numpy as np
import pytest

from polychase_tpu.engine import camera as C
from polychase_tpu.engine import tracker as T
from polychase_tpu.engine.tracker import (
    _build_native_packer,
    track_camera_trajectory,
)
from polychase_tpu.engine.trajectory import CameraTrajectory
from polychase_tpu.io.database import Database
from polychase_tpu.native import available

from synthetic import make_intrinsics, make_sphere_mesh, orbit_pose
from test_tracker import build_flow_db

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable"
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _numpy_pack(per_frame, first_abs, CH, Gp, K, Kmax, idx_dtype, quant,
                kps_all):
    """Line-for-line replica of tracker.pack_chunk's fused-meta branch."""
    src_idx = np.zeros((CH, Gp), np.int32)
    tgt_px = np.zeros((CH, Gp, K, 2), np.float32)
    tgt_i = np.zeros((CH,), np.int32)
    warm_i = np.zeros((CH,), np.int32)
    kp_idx = np.zeros((CH, Gp, K), idx_dtype)
    cnt = np.zeros((CH, Gp), np.int32)
    if quant:
        tgt_q = np.zeros((CH, Gp, K, 2), np.int16)
        qs = np.ones((CH,), np.float32)
    for r, (frame_id, warm, groups) in enumerate(per_frame):
        tgt_i[r] = frame_id - first_abs
        warm_i[r] = warm - first_abs
        for g, (src_f, idx, tpx) in enumerate(groups):
            n = idx.shape[0]
            src_idx[r, g] = src_f - first_abs
            if quant:
                tgt_px[r, g, :n] = tpx - kps_all[src_f - first_abs][idx]
            else:
                tgt_px[r, g, :n] = tpx
            kp_idx[r, g, :n] = idx
            cnt[r, g] = n
        if quant:
            m = float(np.abs(tgt_px[r]).max())
            scale = (m / 32700.0) if m > 0.0 else 1.0
            qs[r] = scale
            np.rint(tgt_px[r] * (1.0 / scale), out=tgt_px[r])
            tgt_q[r] = tgt_px[r]
    nf = len(per_frame)
    tgt_i[nf:] = tgt_i[nf - 1]
    warm_i[nf:] = warm_i[nf - 1]
    meta = np.empty((CH, 2 * Gp + 3), np.int32)
    meta[:, :Gp] = src_idx
    meta[:, Gp : 2 * Gp] = cnt
    meta[:, 2 * Gp] = tgt_i
    meta[:, 2 * Gp + 1] = warm_i
    if quant:
        meta[:, 2 * Gp + 2] = qs.view(np.int32)
        return (meta, kp_idx, tgt_q)
    meta[:, 2 * Gp + 2] = 0
    return (meta, kp_idx, tgt_px)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize(
    "idx_dtype", [np.uint8, np.uint16, np.int32]
)
def test_pack_bit_parity(rng, quant, idx_dtype):
    CH, Gp, K, F = T.SCAN_CHUNK, 8, 24, 40
    Kmax = int(np.iinfo(idx_dtype).max) if idx_dtype != np.int32 else 300
    Kmax = min(Kmax, 300) + 1
    first_abs = 3
    kps_all = rng.normal(500, 200, (F, Kmax, 2)).astype(np.float32)

    fid = first_abs + 1
    all_per_frame = []
    for c in range(3):
        per_frame = []
        rows = CH if c < 2 else CH - 5  # final partial chunk
        for _ in range(rows):
            groups = []
            for _g in range(int(rng.integers(0, Gp + 1))):
                n = int(rng.integers(1, K + 1))
                idx = rng.choice(Kmax, size=n, replace=False).astype(
                    np.uint32
                )
                src = int(rng.integers(0, F)) + first_abs
                tpx = (
                    kps_all[src - first_abs][idx]
                    + rng.normal(0, 30, (n, 2))
                ).astype(np.float32)
                groups.append((src, idx, tpx))
            per_frame.append((fid, fid - 1, groups))
            fid += 1
        all_per_frame.append(per_frame)

    pack = _build_native_packer(
        all_per_frame, first_abs, Gp, K, Kmax, idx_dtype, quant, kps_all
    )
    assert pack is not None
    for c, per_frame in enumerate(all_per_frame):
        got = pack(c)
        ref = _numpy_pack(
            per_frame, first_abs, CH, Gp, K, Kmax, idx_dtype, quant,
            kps_all,
        )
        for a, b in zip(got, ref):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(a, b)


def test_tracking_native_pack_bit_exact(tmp_path, rng, monkeypatch):
    """End-to-end: the native packer produces the same trajectory bit
    for bit as the numpy pack (same xs arrays -> same device program)."""
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    poses = [orbit_pose(0.04 * t) for t in range(10)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)

    def run():
        traj = CameraTrajectory(0, len(poses))
        traj.set(0, C.CameraState(intr, poses[0]))
        track_camera_trajectory(
            Database(db_path), traj, 0, len(poses) - 1,
            np.eye(4, dtype=np.float32), mesh,
        )
        return traj

    monkeypatch.setenv("POLYCHASE_NATIVE_PACK", "0")
    ref = run()
    monkeypatch.setenv("POLYCHASE_NATIVE_PACK", "1")
    got = run()
    for i in range(1, len(poses)):
        np.testing.assert_array_equal(
            np.asarray(got.get(i).pose.q), np.asarray(ref.get(i).pose.q)
        )
        np.testing.assert_array_equal(
            np.asarray(got.get(i).pose.t), np.asarray(ref.get(i).pose.t)
        )
