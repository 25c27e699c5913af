#!/usr/bin/env python3
"""Multi-chip demo: segment-parallel tracking + refine over a device mesh.

Builds a synthetic clip's flow database, splits it into one segment per
device, then runs the two segment-parallel paths (parallel/tracking.py,
parallel/segments.py): every chip tracks/refines its own keyframe
segments in a single dispatch with zero collectives.

Runs anywhere — on a CPU host it uses a virtual 8-device mesh:

    JAX_PLATFORMS=cpu python examples/demo_multichip.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import jax
    import jax.numpy as jnp

    from polychase_tpu.engine import camera as C, pose as P
    from polychase_tpu.engine.levmarq import BundleOptions, CAUCHY
    from polychase_tpu.engine.trajectory import CameraTrajectory
    from polychase_tpu.io.database import Database
    from polychase_tpu.parallel.segments import refine_segments
    from polychase_tpu.parallel.tracking import track_segments
    from synthetic import (
        make_intrinsics, make_sphere_mesh, orbit_pose, project_points,
        sample_surface_points, visible_from,
    )

    n_dev = jax.device_count()
    n_seg = max(n_dev, 2)
    seg_len = 10
    n = n_seg * (seg_len - 1) + 1
    print(f"devices: {n_dev}  segments: {n_seg}  frames: {n}")

    rng = np.random.default_rng(0)
    mesh = make_sphere_mesh(12, 16)
    intr = make_intrinsics()
    poses = jax.device_get([orbit_pose(0.02 * t) for t in range(n)])

    with tempfile.TemporaryDirectory() as td:
        db_path = os.path.join(td, "flow.db")
        db = Database(db_path)
        pts3d = {}
        for i in range(n):
            pts, normals = sample_surface_points(mesh, rng, 150)
            cam = C.CameraState(intr, poses[i])
            px, vis = project_points(cam, pts)
            vis &= visible_from(cam, pts, normals)
            db.write_keypoints(i, px[vis])
            pts3d[i] = pts[vis]
        for i in range(n):
            for skip in (-4, -2, -1, 1, 2, 4):
                j = i + skip
                if not 0 <= j < n:
                    continue
                proj, ok = project_points(
                    C.CameraState(intr, poses[j]), pts3d[i]
                )
                idx = np.nonzero(ok)[0].astype(np.uint32)
                noise = rng.normal(0, 0.25, (idx.size, 2)).astype(
                    np.float32
                )
                db.write_image_pair_flow(
                    i, j, idx, proj[ok] + noise,
                    np.zeros(idx.size, np.float32),
                )
        db.close()

        def seeded():
            out = []
            for s in range(n_seg):
                a = s * (seg_len - 1)
                traj = CameraTrajectory(a, seg_len)
                traj.set(a, C.CameraState(intr, poses[a]))
                out.append(traj)
            return out

        opts = BundleOptions(loss_type=CAUCHY, loss_scale=1.0)
        trajs = seeded()
        t0 = time.perf_counter()
        counts = track_segments(
            db_path, trajs, np.eye(4, dtype=np.float32), mesh,
            bundle_opts=opts,
        )
        dt = time.perf_counter() - t0
        errs = []
        for traj in trajs:
            for f in range(traj.first_frame + 1, traj.last_frame + 1):
                t = np.asarray(jax.device_get(traj.get(f).pose.t))
                errs.append(np.linalg.norm(t - np.asarray(poses[f].t)))
        print(
            f"tracked {n_seg} segments in {dt:.2f}s "
            f"({n_seg * (seg_len - 1) / dt:.1f} fps aggregate), "
            f"worst t_err {max(errs):.4f}, "
            f"min correspondences {int(counts.min())}"
        )

        ropts = BundleOptions(
            loss_type=CAUCHY, loss_scale=1.0, max_iterations=20
        )
        t0 = time.perf_counter()
        refined = refine_segments(
            db_path, trajs, np.eye(4, dtype=np.float32), mesh,
            bundle_opts=ropts,
        )
        dt = time.perf_counter() - t0
        errs = []
        for traj in refined:
            for f in range(traj.first_frame, traj.last_frame + 1):
                t = np.asarray(jax.device_get(traj.get(f).pose.t))
                errs.append(np.linalg.norm(t - np.asarray(poses[f].t)))
        print(
            f"refined {n_seg} segments in {dt:.2f}s, "
            f"worst t_err {max(errs):.4f}"
        )


if __name__ == "__main__":
    main()
