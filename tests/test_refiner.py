"""Bundle-adjustment refiner tests on synthetic trajectories."""

import numpy as np
import jax.numpy as jnp
import pytest

from polychase_tpu.engine import camera as C
from polychase_tpu.engine import pose as P
from polychase_tpu.engine.levmarq import BundleOptions, CAUCHY, TRIVIAL
from polychase_tpu.engine.refiner import (
    RefineTrajectoryUpdate,
    refine_trajectory,
)
from polychase_tpu.engine.trajectory import CameraTrajectory
from polychase_tpu.io.database import Database

from synthetic import make_intrinsics, make_sphere_mesh, orbit_pose
from test_tracker import build_flow_db, pose_errors


def perturbed_traj(poses, intr, rng, rot_sigma=0.01, t_sigma=0.02,
                   keep_ends=True):
    traj = CameraTrajectory(0, len(poses))
    for i, p in enumerate(poses):
        if keep_ends and i in (0, len(poses) - 1):
            traj.set(i, C.CameraState(intr, p))
            continue
        dq = rng.normal(0, rot_sigma, 3).astype(np.float32)
        dt = rng.normal(0, t_sigma, 3).astype(np.float32)
        q = P.quat_step_post(p.q, jnp.asarray(dq))
        traj.set(
            i, C.CameraState(intr, P.Pose(q, p.t + jnp.asarray(dt)))
        )
    return traj


def test_refine_recovers_noisy_trajectory(tmp_path, rng):
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    n = 10
    poses = [orbit_pose(0.05 * t) for t in range(n)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)

    traj = perturbed_traj(poses, intr, rng)
    # Perturbed trajectory starts far from GT
    pre = [pose_errors(traj.get(i).pose, poses[i])[0] for i in range(1, n - 1)]
    assert max(pre) > 5e-3

    refine_trajectory(
        db_path, traj, np.eye(4, dtype=np.float32), mesh,
        bundle_opts=BundleOptions(loss_type=CAUCHY, loss_scale=1.0),
    )

    for i in range(n):
        rot_err, t_err = pose_errors(traj.get(i).pose, poses[i])
        if i in (0, n - 1):
            assert rot_err == 0.0 and t_err == 0.0  # anchors untouched
        else:
            assert rot_err < 1e-3, (i, rot_err)
            assert t_err < 2.5e-3, (i, t_err)


def test_refine_callback_and_cancel(tmp_path, rng):
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    poses = [orbit_pose(0.05 * t) for t in range(8)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)
    traj = perturbed_traj(poses, intr, rng)

    updates = []

    def cb(u: RefineTrajectoryUpdate):
        updates.append(u)
        return len(updates) < 3

    refine_trajectory(
        db_path, traj, np.eye(4, dtype=np.float32), mesh, callback=cb
    )
    assert 3 <= len(updates) <= 4
    assert all(u.stats is not None for u in updates)
    assert "Cost" in updates[0].message


def test_refine_recovers_focal_length(tmp_path, rng):
    mesh = make_sphere_mesh()
    intr = make_intrinsics(f=600.0)
    n = 8
    poses = [orbit_pose(0.06 * t) for t in range(n)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng, n_points=500)

    # All poses exact, but middle frames carry a wrong focal estimate
    wrong = intr._replace(fx=jnp.float32(650.0), fy=jnp.float32(650.0))
    traj = CameraTrajectory(0, n)
    for i, p in enumerate(poses):
        traj.set(i, C.CameraState(intr if i in (0, n - 1) else wrong, p))

    refine_trajectory(
        db_path, traj, np.eye(4, dtype=np.float32), mesh,
        optimize_focal_length=True,
        bundle_opts=BundleOptions(loss_type=TRIVIAL, max_iterations=100),
    )
    for i in range(1, n - 1):
        fy = float(traj.get(i).intrinsics.fy)
        assert abs(fy - 600.0) < 5.0, (i, fy)


def test_refine_requires_filled_frames(tmp_path, rng):
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    traj = CameraTrajectory(0, 5)
    traj.set(0, C.CameraState(intr, orbit_pose(0.0)))
    db = Database(str(tmp_path / "flow.db"))
    db.close()
    with pytest.raises(ValueError):
        refine_trajectory(
            str(tmp_path / "flow.db"), traj, np.eye(4, dtype=np.float32), mesh
        )


def test_prim_refresher_bvh_matches_device(tmp_path, rng, monkeypatch):
    """The host-BVH prim refresh (large-mesh path) returns the same prim
    cache and cost as the fused device sweep."""
    import jax.numpy as jnp

    from polychase_tpu.engine import refiner as R
    from polychase_tpu import native

    if not native.available():
        pytest.skip("native BVH unavailable")

    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    poses = [orbit_pose(0.05 * t) for t in range(6)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)
    traj = perturbed_traj(poses, intr, rng)

    db = Database(db_path)
    data = R.build_refiner_data(db, traj, mesh, np.eye(4, dtype=np.float32))
    db.close()
    params = R.traj_to_params(traj)
    model = jnp.eye(4)
    tri = mesh.triangle_corners()
    scale = jnp.float32(1.0)

    dev = R._make_prim_refresher(data, mesh, model, model, tri, scale, CAUCHY)
    monkeypatch.setattr(R, "BVH_TRIANGLE_THRESHOLD", 1)
    bvh = R._make_prim_refresher(data, mesh, model, model, tri, scale, CAUCHY)

    prims_d, cost_d = dev(params)
    prims_b, cost_b = bvh(params)
    agree = np.mean(np.asarray(prims_d) == np.asarray(prims_b))
    assert agree > 0.999, agree
    assert abs(float(cost_d) - float(cost_b)) < 1e-3 * max(1.0, float(cost_d))


def test_refine_empty_database_is_graceful(tmp_path, rng):
    """A segment with no flows must not crash or move the cameras."""
    from polychase_tpu.io.database import Database as DB

    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    poses = [orbit_pose(0.05 * t) for t in range(5)]
    db_path = str(tmp_path / "empty.db")
    DB(db_path).close()  # schema only, no keypoints/flows

    traj = perturbed_traj(poses, intr, rng)
    before = [np.asarray(traj.get(i).pose.t).copy() for i in range(5)]
    refine_trajectory(db_path, traj, np.eye(4, dtype=np.float32), mesh)
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(traj.get(i).pose.t), before[i], atol=1e-6
        )


def test_refine_recovers_principal_point(tmp_path, rng):
    mesh = make_sphere_mesh()
    intr = make_intrinsics(f=600.0)
    n = 8
    poses = [orbit_pose(0.06 * t) for t in range(n)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng, n_points=500)

    # Exact poses, wrong principal point on the middle frames
    wrong = intr._replace(
        cx=intr.cx + jnp.float32(12.0), cy=intr.cy - jnp.float32(9.0)
    )
    traj = CameraTrajectory(0, n)
    for i, p in enumerate(poses):
        traj.set(i, C.CameraState(intr if i in (0, n - 1) else wrong, p))

    refine_trajectory(
        db_path, traj, np.eye(4, dtype=np.float32), mesh,
        optimize_principal_point=True,
        bundle_opts=BundleOptions(loss_type=TRIVIAL, max_iterations=100),
    )
    for i in range(1, n - 1):
        s = traj.get(i)
        assert abs(float(s.intrinsics.cx) - float(intr.cx)) < 2.0, i
        assert abs(float(s.intrinsics.cy) - float(intr.cy)) < 2.0, i


def test_device_lm_matches_host_driver(tmp_path, rng, monkeypatch):
    """The chunked on-device LM schedule must reproduce the host driver:
    same trajectory, same iteration/cost/lambda bookkeeping."""
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    poses = [orbit_pose(0.05 * t) for t in range(7)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)

    def run():
        traj = perturbed_traj(poses, intr, np.random.default_rng(7))
        updates = []
        # device_mesh=False: the sharded path would mask the device-LM
        # schedule on the 8-device CPU test mesh.
        refine_trajectory(
            db_path, traj, np.eye(4, dtype=np.float32), mesh,
            callback=lambda u: updates.append(u) or True,
            device_mesh=False,
        )
        return traj, updates

    monkeypatch.setenv("POLYCHASE_DEVICE_LM", "0")
    ref_traj, ref_updates = run()
    monkeypatch.setenv("POLYCHASE_DEVICE_LM", "1")
    dev_traj, dev_updates = run()

    for i in range(len(poses)):
        np.testing.assert_allclose(
            np.asarray(dev_traj.get(i).pose.t),
            np.asarray(ref_traj.get(i).pose.t), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(dev_traj.get(i).pose.q),
            np.asarray(ref_traj.get(i).pose.q), atol=1e-5,
        )
    assert len(dev_updates) == len(ref_updates)
    a, b = dev_updates[-1].stats, ref_updates[-1].stats
    assert int(a.iterations) == int(b.iterations)
    assert int(a.invalid_steps) == int(b.invalid_steps)
    np.testing.assert_allclose(float(a.cost), float(b.cost), rtol=1e-4)
    np.testing.assert_allclose(
        float(a.lambda_), float(b.lambda_), rtol=1e-4
    )


def test_device_lm_cancel_matches_host_driver(tmp_path, rng, monkeypatch):
    """Cancelling mid-refine must return the same trajectory on both LM
    drivers — the device chunks run ahead and must roll back."""
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    poses = [orbit_pose(0.05 * t) for t in range(7)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)

    def run(cancel_after):
        traj = perturbed_traj(poses, intr, np.random.default_rng(7))
        n = [0]

        def cb(u):
            n[0] += 1
            return n[0] < cancel_after

        refine_trajectory(
            db_path, traj, np.eye(4, dtype=np.float32), mesh,
            callback=cb, device_mesh=False,
        )
        return traj

    for cancel_after in (1, 2, 3, 6):
        monkeypatch.setenv("POLYCHASE_DEVICE_LM", "0")
        ref = run(cancel_after)
        monkeypatch.setenv("POLYCHASE_DEVICE_LM", "1")
        dev = run(cancel_after)
        for i in range(len(poses)):
            np.testing.assert_allclose(
                np.asarray(dev.get(i).pose.t),
                np.asarray(ref.get(i).pose.t),
                atol=1e-6, err_msg=f"cancel_after={cancel_after} frame={i}",
            )


def test_refine_function_tol_parity_and_quality(tmp_path, rng, monkeypatch):
    """BundleOptions.function_tol on the refiner: the stagnation exit
    must behave identically on the device-chunk and host LM drivers
    (same iteration count, same cost, same trajectory), terminate in no
    more iterations than ftol=0, and leave the recovered trajectory
    within the recovery contract of test_refine_recovers_noisy_trajectory.
    ftol=0 stays the refine default (reference-exact termination)."""
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    n = 10
    poses = [orbit_pose(0.05 * t) for t in range(n)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)

    # Disable the auto-injected refine default so ftol=0 really means
    # exact termination for the comparison arm.
    monkeypatch.setenv("POLYCHASE_REFINE_FTOL", "0")

    def run(ftol):
        traj = perturbed_traj(poses, intr, np.random.default_rng(7))
        updates = []
        refine_trajectory(
            db_path, traj, np.eye(4, dtype=np.float32), mesh,
            bundle_opts=BundleOptions(
                loss_type=CAUCHY, loss_scale=1.0, function_tol=ftol
            ),
            callback=lambda u: updates.append(u) or True,
            device_mesh=False,
        )
        return traj, updates[-1].stats

    monkeypatch.setenv("POLYCHASE_DEVICE_LM", "0")
    host_traj, host_stats = run(1e-5)
    exact_traj, exact_stats = run(0.0)
    monkeypatch.setenv("POLYCHASE_DEVICE_LM", "1")
    dev_traj, dev_stats = run(1e-5)

    # Device/host parity at ftol>0
    assert int(dev_stats.iterations) == int(host_stats.iterations)
    np.testing.assert_allclose(
        float(dev_stats.cost), float(host_stats.cost), rtol=1e-4
    )
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(dev_traj.get(i).pose.t),
            np.asarray(host_traj.get(i).pose.t), atol=1e-5,
        )

    # The stagnation exit can only shorten the schedule.
    assert int(host_stats.iterations) <= int(exact_stats.iterations)

    # Quality contract: same recovery bounds as the ftol=0 contract.
    for i in range(1, n - 1):
        rot_err, t_err = pose_errors(host_traj.get(i).pose, poses[i])
        assert rot_err < 1e-3, (i, rot_err)
        assert t_err < 2.5e-3, (i, t_err)
    # And the final cost is within ftol-noise of exact termination.
    np.testing.assert_allclose(
        float(host_stats.cost), float(exact_stats.cost), rtol=1e-3
    )
