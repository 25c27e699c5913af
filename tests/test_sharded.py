"""Multi-chip sharded BA: parity with the single-device normal equations."""

import numpy as np
import jax
import jax.numpy as jnp

from polychase_tpu.engine import camera as C
from polychase_tpu.engine import pose as P
from polychase_tpu.engine.levmarq import CAUCHY
from polychase_tpu.engine.refiner import (
    build_normal_equations,
    build_refiner_data,
    refresh_prims,
    traj_to_params,
)
from polychase_tpu.engine.trajectory import CameraTrajectory
from polychase_tpu.parallel.sharded import (
    make_edge_mesh,
    sharded_normal_equations,
    sharded_refine_step,
)
from polychase_tpu.io.database import Database

from synthetic import make_intrinsics, make_sphere_mesh, orbit_pose
from test_tracker import build_flow_db


def build_problem(tmp_path, rng, n=8):
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    poses = [orbit_pose(0.05 * t) for t in range(n)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)

    traj = CameraTrajectory(0, n)
    for i, p in enumerate(poses):
        t = np.asarray(p.t)
        if i not in (0, n - 1):
            t = t + rng.normal(0, 0.01, 3).astype(np.float32)
        traj.set(i, C.CameraState(intr, P.Pose(p.q, jnp.asarray(t))))

    db = Database(db_path)
    data = build_refiner_data(db, traj, mesh, np.eye(4, dtype=np.float32))
    db.close()
    params = traj_to_params(traj)
    model = jnp.eye(4)
    prims = refresh_prims(params, data, mesh, model)
    return mesh, data, params, prims, model


def test_sharded_normal_equations_match(tmp_path, rng):
    assert jax.device_count() >= 8
    mesh, data, params, prims, model = build_problem(tmp_path, rng)
    tri = mesh.triangle_corners()
    scale = jnp.float32(1.0)

    JtJ_ref, Jtr_ref = build_normal_equations(
        params, data, prims, tri, model, model,
        scale, loss_type=CAUCHY, opt_f=False, opt_pp=False, ppc=6,
    )

    dev_mesh = make_edge_mesh(jax.devices()[:8])
    JtJ_sh, Jtr_sh = sharded_normal_equations(
        dev_mesh, params, data, prims, tri, model, model, scale,
        loss_type=CAUCHY, opt_f=False, opt_pp=False, ppc=6,
    )
    # float32 reduction order differs across shards → tolerance scaled to
    # the matrix magnitude
    JtJ_ref = np.asarray(JtJ_ref)
    Jtr_ref = np.asarray(Jtr_ref)
    np.testing.assert_allclose(
        np.asarray(JtJ_sh), JtJ_ref,
        rtol=1e-3, atol=1e-5 * max(np.abs(JtJ_ref).max(), 1.0),
    )
    np.testing.assert_allclose(
        np.asarray(Jtr_sh), Jtr_ref,
        rtol=1e-3, atol=1e-5 * max(np.abs(Jtr_ref).max(), 1.0),
    )


def test_sharded_step_runs(tmp_path, rng):
    mesh, data, params, prims, model = build_problem(tmp_path, rng)
    tri = mesh.triangle_corners()
    dev_mesh = make_edge_mesh(jax.devices()[:8])
    bounds = C.intrinsics_bounds(make_intrinsics())

    new_params, step_norm, ok = sharded_refine_step(
        dev_mesh, params, data, prims, tri, model, model,
        jnp.float32(1.0), jnp.float32(1e-4), bounds,
        loss_type=CAUCHY, opt_f=False, opt_pp=False, ppc=6,
    )
    assert bool(ok)
    assert np.isfinite(float(step_norm)) and float(step_norm) > 0
    # Anchors unmoved
    np.testing.assert_array_equal(
        np.asarray(new_params.q[0]), np.asarray(params.q[0])
    )
    np.testing.assert_array_equal(
        np.asarray(new_params.t[-1]), np.asarray(params.t[-1])
    )


def test_refine_trajectory_sharded_matches_single(tmp_path, rng):
    """End-to-end: the full LM schedule over an 8-device CPU mesh converges
    to the same trajectory as forced single-device execution."""
    import copy

    from polychase_tpu.engine.levmarq import BundleOptions
    from polychase_tpu.engine.refiner import refine_trajectory
    from test_refiner import perturbed_traj
    from test_tracker import pose_errors

    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    n = 8
    poses = [orbit_pose(0.05 * t) for t in range(n)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)

    traj_single = perturbed_traj(poses, intr, rng)
    traj_sharded = CameraTrajectory(0, n)
    for i in range(n):
        traj_sharded.set(i, traj_single.get(i))

    opts = BundleOptions(loss_type=CAUCHY, loss_scale=1.0)
    refine_trajectory(
        db_path, traj_single, np.eye(4, dtype=np.float32), mesh,
        bundle_opts=opts, device_mesh=False,
    )
    refine_trajectory(
        db_path, traj_sharded, np.eye(4, dtype=np.float32), mesh,
        bundle_opts=opts, device_mesh=make_edge_mesh(),
    )

    # f32 reduction order differs between the psum-sharded and the
    # single-device sums, so the LM paths diverge slightly; both must
    # agree closely and recover the ground truth away from anchors.
    for i in range(n):
        rot_err, t_err = pose_errors(
            traj_sharded.get(i).pose, traj_single.get(i).pose
        )
        assert rot_err < 2e-3, (i, rot_err)
        assert t_err < 4e-3, (i, t_err)
    for i in range(1, n - 1):
        rot_err, t_err = pose_errors(traj_sharded.get(i).pose, poses[i])
        assert rot_err < 1e-3 and t_err < 2.5e-3, (i, rot_err, t_err)


def test_sharded_normal_equations_match_ppc9(tmp_path, rng):
    """Intrinsics-optimizing (9 params/camera) sharded build parity."""
    mesh, data, params, prims, model = build_problem(tmp_path, rng)
    tri = mesh.triangle_corners()
    scale = jnp.float32(1.0)

    JtJ_ref, Jtr_ref = build_normal_equations(
        params, data, prims, tri, model, model,
        scale, loss_type=CAUCHY, opt_f=True, opt_pp=True, ppc=9,
    )
    dev_mesh = make_edge_mesh(jax.devices()[:8])
    JtJ_sh, Jtr_sh = sharded_normal_equations(
        dev_mesh, params, data, prims, tri, model, model, scale,
        loss_type=CAUCHY, opt_f=True, opt_pp=True, ppc=9,
    )
    JtJ_ref = np.asarray(JtJ_ref)
    np.testing.assert_allclose(
        np.asarray(JtJ_sh), JtJ_ref,
        rtol=1e-3, atol=1e-5 * max(np.abs(JtJ_ref).max(), 1.0),
    )
    np.testing.assert_allclose(
        np.asarray(Jtr_sh), np.asarray(Jtr_ref),
        rtol=1e-3, atol=1e-5 * max(np.abs(np.asarray(Jtr_ref)).max(), 1.0),
    )
