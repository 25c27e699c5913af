"""API facade + worker-thread tests against the polychase_core surface."""

import time

import numpy as np
import pytest

import polychase_tpu.polychase_core as pc

from synthetic import make_sphere_mesh, orbit_pose, make_intrinsics
from test_tracker import build_flow_db
from test_opticalflow import make_clip


def api_intrinsics(w=640, h=480, f=600.0):
    return pc.CameraIntrinsics(
        fx=f, fy=f, cx=w / 2, cy=h / 2, aspect_ratio=1.0,
        width=w, height=h, convention=pc.CameraConvention.OpenCV,
    )


def api_scene(pose):
    import jax.numpy as jnp
    from polychase_tpu.engine import pose as P

    return pc.SceneTransformations(
        model_matrix=np.eye(4, dtype=np.float32),
        view_matrix=np.asarray(P.pose_rt4x4(pose)),
        intrinsics=api_intrinsics(),
    )


@pytest.fixture
def accel_mesh():
    m = make_sphere_mesh()
    return pc.AcceleratedMesh(
        np.asarray(m.vertices), np.asarray(m.triangles)
    )


def test_ray_cast_and_masking(accel_mesh):
    scene = api_scene(orbit_pose(0.0))
    hit = pc.ray_cast(accel_mesh, scene, np.array([320.0, 240.0]), True)
    assert hit is not None
    # Center pixel looks at the sphere: hit near the front surface
    assert abs(np.linalg.norm(hit.pos) - 1.0) < 0.05
    assert hit.t > 0
    prim = hit.primitive_id

    # Mask the hit triangle → same ray misses (masked tris still occlude)
    accel_mesh.inner_mut().mask_triangle(prim)
    assert accel_mesh.inner().is_triangle_masked(prim)
    hit2 = pc.ray_cast(accel_mesh, scene, np.array([320.0, 240.0]), True)
    assert hit2 is None or hit2.primitive_id != prim
    # check_mask=False sees it again
    hit3 = pc.ray_cast(accel_mesh, scene, np.array([320.0, 240.0]), False)
    assert hit3 is not None and hit3.primitive_id == prim


def test_find_transformation_api(accel_mesh):
    scene = api_scene(orbit_pose(0.0))
    pts = np.array([[0.0, 0.0, -1.0]], np.float32)
    out = pc.find_transformation(
        pts, scene, scene,
        pc.PinUpdate(0, np.array([300.0, 220.0], np.float32)),
        pc.TransformationType.Model,
    )
    assert isinstance(out, pc.SceneTransformations)
    assert not np.allclose(out.model_matrix, scene.model_matrix)


def test_tracker_thread(tmp_path, rng):
    mesh = make_sphere_mesh()
    intr = make_intrinsics()
    poses = [orbit_pose(0.04 * t) for t in range(8)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr, poses, rng)

    accel = pc.AcceleratedMesh(np.asarray(mesh.vertices),
                               np.asarray(mesh.triangles))
    opts = pc.BundleOptions()
    thread = pc.TrackerThread(
        db_path, 0, 7, api_scene(poses[0]), accel, False, False, opts
    )
    results, done = [], False
    deadline = time.time() + 300
    while not done and time.time() < deadline:
        msg = thread.try_pop()
        if msg is None:
            time.sleep(0.02)
            continue
        if isinstance(msg, bool):
            done = True
        elif isinstance(msg, Exception):
            raise msg
        else:
            results.append(msg)
    thread.join()
    assert done
    assert [r.frame for r in results] == [1, 2, 3, 4, 5, 6, 7]
    assert all(r.inlier_ratio > 0.99 for r in results)
    assert all(isinstance(r.bundle_stats, pc.BundleStats) for r in results)


def test_refiner_thread(tmp_path, rng):
    mesh = make_sphere_mesh()
    intr_engine = make_intrinsics()
    poses = [orbit_pose(0.05 * t) for t in range(6)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr_engine, poses, rng)

    traj = pc.CameraTrajectory(0, 6)
    for i, p in enumerate(poses):
        state = pc.CameraState(api_intrinsics(), pc.Pose(
            np.asarray(p.q), np.asarray(p.t)))
        if i not in (0, 5):
            state.pose.t = state.pose.t + rng.normal(0, 0.01, 3).astype(
                np.float32)
        traj.set(i, state)

    accel = pc.AcceleratedMesh(np.asarray(mesh.vertices),
                               np.asarray(mesh.triangles))
    thread = pc.RefinerThread(
        db_path, traj, np.eye(4, dtype=np.float32), accel, False, False,
        pc.BundleOptions(),
    )
    updates, done = [], False
    deadline = time.time() + 300
    while not done and time.time() < deadline:
        msg = thread.try_pop()
        if msg is None:
            time.sleep(0.02)
            continue
        if isinstance(msg, bool):
            done = True
        elif isinstance(msg, Exception):
            raise msg
        else:
            updates.append(msg)
    thread.join()
    assert done and updates
    # Refined in place: middle poses recovered
    for i in range(1, 5):
        t = traj.get(i).pose.t
        assert np.linalg.norm(t - np.asarray(poses[i].t)) < 2.5e-3


def test_opticalflow_thread(tmp_path, rng):
    frames = make_clip(rng, n=8)
    info = pc.VideoInfo(width=160, height=120, first_frame=0, num_frames=6)
    db_path = str(tmp_path / "flow.db")
    thread = pc.OpticalFlowThread(info, db_path)

    done, progress_seen = False, 0
    deadline = time.time() + 300
    while not done and time.time() < deadline:
        msg = thread.try_pop()
        if msg is None:
            time.sleep(0.01)
            continue
        if isinstance(msg, bool):
            done = True
        elif isinstance(msg, Exception):
            raise msg
        elif isinstance(msg, pc.OpticalFlowRequest):
            thread.provide_frame(msg.frame_id, frames[msg.frame_id])
        elif isinstance(msg, pc.OpticalFlowProgress):
            progress_seen += 1
    thread.join()
    assert done and progress_seen >= 6

    db = pc.Database(db_path)
    for f in range(6):
        assert db.read_keypoints(f).shape[0] > 0
    assert db.get_min_image_id_with_keypoints() == 0
    assert db.get_max_image_id_with_keypoints() == 5
    db.close()


def test_opticalflow_thread_cancel(tmp_path, rng):
    frames = make_clip(rng, n=12)
    info = pc.VideoInfo(width=160, height=120, first_frame=0, num_frames=12)
    thread = pc.OpticalFlowThread(info, str(tmp_path / "flow.db"))
    served = 0
    done = False
    errors = []
    deadline = time.time() + 300
    while not done and time.time() < deadline:
        msg = thread.try_pop()
        if msg is None:
            time.sleep(0.01)
            continue
        if isinstance(msg, bool):
            done = True
        elif isinstance(msg, pc.OpticalFlowRequest):
            served += 1
            if served > 3:
                thread.request_stop()
            thread.provide_frame(msg.frame_id, frames[msg.frame_id])
        elif isinstance(msg, Exception):
            # Stop during an in-flight frame request surfaces as an error
            # message, exactly like the reference (cpp/opticalflow.cc:311-315)
            errors.append(msg)
    thread.join()
    assert done
    assert served < 12 * 9  # stopped early, nowhere near the full workload


def test_pose_quaternion_convention():
    p = pc.Pose()
    np.testing.assert_array_equal(p.q, [1, 0, 0, 0])  # identity, w first
    p.q = np.array([0.0, 1.0, 0.0, 0.0], np.float32)  # 180° about x
    engine = p._to_engine()
    from polychase_tpu.engine import pose as P
    import jax.numpy as jnp

    v = P.quat_rotate(engine.q, jnp.asarray([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(v), [0, 0, -1], atol=1e-6)


def test_engine_errors_surface_as_cpp_exception(tmp_path):
    """The pybind contract: engine failures raise CppException
    (cpp/polychase_pybind.cc:311-312)."""
    db_path = str(tmp_path / "empty.db")
    pc.Database(db_path).close()
    st = pc.SceneTransformations(
        model_matrix=np.eye(4, dtype=np.float32),
        view_matrix=np.eye(4, dtype=np.float32),
        intrinsics=pc.CameraIntrinsics(
            100.0, 100.0, 50.0, 50.0, 1.0, 100, 100,
            pc.CameraConvention.OpenCV,
        ),
    )
    mesh = pc.AcceleratedMesh(
        np.zeros((3, 3), np.float32), np.array([[0, 1, 2]], np.uint32)
    )
    with pytest.raises(pc.CppException):
        # no flows in the database -> tracker raises
        pc.track_sequence(db_path, 0, 3, st, mesh, lambda r: True)


def test_refine_segments_thread(tmp_path, rng):
    """RefineSegmentsThread: one worker refining two segments in one
    parallel dispatch (addon refine-all multi-chip path)."""
    mesh = make_sphere_mesh()
    intr_engine = make_intrinsics()
    poses = [orbit_pose(0.03 * t) for t in range(11)]
    db_path = str(tmp_path / "flow.db")
    build_flow_db(db_path, mesh, intr_engine, poses, rng)

    def seg(a, b):
        traj = pc.CameraTrajectory(a, b - a + 1)
        for i in range(a, b + 1):
            state = pc.CameraState(api_intrinsics(), pc.Pose(
                np.asarray(poses[i].q), np.asarray(poses[i].t)))
            if i not in (a, b):
                state.pose.t = state.pose.t + rng.normal(
                    0, 0.008, 3
                ).astype(np.float32)
            traj.set(i, state)
        return traj

    trajs = [seg(0, 5), seg(5, 10)]
    accel = pc.AcceleratedMesh(np.asarray(mesh.vertices),
                               np.asarray(mesh.triangles))
    thread = pc.RefineSegmentsThread(
        db_path, trajs, np.eye(4, dtype=np.float32), accel, False, False,
        pc.BundleOptions(),
    )
    done, updates = False, []
    deadline = time.time() + 300
    while not done and time.time() < deadline:
        msg = thread.try_pop()
        if msg is None:
            time.sleep(0.02)
            continue
        if isinstance(msg, bool):
            done = True
        elif isinstance(msg, Exception):
            raise msg
        else:
            updates.append(msg)
    thread.join()
    assert done and updates
    for traj, (a, b) in zip(trajs, [(0, 5), (5, 10)]):
        for i in range(a + 1, b):
            t = traj.get(i).pose.t
            assert np.linalg.norm(t - np.asarray(poses[i].t)) < 2.5e-3
