"""Stage decomposition of config-3 forward tracking (VERDICT r3 item 4).

354.7 fps = 2.8 ms/frame through the device scan chain
(engine/tracker.py) — this probe splits that budget into:

- host pack: DB reads + chunk packing, measured with the device program
  replaced by a trivial jit (same signature, no compute);
- device floor: all chunks of the REAL program dispatched back-to-back
  (async), drained once — the ceiling of a perfectly overlapped chain;
- LM share: device floor at max_iterations 30 vs 1 (the solve's
  marginal iteration cost; the Nielsen loop early-exits, so this bounds
  it from above);
- raycast share: device floor with the full sphere mesh vs a
  4-triangle stand-in (same program shape, trivial cast work);
- link/dispatch residual: e2e minus the max of the overlapped stages.

Run on an idle host with the tunnel live:
    python benchmarks/probe_track_floor.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import run_all as RA

N = int(os.environ.get("POLYCHASE_PROBE_FRAMES", "120"))


def _build():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    mesh, intr, poses = RA.make_scene(N)
    td = tempfile.mkdtemp()
    db_path = os.path.join(td, "flow.db")
    RA.build_synth_db(db_path, mesh, intr, poses, rng)

    tiny_verts = np.array(
        [[-3, -3, 0], [3, -3, 0], [0, 3, 0], [0, 0, 3]], np.float32
    )
    tiny_tris = np.array(
        [[0, 1, 2], [0, 1, 3], [1, 2, 3], [2, 0, 3]], np.uint32
    )
    from polychase_tpu.engine.geometry import Mesh

    tiny = Mesh.create(tiny_verts, tiny_tris)
    return mesh, tiny, intr, poses, db_path


def _run_track(
    db_path, mesh, intr, poses, reps=3, label="", env=None, opts=None,
    scan_chunk=None,
):
    env = env or {}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    from polychase_tpu.engine import tracker as _T

    old_chunk = _T.SCAN_CHUNK
    if scan_chunk is not None:
        # SCAN_CHUNK is frozen at import time — env is too late here.
        _T.SCAN_CHUNK = int(scan_chunk)
    try:
        from polychase_tpu.engine import camera as C
        from polychase_tpu.engine.levmarq import BundleOptions
        from polychase_tpu.engine.tracker import track_camera_trajectory
        from polychase_tpu.engine.trajectory import CameraTrajectory
        from polychase_tpu.io.database import Database

        opts = opts or BundleOptions()

        def run():
            traj = CameraTrajectory(0, N)
            traj.set(0, C.CameraState(intr, poses[0]))
            db = Database(db_path)
            t0 = time.perf_counter()
            track_camera_trajectory(
                db, traj, 0, N - 1, np.eye(4, dtype=np.float32), mesh,
                bundle_opts=opts,
            )
            dt = time.perf_counter() - t0
            db.close()
            return dt

        from polychase_tpu.engine.tracker import TrackingError

        try:
            run()  # compile
            dts = [run() for _ in range(reps)]
        except TrackingError as e:
            print(f"{label}: TrackingError ({e}) — not comparable",
                  flush=True)
            return None
        best = min(dts)
        print(
            f"{label}: {[round(d, 3) for d in dts]} "
            f"min {best:.3f}s = {(N - 1) / best:.1f} fps "
            f"({1000 * best / (N - 1):.2f} ms/frame)",
            flush=True,
        )
        return best
    finally:
        _T.SCAN_CHUNK = old_chunk
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _host_pack_floor(db_path, mesh, intr, poses, reps=3):
    """Replace the compiled scan program with a trivial same-signature
    jit: what remains is host DB reads, packing, uploads, and write-back."""
    import jax
    import jax.numpy as jnp

    from polychase_tpu.engine import tracker as T

    real = T._scan_track_fn
    fake_cache = {}

    def fake_fn(opt_f, opt_pp, opts_key, **kw):
        # Cached like the real factory — a fresh jit per call would
        # recompile every rep and poison the floor measurement.
        key = (opt_f, opt_pp, opts_key, tuple(sorted(kw.items())))
        if key in fake_cache:
            return fake_cache[key]

        @jax.jit
        def run(mesh_, model, model_inv, q0, t0, in0, const5, kps, xs):
            CH = xs[0].shape[0]  # every format leads with SCAN_CHUNK
            vecs = jnp.zeros((CH, 19), jnp.float32)
            vecs = vecs.at[:, 0].set(1.0)
            counts = jnp.full((CH,), 999, jnp.int32)
            # touch EVERY input array so uploads actually happen
            touch = sum(
                jnp.sum(a[0].astype(jnp.float32)) for a in xs
            )
            counts = counts + (touch * 0).astype(jnp.int32)
            return (q0, t0, in0), vecs, counts

        fake_cache[key] = run
        return run

    T._scan_track_fn = fake_fn
    try:
        return _run_track(
            db_path, mesh, intr, poses, reps, label="host pack floor"
        )
    finally:
        T._scan_track_fn = real


def main():
    mesh, tiny, intr, poses, db_path = _build()
    print(f"# scene: {int(mesh.num_triangles)} tris, {N} frames", flush=True)

    from polychase_tpu.engine.levmarq import BundleOptions

    e2e = _run_track(db_path, mesh, intr, poses, label="e2e (default)")
    host = _host_pack_floor(db_path, mesh, intr, poses)
    lm1 = _run_track(
        db_path, mesh, intr, poses, label="max_iterations=1",
        opts=BundleOptions(max_iterations=1),
    )
    tiny_cast = _run_track(
        db_path, tiny, intr, poses, label="4-tri mesh (raycast floor)"
    )
    chunk8 = _run_track(
        db_path, mesh, intr, poses, label="chunk=8", scan_chunk=8,
    )

    ms = lambda s: (1000 * s / (N - 1)) if s is not None else float("nan")
    print("\n# decomposition (ms/frame):")
    print(f"e2e                  {ms(e2e):7.2f}")
    print(f"host pack+write-back {ms(host):7.2f}")
    if lm1 is not None:
        print(f"LM-iteration share   {ms(e2e) - ms(lm1):7.2f}"
              "  (e2e - max_iters=1)")
    if tiny_cast is not None:
        print(f"raycast share        {ms(e2e) - ms(tiny_cast):7.2f}"
              "  (e2e - 4-tri)")
    if chunk8 is not None:
        print(f"chunk=8 delta        {ms(chunk8) - ms(e2e):7.2f}")


if __name__ == "__main__":
    main()
