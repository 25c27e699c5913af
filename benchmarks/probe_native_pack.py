"""Interleaved A/B of the fused C chunk packer (native/bvh.cc
``pack_track_chunk``, POLYCHASE_NATIVE_PACK) on config-3 forward
tracking, plus the host-pack floor under both arms (device program
replaced by a trivial jit, so only DB reads + packing + upload +
write-back remain).

Run on an idle host with the tunnel live:
    python benchmarks/probe_native_pack.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import probe_track_floor as PF

ARMS = {
    "native=1": {"POLYCHASE_NATIVE_PACK": "1"},
    "native=0": {"POLYCHASE_NATIVE_PACK": "0"},
}
REPS = int(os.environ.get("POLYCHASE_PROBE_REPS", "3"))


def main():
    mesh, _tiny, intr, poses, db_path = PF._build()
    print(
        f"# scene: {int(mesh.num_triangles)} tris, {PF.N} frames",
        flush=True,
    )

    results = {k: [] for k in ARMS}
    for rep in range(REPS):
        for k, env in ARMS.items():
            best = PF._run_track(
                db_path, mesh, intr, poses, reps=1,
                label=f"rep{rep} {k}", env=env,
            )
            if best is not None:
                results[k].append(best)
    for k, v in results.items():
        best = min(v)
        print(
            f"{k}: min {best:.3f}s = {(PF.N - 1) / best:.1f} fps "
            f"({1000 * best / (PF.N - 1):.2f} ms/frame)",
            flush=True,
        )

    print("\n# host pack floor (trivial device program):", flush=True)
    for k, env in ARMS.items():
        old = {kk: os.environ.get(kk) for kk in env}
        os.environ.update(env)
        try:
            PF._host_pack_floor(db_path, mesh, intr, poses, reps=REPS)
        finally:
            for kk, vv in old.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv
        print(f"  (above = {k})", flush=True)


if __name__ == "__main__":
    main()
