import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polychase_tpu.engine.geometry import Mesh
from polychase_tpu.engine.gridcast import build_grid_accel, grid_raycast_grouped
from polychase_tpu.engine.raycast import raycast_grouped

def make_mesh(n_tri, seed=0):
    # connected-ish bumpy sphere with n_tri triangles
    import math
    n_lat = max(4, int(math.sqrt(n_tri / 2)))
    n_lon = max(4, n_tri // (2 * n_lat) + 1)
    rng = np.random.default_rng(seed)
    verts, tris = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.05 * rng.standard_normal()
            verts.append([r*np.sin(th)*np.cos(ph), r*np.sin(th)*np.sin(ph), r*np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i*n_lon+j; b = i*n_lon+(j+1)%n_lon
            c = (i+1)*n_lon+j; d = (i+1)*n_lon+(j+1)%n_lon
            if i > 0: tris.append([a,c,b])
            if i < n_lat-1: tris.append([b,c,d])
    return np.asarray(verts, np.float32), np.asarray(tris, np.uint32)

def rays(G, K, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(G,3)); o = 4.0*o/np.linalg.norm(o,axis=-1,keepdims=True)
    tgt = rng.normal(0, 0.6, (G,K,3))
    d = tgt - o[:,None,:]
    return o.astype(np.float32), d.astype(np.float32)

def _study():
    G, K = 64, 512
    for n_tri in (8_000, 30_000, 100_000, 400_000):

        v, t = make_mesh(n_tri)
        T = len(t)
        mesh = Mesh.create(v, t)
        t0 = time.perf_counter()
        accel = build_grid_accel(v, t)
        build_s = time.perf_counter() - t0
        o, d = rays(G, K)
        oj, dj = jnp.asarray(o), jnp.asarray(d)

        def timed(fn, reps=3):
            r = fn(); jax.device_get(r.t)  # warm/compile
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                r = fn(); jax.device_get(r.t)
                best = min(best, time.perf_counter() - t0)
            return best, r

        for blk in (4, 8, 16):
            tg, rg = timed(lambda: grid_raycast_grouped(mesh, accel, oj, dj, block=blk))
            print(f"  T={T} block={blk}: grid={tg*1e3:8.1f}ms")
        n_items = accel.items.shape[0]
        if T <= 500_000:
            tb, rb = timed(lambda: raycast_grouped(mesh, oj, dj))
            agree = (np.asarray(rb.valid) == np.asarray(rg.valid)).mean()
        else:
            tb, agree = float('nan'), float('nan')
        # host BVH
        try:
            from polychase_tpu import native
            bvh = native.BvhRaycaster(v, t)
            of = np.broadcast_to(o[:,None,:],(G,K,3)).reshape(-1,3).copy()
            df = d.reshape(-1,3).copy()
            t0=time.perf_counter(); bvh.raycast(of, df, None); tn = time.perf_counter()-t0
        except Exception as e:
            tn = float('nan')
        print(f"T={T:7d} items={n_items:8d} build={build_s*1e3:7.1f}ms grid={tg*1e3:8.1f}ms brute={tb*1e3 if tb==tb else float('nan'):8.1f}ms bvh_host={tn*1e3:7.1f}ms agree={agree}")


if __name__ == "__main__":
    _study()
