"""Per-level LK iteration statistics at 4K (VERDICT r3 item 6 evidence).

The iterate kernel early-exits per 128-lane GROUP (a group runs until
its worst lane converges).  This probe measures, on a 4K synthetic
noise frame (the config-5b workload), the distribution of group trip
counts per pyramid level — the data behind the coarse-level iteration
cap (POLYCHASE_LK_COARSE_ITERS) and the 4K roofline argument.

Run with the tunnel live:  python benchmarks/probe_lk_iters.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

W4, H4 = 3840, 2160


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from polychase_tpu.engine import gftt as G
    from polychase_tpu.engine import lk as L
    from polychase_tpu.kernels import lk_pallas as lkp

    rng = np.random.default_rng(3)
    big = rng.integers(0, 255, (H4 + 40, W4 + 60)).astype(np.float32)
    big = cv2.GaussianBlur(big, (0, 0), 1.5)
    big = (255 * (big - big.min()) / np.ptp(big)).astype(np.uint8)
    prev = np.ascontiguousarray(big[:H4, :W4])
    nxt = np.ascontiguousarray(big[3 : 3 + H4, 5 : 5 + W4])

    pts, _ = G.good_features_to_track(prev, None, G.GFTTOptions())
    n = (pts.shape[0] // lkp.GROUP) * lkp.GROUP
    pts = np.ascontiguousarray(pts[:n], np.float32)
    print(f"features: {n} ({n // lkp.GROUP} groups)", flush=True)

    opts = L.LKOptions()
    levels = L.num_pyramid_levels(H4, W4, opts)
    pyr_prev = L.prepare_pyramid(jax.device_put(prev), opts)
    pyr_next = L.prepare_pyramid(jax.device_put(nxt), opts)

    preps = lkp.lk_prep_levels_pallas(
        tuple(pyr_prev.levels[:levels]), jnp.asarray(pts),
        dims=tuple(pyr_prev.dims[:levels]), win=opts.window_size,
        min_eig_thr=float(opts.min_eigen_threshold),
    )

    top = levels - 1
    cur = jnp.broadcast_to(
        jnp.asarray(pts)[None] * (1.0 / (1 << top)), (1, n, 2)
    )
    for lvl in range(top, -1, -1):
        H, W = pyr_prev.dims[lvl]
        if lvl != top:
            cur = cur * 2.0
        ip, dxi, dyi, a11, a12, a22, invd, ok = preps[lvl]
        t0 = time.perf_counter()
        cur, st, err, iters = lkp.lk_iterate_level_multi(
            jnp.stack([pyr_next.levels[lvl][0]]),
            ip, dxi, dyi, a11, a12, a22, invd, ok, cur,
            win=opts.window_size, H=H, W=W,
            max_iters=opts.term_max_iters,
            eps2=float(min(max(opts.term_epsilon, 0.0), 10.0) ** 2),
            level_is_zero=(lvl == 0), with_iters=True,
        )
        it_np = np.asarray(jax.device_get(iters))[0][:: lkp.GROUP]
        dt = time.perf_counter() - t0
        q = np.percentile(it_np, [50, 90, 99, 100])
        print(
            f"level {lvl} ({H}x{W}): group iters p50={q[0]:.0f} "
            f"p90={q[1]:.0f} p99={q[2]:.0f} max={q[3]:.0f} "
            f"mean={it_np.mean():.1f} (dispatch+fetch {dt:.2f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
