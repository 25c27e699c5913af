"""Parity tests for the Pallas LK kernels (interpret mode on CPU).

The Pallas path must produce the same tracks as the XLA gather path in
engine/lk.py (which is itself golden-tested against cv2 in test_lk.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polychase_tpu.engine import lk
from polychase_tpu.kernels import lk_pallas as lkp


def _make_pair(h=96, w=160, shift=(3.0, 2.0), seed=0):
    rng = np.random.default_rng(seed)
    big = rng.uniform(0, 255, (h + 32, w + 32)).astype(np.float32)
    # smooth so LK has gradients to work with
    k = np.array([1, 4, 6, 4, 1], np.float32) / 16
    for axis in (0, 1):
        big = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), axis, big
        )
    img1 = big[8 : 8 + h, 8 : 8 + w]
    sy, sx = int(round(shift[1])), int(round(shift[0]))
    img2 = big[8 + sy : 8 + sy + h, 8 + sx : 8 + sx + w]
    return img1.astype(np.float32), img2.astype(np.float32)


def _pallas_pyr(img, opts):
    levels = lk.num_pyramid_levels(img.shape[0], img.shape[1], opts)
    pyr = lk.build_pyramid(jnp.asarray(img), levels)
    data = lk._prepare_levels_pallas(pyr, levels=levels)
    dims = []
    h, w = img.shape
    for _ in range(levels):
        dims.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    return data, tuple(dims), levels


def test_pallas_interpret_matches_xla():
    opts = lk.LKOptions()
    img1, img2 = _make_pair()
    h, w = img1.shape

    rng = np.random.default_rng(1)
    n = lkp.GROUP  # one lane group keeps interpret mode fast
    pts = rng.uniform((12, 12), (w - 12, h - 12), (n, 2)).astype(np.float32)

    # XLA reference path
    pyr1 = lk._prepare_levels(
        lk.build_pyramid(jnp.asarray(img1), 3),
        win=opts.window_size, levels=3,
    )
    pyr2 = lk._prepare_levels(
        lk.build_pyramid(jnp.asarray(img2), 3),
        win=opts.window_size, levels=3,
    )
    ref_nxt, ref_st, ref_err = lk._lk_all_levels(
        pyr1, pyr2, jnp.asarray(pts),
        jnp.float32(opts.term_epsilon**2),
        jnp.float32(opts.min_eigen_threshold),
        win=opts.window_size, max_iters=opts.term_max_iters, levels=3,
    )

    data1, dims, _ = _pallas_pyr(img1, opts)
    data2, _, _ = _pallas_pyr(img2, opts)
    nxt, st, err = lkp.lk_all_levels_pallas(
        tuple(data1[:3]),
        tuple((data2[lvl][0],) for lvl in range(3)),
        jnp.asarray(pts),
        dims=dims[:3],
        win=opts.window_size,
        max_iters=opts.term_max_iters,
        eps2=float(opts.term_epsilon**2),
        min_eig_thr=float(opts.min_eigen_threshold),
        interpret=True,
    )

    ref_nxt, ref_st = np.asarray(ref_nxt), np.asarray(ref_st)
    nxt, st = np.asarray(nxt[0]), np.asarray(st[0])
    assert np.mean(st == ref_st) > 0.97
    both = st & ref_st
    assert both.sum() > n // 2
    d = np.linalg.norm(nxt[both] - ref_nxt[both], axis=1)
    assert np.max(d) < 0.05, np.max(d)


def test_pad_level_dims_invariants():
    for h, w in [(480, 640), (60, 80), (1080, 1920), (17, 33)]:
        hp, wp = lkp.pad_level_dims(h, w)
        assert hp % 8 == 0
        assert wp % 128 == 0
        assert wp >= 256
        assert hp >= lkp.PADY + h + 16
        assert wp >= lkp.PADX + w + 48


def test_pallas_marks_textureless_features_lost():
    """A feature on a flat region must come back status=False, matching
    the XLA path's level-0 ok gate (min-eigenvalue threshold)."""
    opts = lk.LKOptions()
    rng = np.random.default_rng(4)
    img1, img2 = _make_pair()
    # flatten a region: features there have a degenerate normal matrix
    img1 = img1.copy()
    img2 = img2.copy()
    img1[30:70, 40:110] = 100.0
    img2[30:70, 40:110] = 100.0

    n = lkp.GROUP
    pts = np.concatenate(
        [
            rng.uniform((50, 40), (100, 60), (n // 2, 2)),  # flat region
            rng.uniform((12, 100), (148, 84 + 60), (n - n // 2, 2)),
        ]
    ).astype(np.float32)

    pyr1 = lk._prepare_levels(
        lk.build_pyramid(jnp.asarray(img1), 3),
        win=opts.window_size, levels=3,
    )
    pyr2 = lk._prepare_levels(
        lk.build_pyramid(jnp.asarray(img2), 3),
        win=opts.window_size, levels=3,
    )
    _, ref_st, _ = lk._lk_all_levels(
        pyr1, pyr2, jnp.asarray(pts),
        jnp.float32(opts.term_epsilon**2),
        jnp.float32(opts.min_eigen_threshold),
        win=opts.window_size, max_iters=opts.term_max_iters, levels=3,
    )

    data1, dims, _ = _pallas_pyr(img1, opts)
    data2, _, _ = _pallas_pyr(img2, opts)
    _, st, _ = lkp.lk_all_levels_pallas(
        tuple(data1[:3]),
        tuple((data2[lvl][0],) for lvl in range(3)),
        jnp.asarray(pts),
        dims=dims[:3],
        win=opts.window_size,
        max_iters=opts.term_max_iters,
        eps2=float(opts.term_epsilon**2),
        min_eig_thr=float(opts.min_eigen_threshold),
        interpret=True,
    )
    ref_st = np.asarray(ref_st)
    st = np.asarray(st[0])
    assert not ref_st[: n // 2].any()   # flat features fail in XLA
    assert np.array_equal(st, ref_st)   # pallas agrees exactly


def test_escape_reextraction_parity(rng):
    """Large in-level wander (>10px, beyond the patch slack) forces the
    kernel's selective re-extraction; positions/status must still match
    the XLA path exactly."""
    import scipy.ndimage as ndi

    from polychase_tpu.engine import lk
    from polychase_tpu.kernels import lk_pallas as lkp

    H, W = 120, 200
    big = ndi.gaussian_filter(
        rng.uniform(0, 255, (H + 80, W + 80)).astype(np.float32), 2.0
    )
    prev = np.ascontiguousarray(big[:H, :W])
    nxt = np.ascontiguousarray(big[16:16 + H, 12:12 + W])

    pyr_prev = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(prev), 1), levels=1
    )
    pyr_next = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(nxt), 1), levels=1
    )
    pts = rng.uniform((30, 30), (W - 30, H - 30), (128, 2)).astype(
        np.float32
    )
    out = lkp.lk_all_levels_pallas(
        tuple(pyr_prev[:1]), ((pyr_next[0][0],),),
        jnp.asarray(pts), dims=((H, W),), win=10, max_iters=40,
        eps2=1e-4, min_eig_thr=1e-4, interpret=True,
    )
    nxt_pts, st, _err = jax.device_get(out)

    ref = lk._lk_all_levels_multi(
        tuple(lk._prepare_levels(
            lk.build_pyramid(jnp.asarray(prev), 1), win=10, levels=1
        )),
        (jnp.stack([lk._prepare_levels(
            lk.build_pyramid(jnp.asarray(nxt), 1), win=10, levels=1
        )[0][0]]),),
        jnp.asarray(pts), jnp.float32(1e-4), jnp.float32(1e-4),
        win=10, max_iters=40, levels=1,
    )
    nr, sr, _er = jax.device_get(ref)

    disp = np.linalg.norm(np.asarray(nxt_pts[0]) - pts, axis=-1)
    assert (disp > 10).sum() > 20  # escapes actually happened
    assert np.array_equal(np.asarray(st[0]), np.asarray(sr[0]))
    both = np.asarray(st[0]) & np.asarray(sr[0])
    np.testing.assert_allclose(
        nxt_pts[0][both], nr[0][both], atol=1e-2
    )


def test_hbm_dma_path_parity(rng, monkeypatch):
    """The HBM per-feature-DMA path (1080p+ on hardware) against the XLA
    reference, in interpret mode via the FORCE_HBM_FOR_TESTS hook."""
    import scipy.ndimage as ndi

    from polychase_tpu.engine import lk
    from polychase_tpu.kernels import lk_pallas as lkp

    monkeypatch.setattr(lkp, "FORCE_HBM_FOR_TESTS", True)

    H, W = 96, 160
    big = ndi.gaussian_filter(
        rng.uniform(0, 255, (H + 40, W + 40)).astype(np.float32), 1.5
    )
    prev = np.ascontiguousarray(big[:H, :W])
    nxt = np.ascontiguousarray(big[3:3 + H, 4:4 + W])

    levels = 2
    pyr_prev = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(prev), levels), levels=levels
    )
    pyr_next = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(nxt), levels), levels=levels
    )
    dims = ((H, W), ((H + 1) // 2, (W + 1) // 2))
    pts = rng.uniform((14, 14), (W - 14, H - 14), (128, 2)).astype(
        np.float32
    )
    out = lkp.lk_all_levels_pallas(
        tuple(pyr_prev[:levels]),
        tuple((pyr_next[lvl][0],) for lvl in range(levels)),
        jnp.asarray(pts), dims=dims, win=10, max_iters=20,
        eps2=1e-4, min_eig_thr=1e-4, interpret=True,
    )
    nxt_pts, st, _err = jax.device_get(out)

    ref = lk._lk_all_levels_multi(
        tuple(lk._prepare_levels(
            lk.build_pyramid(jnp.asarray(prev), levels),
            win=10, levels=levels,
        )),
        tuple(
            jnp.stack([lk._prepare_levels(
                lk.build_pyramid(jnp.asarray(nxt), levels),
                win=10, levels=levels,
            )[lvl][0]])
            for lvl in range(levels)
        ),
        jnp.asarray(pts), jnp.float32(1e-4), jnp.float32(1e-4),
        win=10, max_iters=20, levels=levels,
    )
    nr, sr, _er = jax.device_get(ref)
    assert np.array_equal(np.asarray(st[0]), np.asarray(sr[0]))
    both = np.asarray(st[0]) & np.asarray(sr[0])
    assert both.sum() > 100
    np.testing.assert_allclose(nxt_pts[0][both], nr[0][both], atol=1e-2)


def test_hbm_dma_dedup_clustered(rng, monkeypatch):
    """Sorted, tightly clustered features share fetch blocks — the
    deduped DMA path must still produce exact XLA parity."""
    import scipy.ndimage as ndi

    from polychase_tpu.engine import lk
    from polychase_tpu.kernels import lk_pallas as lkp

    monkeypatch.setattr(lkp, "FORCE_HBM_FOR_TESTS", True)

    H, W = 96, 160
    big = ndi.gaussian_filter(
        rng.uniform(0, 255, (H + 40, W + 40)).astype(np.float32), 1.5
    )
    prev = np.ascontiguousarray(big[:H, :W])
    nxt = np.ascontiguousarray(big[2:2 + H, 3:3 + W])

    # 128 points in a 30x30 box, row-major sorted: long same-block runs
    pts = rng.uniform((60, 40), (90, 70), (128, 2)).astype(np.float32)
    pts = pts[np.lexsort((pts[:, 0], pts[:, 1]))]

    pyr_prev = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(prev), 1), levels=1
    )
    pyr_next = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(nxt), 1), levels=1
    )
    out = lkp.lk_all_levels_pallas(
        tuple(pyr_prev[:1]), ((pyr_next[0][0],),),
        jnp.asarray(pts), dims=((H, W),), win=10, max_iters=20,
        eps2=1e-4, min_eig_thr=1e-4, interpret=True,
    )
    nxt_pts, st, _err = jax.device_get(out)

    ref = lk._lk_all_levels_multi(
        tuple(lk._prepare_levels(
            lk.build_pyramid(jnp.asarray(prev), 1), win=10, levels=1
        )),
        (jnp.stack([lk._prepare_levels(
            lk.build_pyramid(jnp.asarray(nxt), 1), win=10, levels=1
        )[0][0]]),),
        jnp.asarray(pts), jnp.float32(1e-4), jnp.float32(1e-4),
        win=10, max_iters=20, levels=1,
    )
    nr, sr, _er = jax.device_get(ref)
    assert np.array_equal(np.asarray(st[0]), np.asarray(sr[0]))
    both = np.asarray(st[0]) & np.asarray(sr[0])
    assert both.sum() > 100
    np.testing.assert_allclose(nxt_pts[0][both], nr[0][both], atol=1e-2)


def test_pallas_bf16_storage_matches_f32():
    """POLYCHASE_LK_BF16 opt-in: bf16 IMAGE storage (dtype-driven through
    the kernels — scratch/DMA follow the image dtype, math stays f32)
    must track the f32 path within the bf16 rounding budget."""
    opts = lk.LKOptions()
    img1, img2 = _make_pair(seed=7)
    h, w = img1.shape
    rng = np.random.default_rng(2)
    n = lkp.GROUP
    pts = rng.uniform((12, 12), (w - 12, h - 12), (n, 2)).astype(np.float32)

    def run(bf16):
        d1 = lk._prepare_levels_pallas(
            lk.build_pyramid(jnp.asarray(img1), 3), levels=3, bf16=bf16
        )
        d2 = lk._prepare_levels_pallas(
            lk.build_pyramid(jnp.asarray(img2), 3), levels=3, bf16=bf16
        )
        want = jnp.bfloat16 if bf16 else jnp.float32
        assert d1[0][0].dtype == want
        assert d1[0][1].dtype == jnp.float32  # derivatives stay f32
        dims, hh, ww = [], h, w
        for _ in range(3):
            dims.append((hh, ww))
            hh, ww = (hh + 1) // 2, (ww + 1) // 2
        return lkp.lk_all_levels_pallas(
            tuple(d1[:3]),
            tuple((d2[lvl][0],) for lvl in range(3)),
            jnp.asarray(pts),
            dims=tuple(dims),
            win=opts.window_size,
            max_iters=opts.term_max_iters,
            eps2=float(opts.term_epsilon**2),
            min_eig_thr=float(opts.min_eigen_threshold),
            interpret=True,
        )

    nb, sb, eb = (np.asarray(a) for a in run(True))
    nf, sf, ef = (np.asarray(a) for a in run(False))
    assert np.mean(sb[0] == sf[0]) > 0.97
    both = sb[0] & sf[0]
    assert both.sum() > n // 2
    d = np.linalg.norm(nb[0][both] - nf[0][both], axis=1)
    # bf16 pixel rounding (~0.2% on filtered levels) perturbs converged
    # positions by well under 0.1 px on textured patches.
    assert np.median(d) < 0.05, np.median(d)


def test_pallas_bf16_hbm_path_matches_f32(monkeypatch):
    """bf16 storage through the HBM/DMA fetch path (per-feature async
    copies with bf16 buffers), forced in interpret mode."""
    monkeypatch.setattr(lkp, "FORCE_HBM_FOR_TESTS", True)
    opts = lk.LKOptions()
    img1, img2 = _make_pair(seed=11)
    h, w = img1.shape
    rng = np.random.default_rng(5)
    n = lkp.GROUP
    pts = rng.uniform((12, 12), (w - 12, h - 12), (n, 2)).astype(np.float32)

    def run(bf16):
        d1 = lk._prepare_levels_pallas(
            lk.build_pyramid(jnp.asarray(img1), 2), levels=2, bf16=bf16
        )
        d2 = lk._prepare_levels_pallas(
            lk.build_pyramid(jnp.asarray(img2), 2), levels=2, bf16=bf16
        )
        dims, hh, ww = [], h, w
        for _ in range(2):
            dims.append((hh, ww))
            hh, ww = (hh + 1) // 2, (ww + 1) // 2
        return lkp.lk_all_levels_pallas(
            tuple(d1[:2]),
            tuple((d2[lvl][0],) for lvl in range(2)),
            jnp.asarray(pts),
            dims=tuple(dims),
            win=opts.window_size,
            max_iters=opts.term_max_iters,
            eps2=float(opts.term_epsilon**2),
            min_eig_thr=float(opts.min_eigen_threshold),
            interpret=True,
        )

    nb, sb, _ = (np.asarray(a) for a in run(True))
    nf, sf, _ = (np.asarray(a) for a in run(False))
    assert np.mean(sb[0] == sf[0]) > 0.97
    both = sb[0] & sf[0]
    assert both.sum() > n // 2
    d = np.linalg.norm(nb[0][both] - nf[0][both], axis=1)
    assert np.median(d) < 0.05, np.median(d)
