"""Parity for the LK blend experiment paths (interpret mode on CPU).

- POLYCHASE_LK_NARROW (dynamic-span row blend): term-for-term the same
  math as the default tent-span blend — every skipped term carries zero
  weight — but XLA compiles the shorter sum with different fusion, so
  outputs agree to float reassociation (~1e-5 px), not bit-for-bit.
The flag is a perf experiment resolved per dispatch; the measured
A/B lives in BENCHMARKS.md.  (The MXU matmul blend, counter-experiment
8, was deleted in round 5 after measuring 7.6x slower on TPU.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from polychase_tpu.engine import lk
from polychase_tpu.kernels import lk_pallas as lkp

POS_ATOL = 1e-3   # px; observed reassociation noise is ~1e-5
ERR_ATOL = 5e-3   # err is a mean |diff| over the window, same scale


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _scene(rng, H=120, W=200, shift=(12, 16)):
    big = ndi.gaussian_filter(
        rng.uniform(0, 255, (H + 80, W + 80)).astype(np.float32), 2.0
    )
    prev = np.ascontiguousarray(big[:H, :W])
    nxt = np.ascontiguousarray(
        big[shift[0] : shift[0] + H, shift[1] : shift[1] + W]
    )
    pyr_prev = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(prev), 1), levels=1
    )
    pyr_next = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(nxt), 1), levels=1
    )
    pts = rng.uniform((30, 30), (W - 30, H - 30), (128, 2)).astype(
        np.float32
    )
    return pyr_prev, pyr_next, pts, (H, W)


def _run(pyr_prev, pyr_next, pts, dims, **kw):
    out = lkp.lk_all_levels_pallas(
        tuple(pyr_prev[:1]), ((pyr_next[0][0],),),
        jnp.asarray(pts), dims=(dims,), win=10, max_iters=40,
        eps2=1e-4, min_eig_thr=1e-4, interpret=True, **kw,
    )
    return jax.device_get(out)


@pytest.fixture(autouse=True)
def _full_blend_base(monkeypatch):
    """narrow=2 is the package default since its round-4 A/B win; these
    tests compare each variant against the FULL blend explicitly."""
    monkeypatch.setenv("POLYCHASE_LK_NARROW", "0")


def _run_flagged(monkeypatch, scene, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    try:
        return _run(*scene)
    finally:
        for k in env:
            monkeypatch.delenv(k, raising=False)


def _assert_close(base, other, pos_atol=POS_ATOL, err_atol=ERR_ATOL):
    p_b, s_b, e_b = (np.asarray(a[0]) for a in base)
    p_o, s_o, e_o = (np.asarray(a[0]) for a in other)
    assert np.array_equal(s_b, s_o)
    np.testing.assert_allclose(p_o, p_b, atol=pos_atol)
    np.testing.assert_allclose(e_o[s_b], e_b[s_b], atol=err_atol)


def test_narrow_blend_parity(rng, monkeypatch):
    scene = _scene(rng)
    base = _run(*scene)
    narrow = _run_flagged(monkeypatch, scene, POLYCHASE_LK_NARROW="1")
    _assert_close(base, narrow)


def test_narrow_blend_parity_with_escapes(rng, monkeypatch):
    """Wander beyond the slack forces re-extractions mid-loop — lane
    offsets then spread across the group and the narrow path must fall
    back per iteration without changing the result."""
    scene = _scene(rng, shift=(16, 12))
    base = _run(*scene)
    narrow = _run_flagged(monkeypatch, scene, POLYCHASE_LK_NARROW="1")
    disp = np.linalg.norm(np.asarray(base[0][0]) - scene[2], axis=-1)
    assert (disp > 10).sum() > 20  # escapes actually happened
    _assert_close(base, narrow)


def test_narrow_blend_full_span_bit_equal(rng, monkeypatch):
    """span=Dy compiles the identical full blend inside the narrow
    machinery — this one IS bit-equal, isolating the reassociation
    noise to the shorter sum."""
    scene = _scene(rng)
    base = _run(*scene)
    narrow = _run_flagged(
        monkeypatch, scene,
        POLYCHASE_LK_NARROW="1", POLYCHASE_LK_NARROW_SPAN="64",
    )
    for a, b in zip(base, narrow):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_narrow_blend_tiny_span_forces_fallback(rng, monkeypatch):
    """span=2 cannot cover the post-extraction 8-row alignment spread,
    so nearly every iteration takes the full-blend branch."""
    scene = _scene(rng)
    base = _run(*scene)
    narrow = _run_flagged(
        monkeypatch, scene,
        POLYCHASE_LK_NARROW="1", POLYCHASE_LK_NARROW_SPAN="2",
    )
    _assert_close(base, narrow)


def test_narrow_blend_hbm_path(rng, monkeypatch):
    scene = _scene(rng)
    monkeypatch.setattr(lkp, "FORCE_HBM_FOR_TESTS", True)
    base = _run(*scene)
    narrow = _run_flagged(monkeypatch, scene, POLYCHASE_LK_NARROW="1")
    _assert_close(base, narrow)


def test_coarse_iter_cap_small_motion_unaffected(rng):
    """POLYCHASE_LK_COARSE_ITERS caps only levels > 0; level 0 keeps the
    full budget.  For motion the coarse solve converges on quickly
    (small shifts), a cap of 5 lands within a twentieth of a pixel of
    the uncapped solve.

    Measured caveat (recorded here because it shapes the default): on
    ambiguous repetitive texture with LARGE motion the cap costs real
    recovery — 63→46 of 128 features within 0.5 px of truth at cap=5 on
    a blurred-noise scene with a 10.8 px shift — because an
    under-converged coarse seed snaps level 0 to a different lattice
    optimum.  The flag therefore stays opt-in (a 4K throughput lever),
    never the default.
    """
    H, W = 200, 320
    big = ndi.gaussian_filter(
        rng.uniform(0, 255, (H + 80, W + 80)).astype(np.float32), 2.0
    )
    prev = np.ascontiguousarray(big[:H, :W])
    nxt = np.ascontiguousarray(big[2 : 2 + H, 3 : 3 + W])
    levels = 2
    pyr_prev = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(prev), levels), levels=levels
    )
    pyr_next = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(nxt), levels), levels=levels
    )
    pts = rng.uniform((30, 30), (W - 30, H - 30), (128, 2)).astype(
        np.float32
    )
    dims = ((H, W), ((H + 1) // 2, (W + 1) // 2))

    def run(cap):
        out = lkp.lk_all_levels_pallas(
            tuple(pyr_prev[:levels]),
            tuple((pyr_next[lvl][0],) for lvl in range(levels)),
            jnp.asarray(pts), dims=dims, win=10, max_iters=30,
            eps2=1e-4, min_eig_thr=1e-4, interpret=True,
            coarse_cap=cap,
        )
        return jax.device_get(out)

    base = run(0)
    capped = run(5)
    s_b, s_c = np.asarray(base[1][0]), np.asarray(capped[1][0])
    assert np.mean(s_b == s_c) > 0.97
    both = s_b & s_c
    assert both.sum() > 96
    d = np.linalg.norm(
        np.asarray(capped[0][0])[both] - np.asarray(base[0][0])[both],
        axis=1,
    )
    assert np.max(d) < 0.05, np.max(d)


def test_with_iters_output(rng):
    """with_iters adds a probe-only output (per-group trip counts,
    broadcast across the group's lanes) without perturbing results."""
    scene = _scene(rng)
    base = _run(*scene)
    pyr_prev, pyr_next, pts, dims = scene
    ip, dxi, dyi, a11, a12, a22, invd, ok = lkp.lk_prep_levels_pallas(
        tuple(pyr_prev[:1]), jnp.asarray(pts),
        dims=(dims,), win=10, min_eig_thr=1e-4, interpret=True,
    )[0]
    nxt, st, err, iters = lkp.lk_iterate_level_multi(
        jnp.stack([pyr_next[0][0]]),
        ip, dxi, dyi, a11, a12, a22, invd, ok,
        jnp.broadcast_to(jnp.asarray(pts)[None], (1,) + pts.shape),
        win=10, H=dims[0], W=dims[1], max_iters=40, eps2=1e-4,
        level_is_zero=True, interpret=True, with_iters=True,
    )
    it = np.asarray(iters)[0]
    # broadcast within each group
    assert np.all(it.reshape(-1, lkp.GROUP) == it[::lkp.GROUP][:, None])
    assert np.all((it >= 1) & (it <= 40))
    # same results as the plain 4-output call
    assert np.array_equal(np.asarray(nxt), np.asarray(base[0]))
    assert np.array_equal(np.asarray(st), np.asarray(base[1]))


def test_narrow2_blend_parity(rng, monkeypatch):
    """Level 2 (rows + cols dynamically based) — same zero-weight-terms
    argument on both axes."""
    scene = _scene(rng)
    base = _run(*scene)
    n2 = _run_flagged(monkeypatch, scene, POLYCHASE_LK_NARROW="2")
    _assert_close(base, n2)


def test_narrow2_blend_parity_with_escapes(rng, monkeypatch):
    scene = _scene(rng, shift=(16, 12))
    base = _run(*scene)
    n2 = _run_flagged(monkeypatch, scene, POLYCHASE_LK_NARROW="2")
    _assert_close(base, n2)


def test_tpu_lowering_all_variants():
    """Cross-platform lowering catches Mosaic-unsupported constructs
    WITHOUT TPU hardware (interpret mode does not validate lowering —
    this test caught a value-level dynamic_slice and an f32 iota that
    would have failed on the chip).  Covers the VMEM-image path at a
    small shape and the HBM per-feature-DMA path at a 1080p shape."""
    from jax import export

    from polychase_tpu.kernels import lk_pallas as lkp

    win, n = 10, 128

    def build(blend, H, W, with_iters=False):
        narrow, nspan, nxspan = lkp._blend_flags(blend)
        Hp, Wp = lkp.pad_level_dims(H, W)

        def f(img, ip, dxi, dyi, a11, a12, a22, invd, ok, pts):
            return lkp.lk_iterate_level_multi(
                img, ip, dxi, dyi, a11, a12, a22, invd, ok, pts,
                win=win, H=H, W=W, max_iters=30, eps2=1e-4,
                level_is_zero=True, narrow=narrow,
                with_iters=with_iters,
            )

        args = (
            jnp.zeros((1, Hp, Wp), jnp.float32),
            jnp.zeros((win, win, n)), jnp.zeros((win, win, n)),
            jnp.zeros((win, win, n)),
            jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
            jnp.zeros((n,)), jnp.zeros((n,), bool),
            jnp.zeros((1, n, 2)),
        )
        return f, args

    legs = [
        ("tent", 120, 200, False),
        ("narrow", 120, 200, False),
        ("narrow2", 120, 200, False),
        ("tent", 120, 200, True),          # with_iters output
        ("narrow", 1080, 1920, False),     # HBM per-feature-DMA path
        ("narrow2", 1080, 1920, False),
    ]
    for blend, H, W, wi in legs:
        f, args = build(blend, H, W, with_iters=wi)
        export.export(jax.jit(f), platforms=("tpu",))(*args)


def test_coarse_eps_quality_neutral_on_ambiguous_texture(rng):
    """POLYCHASE_LK_COARSE_EPS (the convergence-verified coarse-level
    stop; default 0, documented opt-in 0.02) must NOT lose features on
    exactly the scene
    class where the fixed iteration cap measured a quality cost:
    ambiguous blurred-noise texture with a large subpixel (~10.8 px)
    shift.  The contract is recovery parity with cv2-exact termination
    (coarse_eps=0); the same scene must show the cap losing features,
    proving the scene discriminates.  (Measured sweep, this scene:
    exact 94/128 within 0.5 px; ce=0.02 → 94, p99 dev 0.026 px;
    ce=0.05 → 92 with 19 px p99 lattice jumps; cap3 → 40, cap5 → 70.)
    """
    H, W = 200, 320
    big = ndi.gaussian_filter(
        rng.uniform(0, 255, (H + 60, W + 60)).astype(np.float32), 1.2
    )
    sy, sx = 7.4, 10.8
    prev = np.ascontiguousarray(big[20 : 20 + H, 20 : 20 + W])
    shifted = ndi.shift(big, (-sy, -sx), order=3, mode="nearest")
    nxt = np.ascontiguousarray(shifted[20 : 20 + H, 20 : 20 + W])
    levels = 3
    pyr_prev = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(prev), levels), levels=levels
    )
    pyr_next = lk._prepare_levels_pallas(
        lk.build_pyramid(jnp.asarray(nxt), levels), levels=levels
    )
    pts = rng.uniform((40, 40), (W - 40, H - 40), (128, 2)).astype(
        np.float32
    )
    dims = []
    h, w = H, W
    for _ in range(levels):
        dims.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    dims = tuple(dims)

    def run(coarse_eps, coarse_cap=0):
        out = lkp.lk_all_levels_pallas(
            tuple(pyr_prev[:levels]),
            tuple((pyr_next[lvl][0],) for lvl in range(levels)),
            jnp.asarray(pts), dims=dims, win=10, max_iters=30,
            eps2=1e-4, min_eig_thr=1e-4, interpret=True,
            coarse_cap=coarse_cap, coarse_eps=coarse_eps,
        )
        return jax.device_get(out)

    # The crop moves the CONTENT by -shift: a feature at p in prev sits
    # at p - (sx, sy) in nxt.
    truth = pts - np.array([sx, sy], np.float32)

    def within_half_px(out):
        st = np.asarray(out[1][0])
        d = np.linalg.norm(np.asarray(out[0][0]) - truth, axis=1)
        return int(np.sum(st & (d < 0.5)))

    # 0.02 = the documented safe opt-in value (the default is 0 = exact
    # termination; the relaxation measured perf-neutral on hardware).
    exact = run(0.0)
    relaxed = run(0.02)
    capped = run(0.0, coarse_cap=5)
    n_exact, n_relaxed, n_capped = (
        within_half_px(exact), within_half_px(relaxed), within_half_px(capped)
    )
    assert n_exact > 80, n_exact  # the scene must be trackable at all
    # The scene must discriminate: the blunt cap loses features here.
    assert n_capped < n_exact, (n_capped, n_exact)
    # The convergence-verified stop must not.
    assert n_relaxed >= n_exact, (n_relaxed, n_exact)
    # And recovered positions must agree closely with exact termination
    # (no lattice jumps at the default eps; 0.05 measured p99 = 19 px).
    st_b = np.asarray(exact[1][0]) & np.asarray(relaxed[1][0])
    d = np.linalg.norm(
        np.asarray(relaxed[0][0])[st_b] - np.asarray(exact[0][0])[st_b],
        axis=1,
    )
    assert np.percentile(d, 99) < 0.1, np.percentile(d, 99)
