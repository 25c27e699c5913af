"""Pyramidal LK golden tests vs cv2.calcOpticalFlowPyrLK."""

import cv2
import numpy as np

from polychase_tpu.engine.gftt import GFTTOptions, good_features_to_track
from polychase_tpu.engine.lk import (
    LKOptions,
    build_pyramid,
    calc_optical_flow,
    num_pyramid_levels,
    prepare_pyramid,
)


def textured(rng, h=160, w=200):
    img = rng.integers(0, 60, size=(h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    img += 80 + 60 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
    img += 40 * np.sin((xx + 2 * yy) / 17.0)
    img = cv2.GaussianBlur(img, (0, 0), 1.2)
    return np.clip(img, 0, 255).astype(np.uint8)


def shift_image(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(
        img, M, (img.shape[1], img.shape[0]), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT_101,
    )


def test_pyramid_matches_opencv(rng):
    img = textured(rng)
    levels = num_pyramid_levels(*img.shape, LKOptions())
    pyr = build_pyramid(np.asarray(img, np.float32), levels)
    golden = img.copy()
    for lvl in range(1, levels):
        golden = cv2.pyrDown(golden)
        ours = np.asarray(pyr[lvl])
        assert ours.shape == golden.shape
        # uint8 rounding in cv2 → compare within 1 intensity level
        assert np.abs(ours - golden.astype(np.float32)).max() <= 1.0 + 1e-3


def test_pure_translation_subpixel(rng):
    img1 = textured(rng)
    dx, dy = 3.4, -2.6
    img2 = shift_image(img1, dx, dy)

    pts, _ = good_features_to_track(img1, None, GFTTOptions(min_distance=10))
    pts = pts[:60]
    sel = (
        (pts[:, 0] > 15) & (pts[:, 0] < img1.shape[1] - 15)
        & (pts[:, 1] > 15) & (pts[:, 1] < img1.shape[0] - 15)
    )
    pts = pts[sel]
    assert len(pts) > 20

    opts = LKOptions()
    p1 = prepare_pyramid(img1, opts)
    p2 = prepare_pyramid(img2, opts)
    nxt, status, err = calc_optical_flow(p1, p2, pts, opts)

    flow = nxt[status] - pts[status]
    assert status.mean() > 0.9
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.08)
    # The bulk of tracked points should be accurate to ~0.25 px
    e = np.linalg.norm(flow - np.array([dx, dy]), axis=-1)
    assert np.quantile(e, 0.8) < 0.25


def test_matches_opencv_on_rotation_zoom(rng):
    img1 = textured(rng, 200, 260)
    center = (130, 100)
    M = cv2.getRotationMatrix2D(center, 2.5, 1.03)
    img2 = cv2.warpAffine(
        img1, M, (img1.shape[1], img1.shape[0]),
        borderMode=cv2.BORDER_REFLECT_101,
    )

    pts, _ = good_features_to_track(img1, None, GFTTOptions(min_distance=8))
    pts = pts[:120]

    opts = LKOptions()
    p1 = prepare_pyramid(img1, opts)
    p2 = prepare_pyramid(img2, opts)
    nxt, status, err = calc_optical_flow(p1, p2, pts, opts)

    cv_nxt, cv_status, cv_err = cv2.calcOpticalFlowPyrLK(
        img1, img2, pts.reshape(-1, 1, 2), None,
        winSize=(opts.window_size, opts.window_size),
        maxLevel=opts.max_level,
        criteria=(
            cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS,
            opts.term_max_iters, opts.term_epsilon,
        ),
        flags=0, minEigThreshold=opts.min_eigen_threshold,
    )
    cv_nxt = cv_nxt.reshape(-1, 2)
    cv_status = cv_status.reshape(-1).astype(bool)

    # Status agreement on the overwhelming majority
    agree = status == cv_status
    assert agree.mean() > 0.9

    both = status & cv_status
    d = np.linalg.norm(nxt[both] - cv_nxt[both], axis=-1)
    # Sub-pixel agreement with OpenCV for the bulk of features
    assert np.quantile(d, 0.8) < 0.3
    assert np.median(d) < 0.15


def test_status_false_for_flat_and_oob(rng):
    img1 = np.full((120, 160), 100, np.uint8)
    img1[40:60, 50:70] = 200
    img2 = img1.copy()
    pts = np.array(
        [
            [10.0, 10.0],    # flat region → min-eig failure
            [50.0, 40.0],    # corner → ok
            [300.0, 40.0],   # far out of bounds
        ],
        np.float32,
    )
    opts = LKOptions()
    p1 = prepare_pyramid(img1, opts)
    p2 = prepare_pyramid(img2, opts)
    nxt, status, err = calc_optical_flow(p1, p2, pts, opts)
    assert not status[0]
    assert status[1]
    assert not status[2]
    np.testing.assert_allclose(nxt[1], pts[1], atol=0.05)


def test_empty_points():
    img = np.zeros((64, 64), np.uint8)
    p = prepare_pyramid(img)
    nxt, status, err = calc_optical_flow(p, p, np.empty((0, 2), np.float32))
    assert nxt.shape == (0, 2)


def test_multi_target_matches_single(rng):
    from polychase_tpu.engine.lk import calc_optical_flow_multi

    img1 = textured(rng)
    targets = [
        shift_image(img1, 1.3, -0.7),
        shift_image(img1, -2.1, 0.4),
        shift_image(img1, 4.0, 2.5),
    ]
    pts, _ = good_features_to_track(img1, None, GFTTOptions(min_distance=9))
    pts = pts[:50]

    opts = LKOptions()
    p1 = prepare_pyramid(img1, opts)
    pyrs = [prepare_pyramid(t, opts) for t in targets]

    # Default multi path compresses the result transfer (f16 deltas /
    # f16 err / packed status): positions round within ~0.01 px of the
    # raw-f32 single path, status is exact.
    m_nxt, m_status, m_err = calc_optical_flow_multi(p1, pyrs, pts, opts)
    singles = []
    for i, p2 in enumerate(pyrs):
        s_nxt, s_status, s_err = calc_optical_flow(p1, p2, pts, opts)
        singles.append((s_nxt, s_status, s_err))
        np.testing.assert_array_equal(m_status[i], s_status)
        np.testing.assert_allclose(m_nxt[i], s_nxt, atol=0.02)
        np.testing.assert_allclose(m_err[i], s_err, rtol=1e-3, atol=1e-3)

    # With compression disabled the multi dispatch is bit-level the same
    # solve as the singles.
    import os

    os.environ["POLYCHASE_LK_COMPRESS"] = "0"
    try:
        r_nxt, r_status, r_err = calc_optical_flow_multi(p1, pyrs, pts, opts)
    finally:
        del os.environ["POLYCHASE_LK_COMPRESS"]
    for i, (s_nxt, s_status, s_err) in enumerate(singles):
        np.testing.assert_array_equal(r_status[i], s_status)
        np.testing.assert_allclose(r_nxt[i], s_nxt, atol=1e-5)
        np.testing.assert_allclose(r_err[i], s_err, atol=1e-5)


def test_bf16_storage_optin_matches_f32(rng):
    """POLYCHASE_LK_BF16=1 stores pyramid images bf16 (XLA flavor here);
    tracks must stay within the bf16 rounding budget of the f32 path."""
    import os

    img1 = textured(rng)
    img2 = shift_image(img1, 2.1, -1.4)
    pts, _ = good_features_to_track(img1, None, GFTTOptions(min_distance=9))
    pts = pts[:60]
    opts = LKOptions()

    def run():
        p1 = prepare_pyramid(img1, opts)
        p2 = prepare_pyramid(img2, opts)
        return p1, calc_optical_flow(p1, p2, pts, opts)

    os.environ["POLYCHASE_LK_BF16"] = "1"
    try:
        pb, (nb, sb, eb) = run()
    finally:
        del os.environ["POLYCHASE_LK_BF16"]
    pf, (nf, sf, ef) = run()
    assert str(pb.levels[0][0].dtype) == "bfloat16"
    assert str(pf.levels[0][0].dtype) == "float32"
    both = np.asarray(sb) & np.asarray(sf)
    assert both.sum() > 40
    d = np.linalg.norm(np.asarray(nb)[both] - np.asarray(nf)[both], axis=1)
    assert np.median(d) < 0.05, np.median(d)


def test_chained_skip_fan_nonlinear_motion(rng, monkeypatch):
    """Chained seeding extrapolates linearly; when the true motion is NOT
    linear in the skip (seed lands far from the optimum) the pyramid
    start must still recover the true flow, matching the unchained path."""
    import os

    monkeypatch.setenv("POLYCHASE_SHARD_ANALYZE", "0")
    from polychase_tpu.engine.lk import (
        calc_optical_flow_multi_async,
        calc_optical_flow_multi_finish,
        chain_engages,
    )

    img1 = textured(rng)
    # skip-2 motion is NOT 2x skip-1, skip-4 reverses direction entirely
    shifts = {1: (1.5, -1.0), 2: (7.0, 3.5), 4: (-5.0, 4.0)}
    skips = [1, 2, 4]
    tgts = [shift_image(img1, *shifts[s]) for s in skips]
    pts, _ = good_features_to_track(img1, None, GFTTOptions(min_distance=9))
    pts = pts[:120]
    opts = LKOptions()
    p1 = prepare_pyramid(img1, opts)
    pyrs = [prepare_pyramid(t, opts) for t in tgts]

    monkeypatch.setenv("POLYCHASE_LK_CHAIN", "1")
    assert chain_engages(skips)
    h = calc_optical_flow_multi_async(p1, pyrs, pts, opts, skips=skips)
    assert h[0] == "devch"
    cn, cs, _ = calc_optical_flow_multi_finish(h)

    monkeypatch.setenv("POLYCHASE_LK_CHAIN", "0")
    h = calc_optical_flow_multi_async(p1, pyrs, pts, opts, skips=skips)
    assert h[0] != "devch"
    un, us, _ = calc_optical_flow_multi_finish(h)

    for i, s in enumerate(skips):
        # the chained run must still find the true (nonlinear) motion
        med = np.median(cn[i][cs[i]] - pts[cs[i]], axis=0)
        np.testing.assert_allclose(med, shifts[s], atol=0.15)
        both = cs[i] & us[i]
        assert both.sum() > 0.8 * len(pts)
        d = np.linalg.norm(cn[i][both] - un[i][both], axis=1)
        assert np.median(d) < 0.05, (s, np.median(d))


def test_chain_plan_structure():
    """Phase/seed bookkeeping for the chained dispatch (pure host)."""
    from polychase_tpu.engine.lk import _chain_plan

    # Full mid-clip fan: 4 phases, each one negative + one positive slot,
    # every later phase seeded from the previous same-sign slot at 2x.
    plan = _chain_plan([-8, -4, -2, -1, 1, 2, 4, 8])
    assert len(plan) == 4
    assert plan[0] == [(3, None, 0.0), (4, None, 0.0)]
    assert plan[1] == [(2, (0, 0), 2.0), (5, (0, 1), 2.0)]
    assert plan[2] == [(1, (1, 0), 2.0), (6, (1, 1), 2.0)]
    assert plan[3] == [(0, (2, 0), 2.0), (7, (2, 1), 2.0)]

    # Clip start: positive-only chain, negative slots become padding.
    plan = _chain_plan([1, 2, 4, 8])
    assert [s[0] for p in plan for s in p] == [0, None, 1, None, 2, None,
                                               3, None]
    assert plan[1][0][1:] == ((0, 0), 2.0)

    # A missing middle magnitude seeds across the gap with the ratio.
    plan = _chain_plan([-1, 1, 4])
    assert len(plan) == 2
    assert plan[1][0] == (2, (0, 1), 4.0)
    assert plan[1][1][0] is None

    # Single magnitude: one unseeded phase (chain_engages gates this off).
    plan = _chain_plan([-1, 1])
    assert len(plan) == 1
    assert all(src is None for (_, src, _) in plan[0])


def test_chained_resume_shaped_fan(rng, monkeypatch):
    """A resume run can present gap-ridden fans (e.g. only skips {2, 8}
    missing): the chain seeds across the gap with the skip ratio and
    must still match the independent solves."""
    monkeypatch.setenv("POLYCHASE_SHARD_ANALYZE", "0")
    from polychase_tpu.engine.lk import (
        calc_optical_flow_multi_async,
        calc_optical_flow_multi_finish,
        chain_engages,
    )

    img1 = textured(rng)
    shifts = {2: (1.6, -1.2), 8: (6.4, -4.8)}   # linear in the skip
    skips = [2, 8]
    tgts = [shift_image(img1, *shifts[s]) for s in skips]
    pts, _ = good_features_to_track(img1, None, GFTTOptions(min_distance=9))
    pts = pts[:100]
    opts = LKOptions()
    p1 = prepare_pyramid(img1, opts)
    pyrs = [prepare_pyramid(t, opts) for t in tgts]

    monkeypatch.setenv("POLYCHASE_LK_CHAIN", "1")
    assert chain_engages(skips)
    h = calc_optical_flow_multi_async(p1, pyrs, pts, opts, skips=skips)
    assert h[0] == "devch"
    cn, cs, _ = calc_optical_flow_multi_finish(h)

    monkeypatch.setenv("POLYCHASE_LK_CHAIN", "0")
    h = calc_optical_flow_multi_async(p1, pyrs, pts, opts, skips=skips)
    un, us, _ = calc_optical_flow_multi_finish(h)

    for i, s in enumerate(skips):
        med = np.median(cn[i][cs[i]] - pts[cs[i]], axis=0)
        np.testing.assert_allclose(med, shifts[s], atol=0.1)
        both = cs[i] & us[i]
        d = np.linalg.norm(cn[i][both] - un[i][both], axis=1)
        assert np.median(d) < 0.05


def test_pack_roundtrip_large_flows():
    """The compressed transfer uses a per-dispatch dynamic int16 scale:
    quantization must stay proportional to the LARGEST delta (a fixed
    f16 encoding would snap a 1200 px 4K fast-pan flow to 0.5 px)."""
    import jax

    from polychase_tpu.engine.lk import _pack_lk_results, _unpack_lk_results

    rng = np.random.default_rng(0)
    T, m = 3, 256
    pts = rng.uniform(0, 3800, (m, 2)).astype(np.float32)
    deltas = rng.uniform(-1200, 1200, (T, m, 2)).astype(np.float32)
    nxt = pts[None] + deltas
    status = rng.random((T, m)) > 0.3
    err = rng.uniform(0, 30, (T, m)).astype(np.float32)

    out = jax.device_get(_pack_lk_results(
        jax.numpy.asarray(nxt), jax.numpy.asarray(status),
        jax.numpy.asarray(err), jax.numpy.asarray(pts),
    ))
    rn, rs, re = _unpack_lk_results(out, pts)
    np.testing.assert_array_equal(rs, status)
    step = np.abs(deltas).max() / 32700.0
    assert np.abs(rn - nxt).max() <= step * 0.75 + 1e-4
    np.testing.assert_allclose(re, err, rtol=2e-3, atol=1e-2)

    # Small-flow dispatch: quantization shrinks with the dispatch
    small = pts[None] + rng.uniform(-8, 8, (T, m, 2)).astype(np.float32)
    out = jax.device_get(_pack_lk_results(
        jax.numpy.asarray(small), jax.numpy.asarray(status),
        jax.numpy.asarray(err), jax.numpy.asarray(pts),
    ))
    rn, _, _ = _unpack_lk_results(out, pts)
    assert np.abs(rn - small).max() < 2e-3
