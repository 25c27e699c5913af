"""GFTT detector golden tests vs OpenCV primitives.

The dense response maps are compared against cv2.cornerMinEigenVal /
cv2.cornerHarris directly.  The full pipeline is compared against a
replica of the reference algorithm (cpp/feature_detection/gftt.cc:14-192)
assembled here from OpenCV building blocks: grid-block threshold-to-zero,
3x3 dilation NMS, deterministic sort, greedy min-distance suppression.
"""

import cv2
import numpy as np
import pytest

from polychase_tpu.engine.gftt import (
    GFTTOptions,
    gftt_response,
    good_features_to_track,
)


def synth_image(rng, h=120, w=160):
    """Textured synthetic image with corners, blobs and noise."""
    img = rng.integers(0, 40, size=(h, w), dtype=np.uint8).astype(np.float32)
    for _ in range(25):
        y = int(rng.integers(5, h - 15))
        x = int(rng.integers(5, w - 15))
        val = float(rng.integers(90, 255))
        img[y : y + int(rng.integers(3, 10)), x : x + int(rng.integers(3, 10))] += val
    yy, xx = np.mgrid[0:h, 0:w]
    img += 30.0 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
    return np.clip(img, 0, 255).astype(np.uint8)


def reference_gftt(image, mask, opts: GFTTOptions):
    """cv2-based replica of the reference GoodFeaturesToTrack."""
    if opts.use_harris:
        eig = cv2.cornerHarris(
            image, opts.block_size, opts.gradient_size, opts.harris_k
        )
    else:
        # NB: the third positional arg is ``dst`` in this cv2 build —
        # ksize must be a keyword or it is silently ignored.
        eig = cv2.cornerMinEigenVal(
            image, opts.block_size, ksize=opts.gradient_size
        )

    h, w = image.shape
    gr, gc = max(1, opts.grid_rows), max(1, opts.grid_cols)
    bh, bw = -(-h // gr), -(-w // gc)
    for gy in range(gr):
        for gx in range(gc):
            y0, x0 = gy * bh, gx * bw
            y1, x1 = min(y0 + bh, h), min(x0 + bw, w)
            blk = eig[y0:y1, x0:x1]
            mblk = None if mask is None else mask[y0:y1, x0:x1]
            _, mx, _, _ = cv2.minMaxLoc(blk, mblk)
            _, out = cv2.threshold(
                blk, mx * opts.quality_level, 0, cv2.THRESH_TOZERO
            )
            eig[y0:y1, x0:x1] = out

    tmp = cv2.dilate(eig, None)
    cands = []
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            v = eig[y, x]
            if v != 0 and v == tmp[y, x] and (mask is None or mask[y, x]):
                cands.append((v, y * w + x, x, y))
    cands.sort(key=lambda c: (-c[0], -c[1]))

    corners = []
    if opts.min_distance >= 1:
        cell = round(opts.min_distance)
        gw, gh = (w + cell - 1) // cell, (h + cell - 1) // cell
        grid = [[] for _ in range(gw * gh)]
        md2 = opts.min_distance**2
        for v, _, x, y in cands:
            xc, yc = x // cell, y // cell
            good = True
            for yy in range(max(yc - 1, 0), min(yc + 1, gh - 1) + 1):
                for xx in range(max(xc - 1, 0), min(xc + 1, gw - 1) + 1):
                    for mx_, my_ in grid[yy * gw + xx]:
                        if (x - mx_) ** 2 + (y - my_) ** 2 < md2:
                            good = False
            if good:
                grid[yc * gw + xc].append((x, y))
                corners.append((x, y, v))
                if opts.max_corners > 0 and len(corners) == opts.max_corners:
                    break
    else:
        for v, _, x, y in cands:
            corners.append((x, y, v))
            if opts.max_corners > 0 and len(corners) == opts.max_corners:
                break
    pts = np.array([(x, y) for x, y, _ in corners], np.float32).reshape(-1, 2)
    quality = np.array([v for _, _, v in corners], np.float32)
    return pts, quality


def test_min_eigen_map_matches_opencv(rng):
    img = synth_image(rng)
    golden = cv2.cornerMinEigenVal(img, 3, ksize=3)
    eig, _ = gftt_response(
        np.asarray(img, np.float32), None, np.float32(1e9), np.float32(0.04)
    )
    # Before thresholding zeroes things, compare the raw response by using
    # a huge quality level (everything thresholded to 0 except the max).
    # Instead compare the internal response via a tiny quality level:
    eig2, _ = gftt_response(
        np.asarray(img, np.float32), None, np.float32(1e-12), np.float32(0.04)
    )
    eig2 = np.asarray(eig2)
    # Where the golden map is well above zero, values must agree closely.
    sel = golden > golden.max() * 1e-3
    np.testing.assert_allclose(eig2[sel], golden[sel], rtol=2e-3, atol=1e-9)


@pytest.mark.parametrize("ksize", [1, 5, 7])
def test_min_eigen_map_matches_opencv_other_ksizes(rng, ksize):
    """gradient_size 1/5/7 vs cv2.cornerMinEigenVal (the reference
    exposes the knob, cpp/feature_detection/gftt.h:5-21; OpenCV's
    getDerivKernels accepts 1/3/5/7)."""
    img = synth_image(rng)
    golden = cv2.cornerMinEigenVal(img, 3, ksize=ksize)
    eig, _ = gftt_response(
        np.asarray(img, np.float32), None, np.float32(1e-12),
        np.float32(0.04), ksize=ksize,
    )
    eig = np.asarray(eig)
    sel = golden > golden.max() * 1e-3
    np.testing.assert_allclose(eig[sel], golden[sel], rtol=2e-3, atol=1e-9)


@pytest.mark.parametrize("ksize", [1, 5])
def test_full_pipeline_other_ksizes(rng, ksize):
    img = synth_image(rng)
    opts = GFTTOptions(gradient_size=ksize)
    got_pts, _ = good_features_to_track(img, None, opts)
    exp_pts, _ = reference_gftt(img, None, opts)
    got = {tuple(p) for p in got_pts.tolist()}
    exp = {tuple(p) for p in exp_pts.tolist()}
    assert len(exp) > 30
    assert len(got & exp) / max(len(exp), 1) > 0.95
    assert len(got - exp) <= max(2, int(0.05 * len(exp)))


def test_topk_block_reduction_tie_collision_falls_back(monkeypatch):
    """The 2×2-reduced top-k is exact unless two adjacent candidates tie
    exactly; that case must signal an overflowed count so gftt_finish
    takes the exact full-map fallback."""
    import jax.numpy as jnp

    from polychase_tpu.engine import gftt as G

    H, W = 16, 16
    # Fake response derives from the image so the program stays
    # data-dependent, and the UNJITTED function is used so the patched
    # trace can never poison gftt_candidates_topk's jit cache for later
    # tests with the same shapes.
    monkeypatch.setattr(
        G, "gftt_response", lambda img, *a, **k: (img, img > 0)
    )
    topk_eager = G.gftt_candidates_topk.__wrapped__
    eig = np.zeros((H, W), np.float32)
    # two ADJACENT candidates with identical response (plateau tie)
    eig[5, 6] = eig[5, 7] = 3.0
    # a normal isolated candidate elsewhere
    eig[10, 3] = 7.0
    vals, idx, count = topk_eager(
        jnp.asarray(eig), None, np.float32(0.01), np.float32(0.04), k=64,
    )
    assert int(count) > vals.shape[0]  # collision → fallback trigger

    # without the tie the reduction is exact
    eig[5, 7] = 0.0
    vals, idx, count = topk_eager(
        jnp.asarray(eig), None, np.float32(0.01), np.float32(0.04), k=64,
    )
    assert int(count) == 2
    got = {
        (int(i) // W, int(i) % W)
        for v, i in zip(np.asarray(vals), np.asarray(idx)) if v > 0
    }
    assert got == {(5, 6), (10, 3)}


def test_gradient_size_validated_at_boundary():
    img = np.zeros((32, 32), np.uint8)
    with pytest.raises(ValueError, match="gradient_size"):
        good_features_to_track(img, None, GFTTOptions(gradient_size=4))


def test_harris_map_matches_opencv(rng):
    img = synth_image(rng)
    golden = cv2.cornerHarris(img, 3, 3, 0.04)
    eig, _ = gftt_response(
        np.asarray(img, np.float32),
        None,
        np.float32(1e-12),
        np.float32(0.04),
        use_harris=True,
    )
    eig = np.asarray(eig)
    # The pipeline thresholds-to-zero, which drops negative Harris values;
    # compare on clearly positive responses only.
    sel = golden > np.abs(golden).max() * 1e-3
    np.testing.assert_allclose(eig[sel], golden[sel], rtol=2e-3, atol=1e-10)


@pytest.mark.parametrize("use_mask", [False, True])
def test_full_pipeline_matches_reference(rng, use_mask):
    img = synth_image(rng)
    mask = None
    if use_mask:
        mask = np.zeros_like(img)
        mask[10:100, 20:140] = 255
    opts = GFTTOptions()
    got_pts, got_q = good_features_to_track(img, mask, opts)
    exp_pts, exp_q = reference_gftt(img, mask, opts)

    # Tiny float differences in the response map can flip strict local-max /
    # threshold decisions for near-tie pixels; demand near-total agreement.
    got = {tuple(p) for p in got_pts.tolist()}
    exp = {tuple(p) for p in exp_pts.tolist()}
    inter = got & exp
    assert len(exp) > 30
    assert len(inter) / max(len(exp), 1) > 0.95
    assert len(got - exp) <= max(2, int(0.05 * len(exp)))


def test_max_corners_and_ordering(rng):
    img = synth_image(rng)
    pts_all, q_all = good_features_to_track(img, None, GFTTOptions())
    pts_5, q_5 = good_features_to_track(
        img, None, GFTTOptions(max_corners=5)
    )
    assert pts_5.shape == (5, 2)
    np.testing.assert_array_equal(pts_5, pts_all[:5])
    # Quality non-increasing
    assert np.all(np.diff(q_all) <= 1e-9)


def test_empty_and_edge_cases():
    pts, q = good_features_to_track(
        np.zeros((0, 0), np.uint8), None, GFTTOptions()
    )
    assert pts.shape == (0, 2)
    # Uniform image → no corners
    pts, q = good_features_to_track(
        np.full((64, 64), 128, np.uint8), None, GFTTOptions()
    )
    assert pts.shape[0] == 0


class TestDeviceSuppression:
    """Device-parallel min-distance suppression must match the host
    greedy pass EXACTLY (same kept set, same order)."""

    def _compare(self, img, options, mask=None, monkeypatch=None):
        import jax
        from polychase_tpu.engine import gftt as G

        host = G.good_features_to_track_host(img, mask, options)
        # Force the device route regardless of image size
        monkeypatch.setenv("POLYCHASE_GFTT_DEV_SUPPRESS_MIN", "0")
        dev = G.gftt_finish(G.gftt_dispatch(img, mask, options))
        np.testing.assert_array_equal(dev[0], host[0])
        np.testing.assert_array_equal(dev[1], host[1])
        return host

    def test_matches_host_noise(self, rng, monkeypatch):
        img = rng.integers(0, 255, (120, 160)).astype(np.uint8)
        pts, _ = self._compare(
            img, GFTTOptions(min_distance=5.0), monkeypatch=monkeypatch
        )
        assert len(pts) > 20

    def test_matches_host_structured(self, rng, monkeypatch):
        import scipy.ndimage as ndi

        img = ndi.gaussian_filter(
            rng.uniform(0, 255, (100, 140)).astype(np.float32), 2.0
        ).astype(np.uint8)
        self._compare(
            img, GFTTOptions(min_distance=3.0), monkeypatch=monkeypatch
        )

    def test_matches_host_with_ties(self, rng, monkeypatch):
        # Tiled copies create exact quality ties -> exercises the
        # later-row-major-position tie-break.
        tile = rng.integers(0, 255, (40, 40)).astype(np.uint8)
        img = np.tile(tile, (3, 4))
        self._compare(
            img, GFTTOptions(min_distance=4.0), monkeypatch=monkeypatch
        )

    def test_matches_host_max_corners(self, rng, monkeypatch):
        img = rng.integers(0, 255, (120, 160)).astype(np.uint8)
        self._compare(
            img, GFTTOptions(min_distance=5.0, max_corners=25),
            monkeypatch=monkeypatch,
        )

    def test_matches_host_with_mask(self, rng, monkeypatch):
        img = rng.integers(0, 255, (96, 128)).astype(np.uint8)
        mask = np.zeros((96, 128), np.uint8)
        mask[20:80, 30:100] = 1
        self._compare(
            img, GFTTOptions(min_distance=5.0), mask=mask,
            monkeypatch=monkeypatch,
        )

    def test_matches_cv2_end_to_end(self, rng, monkeypatch):
        """Device-suppressed output still matches OpenCV goodFeaturesToTrack."""
        import cv2
        from polychase_tpu.engine import gftt as G

        img = rng.integers(0, 255, (120, 160)).astype(np.uint8)
        monkeypatch.setenv("POLYCHASE_GFTT_DEV_SUPPRESS_MIN", "0")
        # No grid threshold (grid 1x1 ~= stock OpenCV behavior)
        opts = GFTTOptions(min_distance=5.0, grid_rows=1, grid_cols=1)
        pts, _ = G.gftt_finish(G.gftt_dispatch(img, None, opts))
        ref = cv2.goodFeaturesToTrack(
            img, maxCorners=0, qualityLevel=0.01, minDistance=5.0,
            blockSize=3,
        ).reshape(-1, 2)
        assert len(pts) == len(ref)
        # Same corner set (order can differ on exact ties)
        a = {tuple(p) for p in pts.astype(int).tolist()}
        b = {tuple(p) for p in ref.astype(int).tolist()}
        assert len(a & b) >= 0.98 * len(ref)


def test_device_suppress_routing_guards(rng, monkeypatch):
    """Big min_distance must stay on the host path (the device disc
    unroll is O(d^2)); POLYCHASE_GFTT_DEV_SUPPRESS=0 disables outright."""
    from polychase_tpu.engine import gftt as G

    img = rng.integers(0, 255, (120, 160)).astype(np.uint8)
    monkeypatch.setenv("POLYCHASE_GFTT_DEV_SUPPRESS_MIN", "0")
    d1 = G.gftt_dispatch(img, None, GFTTOptions(min_distance=5.0))
    assert d1.suppressed
    d2 = G.gftt_dispatch(img, None, GFTTOptions(min_distance=9.0))
    assert not d2.suppressed
    monkeypatch.setenv("POLYCHASE_GFTT_DEV_SUPPRESS", "0")
    d3 = G.gftt_dispatch(img, None, GFTTOptions(min_distance=5.0))
    assert not d3.suppressed


class TestFusedNativeSortSuppress:
    """The fused C sort+suppress (native/bvh.cc gftt_sort_suppress) must be
    bit-equal to the numpy lexsort + greedy-grid behavioural reference for
    every option shape the pipeline can route through it."""

    @pytest.mark.parametrize(
        "opts",
        [
            GFTTOptions(),
            GFTTOptions(max_corners=200),
            GFTTOptions(min_distance=0.0),
            GFTTOptions(min_distance=0.0, max_corners=150),
            GFTTOptions(min_distance=11.0),
            GFTTOptions(use_harris=True),
        ],
        ids=["default", "capped", "no-suppress", "no-suppress-capped",
             "big-radius", "harris"],
    )
    def test_bit_equal_to_numpy_path(self, rng, opts):
        from polychase_tpu.engine import gftt as G

        if not G._native_sort_suppress(
            np.ones(1, np.float32), np.zeros(1, np.int64), 8, 8, 2.0, 0
        ) is not None:
            pytest.skip("native library unavailable")
        img = synth_image(rng, 160, 200)
        fused_xy, fused_q = G.gftt_finish(G.gftt_dispatch(img, None, opts))
        # The reference run must be the PURE numpy/Python path — null every
        # native reroute (including the inner greedy-grid C pass), else the
        # "bit-equal" claim is C compared against C.
        orig = (
            G._native_sort_suppress, G._native_suppress,
            G._native_quality_order,
        )
        G._native_sort_suppress = lambda *a, **k: None
        G._native_suppress = lambda *a, **k: None
        G._native_quality_order = lambda *a, **k: None
        try:
            ref_xy, ref_q = G.gftt_finish(G.gftt_dispatch(img, None, opts))
        finally:
            (
                G._native_sort_suppress, G._native_suppress,
                G._native_quality_order,
            ) = orig
        np.testing.assert_array_equal(fused_xy, ref_xy)
        np.testing.assert_array_equal(fused_q, ref_q)

    def test_quality_order_matches_lexsort(self, rng):
        from polychase_tpu.engine import gftt as G

        n = 3000
        # Heavy ties + negative values: the packed-key encoding must stay
        # exactly lexsort-ordered through sign changes and equal keys.
        vals = rng.choice(
            np.array([-2.5, -0.0, 0.0, 0.125, 0.125, 3.0, 7.5], np.float32),
            n,
        ).astype(np.float32)
        lin = rng.permutation(n).astype(np.int64)
        order = G._native_quality_order(vals, lin)
        if order is None:
            pytest.skip("native library unavailable")
        ref = np.lexsort((-lin, -vals))
        # Keys (vals, lin) are unique per candidate (lin is a permutation),
        # so the total orders must agree element-wise.
        np.testing.assert_array_equal(
            np.stack([vals[order], lin[order]]),
            np.stack([vals[ref], lin[ref]]),
        )


def test_unsorted_candidates_bit_equal_to_topk(rng, monkeypatch):
    """POLYCHASE_GFTT_TOPK=0 ships the raw 2×2-reduced maps instead of a
    device top-k; the host finish re-sorts either way, so detected
    corners and qualities must be bit-identical."""
    from polychase_tpu.engine import gftt as G

    img = (rng.uniform(0, 255, (96, 128))).astype(np.uint8)

    base = G.gftt_finish(G.gftt_dispatch(img, None, GFTTOptions()))
    monkeypatch.setenv("POLYCHASE_GFTT_TOPK", "0")
    nosort = G.gftt_finish(G.gftt_dispatch(img, None, GFTTOptions()))
    assert np.array_equal(base[0], nosort[0])
    assert np.array_equal(base[1], nosort[1])
    assert base[0].shape[0] > 16


def test_unsorted_candidates_tie_collision_falls_back(rng, monkeypatch):
    """The 2×2 plateau-tie collision must trip the same overflowed-count
    sentinel in the unsorted variant (gftt_finish then takes the exact
    full-map path and both variants agree)."""
    import jax.numpy as jnp

    from polychase_tpu.engine import gftt as G

    H, W = 16, 16
    monkeypatch.setattr(
        G, "gftt_response", lambda img, *a, **k: (img, img > 0)
    )
    reduced_eager = G.gftt_candidates_reduced.__wrapped__
    eig = np.zeros((H, W), np.float32)
    eig[5, 6] = eig[5, 7] = 3.0
    vals, idx, count = reduced_eager(
        jnp.asarray(eig), None, np.float32(0.01), np.float32(0.04),
    )
    assert int(count) > vals.shape[0]
