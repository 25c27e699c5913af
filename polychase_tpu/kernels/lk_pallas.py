"""Pyramidal Lucas-Kanade iteration as Pallas TPU kernels.

Why this exists: the pure-XLA path in :mod:`polychase_tpu.engine.lk`
gathers an 11x11 window per feature per iteration.  XLA lowers each
window to one DMA descriptor, costing ~2us regardless of size, so a
640x480 analyze frame (8k features x 8 skip-targets x 30 iters x 4
levels) spends ~12 s in gathers on a v5e chip.  These kernels stage a
(PR, PC) patch per feature in VMEM *once per pyramid level* and run all
LK iterations out of VMEM, sampling bilinearly with per-feature integer
offsets folded into shifted-slice weights (pure VPU work, no gathers).

Semantics mirror ``engine.lk._lk_level`` (itself validated against
``cv2.calcOpticalFlowPyrLK`` goldens; reference hot loop:
/root/reference/cpp/opticalflow.cc:119-125):

- per level, the previous image/derivative windows and the 2x2 normal
  matrix come from a fixed sub-pixel position (``lk_prepare_level``: one
  extraction kernel over a stacked (img, dx, dy) grid axis, blend and
  normal matrices in XLA);
- the iteration loop samples the *next* image at the moving position,
  solves the 2x2 system, applies OpenCV's convergence / oscillation /
  out-of-bounds rules (``lk_iterate_level_multi``: one kernel whose grid
  covers all T skip-targets x feature groups), with early exit when
  every feature in the 128-lane group has converged;
- a feature whose position drifts outside its staged patch triggers an
  in-loop re-extraction of the group's patches (rare: patches carry
  +-6..10 px of slack re-centered on every extraction).

Layout notes (see /opt/skills/guides/pallas_guide.md): feature groups of
128 ride the lane dimension; patches live as (PR, PC, 128) f32 in VMEM;
per-feature extraction does an 8-aligned sublane block slice plus one
dynamic lane roll, then one transpose per group.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128          # features per kernel grid step (= lane width)
PADX = 16            # left padding of each pyramid level, pixels
PADY = 16            # top padding
_FLT_SCALE = 1.0 / (1 << 20)
_FLT_EPSILON = np.float32(1.1920929e-07)


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _patch_rows(win: int) -> int:
    """Iteration patch rows: window + drift slack, 8-aligned.

    Slack trades per-iteration sample cost (the bilinear blend spans
    every possible offset of the slack range) against re-extraction
    frequency.  Measured at 640p/win=10: win+12 slack is ~20% SLOWER
    end-to-end than win+22 — the grouped re-extraction (per-track DMA +
    rolls, triggered when any track of the group escapes) costs far more
    than the wider blend, so the generous slack stays."""
    return _round8(win + 22)


def _patch_cols(win: int) -> int:
    return win + 14


def _prep_rows(win: int) -> int:
    """Prep block rows: (win+2) window + up-to-7 alignment remainder."""
    return _round8(win + 10)


def pallas_supported() -> bool:
    """True when the default backend can run these kernels compiled."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def pad_level_dims(h: int, w: int) -> Tuple[int, int]:
    """Padded (Hp, Wp) for a level of size (h, w)."""
    hp = PADY + h + 16 + (-(h + PADY + 16)) % 8
    wp = max(256, -(-(w + PADX + 48) // 128) * 128)
    return hp, wp


def _to_smem(rows, vtmp, smem, sem):
    """Stage per-feature scalar vectors in SMEM via one DMA: per-feature
    extraction loops read GROUP x len(rows) scalars, and a cross-lane
    reduction per read costs ~5 VPU ops while an SMEM read is free."""
    vtmp[:] = jnp.concatenate(rows, axis=0)
    copy = pltpu.make_async_copy(vtmp, smem, sem)
    copy.start()
    copy.wait()


# ---------------------------------------------------------------------------
# Kernel A: previous-image window + derivative patches + normal matrix
# ---------------------------------------------------------------------------


# Keep a whole padded level in VMEM only below this size; larger images
# (1080p/4K frames) stay in HBM and patches arrive via per-feature DMA.
# Pallas double-buffers the image block across grid steps (it changes
# per stack/target index), so the budget is ~(16 MB - ~8 MB scratch)/2.
IMG_VMEM_LIMIT = 3 * (1 << 20)

# Test hook: force the HBM/DMA path in interpret mode (it is otherwise
# only reachable on real hardware at 1080p+).
FORCE_HBM_FOR_TESTS = False


def _narrow_level() -> int:
    """Dynamic-span row blend (POLYCHASE_LK_NARROW=1, experiment).

    The full blend spans every possible per-lane row offset (Dy terms)
    because offsets are per-feature.  Active offsets cluster: right
    after a group extraction they span <=8 rows (the 8-aligned block
    base) plus the drift since.  The narrow path computes the group's
    live offset range each iteration and, when it fits NARROW_SPAN,
    blends only that dynamically-based band.  The skipped terms all
    carry zero tent weight, so the math is identical term-for-term;
    outputs agree to float reassociation (~1e-5 px — XLA fuses the
    12-term and Dy-term sums differently).  Parity is pinned by the
    interpret test.

    Round-4 TPU A/B (interleaved): level 2 (rows+cols) won +13% at
    640p (11.85 vs 10.47 fps) and was neutral at 4K (0.777 vs 0.784,
    inside noise), so 2 is the default; 0 restores the full blend.
    """
    return int(os.environ.get("POLYCHASE_LK_NARROW", "2"))


def _narrow_span() -> int:
    return int(os.environ.get("POLYCHASE_LK_NARROW_SPAN", "12"))


def _narrow_xspan() -> int:
    return int(os.environ.get("POLYCHASE_LK_NARROW_XSPAN", "6"))


# NOTE: the MXU matmul blend (POLYCHASE_LK_MXU, counter-experiment 8)
# was DELETED in round 5 after its round-4 TPU A/B measured 7.6x slower
# end-to-end (1.52 vs 11.61 fps at 640p) — per-feature weights force a
# fori_loop of GROUP tiny dots, latency-bound exactly as hypothesized.
# The measurement record lives in BENCHMARKS.md; do not re-implement.


def coarse_iter_cap() -> int:
    """Optional iteration cap for pyramid levels ABOVE level 0
    (POLYCHASE_LK_COARSE_ITERS=n; 0 = off, cv2 semantics).

    Coarse levels only seed the next level's guess — a cap there trades
    a bounded seed error (halved per level by the 2x upsample, then
    re-converged at level 0 under the full budget) for the straggler
    tail of the per-group early exit, which dominates at 4K feature
    counts (1300+ lane groups each iterating until their worst lane).
    Level 0 always keeps the caller's budget, so convergence/status
    semantics at the output resolution are unchanged.

    Measured quality trade (round 4): an under-converged seed (cap hit
    while updates were still large) can snap level 0 to a different
    lattice optimum on ambiguous texture — the cap stays opt-in.  The
    convergence-VERIFIED relaxation below (coarse_level_eps) is the
    quality-neutral default instead.
    """
    return int(os.environ.get("POLYCHASE_LK_COARSE_ITERS", "0"))


def coarse_level_eps() -> float:
    """Convergence-verified early stop for pyramid levels ABOVE level 0
    (POLYCHASE_LK_COARSE_EPS, pixels at the coarse level's own scale;
    0 disables → cv2-exact termination at every level).

    Unlike the fixed iteration cap, this stops a coarse level only when
    the group's updates have genuinely shrunk below the threshold, so a
    straggler still iterating in large steps keeps its budget — the
    failure mode the cap measured (63→46 of 128 features within 0.5 px
    on ambiguous texture) cannot occur by construction: the seed handed
    to the next level is within ~2·eps of the fully-converged seed,
    deep inside the level-0 re-convergence basin (window 10).  cv2 uses
    the same numeric eps (default 0.01) at every level, tighter than
    seeding needs.

    Default 0 (exact termination).  Measured round 5 on hardware: the
    convergence-verified stop is perf-NEUTRAL at both 640p (13.89 vs
    13.79 fps) and 4K (0.842 vs 0.846 fps) — the 4K cap's round-4 +13%
    came precisely from truncating iterations stragglers still needed,
    which this formulation never does, so there is nothing for it to
    win.  Kept as an opt-in because its quality is proven: at 0.02 the
    within-0.5px recovery count is UNCHANGED vs cv2-exact termination
    (94/94, p99 position deviation 0.026 px, quality probe in
    tests/test_lk_blend_variants.py) while cap=3/5 lose 54/24 features
    on the same scene; at 0.05 ambiguous-texture features start
    lattice-jumping (p99 deviation 19 px, count 94→92).

    Determinism note: the group-level early exit already made results
    depend (sub-ulp, ~4e-4 px) on how features are grouped; a nonzero
    coarse eps raises that grouping sensitivity to ~0.15 px worst-case
    between different shardings of the same problem (multi-chip vs
    single) — a second reason the default stays 0.
    """
    return float(os.environ.get("POLYCHASE_LK_COARSE_EPS", "0"))


def blend_variant() -> str:
    """Resolve the active blend experiment from the environment.

    Returned string ("tent" | "narrow" | "narrow2") is hashable so the
    engine's jitted wrappers can carry it as a static argument — env
    flips then retrace instead of silently reusing a stale compile
    (required for in-process interleaved A/Bs)."""
    lvl = _narrow_level()
    if lvl >= 2:
        return f"narrow2@{_narrow_span()}x{_narrow_xspan()}"
    if lvl == 1:
        return f"narrow@{_narrow_span()}"
    return "tent"


def _blend_flags(blend):
    if blend is None:
        return None, None, None
    base, _, spans = blend.partition("@")
    if base not in ("tent", "narrow", "narrow2"):
        raise ValueError(f"unknown blend variant: {blend!r}")
    narrow = {"narrow": 1, "narrow2": 2}.get(base, 0)
    nspan = nxspan = None
    if spans:
        sy, _, sx = spans.partition("x")
        nspan = int(sy)
        if sx:
            nxspan = int(sx)
    return narrow, nspan, nxspan


def _use_hbm(
    Hp: int, Wp: int, interpret: bool, itemsize: int = 4
) -> bool:
    if interpret:
        return FORCE_HBM_FOR_TESTS
    return Hp * Wp * itemsize > IMG_VMEM_LIMIT


def _dedup_slots(by, bx, sel_i):
    """Per-lane DMA slot assignment with run dedup.

    Spatially sorted features frequently land in the SAME (row-base,
    col-base) fetch block; at 4K the per-feature block DMA dominates
    extraction (≈40 KB × GROUP per group-step).  A lane reuses the
    previous lane's block when (by, bx) match and both lanes are
    selected — ``slot[b]`` is the first lane of b's run, so only run
    heads issue/wait DMAs and followers read the head's buffer.
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
    prev_by = pltpu.roll(by, 1, 1)
    prev_bx = pltpu.roll(bx, 1, 1)
    prev_sel = pltpu.roll(sel_i, 1, 1)
    same = (prev_by == by) & (prev_bx == bx) & (idx > 0) & (prev_sel != 0)
    new = (sel_i != 0) & ~same
    sm = jnp.where(new, idx, -1)
    for k in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(sm, k, 1)
        sm = jnp.maximum(sm, jnp.where(idx >= k, sh, -1))
    return sm


def _block_fetcher(img_ref, img_in_hbm: bool, rows: int, lead):
    """Returns (issue(b, yb, xc, buf, sems), grab(b, yb, xc, buf, sems))
    for fetching a (rows, 256) block at an aligned base.

    ``lead`` indexes the stacked leading axis: VMEM images arrive as a
    (1, Hp, Wp) block (lead always 0); HBM images stay whole and ``lead``
    is the grid's stack index.  HBM blocks DMA into a per-feature buffer
    slot — all GROUP DMAs are issued before the first wait so their
    latencies overlap (guide: Async DMA / double buffering)."""
    if not img_in_hbm:
        def issue(b, yb, xc, buf, sems):
            return None

        def grab(b, yb, xc, buf, sems):
            return img_ref[
                0,
                pl.ds(pl.multiple_of(yb, 8), rows),
                pl.ds(pl.multiple_of(xc, 128), 256),
            ]

        return issue, grab

    def _src(yb, xc):
        return img_ref.at[
            lead,
            pl.ds(pl.multiple_of(yb, 8), rows),
            pl.ds(pl.multiple_of(xc, 128), 256),
        ]

    def issue(b, yb, xc, buf, sems):
        pltpu.make_async_copy(_src(yb, xc), buf.at[b], sems.at[b]).start()

    def grab(b, yb, xc, buf, sems):
        pltpu.make_async_copy(_src(yb, xc), buf.at[b], sems.at[b]).wait()
        return buf[b]

    return issue, grab


def _hbm_fetch_parts(img_ref, rows: int, lead):
    """HBM fetch split into (issue, wait, read) for slot-deduped DMAs:
    only a run head issues and waits; followers ``read`` its buffer."""

    def _src(yb, xc):
        return img_ref.at[
            lead,
            pl.ds(pl.multiple_of(yb, 8), rows),
            pl.ds(pl.multiple_of(xc, 128), 256),
        ]

    def issue(b, yb, xc, buf, sems):
        pltpu.make_async_copy(_src(yb, xc), buf.at[b], sems.at[b]).start()

    def wait(b, yb, xc, buf, sems):
        pltpu.make_async_copy(_src(yb, xc), buf.at[b], sems.at[b]).wait()

    def read(sl, buf):
        return buf[sl]

    return issue, wait, read


def _make_extract_kernel(win: int, Hp: int, Wp: int, img_in_hbm: bool):
    """Extract the (win+2)x(win+2) integer support window per feature from
    ONE image.  A single kernel loading image+dx+dy together exceeds the
    ~16 MB VMEM budget at 1080p, so prep runs this once per array and the
    bilinear blend + normal matrix happen in XLA on the (INT, INT, N)
    outputs."""
    INT = win + 2          # integer support incl. bilerp neighbor row/col
    BR = _prep_rows(win)

    def kernel(iyp_ref, ixp_ref, img_ref, out_ref, tmp, buf, sems,
               vtmp, smem, vsem):
        iyv = jnp.clip(iyp_ref[:], 0, Hp - INT)
        ixv = jnp.clip(ixp_ref[:], 0, Wp - INT)
        byv = jnp.minimum((iyv // 8) * 8, Hp - BR)
        ryv = iyv - byv
        bxcv = jnp.minimum((ixv // 128) * 128, Wp - 256)
        rxv = ixv - bxcv
        ones = jnp.ones((1, GROUP), jnp.int32)
        slots = _dedup_slots(byv, bxcv, ones) if img_in_hbm else ones
        _to_smem([byv, ryv, bxcv, rxv, slots], vtmp, smem, vsem)
        issue, grab = _block_fetcher(
            img_ref, img_in_hbm, BR, pl.program_id(0)
        )

        if img_in_hbm:
            issue_h, wait_h, read_h = _hbm_fetch_parts(
                img_ref, BR, pl.program_id(0)
            )

            def start(b, _):
                @pl.when(smem[4, b] == b)
                def _():
                    issue_h(b, smem[0, b], smem[2, b], buf, sems)

                return 0

            jax.lax.fori_loop(0, GROUP, start, 0)

        def per_track(b, _):
            yb = pl.multiple_of(smem[0, b], 8)
            ry = smem[1, b]
            xc = pl.multiple_of(smem[2, b], 128)
            rx = smem[3, b]
            if img_in_hbm:
                sl = smem[4, b]

                @pl.when(sl == b)
                def _():
                    wait_h(b, yb, xc, buf, sems)

                blk = read_h(sl, buf)
            else:
                blk = grab(b, yb, xc, buf, sems)
            blk = pltpu.roll(blk, (256 - rx) % 256, 1)
            blk = pltpu.roll(blk, (BR - ry) % BR, 0)
            tmp[b] = blk[:INT, :INT]
            return 0

        jax.lax.fori_loop(0, GROUP, per_track, 0)
        out_ref[0] = jnp.transpose(tmp[:], (1, 2, 0))

    return kernel, BR, INT


def lk_prepare_level(
    img_pad, dx_pad, dy_pad, pts, *, win: int, H: int, W: int,
    min_eig_thr: float, interpret: bool = False,
):
    """Previous-frame patches + normal matrices for one pyramid level.

    ``pts`` is (N, 2) float32 in unpadded level coordinates, N a multiple
    of GROUP.  Returns (Ipatch, dxI, dyI, A11, A12, A22, invD, ok) where
    patch arrays are (win, win, N) and vectors are (N,).
    """
    n = pts.shape[0]
    assert n % GROUP == 0, n
    Hp, Wp = img_pad.shape
    half = (win - 1) * 0.5
    ipf = jnp.floor(pts - half)
    ax = (pts[:, 0] - half - ipf[:, 0]).reshape(1, 1, n)
    ay = (pts[:, 1] - half - ipf[:, 1]).reshape(1, 1, n)
    ix = ipf[:, 0].astype(jnp.int32)
    iy = ipf[:, 1].astype(jnp.int32)
    ixp = (ix + PADX).reshape(1, n)
    iyp = (iy + PADY).reshape(1, n)

    img_in_hbm = _use_hbm(Hp, Wp, interpret)
    kernel, BR, INT = _make_extract_kernel(win, Hp, Wp, img_in_hbm)
    grid = (3, n // GROUP)   # stacked (img, dx, dy) x feature groups
    vec_in = lambda: pl.BlockSpec(
        (1, GROUP), lambda a, g: (0, g), memory_space=pltpu.VMEM
    )
    if img_in_hbm:
        img_in = pl.BlockSpec(memory_space=pl.ANY)
    else:
        img_in = pl.BlockSpec(
            (1, Hp, Wp), lambda a, g: (a, 0, 0), memory_space=pltpu.VMEM
        )
    ints_out = pl.BlockSpec(
        (1, INT, INT, GROUP), lambda a, g: (a, 0, 0, g),
        memory_space=pltpu.VMEM,
    )

    stacked = jnp.stack([img_pad, dx_pad, dy_pad])
    ints = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vec_in(), vec_in(), img_in],
        out_specs=ints_out,
        out_shape=jax.ShapeDtypeStruct((3, INT, INT, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((GROUP, INT, INT), jnp.float32),
            pltpu.VMEM(
                (GROUP, BR, 256) if img_in_hbm else (1, 8, 128),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((GROUP,)),
            pltpu.VMEM((5, GROUP), jnp.int32),
            pltpu.SMEM((5, GROUP), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(iyp, ixp, stacked)

    w00 = (1.0 - ax) * (1.0 - ay)
    w01 = ax * (1.0 - ay)
    w10 = (1.0 - ax) * ay
    w11 = ax * ay

    def bilerp(p):
        return (
            w00 * p[:win, :win, :]
            + w01 * p[:win, 1 : win + 1, :]
            + w10 * p[1 : win + 1, :win, :]
            + w11 * p[1 : win + 1, 1 : win + 1, :]
        )

    ip = bilerp(ints[0])
    dxi = bilerp(ints[1])
    dyi = bilerp(ints[2])
    a11 = jnp.sum(dxi * dxi, axis=(0, 1)) * _FLT_SCALE
    a12 = jnp.sum(dxi * dyi, axis=(0, 1)) * _FLT_SCALE
    a22 = jnp.sum(dyi * dyi, axis=(0, 1)) * _FLT_SCALE
    in_bounds = (ix >= -win) & (ix < W) & (iy >= -win) & (iy < H)
    D = a11 * a22 - a12 * a12
    win_area = float(win * win)
    min_eig = (a22 + a11 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) / (
        2.0 * win_area
    )
    ok = in_bounds & (min_eig >= min_eig_thr) & (D >= _FLT_EPSILON)
    invD = jnp.where(ok, 1.0 / jnp.where(ok, D, 1.0), 0.0)
    return ip, dxi, dyi, a11, a12, a22, invD, ok


# ---------------------------------------------------------------------------
# Kernel B: the LK iteration loop for one (level, target) pair
# ---------------------------------------------------------------------------


def _make_iter_kernel(
    win: int, Hp: int, Wp: int, H: int, W: int,
    max_iters: int, eps2: float, level_is_zero: bool, img_in_hbm: bool,
    narrow: int = 0, nspan: int = 12, nxspan: int = 6,
    with_iters: bool = False,
):
    PR = _patch_rows(win)
    PC = _patch_cols(win)
    Dy = PR - win + 1
    Dx = PC - win + 1
    LYT = (PR - win - 1) // 2 - 2   # initial row slack target (pre-align)
    LXT = (PC - win - 1) // 2       # initial col slack target
    half = (win - 1) * 0.5
    ly_max = float(PR - win - 1)
    lx_max = float(PC - win - 1)
    nspan = min(nspan, Dy)
    nxspan = min(nxspan, Dx)

    def kernel(
        ip_ref, dxi_ref, dyi_ref, a11_ref, a12_ref, a22_ref, invd_ref,
        ok_ref, x0_ref, y0_ref,
        img_ref,
        *rest,
    ):
        n_out = 5 if with_iters else 4
        xo_ref, yo_ref, st_ref, err_ref = rest[:4]
        it_ref = rest[4] if with_iters else None
        (tmp, patch, by_ref, bx_ref, buf, sems, vtmp, smem,
         vsem) = rest[n_out : n_out + 9]
        extra = rest[n_out + 9 :]
        issue, grab = _block_fetcher(
            img_ref, img_in_hbm, PR, pl.program_id(0)
        )
        if img_in_hbm:
            issue_h, wait_h, read_h = _hbm_fetch_parts(
                img_ref, PR, pl.program_id(0)
            )

        def extract(pxv, pyv, sel=None):
            """(Re-)stage patches.  ``sel`` (1, GROUP) bool restricts the
            per-track fetch/roll work to the selected lanes — an escape
            re-extraction touches only the lanes that drifted out, not
            the whole group (the per-track loop is the expensive part)."""
            oyf = pyv - half + PADY
            oxf = pxv - half + PADX
            iyw = jnp.floor(oyf).astype(jnp.int32)
            ixw = jnp.floor(oxf).astype(jnp.int32)
            byv = jnp.clip(((iyw - LYT) // 8) * 8, 0, Hp - PR)
            bxv = jnp.clip(ixw - LXT, 0, Wp - PC)
            if sel is None:
                sel_i = jnp.ones((1, GROUP), jnp.int32)
            else:
                sel_i = jnp.where(sel, 1, 0)
                byv = jnp.where(sel, byv, by_ref[:])
                bxv = jnp.where(sel, bxv, bx_ref[:])
            by_ref[:] = byv
            bx_ref[:] = bxv
            bxcv = jnp.minimum((bxv // 128) * 128, Wp - 256)
            rxv = bxv - bxcv
            slots = (
                _dedup_slots(byv, bxcv, sel_i) if img_in_hbm else sel_i
            )

            _to_smem([byv, bxcv, rxv, sel_i, slots], vtmp, smem, vsem)

            if img_in_hbm:
                def start(b, _):
                    @pl.when((smem[3, b] != 0) & (smem[4, b] == b))
                    def _():
                        issue_h(b, smem[0, b], smem[1, b], buf, sems)

                    return 0

                jax.lax.fori_loop(0, GROUP, start, 0)

            def per_track(b, _):
                @pl.when(smem[3, b] != 0)
                def _():
                    yb = pl.multiple_of(smem[0, b], 8)
                    xc = pl.multiple_of(smem[1, b], 128)
                    rx = smem[2, b]
                    if img_in_hbm:
                        sl = smem[4, b]

                        @pl.when(sl == b)
                        def _():
                            wait_h(b, yb, xc, buf, sems)

                        blk = read_h(sl, buf)
                    else:
                        blk = grab(b, yb, xc, buf, sems)
                    # Mosaic's dynamic_rotate is 32-bit only: rotate in
                    # f32 (tmp is f32 staging; extraction is off the
                    # per-iteration path, so the upcast is cheap).
                    tmp[b] = pltpu.roll(
                        blk.astype(jnp.float32), (256 - rx) % 256, 1
                    )[:, :PC]

                return 0

            jax.lax.fori_loop(0, GROUP, per_track, 0)
            # Narrowing store: the transpose itself stays f32 (a bf16
            # relayout costs Mosaic extra staging stack), only the
            # iteration-resident patch is narrow.
            patch[:] = jnp.transpose(tmp[:], (1, 2, 0)).astype(
                patch.dtype
            )

        def local_coords(pxv, pyv):
            lyf = (pyv - half + PADY) - by_ref[:].astype(jnp.float32)
            lxf = (pxv - half + PADX) - bx_ref[:].astype(jnp.float32)
            return lyf, lxf

        def _col_blend(rows, lxf):
            jw = jnp.zeros((win, win, GROUP), jnp.float32)
            for e in range(Dx):
                we = jnp.maximum(0.0, 1.0 - jnp.abs(lxf - e)).reshape(
                    1, 1, GROUP
                )
                jw = jw + we * rows[:, e : e + win, :]
            return jw

        def sample(lyf, lxf):
            p = patch[:]
            rows = jnp.zeros((win, PC, GROUP), jnp.float32)
            for d in range(Dy):
                wd = jnp.maximum(0.0, 1.0 - jnp.abs(lyf - d)).reshape(
                    1, 1, GROUP
                )
                rows = rows + wd * p[d : d + win, :, :]
            return _col_blend(rows, lxf)

        if narrow:
            rows_scr = extra[0]
            jwn_scr = extra[1] if narrow >= 2 else None

            def sample_narrow(lyf, lxf, active):
                """Row blend over a dynamically-based band of nspan
                shifts when every active lane's tent fits it; same
                nonzero terms as ``sample`` (the skipped ones have zero
                weight), equal up to compiler reassociation."""
                big = jnp.float32(3.0e38)
                mn = jnp.min(jnp.where(active, lyf, big))
                mx = jnp.max(jnp.where(active, lyf, -big))
                has = jnp.any(active)
                # Guard the empty-active case before the int cast.
                kb = jnp.clip(
                    jnp.minimum(mn, jnp.float32(PR)).astype(jnp.int32),
                    0, PR - win - nspan + 1,
                )
                fits = has & (mx <= kb.astype(jnp.float32) + (nspan - 1))

                @pl.when(fits)
                def _():
                    # Axis-0 slice = whole (PC, GROUP) planes: vreg
                    # granular for f32, no sub-register shuffling.
                    sub = patch[pl.ds(kb, win + nspan - 1)].astype(
                        jnp.float32
                    )
                    lrel = lyf - kb.astype(jnp.float32)
                    r = jnp.zeros((win, PC, GROUP), jnp.float32)
                    for d in range(nspan):
                        wd = jnp.maximum(
                            0.0, 1.0 - jnp.abs(lrel - d)
                        ).reshape(1, 1, GROUP)
                        r = r + wd * sub[d : d + win, :, :]
                    rows_scr[:] = r

                @pl.when(~fits)
                def _():
                    p = patch[:]
                    r = jnp.zeros((win, PC, GROUP), jnp.float32)
                    for d in range(Dy):
                        wd = jnp.maximum(
                            0.0, 1.0 - jnp.abs(lyf - d)
                        ).reshape(1, 1, GROUP)
                        r = r + wd * p[d : d + win, :, :]
                    rows_scr[:] = r

                if narrow < 2:
                    return _col_blend(rows_scr[:], lxf)

                # Level 2: the same dynamic-base trick on the column
                # axis (sublane-dim dynamic slice of the rows value).
                mnx = jnp.min(jnp.where(active, lxf, big))
                mxx = jnp.max(jnp.where(active, lxf, -big))
                kbx = jnp.clip(
                    jnp.minimum(mnx, jnp.float32(PC)).astype(jnp.int32),
                    0, PC - win - nxspan + 1,
                )
                fits_x = has & (
                    mxx <= kbx.astype(jnp.float32) + (nxspan - 1)
                )

                @pl.when(fits_x)
                def _():
                    # Ref-read dynamic slice (a value-level
                    # lax.dynamic_slice has no Pallas TPU lowering).
                    sub = rows_scr[:, pl.ds(kbx, win + nxspan - 1), :]
                    lrelx = lxf - kbx.astype(jnp.float32)
                    jw = jnp.zeros((win, win, GROUP), jnp.float32)
                    for e in range(nxspan):
                        we = jnp.maximum(
                            0.0, 1.0 - jnp.abs(lrelx - e)
                        ).reshape(1, 1, GROUP)
                        jw = jw + we * sub[:, e : e + win, :]
                    jwn_scr[:] = jw

                @pl.when(~fits_x)
                def _():
                    jwn_scr[:] = _col_blend(rows_scr[:], lxf)

                return jwn_scr[:]

        ipatch = ip_ref[:]
        dxi = dxi_ref[:]
        dyi = dyi_ref[:]
        A11 = a11_ref[:]
        A12 = a12_ref[:]
        A22 = a22_ref[:]
        invD = invd_ref[:]
        ok = ok_ref[:] > 0.0

        px0 = x0_ref[0]
        py0 = y0_ref[0]
        extract(px0, py0)

        def cond(c):
            it, _, _, active_f, _, _, _ = c
            return (it < max_iters) & jnp.any(active_f > 0.0)

        def body(c):
            # Mosaic cannot carry i1 vectors through scf.while: active and
            # status ride the carry as f32 masks.
            it, px, py, active_f, pdx, pdy, status_f = c
            active = active_f > 0.0
            ixw = jnp.floor(px - half).astype(jnp.int32)
            iyw = jnp.floor(py - half).astype(jnp.int32)
            oob = (ixw < -win) | (ixw >= W) | (iyw < -win) | (iyw >= H)
            if level_is_zero:
                status_f = jnp.where(active & oob, 0.0, status_f)
            active = active & ~oob

            lyf, lxf = local_coords(px, py)
            esc = active & (
                (lyf < 0.0) | (lyf > ly_max) | (lxf < 0.0) | (lxf > lx_max)
            )

            @pl.when(jnp.any(esc))
            def _():
                extract(px, py, esc)

            lyf, lxf = local_coords(px, py)
            if narrow:
                jw = sample_narrow(lyf, lxf, active)
            else:
                jw = sample(lyf, lxf)
            diff = (jw - ipatch) * 32.0
            b1 = (jnp.sum(diff * dxi, axis=(0, 1)) * _FLT_SCALE).reshape(
                1, GROUP
            )
            b2 = (jnp.sum(diff * dyi, axis=(0, 1)) * _FLT_SCALE).reshape(
                1, GROUP
            )
            dx_ = (A12 * b2 - A22 * b1) * invD
            dy_ = (A12 * b1 - A11 * b2) * invD
            px2 = jnp.where(active, px + dx_, px)
            py2 = jnp.where(active, py + dy_, py)
            conv = dx_ * dx_ + dy_ * dy_ <= eps2
            osc = (
                (it > 0)
                & (jnp.abs(dx_ + pdx) < 0.01)
                & (jnp.abs(dy_ + pdy) < 0.01)
            )
            back = active & osc
            px2 = jnp.where(back, px2 - dx_ * 0.5, px2)
            py2 = jnp.where(back, py2 - dy_ * 0.5, py2)
            active = active & ~conv & ~osc
            return (
                it + 1, px2, py2,
                jnp.where(active, 1.0, 0.0),
                dx_, dy_, status_f,
            )

        # At level 0 a failed eigenvalue/bounds/determinant gate finalizes
        # status=False, exactly like the XLA path (engine/lk.py: status &=
        # where(level_is_zero, ok, True)) and lkpyramid.cpp.
        status0 = (
            jnp.where(ok, 1.0, 0.0)
            if level_is_zero
            else jnp.ones((1, GROUP), jnp.float32)
        )
        init = (
            jnp.int32(0),
            px0,
            py0,
            jnp.where(ok, 1.0, 0.0),
            jnp.zeros((1, GROUP), jnp.float32),
            jnp.zeros((1, GROUP), jnp.float32),
            status0,
        )
        it_fin, px, py, _, _, _, status_f = jax.lax.while_loop(
            cond, body, init
        )

        xo_ref[0] = px
        yo_ref[0] = py
        st_ref[0] = status_f
        if with_iters:
            # Per-group early-exit statistic (probe-only output): every
            # lane of the group carries the group's final trip count.
            it_ref[0] = jnp.full((1, GROUP), it_fin, jnp.float32)
        if level_is_zero:
            # Patches are only stale for features whose final position
            # left the slack window; skip the re-extraction otherwise.
            lyf0, lxf0 = local_coords(px, py)
            stale = (
                (lyf0 < 0.0) | (lyf0 > ly_max)
                | (lxf0 < 0.0) | (lxf0 > lx_max)
            )

            @pl.when(jnp.any(stale))
            def _():
                extract(px, py, stale)

            lyf, lxf = local_coords(px, py)
            jw = sample(lyf, lxf)
            err_ref[0] = (
                jnp.sum(jnp.abs(jw - ipatch), axis=(0, 1)) / float(win * win)
            ).reshape(1, GROUP)
        else:
            err_ref[0] = jnp.zeros((1, GROUP), jnp.float32)

    return kernel, PR, PC


def lk_iterate_level_multi(
    imgs_pad, ipatch, dxi, dyi, a11, a12, a22, invd, ok, pts, *,
    win: int, H: int, W: int, max_iters: int, eps2: float,
    level_is_zero: bool, interpret: bool = False,
    narrow: int | None = None,
    nspan: int | None = None, nxspan: int | None = None,
    with_iters: bool = False,
):
    """Run the LK iteration loop for one level against T stacked targets.

    ``imgs_pad`` is (T, Hp, Wp); ``pts`` is the (T, N, 2) current guess in
    level coordinates (prep arrays are shared across targets).  One
    pallas_call with grid (T, N/GROUP) replaces T separate dispatches —
    per-call setup dominates at small frame sizes.  Returns
    (new_pts (T,N,2), status (T,N) bool, err (T,N)).
    """
    T, Hp, Wp = imgs_pad.shape
    n = pts.shape[1]
    assert n % GROUP == 0, n
    # Images may arrive bf16 (engine.lk._lk_bf16_enabled): the patch/DMA
    # scratch follows the image dtype — the sliding-window blend reads,
    # the measured bound of this kernel, then move half the bytes.  All
    # arithmetic still runs f32 (jnp promotion at the weight multiply).
    img_t = imgs_pad.dtype
    img_in_hbm = _use_hbm(Hp, Wp, interpret, imgs_pad.dtype.itemsize)
    if narrow is None:
        narrow = _narrow_level()
    kernel, PR, PC = _make_iter_kernel(
        win, Hp, Wp, H, W, max_iters, eps2, level_is_zero, img_in_hbm,
        narrow=int(narrow),
        nspan=_narrow_span() if nspan is None else int(nspan),
        nxspan=_narrow_xspan() if nxspan is None else int(nxspan),
        with_iters=with_iters,
    )
    grid = (T, n // GROUP)
    vec = lambda: pl.BlockSpec(
        (1, GROUP), lambda t, g: (0, g), memory_space=pltpu.VMEM
    )
    tvec = lambda: pl.BlockSpec(
        (1, 1, GROUP), lambda t, g: (t, 0, g), memory_space=pltpu.VMEM
    )
    patch_in = lambda: pl.BlockSpec(
        (win, win, GROUP), lambda t, g: (0, 0, g), memory_space=pltpu.VMEM
    )
    if img_in_hbm:
        img_in = pl.BlockSpec(memory_space=pl.ANY)
    else:
        img_in = pl.BlockSpec(
            (1, Hp, Wp), lambda t, g: (t, 0, 0), memory_space=pltpu.VMEM
        )

    okf = jnp.where(ok, 1.0, 0.0).reshape(1, n)
    x0 = pts[..., 0].reshape(T, 1, n)
    y0 = pts[..., 1].reshape(T, 1, n)
    a11r = a11.reshape(1, n)
    a12r = a12.reshape(1, n)
    a22r = a22.reshape(1, n)
    invdr = invd.reshape(1, n)

    n_out = 5 if with_iters else 4
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[patch_in() for _ in range(3)]
        + [vec() for _ in range(5)]
        + [tvec(), tvec()]
        + [img_in],
        out_specs=tuple(tvec() for _ in range(n_out)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((T, 1, n), jnp.float32)
            for _ in range(n_out)
        ),
        scratch_shapes=[
            pltpu.VMEM((GROUP, PR, PC), jnp.float32),
            pltpu.VMEM((PR, PC, GROUP), img_t),
            pltpu.VMEM((1, GROUP), jnp.int32),
            pltpu.VMEM((1, GROUP), jnp.int32),
            pltpu.VMEM(
                (GROUP, PR, 256) if img_in_hbm else (1, 8, 128),
                img_t,
            ),
            pltpu.SemaphoreType.DMA((GROUP,)),
            pltpu.VMEM((5, GROUP), jnp.int32),
            pltpu.SMEM((5, GROUP), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ]
        + ([pltpu.VMEM((win, PC, GROUP), jnp.float32)] if narrow else [])
        + (
            [pltpu.VMEM((win, win, GROUP), jnp.float32)]
            if narrow >= 2
            else []
        ),
        interpret=interpret,
    )(ipatch, dxi, dyi, a11r, a12r, a22r, invdr, okf, x0, y0, imgs_pad)

    xo, yo, st, err = (a.reshape(T, n) for a in outs[:4])
    new_pts = jnp.stack([xo, yo], axis=-1)
    if with_iters:
        return new_pts, st > 0.0, err, outs[4].reshape(T, n)
    return new_pts, st > 0.0, err


# ---------------------------------------------------------------------------
# Full coarse-to-fine solve (one XLA program; host wrapper jits this)
# ---------------------------------------------------------------------------


def lk_all_levels_pallas(
    prev_levels: Sequence,      # per level: (img_pad, dx_pad, dy_pad)
    next_images: Sequence,      # per level: tuple over T targets of img_pad
    pts,                        # (N, 2) f32 full-res positions, N % 128 == 0
    *,
    dims: Tuple[Tuple[int, int], ...],   # per level (H, W), unpadded
    win: int,
    max_iters: int,
    eps2: float,
    min_eig_thr: float,
    interpret: bool = False,
    init_flow=None,             # optional (T, N, 2) full-res starting flow
    blend: str | None = None,   # "tent"|"narrow"|"narrow2"; None = env
    coarse_cap: int | None = None,  # per-level iteration budget; None = env
    coarse_eps: float | None = None,  # coarse-level stop eps; None = env
):
    """Coarse-to-fine pyramidal LK for T targets sharing one source frame.

    Returns (next_pts (T,N,2), status (T,N) bool, err (T,N) f32) with the
    same conventions as ``engine.lk._lk_all_levels_multi``.  A per-target
    ``init_flow`` seeds the top-level guess (chained skip initialization);
    zero/None reproduces cv2's from-scratch coarse-to-fine.
    """
    preps = lk_prep_levels_pallas(
        prev_levels, pts,
        dims=dims, win=win, min_eig_thr=min_eig_thr, interpret=interpret,
    )
    return lk_iter_levels_pallas(
        preps, next_images, pts,
        dims=dims, win=win, max_iters=max_iters, eps2=eps2,
        interpret=interpret, init_flow=init_flow, blend=blend,
        coarse_cap=coarse_cap, coarse_eps=coarse_eps,
    )


def lk_prep_levels_pallas(
    prev_levels, pts, *, dims, win: int, min_eig_thr: float,
    interpret: bool = False,
):
    """Source-frame prep (template patches, derivative patches, normal
    matrices) for every level.  Depends only on the source pyramid and
    the points, so chained dispatches hoist it and share one prep across
    all phases of a skip fan."""
    out = []
    for lvl in range(len(prev_levels)):
        H, W = dims[lvl]
        prev_pts = pts * (1.0 / (1 << lvl))
        img_p, dx_p, dy_p = prev_levels[lvl]
        out.append(lk_prepare_level(
            img_p, dx_p, dy_p, prev_pts,
            win=win, H=H, W=W, min_eig_thr=min_eig_thr,
            interpret=interpret,
        ))
    return tuple(out)


def lk_iter_levels_pallas(
    preps, next_images, pts, *, dims, win: int, max_iters: int,
    eps2: float, interpret: bool = False, init_flow=None,
    blend: str | None = None, coarse_cap: int | None = None,
    coarse_eps: float | None = None,
):
    """Coarse-to-fine iterate chain over precomputed per-level preps."""
    narrow, nspan, nxspan = _blend_flags(blend)
    if coarse_cap is None:
        coarse_cap = coarse_iter_cap()
    if coarse_eps is None:
        coarse_eps = coarse_level_eps()
    levels = len(preps)
    T = len(next_images[0])
    top = levels - 1
    start = pts[None] if init_flow is None else pts[None] + init_flow
    cur = jnp.broadcast_to(
        start * (1.0 / (1 << top)), (T,) + pts.shape
    )
    status = err = None

    for lvl in range(top, -1, -1):
        H, W = dims[lvl]
        if lvl != top:
            cur = cur * 2.0
        ip, dxi, dyi, a11, a12, a22, invd, ok = preps[lvl]
        imgs = next_images[lvl]
        if not isinstance(imgs, jax.Array):
            imgs = jnp.stack(imgs)
        lvl_iters = max_iters
        if lvl > 0 and coarse_cap:
            lvl_iters = min(max_iters, coarse_cap)
        lvl_eps2 = eps2
        if lvl > 0 and coarse_eps:
            # Convergence-verified coarse stop (see coarse_level_eps):
            # relax the per-group exit threshold, never the budget.
            lvl_eps2 = max(float(eps2), float(coarse_eps) ** 2)
        cur, st, er = lk_iterate_level_multi(
            imgs, ip, dxi, dyi, a11, a12, a22,
            invd, ok, cur,
            win=win, H=H, W=W, max_iters=lvl_iters, eps2=lvl_eps2,
            level_is_zero=(lvl == 0), interpret=interpret,
            narrow=narrow, nspan=nspan, nxspan=nxspan,
        )
        if lvl == 0:
            status, err = st, er

    return cur, status, err
