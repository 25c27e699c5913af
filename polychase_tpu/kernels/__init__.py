"""Pallas TPU kernels for the hot compute paths.

The flagship kernel is pyramidal Lucas-Kanade optical flow
(:mod:`polychase_tpu.kernels.lk_pallas`), replacing the XLA gather-based
iteration in :mod:`polychase_tpu.engine.lk` on TPU.  XLA lowers the
per-feature window gather to one DMA descriptor per window (~2us each),
which makes the 30-iteration LK loop gather-bound; the Pallas kernel
instead stages per-feature patches in VMEM once per pyramid level and
runs every iteration out of VMEM.
"""

from polychase_tpu.kernels.lk_pallas import (  # noqa: F401
    lk_all_levels_pallas,
    lk_prepare_level,
    pallas_supported,
)
