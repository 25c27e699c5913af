"""Observability: logging + opt-in JAX profiler traces.

The reference logs through spdlog (e.g. cpp/tracker.cc:139,156,189); here
every subsystem logs through a ``polychase_tpu.*`` stdlib logger.  Nothing
is emitted unless the application configures logging or sets
``POLYCHASE_LOG=debug|info|...`` (which installs a stderr handler).

Profiling: set ``POLYCHASE_PROFILE=/some/dir`` to capture a
``jax.profiler`` trace around the hot dispatch regions (viewable with
TensorBoard / Perfetto); :func:`profile_region` is a no-op otherwise.
"""

from __future__ import annotations

import contextlib
import logging
import os
import sys

_CONFIGURED = False


def get_logger(name: str) -> logging.Logger:
    """Logger under the ``polychase_tpu`` namespace, honoring POLYCHASE_LOG."""
    global _CONFIGURED
    logger = logging.getLogger(f"polychase_tpu.{name}")
    if not _CONFIGURED:
        _CONFIGURED = True
        level = os.environ.get("POLYCHASE_LOG", "").strip().upper()
        if level:
            root = logging.getLogger("polychase_tpu")
            handler = logging.StreamHandler(sys.stderr)
            handler.setFormatter(
                logging.Formatter(
                    "%(asctime)s %(levelname).1s %(name)s: %(message)s"
                )
            )
            root.addHandler(handler)
            root.setLevel(getattr(logging, level, logging.INFO))
    return logger


@contextlib.contextmanager
def profile_region(name: str):
    """Trace a hot region with jax.profiler when POLYCHASE_PROFILE is set.

    The first entered region starts a trace into ``$POLYCHASE_PROFILE``;
    every region is additionally annotated with a named TraceAnnotation so
    dispatch groups are attributable in the timeline.
    """
    trace_dir = os.environ.get("POLYCHASE_PROFILE", "").strip()
    if not trace_dir:
        yield
        return
    import jax

    global _TRACE_STARTED
    if not globals().get("_TRACE_STARTED"):
        globals()["_TRACE_STARTED"] = True
        jax.profiler.start_trace(trace_dir)
        get_logger("obs").info("jax profiler trace -> %s", trace_dir)
    with jax.profiler.TraceAnnotation(name):
        yield


def stop_profiler() -> None:
    """Flush an active POLYCHASE_PROFILE trace (safe to call always)."""
    if globals().get("_TRACE_STARTED"):
        import jax

        jax.profiler.stop_trace()
        globals()["_TRACE_STARTED"] = False
