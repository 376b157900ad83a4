"""Profiling / tracing helpers.

The reference's only tracing is commented-out timers and a rays/s log line
(SURVEY.md §5). Here: JAX profiler traces viewable in TensorBoard/Perfetto
plus a phase timer that forces device completion (``block_until_ready``
does not actually block through this environment's tunneled TPU — a device
round trip does).
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("stnerf_tpu.profile")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace("/tmp/tb"): step()`` then open
    the logdir in TensorBoard's profile tab (or Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profile trace written to %s", logdir)


@contextlib.contextmanager
def phase(name: str, sync_on=None):
    """Wall-time a phase; pass a jax array (or pytree) as ``sync_on`` to
    force device completion before the clock stops."""
    t0 = time.time()
    holder = {}
    try:
        yield holder
    finally:
        if sync_on is not None or holder.get("sync") is not None:
            import jax

            target = holder.get("sync", sync_on)
            jax.device_get(jax.tree.map(lambda x: x.ravel()[0], target))
        dt = time.time() - t0
        holder["seconds"] = dt
        logger.info("[phase] %s: %.3fs", name, dt)


def device_memory_stats() -> dict:
    """Best-effort live/peak device memory numbers."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                      "bytes_limit") if k in stats}
    except Exception:
        return {}
