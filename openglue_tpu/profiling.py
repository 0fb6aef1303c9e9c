"""Profiling & timing utilities (SURVEY.md §5: the reference has no profiling
at all; here it is first-class).

* ``trace`` — jax.profiler trace context writing a Perfetto-compatible trace.
* ``annotate`` — named scope that shows up on the TPU timeline.
* ``device_timeit`` — robust kernel timing behind the axon tunnel, where
  ``block_until_ready`` does NOT synchronize: the op runs in a device-side
  lax.scan inside one jit with a serializing data dependency, a scalar fetch
  forces completion, and two iteration counts are differenced to cancel the
  fixed ~40 ms dispatch cost (see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in Perfetto/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Timeline annotation context (device ops traced under this name)."""
    return jax.profiler.TraceAnnotation(name)


def device_timeit(
    fn: Callable[[Any], Any],
    x: Any,
    iters_low: int = 4,
    iters_high: int = 16,
    perturb: Optional[Callable[[Any, jnp.ndarray], Any]] = None,
) -> float:
    """Seconds per call of ``fn(x)``, measured device-side.

    fn must map a pytree to a pytree; each iteration perturbs the input by a
    per-iteration scalar so XLA cannot hoist the call out of the loop
    (multiplying by 1 + 1e-6*u changes results only at the last ulp).
    """
    if perturb is None:
        perturb = lambda x, s: jax.tree_util.tree_map(
            lambda a: a * s if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            x,
        )

    key = jax.random.key(1234)

    @jax.jit
    def loop(x, n):
        # TRACED trip count: one compile serves every iteration count, which
        # matters when remote compiles cost ~1 min each.
        def body(i, acc):
            s = (1.0 + 1e-6 * jax.random.uniform(jax.random.fold_in(key, i))).astype(
                jnp.float32
            )
            out = fn(perturb(x, s))
            # include EVERY numeric leaf — dropping (e.g. integer) outputs can
            # leave the loop body without live outputs and XLA deletes it
            leaves = [
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(jnp.asarray(l).dtype, jnp.number)
                or jnp.asarray(l).dtype == jnp.bool_
            ]
            if not leaves:
                raise ValueError("fn produced no numeric outputs to anchor timing")
            return acc + sum(leaves)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    def measure(lo, hi):
        times = {}
        for n in (lo, hi):
            float(loop(x, n))  # warm (compiled once overall)
            t0 = time.perf_counter()
            float(loop(x, n))
            times[n] = time.perf_counter() - t0
        return (times[hi] - times[lo]) / (hi - lo), times[hi] - times[lo]

    # Adaptive: the differenced window must dwarf the ~ms dispatch jitter of
    # the tunnel, or per-call estimates go negative for microsecond kernels.
    lo, hi = iters_low, iters_high
    for _ in range(5):
        per_iter, window = measure(lo, hi)
        if window > 0.05:  # 50 ms of differenced device time
            return per_iter
        lo, hi = lo * 8, hi * 8
    return per_iter
