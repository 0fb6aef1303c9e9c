"""Numerical-safety utilities (SURVEY.md §5: the reference has no sanitizers;
TPU equivalent = checkify/jax.debug for NaN/Inf and bounds checking).

* ``checked`` — wrap a jittable function with checkify NaN/div/OOB checks; the
  returned function raises on the first violation with its location.
* ``assert_all_finite`` — tree-wide finite check inside jit
  (checkify.check-based, so it composes with the wrapper).
* ``find_nonfinite`` — host-side inspector for a pytree (which leaves are bad
  and where), for post-mortem use outside jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.experimental import checkify

DEFAULT_CHECKS = checkify.float_checks | checkify.index_checks | checkify.div_checks


def checked(fn: Callable, errors=DEFAULT_CHECKS) -> Callable:
    """checkify-wrap fn; the wrapper throws at the first NaN/Inf, OOB index or
    zero-division produced anywhere inside (including scans)."""
    checked_fn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_all_finite(tree: Any, name: str = "value") -> None:
    """Inside a checkify'd function: assert every float leaf is finite."""
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            checkify.check(
                jnp.all(jnp.isfinite(arr)),
                f"non-finite values in {name}{jax.tree_util.keystr(key_path)}",
            )


def find_nonfinite(tree: Any) -> Dict[str, Dict[str, int]]:
    """Host-side: map of leaf path -> counts of nan/inf entries (only bad
    leaves included)."""
    import numpy as np

    report: Dict[str, Dict[str, int]] = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        nan = int(np.isnan(arr).sum())
        inf = int(np.isinf(arr).sum())
        if nan or inf:
            report[jax.tree_util.keystr(key_path)] = {
                "nan": nan, "inf": inf, "size": arr.size
            }
    return report
