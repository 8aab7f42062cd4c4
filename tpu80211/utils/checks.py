"""Numeric guards — the framework's answer to the reference's absent
error/race story (SURVEY.md §5).

The reference ships known-racy code (determinant_impl_omp parallelizes
dependent rows, utils.c:646-656) and non-fatal dimension-mismatch printfs
(utils.c:18-19).  JAX purity makes data races unrepresentable; what remains
is numeric validity, guarded here:

  * `checked(fn)` — wraps a pipeline function with jax.experimental.checkify
    so NaN/Inf and out-of-bounds indexing surface as errors instead of
    silently corrupt estimates;
  * `assert_finite(tree)` — host-side debug gate for tests and the
    streaming driver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify

from tpu80211.cplx import Cplx


def checked(fn, errors=checkify.float_checks):
    """checkify-wrap `fn`; returns a callable raising on NaN/Inf.

    Usage: `out = checked(sc.rx_chain)(args...)` — the checkify error is
    thrown host-side after the step completes.
    """
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kw):
        err, out = cfn(*args, **kw)
        err.throw()
        return out

    return wrapper


def assert_finite(tree, name: str = "output") -> None:
    """Host-side: raise if any leaf (incl. Cplx planes) is non-finite."""
    leaves = jax.tree.leaves(
        jax.tree.map(
            lambda x: x, tree,
            is_leaf=lambda x: isinstance(x, Cplx),
        )
    )
    for leaf in leaves:
        arrs = (leaf.re, leaf.im) if isinstance(leaf, Cplx) else (leaf,)
        for a in arrs:
            a = np.asarray(a)
            if not np.isfinite(a).all():
                bad = int((~np.isfinite(a)).sum())
                raise FloatingPointError(
                    f"{name}: {bad}/{a.size} non-finite values "
                    f"(shape {a.shape}, dtype {a.dtype})"
                )
