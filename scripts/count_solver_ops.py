#!/usr/bin/env python
"""Count the dense-solve kernel's VPU element-ops exactly, from its jaxpr.

Walks the traced computation of one grid step of the production chol/gauss
kernels (`_rank1_system` + `_chol_solve`/`_gauss_solve` at the full
(64, 64, 128) static shapes) and sums the output element count of every
elementwise primitive — the number of 8×128-lane VPU issue slots the
step fundamentally requires (broadcasts of (1,1,L) scalars are counted at
their true size; masks/selects count like arithmetic because the VPU
issues them from the same single port).

Together with scripts/probe_vpu_peak.py (the measured ~1.6e12 f32
element-ops/s single-port ceiling) this gives the roofline in PERF.md
"Speed of light": elements / ceiling = the floor time of any VPU
implementation of this op sequence.

Runs on CPU (tracing only — nothing is executed).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tpu80211.kernels import mmse_solve as ms

# primitives the VPU issues one vector op per 8×128 tile for
ELEMENTWISE = {
    "add", "sub", "mul", "div", "neg", "max", "min",
    "rsqrt", "sqrt", "select_n", "and", "or", "not", "xor",
    "gt", "lt", "ge", "le", "eq", "ne", "sign", "abs",
}
# shape/layout ops: free or near-free (static slices resolve to views /
# lane moves; Mosaic still spends issue slots on some — counted
# separately as an upper bracket)
LAYOUT = {"slice", "concatenate", "broadcast_in_dim", "transpose",
          "squeeze", "reshape", "rev", "iota", "convert_element_type"}
# reductions cost ~input-size element ops (tree combine on the VPU)
REDUCE = {"reduce_sum", "reduce_max", "reduce_min"}


def count(jaxpr, counts):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("pjit", "custom_jvp_call", "custom_vjp_call",
                    "closed_call"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                count(inner.jaxpr if hasattr(inner, "jaxpr") else inner,
                      counts)
            continue
        if name in REDUCE:
            counts["elementwise"] += sum(
                int(np.prod(v.aval.shape)) for v in eqn.invars
                if hasattr(v.aval, "shape"))
            continue
        n = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
                if hasattr(v.aval, "shape"))
        if name in ELEMENTWISE:
            counts["elementwise"] += n
        elif name in LAYOUT:
            counts["layout"] += n
        else:
            counts.setdefault("other:" + name, 0)
            counts["other:" + name] += n
    return counts


def main():
    lanes = ms.LANES
    n = ms.N
    u = jnp.zeros((n, lanes), jnp.float32)
    b = jnp.zeros((n, lanes), jnp.float32)
    ow2 = jnp.zeros((lanes,), jnp.float32)

    out = {"lanes": lanes, "n": n, "k": ms.K}
    for method in ("chol", "gauss"):
        def step(ur, ui, rr, ri, w):
            ar, ai = ms._rank1_system(ur, ui, w)
            return ms._solve(method)(ar, ai, rr, ri)

        jaxpr = jax.make_jaxpr(step)(u, u, b, b, ow2)
        counts = count(jaxpr.jaxpr, {"elementwise": 0, "layout": 0})
        # per-tile → per-matrix and per-8192-step views
        per_tile = counts["elementwise"]
        out[method] = {
            **counts,
            "elementwise_per_matrix": per_tile / lanes,
            "elementwise_per_8192_step": per_tile * (8192 // lanes),
        }
        print(json.dumps({method: out[method]}))

    path = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    path.mkdir(exist_ok=True)
    (path / "solver_op_counts.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"wrote": str(path / "solver_op_counts.json")}))


if __name__ == "__main__":
    main()
