#!/usr/bin/env python
"""Measure the chip's sustained f32 VPU element-op throughput — SWEEP.

The dense-solve roofline (PERF.md "Speed of light") needs a committed,
auditable denominator: the best f32 elementwise rate this chip sustains
from VMEM, searched over accumulator count (ILP), tile shape, and op
mix (VERDICT round-4 weak#1: the quoted best must BE a row of
artifacts/vpu_peak.json).

Each configuration runs R rounds of an elementwise body over NB
independent accumulators of shape SHAPE inside one Pallas kernel —
serialized round-to-round within an accumulator (a real dependence
chain), independent ACROSS accumulators (ILP) — and reports the
marginal rate of R extra rounds in THREE unit systems:

  * issue slots/s   — hardware FMA-slot count, assuming every foldable
                      mul+add/sub pair folds into one VPU FMA issue:
                      fma body = 1 slot, cmac body = 3 slots per
                      element-round (mul, fma, sub);
  * element-ops/s   — the solver's semantic accounting (one `x*a+b` =
                      one element-op): fma = 1, cmac = 3;
  * jaxpr-ops/s     — counting every traced mul/add/sub as 1 (the unit
                      scripts/count_solver_ops.py counts the kernel
                      in): fma = 2, cmac = 4.

Op mixes:
  fma  — acc = acc*a + 0.5 (pure FMA chain, the textbook peak);
  cmac — the solver's complex-MAC structure, two coupled planes:
         p_re = p_re − (p_im*a − p_re*0.5), and symmetrically — 2 muls
         + 2 subs per element, foldable to mul+fma+sub = 3 slots.

Usage: python scripts/probe_vpu_peak.py [R]        (sweep, default 20000)
Writes artifacts/vpu_peak.json: every row + per-accounting "best".
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu80211-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (sublane-blocks, 8, 128) accumulator tiles; (8,8,128) = 8 vregs
SHAPES = ((4, 8, 128), (8, 8, 128), (16, 8, 128))
NBS = (8, 16, 32, 64)
MIXES = ("fma", "cmac")

# per-element-round op weights per mix: (issue slots, element-ops, jaxpr)
WEIGHTS = {"fma": (1, 1, 2), "cmac": (3, 3, 4)}


def _kernel(x_ref, out_ref, *, rounds, nb, mix):
    accs = tuple(x_ref[:] * (1.0 + 0.001 * q) for q in range(nb))

    if mix == "fma":
        def body(r, accs):
            a = 1.0 + 1e-7 * r.astype(jnp.float32)
            return tuple(acc * a + 0.5 for acc in accs)
    else:  # "cmac": the solver's complex-MAC op mix
        def body(r, accs):
            a = 1.0 + 1e-7 * r.astype(jnp.float32)
            out = list(accs)
            for q in range(nb // 2):
                pr, pi_ = accs[2 * q], accs[2 * q + 1]
                out[2 * q] = pr - (pi_ * a - pr * 0.5)
                out[2 * q + 1] = pi_ - (pr * a + pi_ * 0.5)
            return tuple(out)

    accs = jax.lax.fori_loop(0, rounds, body, accs)
    total = accs[0]
    for acc in accs[1:]:
        total = total + acc
    out_ref[:] = total


@functools.partial(jax.jit, static_argnames=("rounds", "nb", "mix", "shape"))
def _call(x, rounds, nb, mix, shape):
    return pl.pallas_call(
        functools.partial(_kernel, rounds=rounds, nb=nb, mix=mix),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def measure(rounds, nb, mix, shape):
    elems = int(np.prod(shape))
    # work-normalize: small configs at the nominal round count finish in
    # <1 ms, below the tunnel's dispatch-jitter floor, and report junk
    # rates (observed: a 0.78 ms marginal printing 2.5e12).  Keep
    # rounds*nb*elems ~= the 32x(8,8,128) reference workload
    rounds = max(2000, int(rounds * (32 * 8192) / (nb * elems)))
    x = jnp.ones(shape, jnp.float32) * 0.1

    def run(r):
        out = _call(x, r, nb, mix, shape)
        out.block_until_ready()
        # readback fence (block_until_ready is not a fence on axon)
        return float(jnp.sum(out))

    run(rounds)  # warm
    reps = 3
    margins = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(rounds)
        t1 = time.perf_counter()
        run(2 * rounds)
        t2 = time.perf_counter()
        margins.append(max((t2 - t1) - (t1 - t0), 1e-9))
    dt = sorted(margins)[reps // 2]
    slots_w, elem_w, jaxpr_w = WEIGHTS[mix]
    base = rounds * nb * elems
    return {
        "mix": mix, "rounds": rounds, "nb": nb, "shape": list(shape),
        "issue_slots_per_s": round(base * slots_w / dt, 1),
        "elem_ops_per_s": round(base * elem_w / dt, 1),
        "jaxpr_ops_per_s": round(base * jaxpr_w / dt, 1),
        "tera_elem_ops": round(base * elem_w / dt / 1e12, 3),
        "marginal_s": round(dt, 5),
    }


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rows = []
    for mix in MIXES:
        for shape in SHAPES:
            for nb in NBS:
                if nb * int(np.prod(shape)) * 4 > 8 * 2 ** 20:
                    continue  # keep all accumulators comfortably in VMEM
                row = measure(rounds, nb, mix, shape)
                rows.append(row)
                print(json.dumps(row))
    out = {
        "device": str(jax.devices()[0]),
        "rows": rows,
        "best": {
            key: max(rows, key=lambda r: r[key])
            for key in ("issue_slots_per_s", "elem_ops_per_s",
                        "jaxpr_ops_per_s")
        },
    }
    path = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    path.mkdir(exist_ok=True)
    (path / "vpu_peak.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"wrote": str(path / "vpu_peak.json")}))


if __name__ == "__main__":
    main()
