#!/usr/bin/env python
"""Measure the chip's sustained f32 VPU element-op throughput.

The dense-solve roofline (PERF.md "Speed of light") needs a denominator:
the best f32 elementwise rate this chip actually sustains from VMEM.
This probe runs R rounds of fused multiply-add over NB independent
(64, 8, 128) accumulators — the exact operand shape of the solver's
trailing-update ops — inside one Pallas kernel, serialized by data
dependence round-to-round within each accumulator but independent ACROSS
accumulators (ILP), and reports element-FMAs/s from the marginal time of
two R values.

Each "element-FMA" here is one `x*a+b` over one f32 element: the number
the solver's element-op counts divide by.  A second variant measures the
6-op complex-MAC structure the solver actually uses (2 muls + 1 sub per
plane, no fused FMA) to show how much of the FMA ceiling that op mix
keeps.

Usage: python scripts/probe_vpu_peak.py [R] [NB]
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

SHAPE = tuple(int(x) for x in __import__("os").environ.get("PROBE_SHAPE", "8,8,128").split(","))  # default: 8 vregs per accumulator
ELEMS = int(np.prod(SHAPE))


def _kernel(x_ref, out_ref, *, rounds, nb, mix):
    accs = tuple(x_ref[:] * (1.0 + 0.001 * q) for q in range(nb))

    if mix == "fma":
        def body(r, accs):
            a = 1.0 + 1e-7 * r.astype(jnp.float32)
            return tuple(acc * a + 0.5 for acc in accs)
    else:  # "cmac": the solver's complex-MAC op mix (no single-op FMA)
        def body(r, accs):
            a = 1.0 + 1e-7 * r.astype(jnp.float32)
            out = list(accs)
            # t -= (l*ur - li*ui) structure: 2 muls + 1 sub per plane,
            # exercised as 2 independent planes like the kernel's re/im
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


@functools.partial(jax.jit, static_argnames=("rounds", "nb", "mix"))
def _call(x, rounds, nb, mix):
    return pl.pallas_call(
        functools.partial(_kernel, rounds=rounds, nb=nb, mix=mix),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def measure(rounds, nb, mix):
    x = jnp.ones(SHAPE, jnp.float32) * 0.1

    def run(r):
        out = _call(x, r, nb, mix)
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
    per_round = 1 if mix == "fma" else 3
    elem_ops = rounds * nb * ELEMS * per_round
    return {"mix": mix, "rounds": rounds, "nb": nb,
            "elem_ops_per_s": round(elem_ops / dt, 1),
            "teraops": round(elem_ops / dt / 1e12, 3),
            "marginal_s": round(dt, 5)}


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = {"device": str(jax.devices()[0]), "shape": SHAPE}
    for mix in ("fma", "cmac"):
        out[mix] = measure(rounds, nb, mix)
        print(json.dumps(out[mix]))
    path = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    path.mkdir(exist_ok=True)
    (path / "vpu_peak.json").write_text(json.dumps(out, indent=1))
    print(json.dumps({"wrote": str(path / "vpu_peak.json")}))


if __name__ == "__main__":
    main()
