"""Microbench: what does one bisection count-pass cost per dtype?

The selbin kernel's 32-level dual-rank bisection is the frontend's
binding VPU cost (ROOFLINE_r04: frontend at 0.348 of its VPU model).
Each level is `count = sum(keys < bound)` over the VMEM-resident
plane.  The open question for the two-stage-select redesign (round-4
verdict, next item 6) is whether 16-bit counting runs ~2x the 32-bit
rate on this VPU (two lanes per 32-bit register) -- if it does, a
split-key bisection (16 levels on the hi16 halves + 16 on the lo16
with an active mask) cuts the pass cost ~2x while staying exact
(bf16/int16 truncation preserves f32 key order).

Measures a pallas kernel running R count-passes over a resident
[T, F] plane for keys in {int32, int16, int8}, slope-timed.
Prints one JSON line with ns-per-element-per-pass for each dtype.
"""

from __future__ import annotations

import functools
import json
import os
import sys

from bench import _enable_compile_cache, _slope_time


def main() -> None:
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, f = 3072, 256
    levels = 32

    def make_kernel(dtype):
        def kern(keys_ref, out_ref, *, lv):
            def level(i, acc):
                ks = keys_ref[...]
                bound = dtype(1) * jnp.asarray(i + 7, dtype)
                c = jnp.sum((ks < bound).astype(jnp.int32))
                return acc + c

            out_ref[0, 0] = jax.lax.fori_loop(0, lv, level, jnp.int32(0))
        return kern

    results = {}
    for name, dtype in (("int32", jnp.int32), ("int16", jnp.int16),
                        ("int8", jnp.int8)):
        @jax.jit
        def make():
            return jax.random.uniform(
                jax.random.PRNGKey(0), (t, f), jnp.float32, -100, 100
            )

        keys = make()
        keys.block_until_ready()

        # keys ride in as f32 so _slope_time's per-iteration eps
        # perturbation is non-zero (an int eps would truncate to 0 and
        # XLA would CSE the repeated calls); the one cast pass is
        # amortized over the 32 counted levels
        def run(ksf, dtype=dtype):
            ks = ksf.astype(jnp.int32).astype(dtype)
            out = pl.pallas_call(
                functools.partial(make_kernel(dtype), lv=levels),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                interpret=jax.default_backend() == "cpu",
            )(ks)
            return jnp.sum(out)

        try:
            dt = _slope_time(run, keys, reps=(2, 8))
            results[name] = round(
                dt / (t * f * levels) * 1e9, 4
            )  # ns per element-pass
        except Exception as exc:
            results[name] = f"error: {repr(exc)[:200]}"
    print(json.dumps({"ns_per_element_pass": results,
                      "shape": [t, f], "levels": levels}))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
