"""Microbench v3: probe tpu.dynamic_gather semantics + speed.

Mosaic lowers jnp.take_along_axis(x, idx, axis=0) where idx.shape == x.shape
to tpu.dynamic_gather along sublanes: out[i, j] = x[idx[i, j], j].
Questions: (a) may idx reach ARBITRARY rows (not just within the 8-sublane
tile)? (b) cost vs operand height A.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def taa_kernel(idx_ref, fm_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(fm_ref[:], idx_ref[:], axis=0)


def run_case(A, C, dtype=jnp.bfloat16, iters=64):
    k = jax.random.PRNGKey(0)
    fm = jax.random.normal(k, (A, C), dtype)
    idx = jax.random.randint(jax.random.fold_in(k, 1), (A, C), 0, A, jnp.int32)

    f = pl.pallas_call(
        taa_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, C), dtype),
    )

    try:
        out = jax.jit(f)(idx, fm)
        ref = jnp.take_along_axis(fm, idx, axis=0)
        ok = bool(jnp.array_equal(out, ref))
    except Exception as e:
        print(f"A={A:6d} C={C:4d} FAILED: {type(e).__name__}: "
              f"{(str(e).splitlines() or [''])[0][:160]}")
        return

    @jax.jit
    def loop(fm, idx):
        def body(carry, _):
            o = f((idx + carry) % A, fm)
            return o[0, 0].astype(jnp.int32) % 1, o[0, 0]
        c, ys = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return ys.sum()

    r = loop(fm, idx); r.block_until_ready()
    t0 = time.perf_counter()
    r = loop(fm, idx); r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"A={A:6d} C={C:4d} ok={ok} {dt*1e6:9.1f} us "
          f"{dt/A*1e9:7.2f} ns/row  {A*C*2/dt/1e9:7.1f} GB/s")


def main():
    for A, C in [(512, 256), (4096, 256), (14080, 256), (14080, 128),
                 (8192, 512)]:
        run_case(A, C)


if __name__ == "__main__":
    main()
