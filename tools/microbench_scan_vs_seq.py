"""Is lax.scan pathological for gathers on this TPU backend?

Times the SAME patch-gather + interp computation three ways:
  a) inside jax.lax.scan (bench.py-style),
  b) as 16 sequential jitted dispatches with distinct inputs (no tunnel
     dedup possible), chained via a carried scalar,
  c) sequential dispatches, fully independent (upper bound on overlap).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

BS, CAMS, C = 1, 6, 256
H0, W0 = 88, 160
M = 254739
ITERS = 16

k = jax.random.PRNGKey(0)
f0 = jax.random.normal(k, (BS, CAMS, H0, W0, C), jnp.bfloat16)
cam = jax.random.randint(jax.random.fold_in(k, 2), (BS, M), 0, CAMS, jnp.int32)
sy0 = jax.random.randint(jax.random.fold_in(k, 3), (BS, M), 0, H0 - 2, jnp.int32)
sx0 = jax.random.randint(jax.random.fold_in(k, 4), (BS, M), 0, W0 - 2, jnp.int32)
wy = jax.random.uniform(jax.random.fold_in(k, 5), (BS, M, 2), jnp.bfloat16)
wx = jax.random.uniform(jax.random.fold_in(k, 6), (BS, M, 2), jnp.bfloat16)

dn = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3), collapsed_slice_dims=(0,), start_index_map=(0, 1, 2))


def work(f, sy):
    def g(fm, ic, yy, xx):
        starts = jnp.stack([ic, yy, xx], axis=-1)
        return jax.lax.gather(fm, starts, dn, slice_sizes=(1, 2, 2, C),
                              mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patch = jax.vmap(g)(f, cam, sy, sx0)
    out = jnp.einsum("bmijC,bmi,bmj->bmC", patch.astype(jnp.bfloat16), wy, wx)
    return out.astype(jnp.float32).sum()


@jax.jit
def run_scan(f, sy):
    def body(c, _):
        v = work(f, (sy + c) % (H0 - 2))
        return v.astype(jnp.int32) % 1024, v
    c, ys = jax.lax.scan(body, jnp.int32(1), None, length=ITERS)
    return ys.sum()


@jax.jit
def one(f, sy, c):
    v = work(f, (sy + c) % (H0 - 2))
    return v.astype(jnp.int32) % 1024, v


def main():
    # a) scan
    r = run_scan(f0, sy0); r.block_until_ready()
    t0 = time.perf_counter()
    r = run_scan(f0, (sy0 + 7) % (H0 - 2)); r.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"scan body          : {dt*1e3:8.2f} ms/iter  {dt/M*1e9:7.1f} ns/sample")

    # b) sequential chained dispatches
    c = jnp.int32(1)
    _, v = one(f0, sy0, c); v.block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        c, v = one(f0, sy0, c + i)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"chained dispatches : {dt*1e3:8.2f} ms/iter  {dt/M*1e9:7.1f} ns/sample")

    # c) independent dispatches
    t0 = time.perf_counter()
    outs = [one(f0, sy0, jnp.int32(100 + i))[1] for i in range(ITERS)]
    for o in outs:
        o.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"indep dispatches   : {dt*1e3:8.2f} ms/iter  {dt/M*1e9:7.1f} ns/sample")

    # d) per-call HARD sync (host value transfer each call): artifact-proof
    c = jnp.int32(1)
    _, v = one(f0, sy0, c); float(v)
    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        c, v = one(f0, sy0, c + i)
        float(v)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    print(f"hard-synced        : {p50*1e3:8.2f} ms/iter  {p50/M*1e9:7.1f} ns/sample"
          f"  (min {times[0]*1e3:.2f} max {times[-1]*1e3:.2f})")

    # e) trivial op hard-synced: tunnel round-trip floor
    @jax.jit
    def triv(c):
        return c + 1, (c * 2).astype(jnp.float32)
    c = jnp.int32(1)
    c, v = triv(c); float(v)
    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        c, v = triv(c)
        float(v)
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"RTT floor          : {times[len(times)//2]*1e3:8.2f} ms/iter")


if __name__ == "__main__":
    main()
