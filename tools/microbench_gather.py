"""Gather cost model v2 (artifact-proof): ns/index vs row width, plus the
(1,2,2,C) patch slice for comparison. Hard-synced per call, RTT subtracted.
"""

import time

import jax
import jax.numpy as jnp

M = 254739
HW = 84480  # 6 cams x 88 x 160
N = 8


def rtt_floor():
    @jax.jit
    def triv(c):
        return c + 1, (c * 2).astype(jnp.float32)
    c = jnp.int32(1)
    c, v = triv(c); float(v)
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        c, v = triv(c)
        float(v)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def timed(f, x, rtt):
    c = jnp.int32(1)
    c, v = f(x, c); float(v)
    ts = []
    for i in range(N):
        t0 = time.perf_counter()
        c, v = f(x, c + i)
        float(v)
        ts.append(time.perf_counter() - t0)
    return max(0.0, sorted(ts)[len(ts) // 2] - rtt)


def main():
    rtt = rtt_floor()
    print(f"RTT {rtt*1e3:.2f} ms")
    k = jax.random.PRNGKey(0)
    idx = jax.random.randint(jax.random.fold_in(k, 1), (M,), 0, HW, jnp.int32)

    for C in (256, 512, 1024, 2048, 4096, 8192):
        fm = jax.random.normal(k, (HW // (C // 256), C), jnp.bfloat16)
        hw = HW // (C // 256)

        @jax.jit
        def f(fm, c, hw=hw):
            rows = jnp.take(fm, (idx + c) % hw, axis=0)
            v = rows.astype(jnp.float32).sum()
            return v.astype(jnp.int32) % 1024, v

        dt = timed(f, fm, rtt)
        bw = M * C * 2 / max(dt, 1e-9) / 1e9
        print(f"row C={C:5d} ({C*2:6d} B): {dt*1e3:8.2f} ms "
              f"{dt/M*1e9:6.1f} ns/idx {bw:7.1f} GB/s")

    # patch slice (1,2,2,256) from [6, 88, 160, 256]
    feat = jax.random.normal(k, (6, 88, 160, 256), jnp.bfloat16)
    cam = jax.random.randint(jax.random.fold_in(k, 2), (M,), 0, 6, jnp.int32)
    sy = jax.random.randint(jax.random.fold_in(k, 3), (M,), 0, 86, jnp.int32)
    sx = jax.random.randint(jax.random.fold_in(k, 4), (M,), 0, 158, jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))

    @jax.jit
    def g(feat, c):
        starts = jnp.stack([cam, (sy + c) % 86, sx], axis=-1)
        p = jax.lax.gather(feat, starts, dn, slice_sizes=(1, 2, 2, 256),
                           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        v = p.astype(jnp.float32).sum()
        return v.astype(jnp.int32) % 1024, v

    dt = timed(g, feat, rtt)
    print(f"patch (1,2,2,256)  : {dt*1e3:8.2f} ms {dt/M*1e9:6.1f} ns/idx "
          f"{M*4*256*2/max(dt,1e-9)/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
