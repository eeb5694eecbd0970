"""Sweep the production sampler's internal config at stage-2 scale.

Hard-synced per call, tunnel RTT subtracted (see verify skill gotchas).
Answers: where do the fused call's 34 ms go — gather levels, dense
interp-matmul levels, compaction, or epilogue?
"""

import time

import jax
import jax.numpy as jnp

from hipad_tpu.ops.sampling import deformable_samples_topk_flat

BS, CAMS, C, L, G = 1, 6, 256, 4, 8
M0 = 84913
N = 8


def measure_rtt():
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


def main():
    k = jax.random.PRNGKey(1)
    shapes = [(BS, CAMS, 88, 160, C), (BS, CAMS, 44, 80, C),
              (BS, CAMS, 22, 40, C), (BS, CAMS, 11, 20, C)]
    fmaps = [jax.random.normal(jax.random.fold_in(k, i), s, jnp.bfloat16)
             for i, s in enumerate(shapes)]
    pts = jax.random.uniform(jax.random.fold_in(k, 9), (BS, M0, CAMS, 2),
                             jnp.float32)
    wts = jax.nn.softmax(jax.random.normal(
        jax.random.fold_in(k, 10), (BS, M0, CAMS, L, G), jnp.bfloat16))

    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.2f} ms")

    def run_case(name, **kw):
        @jax.jit
        def f(pts, c):
            out = deformable_samples_topk_flat(
                fmaps, pts + c.astype(pts.dtype) * 1e-7, wts, **kw)
            v = out.astype(jnp.float32).sum()
            return v.astype(jnp.int32) % 1024, v

        try:
            c = jnp.int32(1)
            c, v = f(pts, c); float(v)
            ts = []
            for i in range(N):
                t0 = time.perf_counter()
                c, v = f(pts, c + i)
                float(v)
                ts.append(time.perf_counter() - t0)
            p50 = sorted(ts)[len(ts) // 2] - rtt
            print(f"{name:44s} {p50*1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:44s} FAILED {(str(e).splitlines() or [''])[0][:80]}")

    run_case("default (mm23, k3)", cam_k=3, matmul_levels=(2, 3))
    run_case("gather all levels (k3)", cam_k=3, matmul_levels=())
    run_case("gather all levels row_packed (k3)", cam_k=3, matmul_levels=(),
             row_packed=True)
    run_case("mm23 row_packed (k3)", cam_k=3, matmul_levels=(2, 3),
             row_packed=True)
    run_case("mm123 (k3)", cam_k=3, matmul_levels=(1, 2, 3))
    run_case("gather all levels (k2)", cam_k=2, matmul_levels=())
    run_case("mm23 (k2)", cam_k=2, matmul_levels=(2, 3))
    run_case("mm3 only (k3)", cam_k=3, matmul_levels=(3,))


if __name__ == "__main__":
    main()
