"""Minimal bs=2 sampler-only repro on the real TPU: bisect the device fault."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hipad_tpu.ops import sampling as S

H, W = 352, 640
CAMS, C, G = 6, 256, 8
LEVELS = [(H // s, W // s) for s in (4, 8, 16, 32)]

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
bs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
n, P = 900, 13

rs = np.random.RandomState(0)
fms = [jnp.asarray(rs.randn(bs, CAMS, h, w, C).astype(np.float32)).astype(jnp.bfloat16)
       for (h, w) in LEVELS]
pts = jnp.asarray(rs.rand(bs, n, P, CAMS, 2).astype(np.float32))
wts = jax.nn.softmax(jnp.asarray(
    rs.randn(bs, n, P, CAMS, len(LEVELS), G).astype(np.float32)), axis=2)

kw = dict(cam_k=2, matmul_levels=(2, 3), cam_renorm=True,
          point_k=int(np.ceil(0.25 * P)))
if mode == "nomm":
    kw["matmul_levels"] = ()
elif mode == "nopk":
    kw["point_k"] = None
elif mode == "allcam":
    kw["cam_k"] = CAMS
    kw["cam_renorm"] = False


@jax.jit
def f(fms, pts, wts, c):
    out = S.deformable_aggregation_topk(fms, pts + c.astype(pts.dtype) * 1e-7,
                                        wts, **kw)
    v = out.astype(jnp.float32).sum()
    return v.astype(jnp.int32) % 1024, v


c = jnp.int32(1)
t0 = time.time()
c, v = f(fms, pts, wts, c)
print(f"mode={mode} bs={bs} first step ok v={float(v):.3f} "
      f"({time.time()-t0:.1f}s)")
for i in range(3):
    c, v = f(fms, pts, wts, c + i)
    print(" step", i, float(v))
print("OK")
