"""Open-loop evaluation CLI.

TPU counterpart of `tools/test.py` + `apis/test.py`: stream the validation
split *in sequence order* (the temporal instance banks are stateful across
frames, `apis/test.py:49-98`), decode per-frame results, then compute
planning L2/collision, detection mAP/NDS, map chamfer-AP and motion EPA
(`bench2drive_dataset.py:1596-1657`).

Single-host: frames stream through one jitted step (``--batch-slots B``
streams B sequences per dispatch — the GroupInBatchSampler slot trick —
cutting the per-frame host sync ~B-fold). Multi-host (``--multihost``): each
process evaluates a contiguous sequence-aligned shard and rank 0 gathers
rank-ordered pickles from ``--gather-dir`` (the reference's
`apis/test.py:122-167` semantics).

    python tools/test.py --ann-file data/infos/b2d_infos_val.pkl \
        --map-file data/infos/b2d_map_infos.pkl --ckpt work_dirs/hipad_tpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--map-file", default=None)
    p.add_argument("--data-root", default="data/bench2drive")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--stage", type=int, default=2)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--out", default=None, help="json results path")
    p.add_argument("--eval-planning", action="store_true", default=True)
    p.add_argument("--eval-det", action="store_true")
    p.add_argument("--eval-map", action="store_true")
    p.add_argument("--eval-motion", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax platform (the JAX_PLATFORMS env var "
                        "does not override an installed TPU plugin)")
    p.add_argument("--batch-slots", type=int, default=1,
                   help="stream N independent sequences per dispatch")
    p.add_argument("--num-workers", type=int, default=0,
                   help="data-loading threads for the batched runner")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize(); shard sequences per "
                        "process and gather on rank 0")
    p.add_argument("--gather-dir", default="work_dirs/eval_gather",
                   help="rank-ordered pickle gather dir (multihost)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        jax.distributed.initialize()
    import jax.numpy as jnp
    import numpy as np

    from hipad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hipad_tpu.configs import model as cfgs
    from hipad_tpu.data.bench2drive import Bench2DriveDataset
    from hipad_tpu.eval import planning as plan_eval
    from hipad_tpu.models.detector import HiPAD
    from hipad_tpu.train import checkpoint, optim
    from hipad_tpu.train.train_step import META_KEYS, create_train_state

    cfg = cfgs.stage2() if args.stage == 2 else cfgs.stage1()
    tx = optim.make_optimizer(total_steps=1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx, batch_size=1)
    if args.ckpt:
        state = checkpoint.load_params_only(args.ckpt, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    dataset = Bench2DriveDataset(
        ann_file=args.ann_file, map_file=args.map_file,
        data_root=args.data_root, test_mode=True,
        plan_anchor_types=cfg.plan_anchor_types,
    )
    from hipad_tpu.eval.runner import run_openloop_eval

    import time

    t0 = time.perf_counter()
    summary = run_openloop_eval(
        cfg, variables, dataset, max_frames=args.max_frames,
        dtype=jnp.bfloat16, eval_planning=args.eval_planning,
        eval_det=args.eval_det, eval_map=args.eval_map,
        eval_motion=args.eval_motion,
        batch_slots=args.batch_slots, num_workers=args.num_workers,
        rank=jax.process_index(), world=jax.process_count(),
        gather_dir=args.gather_dir,
    )
    wall = time.perf_counter() - t0
    if summary is None:  # non-zero rank: records shipped to rank 0
        return

    from hipad_tpu.eval.report import format_summary

    tables = format_summary(summary)
    if tables:
        print(tables)
        print()
    n_frames = args.max_frames or len(dataset)
    # wall includes the one-time jit compile; fps_wall is the honest
    # end-to-end number for THIS invocation, not a steady-state rate
    perf = {"frames": int(n_frames), "wall_s": round(wall, 1),
            "fps_wall": round(n_frames / wall, 3)}
    print(json.dumps({**summary, "perf": perf}, indent=2, default=float))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "perf": perf}, f, default=float)


if __name__ == "__main__":
    main()
