"""Training CLI.

TPU counterpart of `tools/train.py` + `apis/mmdet_train.py` +
`tools/dist_train.sh`: no torch.distributed.launch — one process per host,
`jax.distributed.initialize` for multi-host pods, a 1-D data mesh, and the
jitted train step from `hipad_tpu.train.train_step`.

    python tools/train.py --stage 2 --ann-file data/infos/b2d_infos_train.pkl \
        --map-file data/infos/b2d_map_infos.pkl --batch-size 48 --synthetic 0

With --synthetic N the loader is replaced by seeded synthetic batches — the
smoke-train mode used on machines without the Bench2Drive dataset.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=2, choices=[1, 2])
    p.add_argument("--ann-file", default=None)
    p.add_argument("--map-file", default=None)
    p.add_argument("--data-root", default="data/bench2drive")
    p.add_argument("--batch-size", type=int, default=6, help="global batch")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="gradient accumulation: micro-batches per optimizer "
                        "update (the 16 GB-HBM bs=1-per-chip counterpart of "
                        "the reference's bs=6/GPU; global batch = "
                        "batch-size * accum-steps)")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--work-dir", default="work_dirs/hipad_tpu")
    p.add_argument("--ckpt-interval", type=int, default=4891)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--load-from", default=None, help="warm-start ckpt dir")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train N synthetic iters (no dataset needed)")
    p.add_argument("--synthetic-pool", type=int, default=0,
                   help="with --synthetic: cycle a pool of K distinct "
                        "batches whose GT uploads once and whose noise "
                        "images are generated ON DEVICE, instead of "
                        "streaming ~17 MB of fresh batch per step. The axon "
                        "tunnel wedges under sustained streaming uploads "
                        "(round-5 incident: three runs stalled mid-stream; "
                        "the round-3 500-step streaming run predates the "
                        "instability).")
    p.add_argument("--eval-interval", type=int, default=0,
                   help="run open-loop eval every N iters (needs --val-ann-file)")
    p.add_argument("--val-ann-file", default=None)
    p.add_argument("--eval-frames", type=int, default=500)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true", help="tiny config (CI)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize() for TPU pods")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax platform (the JAX_PLATFORMS env var "
                        "does not override an installed TPU plugin; this "
                        "uses the config API before backend init)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.multihost:
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from hipad_tpu.configs import model as cfgs
    from hipad_tpu.data import synthetic
    from hipad_tpu.parallel import mesh as mesh_lib
    from hipad_tpu.train import checkpoint, optim
    from hipad_tpu.train.train_step import create_train_state, jit_train_step

    if args.tiny:
        cfg = cfgs.tiny()
    elif args.stage == 1:
        cfg = cfgs.stage1()
    else:
        cfg = cfgs.stage2()

    total_steps = args.max_iters or (234769 // 48 * 18 if args.stage == 2
                                     else 234769 // 64 * 12)
    if args.synthetic:
        total_steps = args.synthetic

    mesh = mesh_lib.make_mesh()
    tx = optim.make_optimizer(base_lr=args.lr, total_steps=total_steps)
    model, state = create_train_state(cfg, jax.random.PRNGKey(args.seed), tx,
                                      batch_size=1)
    state = mesh_lib.replicate(mesh, state)

    if args.load_from:
        state = checkpoint.load_params_only(args.load_from, state)
    if args.resume and os.path.isdir(args.work_dir):
        try:
            state = checkpoint.restore_checkpoint(args.work_dir, state)
            print(f"resumed from step {int(state.step)}")
        except Exception as e:  # first run
            print(f"no checkpoint to resume ({e})")

    # --batch-size is GLOBAL; each process loads its own local shard
    # (multihost: the reference's per-rank GroupInBatchSampler split).
    n_proc = jax.process_count()
    if args.batch_size % n_proc:
        raise ValueError(f"--batch-size {args.batch_size} not divisible by "
                         f"process_count {n_proc}")
    local_bs = args.batch_size // n_proc
    pid = jax.process_index()

    if args.synthetic:
        if args.synthetic_pool:
            # GT/meta tensors are KB-scale and upload once; IMAGES (the
            # ~17 MB/batch that wedges the tunnel) are generated ON DEVICE —
            # the synthetic loader's images are standard-normal noise
            # uncorrelated with the GT (synthetic.make_images), so
            # jax.random.normal is the identical distribution.
            h, w = cfg.input_size
            img_shape = (local_bs, cfg.num_cams, h, w, 3)
            gen_img = jax.jit(
                lambda k: jax.random.normal(k, img_shape, jnp.float32))
            keys = jax.random.split(jax.random.PRNGKey(args.seed + 999),
                                    args.synthetic_pool)
            pool = []
            for i in range(args.synthetic_pool):
                b = synthetic.make_batch(
                    cfg, local_bs, seed=args.seed + i * n_proc + pid)
                jb = {k: jnp.asarray(v) for k, v in b.items()
                      if k != "images" and not isinstance(v, list)}
                jb["images"] = gen_img(keys[i])
                pool.append(jb)

            def batches():
                i = 0
                while True:
                    yield pool[i % len(pool)]
                    i += 1
        else:
            def batches():
                i = 0
                while True:
                    # distinct data per process: seed offset by (step, rank)
                    yield synthetic.make_batch(
                        cfg, local_bs, seed=args.seed + i * n_proc + pid)
                    i += 1
        loader = batches()
    else:
        from hipad_tpu.data.bench2drive import Bench2DriveDataset
        from hipad_tpu.data.sampler import TrainLoader

        dataset = Bench2DriveDataset(
            ann_file=args.ann_file, map_file=args.map_file,
            data_root=args.data_root,
            plan_anchor_types=cfg.plan_anchor_types,
        )
        loader = iter(TrainLoader(dataset, args.batch_size, seed=args.seed,
                                  num_workers=min(local_bs, 8),
                                  rank=pid, world=n_proc))

    A = args.accum_steps
    step_fn = jit_train_step(cfg, model, mesh, accum_steps=A)
    banks = None
    if A > 1:
        # accumulation widens the global batch: each micro-slice carries its
        # own bank slice (its own GroupStreamSampler slots)
        from hipad_tpu.models.instance_bank import init_bank_states

        banks = jax.tree.map(
            lambda x: jnp.stack([x] * A),
            init_bank_states(cfg, local_bs, feature_dtype=jnp.bfloat16))
    rng = jax.random.PRNGKey(args.seed + 1)
    os.makedirs(args.work_dir, exist_ok=True)
    log_path = os.path.join(args.work_dir, "train_log.jsonl")

    t0 = time.time()
    start = int(state.step)
    for it in range(start, total_steps):
        if A > 1:
            micro = [next(loader) for _ in range(A)]
            batch = {k: jnp.stack([jnp.asarray(mb[k]) for mb in micro])
                     for k in micro[0] if not isinstance(micro[0][k], list)}
        else:
            batch = {k: jnp.asarray(v) for k, v in next(loader).items()
                     if not isinstance(v, list)}
        batch = mesh_lib.shard_batch(mesh, batch, accum=A > 1)
        rng, sub = jax.random.split(rng)
        state, banks, metrics = step_fn(state, banks, batch, sub)
        if ((it + 1) % args.log_interval == 0 or it == start) and pid == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m.update(iter=it + 1, time=round(time.time() - t0, 1),
                     ips=round((it + 1 - start) / (time.time() - t0), 3))
            print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                              for k, v in m.items()}), flush=True)
            with open(log_path, "a") as f:
                f.write(json.dumps(m) + "\n")
        if (it + 1) % args.ckpt_interval == 0 or it + 1 == total_steps:
            checkpoint.save_checkpoint(args.work_dir, it + 1, state)
        if (args.eval_interval and args.val_ann_file
                and (it + 1) % args.eval_interval == 0):
            from hipad_tpu.data.bench2drive import Bench2DriveDataset
            from hipad_tpu.eval.runner import run_openloop_eval

            val = Bench2DriveDataset(
                ann_file=args.val_ann_file, map_file=args.map_file,
                data_root=args.data_root, test_mode=True,
                plan_anchor_types=cfg.plan_anchor_types,
            )
            summary = run_openloop_eval(
                cfg, {"params": state.params, "batch_stats": state.batch_stats},
                val, max_frames=args.eval_frames,
            )
            print(json.dumps({"eval_at": it + 1, **{
                f"{k}/{m}": round(float(x), 4)
                for k, d in summary.items() for m, x in d.items()
            }}), flush=True)
    print("training done")


if __name__ == "__main__":
    main()
