"""Child process for tests/test_multihost.py: one rank of a 2-process
data-parallel train step over Gloo-backed CPU collectives.

Usage: python tests/_multihost_child.py <process_id> <num_processes> <port>

Prints one JSON line: {"pid": i, "loss": float, "grad_norm": float}.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# one device per process -> the global mesh is exactly the process set
os.environ.pop("XLA_FLAGS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=pid,
        cluster_detection_method="deactivate",
    )
    assert jax.process_count() == n_proc
    assert jax.device_count() == n_proc  # 1 CPU device per process

    import jax.numpy as jnp
    import optax

    from hipad_tpu.configs.model import tiny
    from hipad_tpu.data import synthetic
    from hipad_tpu.parallel import mesh as mesh_lib
    from hipad_tpu.train.train_step import create_train_state, jit_train_step

    cfg = tiny()
    mesh = mesh_lib.make_mesh()
    tx = optax.adamw(1e-4)
    # same seed on every process -> identical initial params (the DDP
    # invariant); replicate() turns them into one global replicated array
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=1)
    state = mesh_lib.replicate(mesh, state)

    # distinct data per process (local shard of the global batch)
    local = synthetic.make_batch(cfg, 1, seed=100 + pid)
    local = {k: v for k, v in local.items() if not isinstance(v, list)}
    batch = mesh_lib.shard_batch(mesh, batch=local)

    step_fn = jit_train_step(cfg, model, mesh)
    rng = jax.random.PRNGKey(7)
    state, banks, metrics = step_fn(state, None, batch, rng)
    out = {"pid": pid,
           "loss": float(metrics["total_loss"]),
           "grad_norm": float(metrics["grad_norm"]),
           "step": int(jax.device_get(state.step))}
    print("CHILD_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
