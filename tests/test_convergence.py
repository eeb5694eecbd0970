"""The training system LEARNS: overfit-one-batch convergence.

Round-2 verdict item 1a: every prior training artifact was a single step
asserted finite; a sign error in a loss branch, a bad lr wiring, or a
bank-carry bug could pass all of them. This test runs the REAL jitted train
step (forward, all ~15 loss branches, Hungarian targets, backward, clip,
AdamW) repeatedly on one FIXED synthetic batch — the input is constant, so
the objective is a deterministic function the optimizer must be able to
descend — and asserts the total loss falls by >50%.

Counterpart of the reference's proof-of-life, which is the published
checkpoint converging under `apis/mmdet_train.py:126-219`; one-batch
overfitting is the standard CI-sized version of that evidence.

Dynamics note (measured in round 3, recorded so nobody "fixes" it): with
Hungarian-matched heads, det_loss_box and map_loss_line RISE over the first
few hundred steps while their cls branches collapse — matching churn, the
classic DETR-style warmup — so per-branch monotonicity is asserted only for
the branches that are matching-free (ego/plan regressions, cls focals).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hipad_tpu.configs.model import tiny
from hipad_tpu.data import synthetic
from hipad_tpu.models.instance_bank import init_bank_states
from hipad_tpu.train import optim
from hipad_tpu.train.train_step import create_train_state, make_train_step

MAX_STEPS = 400
LR = 4e-4

# matching-free branches: must end below their starting value
MONOTONE_BRANCHES = (
    "ego_loss_status",
    "plan_loss_temp_reg", "plan_loss_spat_reg", "plan_loss_speed_reg",
    "plan_loss_temp_cls", "plan_loss_spat_cls", "plan_loss_speed_cls",
    "det_loss_cls", "map_loss_cls", "motion_loss_cls",
)


def test_overfit_one_batch():
    cfg = tiny()
    tx = optim.make_optimizer(schedule=optax.constant_schedule(LR))
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), tx,
                                      batch_size=1, dtype=None)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_batch(cfg, 1, seed=0).items()}
    banks = init_bank_states(cfg, 1, feature_dtype=jnp.float32)
    step = jax.jit(make_train_step(cfg, model), donate_argnums=(0, 1))
    rng = jax.random.PRNGKey(7)  # FIXED rng: deterministic objective

    first = None
    hist = []
    for it in range(MAX_STEPS):
        state, banks, metrics = step(state, banks, batch, rng)
        # check total_loss finiteness EVERY step so a NaN is reported at the
        # step it appeared (AdamW state keeps it, but diagnosis latency
        # matters); full per-branch metrics on the logging cadence.
        assert np.isfinite(float(metrics["total_loss"])), (
            f"non-finite total_loss at step {it}")
        if it % 20 == 0 or it == MAX_STEPS - 1:
            m = {k: float(v) for k, v in metrics.items()}
            for k, v in m.items():
                assert np.isfinite(v), f"non-finite {k} at step {it}"
            hist.append(m)
            if first is None:
                first = m
            if m["total_loss"] < 0.45 * first["total_loss"]:
                break  # converged early — don't burn CI time

    last = hist[-1]
    assert last["total_loss"] < 0.5 * first["total_loss"], (
        f"total loss {first['total_loss']:.2f} -> {last['total_loss']:.2f} "
        f"in {MAX_STEPS} steps: the trainer is not learning")
    # compare against the MINIMUM over the logged history, not the value at
    # the early-break instant — a branch hovering near its start right when
    # total_loss crossed the break threshold must not flip the test on
    # numeric drift across jaxlib/XLA bumps.
    for k in MONOTONE_BRANCHES:
        best = min(m[k] for m in hist)
        assert best < first[k], (
            f"{k} never decreased over {len(hist)} logged steps: "
            f"start {first[k]:.4f}, min {best:.4f}")
