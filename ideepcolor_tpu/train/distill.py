"""Teacher->student distillation for reduced-FLOP serving variants.

The serving path is compute-bound at 75-80% MXU utilization
(docs/BENCHMARKS.md "Speed of light"), so further throughput must come
from fewer FLOPs. This module trains a width-multiplied SIGGRAPH student
(models/siggraph.scaled_channels; FLOPs scale ~width^2) to match the
full-width teacher's regression output and 529-bin distribution under the
same simulated-hint inputs the reference training recipe uses. The
reference has no training at all (SURVEY.md section 4; training lives in
the external colorization-pytorch repo), so this is a new capability of
the framework, not a port.

One jitted step; batch axis DP-shardable exactly like train/step.py.
Teacher params are frozen inputs (serve them bf16 to halve teacher HBM
traffic — the student gradients stay f32).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..models import siggraph
from . import hints_sim


@dataclass
class DistillConfig:
    width: float = 0.5          # student channel multiplier
    lr: float = 1e-3
    reg_weight: float = 10.0    # smooth-L1 on ab vs the teacher's ab
    kl_weight: float = 1.0      # KL(teacher dist || student dist) at H/4
    gt_weight: float = 0.0      # optional smooth-L1 vs ground-truth ab
    temperature: float = 1.0    # softens both distributions
    maskcent: float = 0.0
    hint_p_keep: float = 1.0 / 8.0
    remat: bool = False         # students are small; off by default
    # LR schedule — same semantics as train.step.TrainConfig
    schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 0


def _as_train_cfg(cfg: DistillConfig):
    from . import step as tstep
    return tstep.TrainConfig(lr=cfg.lr, schedule=cfg.schedule,
                             warmup_steps=cfg.warmup_steps,
                             total_steps=cfg.total_steps)


def make_optimizer(cfg: DistillConfig):
    from . import step as tstep
    return tstep.make_optimizer(_as_train_cfg(cfg))


def init_student(key: jax.Array, cfg: DistillConfig, params=None):
    """Fresh student state; ``params`` seeds from an existing checkpoint
    (must be at cfg.width's channel tiers — the first-conv input axis is
    4 at EVERY width, so the tier is checked explicitly here)."""
    if params is None:
        params = siggraph.init_params(key, width=cfg.width)
    else:
        want = siggraph.scaled_channels(cfg.width)[0]
        got = int(params["model1.0.weight"].shape[3])
        if got != want:
            raise ValueError(
                f"--init-from params are width-tier c1={got}, but "
                f"--width {cfg.width} needs c1={want}; a mismatched "
                "init would silently train the wrong-size student")
    opt_state = make_optimizer(cfg).init(params)
    return {"params": params, "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32)}


def distill_loss(student_params, teacher_params, batch, key,
                 cfg: DistillConfig):
    """batch: dict with 'l' (N,H,W,1) raw L in [0,100] and 'ab' (N,H,W,2).

    Teacher and student see identical inputs (same simulated hints); the
    student matches the teacher's singly-scaled regression ab and its
    class-head distribution (KL at the logits' H/4 resolution).
    """
    hint_ab, hint_mask = hints_sim.sample_hints(key, batch["ab"],
                                                p_keep=cfg.hint_p_keep)
    A = batch["l"] - 50.0
    t_reg, t_logits = siggraph.apply_train(teacher_params, A, hint_ab,
                                           hint_mask, cfg.maskcent)
    t_reg = jax.lax.stop_gradient(t_reg.astype(jnp.float32))
    t_logits = jax.lax.stop_gradient(t_logits.astype(jnp.float32))

    fwd = siggraph.apply_train
    if cfg.remat:
        fwd = jax.checkpoint(fwd)
    s_reg, s_logits = fwd(student_params, A, hint_ab, hint_mask,
                          cfg.maskcent)

    from . import losses
    l_reg = losses.smooth_l1(s_reg / 110.0, t_reg / 110.0)
    t_prob = jax.nn.softmax(t_logits / cfg.temperature, axis=-1)
    s_logp = jax.nn.log_softmax(s_logits / cfg.temperature, axis=-1)
    l_kl = jnp.mean(jnp.sum(
        t_prob * (jnp.log(jnp.clip(t_prob, 1e-20)) - s_logp), axis=-1))
    total = cfg.reg_weight * l_reg + cfg.kl_weight * l_kl
    aux = {"loss": total, "reg": l_reg, "kl": l_kl}
    if cfg.gt_weight:
        l_gt = losses.smooth_l1(s_reg / 110.0, batch["ab"] / 110.0)
        total = total + cfg.gt_weight * l_gt
        aux = {**aux, "loss": total, "gt": l_gt}
    return total, aux


def make_distill_step(cfg: DistillConfig, jit: bool = True):
    """One fused distillation step (value_and_grad + adam on the student;
    the teacher is a frozen input)."""
    opt = make_optimizer(cfg)

    def step(state, teacher_params, batch, key):
        (_, aux), grads = jax.value_and_grad(distill_loss, has_aux=True)(
            state["params"], teacher_params, batch, key, cfg)
        updates, opt_state = opt.update(grads, state["opt_state"],
                                        state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "opt_state": opt_state,
                 "step": state["step"] + 1}, aux)

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def load_student_state(path: str, cfg: DistillConfig):
    """Restore a student state saved by train.step.save_train_state (the
    optimizer tree matches the same schedule config)."""
    from . import step as tstep
    return tstep.load_train_state(path, _as_train_cfg(cfg))


def make_sharded_distill_step(cfg: DistillConfig, mesh):
    """DP over the mesh 'data' axis: teacher params replicated, batch
    sharded; XLA inserts the student-gradient all-reduce. Returns
    (jitted_step, shard_state, shard_batch, put_teacher)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import mesh as pmesh

    step = make_distill_step(cfg, jit=False)
    repl = NamedSharding(mesh, P())
    batch_s = pmesh.batch_sharding(mesh)

    def shard_state(state):
        return jax.device_put(state, repl)

    def shard_batch(batch):
        return {k: jax.device_put(v, batch_s) for k, v in batch.items()}

    def put_teacher(teacher_params):
        return {k: jax.device_put(v, repl) for k, v in teacher_params.items()}

    jitted = jax.jit(step, donate_argnums=(0,))
    return jitted, shard_state, shard_batch, put_teacher
