"""Training: flow-match loss + optax train step with FSDP-sharded state.

Mirrors the reference training stack (trainers/utils.py:521-566 and
pipelines/wan_video_new.py:108-121): random timestep in [min, max] boundary,
add_noise, model forward, Gaussian-bell-weighted MSE on (noise - x0). The
accelerate/DeepSpeed machinery is replaced by one jitted step over the mesh:
grads reduce-scatter along fsdp, optimizer state lives sharded like params
(ZeRO), dp handles batch parallelism — all emitted by GSPMD.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.wan_dit import WanDiTConfig, wan_dit_forward
from ..schedulers.flow_match import FlowMatchScheduler


def flow_match_loss(params, cfg: WanDiTConfig, latents, context, rng,
                    sigmas, timesteps, weights,
                    min_tid: int = 0, max_tid: Optional[int] = None,
                    vace_params=None, vace_cfg=None, vace_context=None,
                    remat: bool = True):
    """One training loss evaluation (pipelines/wan_video_new.py:108-121).

    latents: (B, C, F, H, W) clean latents; sigmas/timesteps/weights: the
    1000-entry training tables from FlowMatchScheduler(training=True).
    """
    max_tid = max_tid if max_tid is not None else sigmas.shape[0]
    rng_t, rng_n = jax.random.split(rng)
    tid = jax.random.randint(rng_t, (), min_tid, max_tid)
    sigma = sigmas[tid].astype(jnp.float32)
    noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
    lat_f = latents.astype(jnp.float32)
    noisy = ((1 - sigma) * lat_f + sigma * noise).astype(latents.dtype)
    timestep = timesteps[tid][None].astype(jnp.float32)
    pred = wan_dit_forward(params, cfg, noisy, timestep, context,
                           vace_params=vace_params, vace_cfg=vace_cfg,
                           vace_context=vace_context, remat=remat)
    target = noise - lat_f
    loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target))
    return loss * weights[tid].astype(jnp.float32)


def make_train_step(cfg: WanDiTConfig, optimizer: optax.GradientTransformation,
                    scheduler: Optional[FlowMatchScheduler] = None,
                    trainable_mask=None, remat: bool = True) -> Callable:
    """Build a jittable (params, opt_state, batch, rng) -> (loss, params,
    opt_state) step. `trainable_mask` (pytree of bools) freezes leaves the
    way freeze_except/LoRA-only training does."""
    if scheduler is None:
        scheduler = FlowMatchScheduler(shift=3.0, extra_one_step=False)
        scheduler.set_timesteps(1000, training=True)
    sigmas = jnp.asarray(scheduler.sigmas)
    timesteps = jnp.asarray(scheduler.timesteps)
    weights = jnp.asarray(scheduler.linear_timesteps_weights)

    def step(params, opt_state, latents, context, rng):
        def loss_fn(p):
            return flow_match_loss(p, cfg, latents, context, rng,
                                   sigmas, timesteps, weights, remat=remat)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if trainable_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss, params, opt_state

    return step
