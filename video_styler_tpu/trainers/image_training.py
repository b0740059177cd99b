"""Generic image-family LoRA training: flow-match target over any DiT
forward.

The reference trains its image DiT families (FLUX, SD3, Qwen-Image) with the
same flow-match objective as Wan (train/flux/train_flux_lora.py et al. all
route through trainers/utils.py:521-566); only the forward signature differs
per family. Here that shared objective is one factory over an opaque
`forward_fn(params, noisy_latents, timestep, context) -> velocity`:
LoRA factors (lora_train.init_lora) are the only trainable leaves, the base
params stay frozen, and the whole step jits once per family.

SD/SDXL (epsilon/v-prediction UNets) train through
trainers/sd_training.make_sd_lora_train_step instead.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..schedulers.flow_match import FlowMatchScheduler
from .lora_train import apply_lora


def make_image_lora_train_step(forward_fn: Callable, base_params,
                               optimizer: optax.GradientTransformation,
                               scheduler: FlowMatchScheduler | None = None):
    """(lora, opt_state, latents, context, rng) -> (loss, lora, opt_state).

    latents: (B, C, H, W) clean latents; context: whatever pytree
    `forward_fn` expects as its conditioning argument.
    """
    if scheduler is None:
        scheduler = FlowMatchScheduler(shift=3.0, extra_one_step=False)
        scheduler.set_timesteps(1000, training=True)
    sigmas = jnp.asarray(scheduler.sigmas)
    timesteps = jnp.asarray(scheduler.timesteps)
    weights = jnp.asarray(scheduler.linear_timesteps_weights)

    def loss_fn(lora, latents, context, rng):
        params = apply_lora(base_params, lora)
        rng_t, rng_n = jax.random.split(rng)
        tid = jax.random.randint(rng_t, (), 0, sigmas.shape[0])
        sigma = sigmas[tid].astype(jnp.float32)
        noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
        lat_f = latents.astype(jnp.float32)
        noisy = ((1 - sigma) * lat_f + sigma * noise).astype(latents.dtype)
        timestep = timesteps[tid][None].astype(jnp.float32)
        pred = forward_fn(params, noisy, timestep, context)
        target = noise - lat_f
        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target))
        return loss * weights[tid].astype(jnp.float32)

    @jax.jit
    def step(lora, opt_state, latents, context, rng):
        loss, grads = jax.value_and_grad(loss_fn)(lora, latents, context, rng)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return loss, lora, opt_state

    return step
