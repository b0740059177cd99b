"""Image-diffusion (SD/SDXL) LoRA training — text_to_image trainer analog.

Re-design of the reference LightningModelForT2ILoRA
(/root/reference/diffsynth/trainers/text_to_image.py:10-115): random
timestep from the DDIM training schedule, `add_noise`, epsilon (or
v-prediction) MSE scaled by `training_weight`, LoRA-only gradients. The
Lightning/accelerate machinery is replaced by one jitted optax step; the
LoRA A/B factors are the only trainable pytree (the frozen UNet params are
closed over as constants), so optimizer state is tiny and the base weights
never appear in the gradient graph.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..schedulers import EnhancedDDIMScheduler
from .lora_train import apply_lora, init_lora


def make_sd_lora_train_step(unet_forward: Callable, unet_params,
                            optimizer: optax.GradientTransformation,
                            scheduler: Optional[EnhancedDDIMScheduler] = None,
                            lora_scale: float = 1.0):
    """-> jitted (lora, opt_state, latents, ctx, rng) -> (loss, lora,
    opt_state).

    unet_forward: callable(params, sample, timestep, ctx) — sd or sdxl
    forward partially applied with its extra conditioning. Matches the
    reference training_step math (text_to_image.py:67-95).
    """
    if scheduler is None:
        scheduler = EnhancedDDIMScheduler()
    alphas = jnp.asarray(scheduler.alphas_cumprod, jnp.float32)
    n_train = scheduler.num_train_timesteps
    pred_type = scheduler.prediction_type

    def loss_fn(lora, latents, ctx, rng):
        rng_t, rng_n = jax.random.split(rng)
        tid = jax.random.randint(rng_t, (), 0, n_train)
        a = alphas[tid]
        noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
        lat_f = latents.astype(jnp.float32)
        noisy = jnp.sqrt(a) * lat_f + jnp.sqrt(1 - a) * noise
        if pred_type == "v_prediction":
            target = jnp.sqrt(a) * noise - jnp.sqrt(1 - a) * lat_f
        else:
            target = noise
        params = apply_lora(unet_params, lora, scale=lora_scale)
        pred = unet_forward(params, noisy.astype(latents.dtype),
                            tid[None].astype(jnp.float32), ctx)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))

    @jax.jit
    def step(lora, opt_state, latents, ctx, rng):
        loss, grads = jax.value_and_grad(loss_fn)(lora, latents, ctx, rng)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return loss, lora, opt_state

    return step


def init_sd_lora(key, unet_params, rank: int = 4,
                 targets=("*to_q", "*to_k", "*to_v", "*to_out*")):
    """LoRA factors over the UNet's attention projections
    (add_lora_to_model defaults `to_q,to_k,to_v,to_out`,
    text_to_image.py:37-64)."""
    return init_lora(key, unet_params, rank=rank, targets=targets)
