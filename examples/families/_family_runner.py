"""Shared driver behind the generated per-family example scripts.

Each non-Wan pipeline family gets two execution modes (mirroring
examples/wanvideo/_runner.py):

  real  : delegate to the family's real-checkpoint entry point
          (examples/image_gen.py / examples/video_gen.py, printed per
          recipe) — from_pretrained/from_civitai converters + full VAE/TE.
  smoke : tiny random-init models, CPU- or single-chip-runnable; encoders
          whose math is covered by the dedicated parity tests
          (test_*_parity.py) are stubbed with fixed random embeddings so the
          recipe exercises the PIPELINE orchestration (schedulers, CFG,
          packing, windows). Swept by tests/test_examples_smoke.py.

Training (`train("<family>")`): a runnable LoRA recipe per image family —
flow-match target for the DiT families (trainers/image_training.py), the
v-prediction DDIM target for SD/SDXL (trainers/sd_training.py) — ending in
a saved LoRA safetensors. Smoke trains a tiny model for a few steps and
verifies the loss moved; real runs swap in converted checkpoints and cached
latents (see each script's docstring).
"""
from __future__ import annotations

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)

# load by path: examples/wanvideo has its own recipes.py and a consumer may
# have imported it first under the same module name
import importlib.util  # noqa: E402
_spec = importlib.util.spec_from_file_location(
    "family_recipes", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "recipes.py"))
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
FAMILIES = _mod.FAMILIES


def _rng(i):
    import jax
    return jax.random.fold_in(jax.random.PRNGKey(7), i)


def _frames(n, h=32, w=32, seed=0):
    import numpy as np
    from PIL import Image
    r = np.random.default_rng(seed)
    return [Image.fromarray(r.integers(0, 255, (h, w, 3), np.uint8))
            for _ in range(n)]


# ---------------------------------------------------------------------------
# smoke pipelines (one builder per family)
# ---------------------------------------------------------------------------

def _stub_image_codec(pipe, z=16):
    import numpy as np
    import jax.numpy as jnp
    pipe.encode_image = lambda arr: jnp.asarray(
        np.repeat(arr[:, :1], z, 1)[:, :, ::8, ::8], jnp.float32)
    pipe.decode_image = lambda lat: jnp.zeros(
        (1, 3, lat.shape[2] * 8, lat.shape[3] * 8))


def smoke_sd3():
    import jax, jax.numpy as jnp  # noqa: E401
    from video_styler_tpu.models.sd3_dit import SD3_DIT_TINY, init_sd3_dit
    from video_styler_tpu.pipelines import SD3ImagePipeline
    cfg = SD3_DIT_TINY
    pipe = SD3ImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = init_sd3_dit(jax.random.PRNGKey(0), cfg)
    _stub_image_codec(pipe)
    pooled = jax.random.normal(_rng(1), (1, cfg.pooled_dim))
    pipe.encode_prompt = lambda p, n=77: (
        jax.random.normal(_rng(abs(hash(p)) % 997), (1, 8, cfg.context_dim)),
        pooled)
    return pipe, dict(cfg_scale=3.0)


def smoke_flux():
    import numpy as np
    import jax, jax.numpy as jnp  # noqa: E401
    from video_styler_tpu.models.flux_dit import FLUX_DIT_TINY, init_flux_dit
    from video_styler_tpu.pipelines import FluxImagePipeline
    cfg = FLUX_DIT_TINY
    pipe = FluxImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = init_flux_dit(jax.random.PRNGKey(0), cfg)
    _stub_image_codec(pipe)
    pooled = jax.random.normal(_rng(2), (1, cfg.pooled_dim))
    pipe.encode_prompt = lambda p, n=512: (
        jax.random.normal(_rng(abs(hash(p)) % 997), (1, 8, cfg.context_dim)),
        pooled, np.zeros((8, 3)))
    return pipe, dict()


def smoke_qwen_image():
    import jax, jax.numpy as jnp  # noqa: E401
    from video_styler_tpu.models.qwen_image_dit import (QWEN_IMAGE_TINY,
                                                        init_qwen_image_dit)
    from video_styler_tpu.pipelines import QwenImagePipeline
    cfg = QWEN_IMAGE_TINY
    pipe = QwenImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = init_qwen_image_dit(jax.random.PRNGKey(0), cfg)
    _stub_image_codec(pipe)
    pipe.text_encoder = lambda p: (
        jax.random.normal(_rng(abs(hash(p)) % 997), (1, 8, cfg.text_dim)),
        jnp.ones((1, 8), jnp.int32))
    return pipe, dict(cfg_scale=1.0)


def smoke_hunyuan_image():
    import jax, jax.numpy as jnp  # noqa: E401
    import numpy as np
    import video_styler_tpu.models.hunyuan_image_dit as H
    from video_styler_tpu.pipelines import HunyuanImagePipeline
    cfg = H.HUNYUAN_DIT_TINY
    pipe = HunyuanImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = H.init_hunyuan_image_dit(jax.random.PRNGKey(0), cfg)

    def enc(prompt, clip_skip=1, clip_skip_2=1):
        r = np.random.default_rng(abs(hash(prompt)) % 2 ** 31)
        return {
            "text_emb": jnp.asarray(r.standard_normal(
                (1, cfg.text_length, cfg.text_dim)), jnp.float32),
            "text_emb_t5": jnp.asarray(r.standard_normal(
                (1, cfg.t5_length, cfg.t5_dim)), jnp.float32),
            "text_emb_mask": jnp.ones((1, cfg.text_length), jnp.int32),
            "text_emb_mask_t5": jnp.ones((1, cfg.t5_length), jnp.int32),
        }
    pipe.encode_prompt = enc
    return pipe, dict(cfg_scale=2.0)


def smoke_omnigen():
    import types
    import numpy as np
    import jax, jax.numpy as jnp  # noqa: E401
    import video_styler_tpu.models.omnigen as O
    from video_styler_tpu.pipelines import OmnigenImagePipeline
    cfg = O.OMNIGEN_TINY
    pipe = OmnigenImagePipeline(dtype=jnp.float32)
    pipe.cfg = cfg
    pipe.su_factor = np.asarray([1.0, 1.1, 1.2, 1.3])
    pipe.transformer_params = O.init_omnigen(jax.random.PRNGKey(0), cfg)

    class Tok:
        def __call__(self, text):
            return types.SimpleNamespace(
                input_ids=[1] + [5] * (len(text) % 5 + 2))
    pipe.prompter.tokenizer = Tok()
    _stub_image_codec(pipe, z=4)
    return pipe, dict()


def smoke_sd():
    """SD pipeline orchestration with a stub denoiser: the real 860M UNet
    has no tiny configuration (fixed channel plan, models/sd.py) — its math
    is covered by test_sd_parity; this recipe exercises the scheduler/CFG/
    controlnet plumbing the way test_controlled_pipelines does with the
    reference-loaded UNet."""
    import jax, jax.numpy as jnp  # noqa: E401
    import video_styler_tpu.models.sd as SDM
    from video_styler_tpu.pipelines import SDImagePipeline
    pipe = SDImagePipeline(dtype=jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 1, 1)) * 0.2
    pipe.unet_params = {"stub": {"w": w}}

    def stub_unet(params, sample, timestep, text_emb,
                  controlnet_res_stack=None, ipadapter_kwargs_list=None,
                  motion=None):
        y = jax.lax.conv_general_dilated(
            sample, params["stub"]["w"].astype(sample.dtype), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + 0.01 * jnp.mean(text_emb).astype(sample.dtype)
    orig = SDM.sd_unet_forward
    SDM.sd_unet_forward = stub_unet

    def cleanup():
        SDM.sd_unet_forward = orig
    ctx = {}

    def enc(prompt, clip_skip=1):
        if prompt not in ctx:
            ctx[prompt] = jax.random.normal(
                _rng(abs(hash(prompt)) % 997), (1, 77, 768))
        return ctx[prompt]
    pipe.encode_prompt = enc
    _stub_image_codec(pipe, z=4)
    return pipe, dict(cfg_scale=4.0), cleanup


def smoke_sdxl():
    """Same stub-denoiser approach as smoke_sd (see that docstring); SDXL
    math is covered by test_sdxl_parity."""
    import jax, jax.numpy as jnp  # noqa: E401
    import video_styler_tpu.models.sdxl as XLM
    from video_styler_tpu.pipelines import SDXLImagePipeline
    pipe = SDXLImagePipeline(dtype=jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 1, 1)) * 0.2
    pipe.unet_params = {"stub": {"w": w}}

    def stub_unet(params, sample, timestep, encoder_hidden_states,
                  add_time_id, add_text_embeds, controlnet_res_stack=None,
                  ipadapter_kwargs_list=None, motion=None):
        y = jax.lax.conv_general_dilated(
            sample, params["stub"]["w"].astype(sample.dtype), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + (0.01 * jnp.mean(encoder_hidden_states)
                    + 0.001 * jnp.mean(add_text_embeds)).astype(sample.dtype)
    orig = XLM.sdxl_unet_forward
    XLM.sdxl_unet_forward = stub_unet

    def cleanup():
        XLM.sdxl_unet_forward = orig

    def enc(prompt, clip_skip=2):
        k = abs(hash(prompt)) % 997
        return (jax.random.normal(_rng(k), (1, 77, 2048)),
                jax.random.normal(_rng(k + 1), (1, 1280)))
    pipe.encode_prompt = enc
    _stub_image_codec(pipe, z=4)
    return pipe, dict(cfg_scale=4.0), cleanup


def smoke_step1x():
    """Step1x instruction edit: FLUX trunk + the Step1x connector feeding
    per-step reference conditioning (models/step1x.py); the Qwen2.5-VL
    captioner is stubbed (its tower is parity-tested separately)."""
    import numpy as np
    import jax, jax.numpy as jnp  # noqa: E401
    import video_styler_tpu.models.step1x as S
    from video_styler_tpu.models.flux_dit import FLUX_DIT_TINY, init_flux_dit
    from video_styler_tpu.pipelines import FluxImagePipeline
    cfg = FLUX_DIT_TINY
    pipe = FluxImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = init_flux_dit(jax.random.PRNGKey(0), cfg)
    _stub_image_codec(pipe)
    pooled = jax.random.normal(_rng(2), (1, cfg.pooled_dim))
    pipe.encode_prompt = lambda p, n=512: (
        jax.random.normal(_rng(abs(hash(p)) % 997), (1, 8, cfg.context_dim)),
        pooled, np.zeros((8, 3)))
    ccfg = S.Step1xConnectorConfig(in_channels=16, hidden_size=cfg.context_dim,
                                   num_heads=2, depth=1,
                                   pooled_dim=cfg.pooled_dim)
    pipe.step1x_connector_params = S.init_step1x_connector(
        jax.random.PRNGKey(3), ccfg)
    pipe.step1x_connector_cfg = ccfg
    pipe.qwenvl = lambda caps, refs: (
        np.random.default_rng(0).standard_normal((1, 6, 16)).astype(np.float32),
        np.ones((1, 6), np.int64))
    return pipe, dict(step1x_reference_image=_frames(1)[0])


def smoke_hunyuan_video():
    import numpy as np
    import jax, jax.numpy as jnp  # noqa: E401
    from video_styler_tpu.models.hunyuan_video_dit import (
        HUNYUAN_VIDEO_TINY, init_hunyuan_video_dit)
    from video_styler_tpu.pipelines import HunyuanVideoPipeline
    cfg = HUNYUAN_VIDEO_TINY
    pipe = HunyuanVideoPipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = init_hunyuan_video_dit(jax.random.PRNGKey(0), cfg)
    mask = jnp.ones((1, cfg.txt_len), jnp.int32)
    pooled = jax.random.normal(_rng(9), (1, cfg.pooled_dim))
    pipe.encode_prompt = lambda p: (
        jax.random.normal(_rng(abs(hash(p)) % 997),
                          (1, cfg.txt_len, cfg.text_dim)), mask, pooled)
    pipe.encode_video = lambda arr, **k: jnp.asarray(
        np.repeat(arr[:, :1], 16, 1)[:, :, ::4, ::8, ::8]
        [:, :, :((arr.shape[2] - 1) // 4 + 1)], jnp.float32)
    return pipe, dict(num_frames=9)


def smoke_cog_video():
    import jax, jax.numpy as jnp  # noqa: E401
    import video_styler_tpu.models.cog_video as C
    from video_styler_tpu.pipelines import CogVideoPipeline
    cfg = C.COG_DIT_TINY
    pipe = CogVideoPipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = C.init_cog_dit(jax.random.PRNGKey(0), cfg)
    pipe.text_encoder = lambda p, length=226: jax.random.normal(
        _rng(abs(hash(p)) % 997), (1, 8, cfg.text_dim))
    return pipe, dict(num_frames=4, cfg_scale=1.5)


def smoke_step_video():
    import jax, jax.numpy as jnp  # noqa: E401
    import video_styler_tpu.models.stepvideo_dit as D
    from video_styler_tpu.pipelines import StepVideoPipeline
    cfg = D.STEP_VIDEO_TINY
    pipe = StepVideoPipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = D.init_step_video_dit(jax.random.PRNGKey(0), cfg)

    def enc(p):
        k = _rng(abs(hash(p)) % 997)
        import jax as _j
        return (_j.random.normal(k, (1, 7, cfg.caption_dim)),
                _j.random.normal(_j.random.fold_in(k, 1), (1, 3, cfg.clip_dim)),
                jnp.ones((1, 10), jnp.int32))
    pipe.text_encoder = enc
    return pipe, dict(num_frames=17, cfg_scale=2.0)


def smoke_svd():
    import jax, jax.numpy as jnp  # noqa: E401
    from video_styler_tpu.pipelines import SVDVideoPipeline
    pipe = SVDVideoPipeline(dtype=jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 1, 1)) * 0.1

    def fake_unet(params, x, t, emb, ids):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + 0.01 * emb.mean() + 0.001 * jnp.asarray(ids).sum()
    pipe._fwd = lambda: fake_unet
    pipe.encode_image_with_clip = lambda img, h, w_: jnp.ones((1, 1, 1024))
    pipe.encode_image_with_vae = lambda img, s, h, w_, seed=None: jnp.zeros(
        (1, 4, h // 8, w_ // 8))
    pipe.encode_video_with_vae = lambda frames, h, w_: jnp.zeros(
        (len(frames), 4, h // 8, w_ // 8))
    return pipe, dict()


SMOKE = {"sd": smoke_sd, "sdxl": smoke_sdxl, "sd3": smoke_sd3,
         "flux": smoke_flux, "qwen_image": smoke_qwen_image,
         "hunyuan_image": smoke_hunyuan_image, "omnigen": smoke_omnigen,
         "step1x": smoke_step1x,
         "hunyuan_video": smoke_hunyuan_video, "cog_video": smoke_cog_video,
         "step_video": smoke_step_video, "svd": smoke_svd}


def run(family: str, argv=None):
    """Inference entry for a generated family script."""
    import jax.numpy as jnp
    meta = FAMILIES[family]
    ap = argparse.ArgumentParser(description=f"{family} example recipe")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--prompt", default="a watercolor fox in a forest")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output", default=None, help=".npy latent dump (smoke)")
    a, rest = ap.parse_known_args(argv)
    if not a.smoke:
        print(f"real-checkpoint runs go through: python {meta['real']} "
              f"--prompt '...' --dit_path ... (see examples/image_gen.py / "
              f"video_gen.py); this script's --smoke mode runs tiny models")
        return None
    built = SMOKE[family]()
    pipe, kw = built[0], dict(built[1])
    cleanup = built[2] if len(built) > 2 else None
    try:
        if meta["kind"] == "video" and family == "svd":
            lat = pipe(input_image=_frames(1, 64, 64)[0], height=64,
                       width=64, num_frames=3, num_inference_steps=a.steps,
                       seed=a.seed, return_latents=True, **kw)
        else:
            kw.setdefault("height", a.height)
            kw.setdefault("width", a.width)
            lat = pipe(a.prompt, num_inference_steps=a.steps, seed=a.seed,
                       return_latents=True, **kw)
    finally:
        if cleanup is not None:
            cleanup()
    ok = bool(jnp.isfinite(lat.astype(jnp.float32)).all())
    print(f"[{family}] smoke latents {tuple(lat.shape)} finite={ok}")
    if not ok:
        raise SystemExit(f"{family}: non-finite latents")
    if a.output:
        import numpy as np
        np.save(a.output, np.asarray(lat, np.float32))
        print(f"saved {a.output}")
    return lat


# ---------------------------------------------------------------------------
# training recipes
# ---------------------------------------------------------------------------

def _train_smoke_pack(family):
    """(base_params, forward_fn, latents, context) for the family's tiny
    flow-match LoRA loop."""
    import jax, jax.numpy as jnp  # noqa: E401
    if family == "flux":
        import numpy as np
        from video_styler_tpu.models.flux_dit import (FLUX_DIT_TINY,
                                                      init_flux_dit,
                                                      flux_dit_forward)
        cfg = FLUX_DIT_TINY
        params = init_flux_dit(jax.random.PRNGKey(0), cfg)
        ctx = {"emb": jax.random.normal(_rng(1), (1, 8, cfg.context_dim)),
               "pooled": jax.random.normal(_rng(2), (1, cfg.pooled_dim))}
        text_ids = np.zeros((8, 3))  # static: RoPE id tables stay numpy

        def fwd(p, x, t, c):
            return flux_dit_forward(p, cfg, x, t, c["emb"], c["pooled"],
                                    text_ids=text_ids)
        lat = jax.random.normal(_rng(3), (1, 16, 8, 8)) * 0.3
        return params, fwd, lat, ctx
    if family == "sd3":
        from video_styler_tpu.models.sd3_dit import (SD3_DIT_TINY,
                                                     init_sd3_dit,
                                                     sd3_dit_forward)
        cfg = SD3_DIT_TINY
        params = init_sd3_dit(jax.random.PRNGKey(0), cfg)
        ctx = {"emb": jax.random.normal(_rng(1), (1, 8, cfg.context_dim)),
               "pooled": jax.random.normal(_rng(2), (1, cfg.pooled_dim))}

        def fwd(p, x, t, c):
            return sd3_dit_forward(p, cfg, x, t, c["emb"], c["pooled"])
        lat = jax.random.normal(_rng(3), (1, 16, 8, 8)) * 0.3
        return params, fwd, lat, ctx
    if family == "qwen_image":
        from video_styler_tpu.models.qwen_image_dit import (
            QWEN_IMAGE_TINY, init_qwen_image_dit, qwen_image_dit_forward)
        cfg = QWEN_IMAGE_TINY
        params = init_qwen_image_dit(jax.random.PRNGKey(0), cfg)
        ctx = {"emb": jax.random.normal(_rng(1), (1, 8, cfg.text_dim))}

        def fwd(p, x, t, c):
            return qwen_image_dit_forward(p, cfg, x, t, c["emb"])
        lat = jax.random.normal(_rng(3), (1, 16, 8, 8)) * 0.3
        return params, fwd, lat, ctx
    raise KeyError(family)


def train(family: str, argv=None):
    """LoRA training entry for a generated family script."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    ap = argparse.ArgumentParser(description=f"{family} LoRA training recipe")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--rank", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--output_path", default=None)
    a, rest = ap.parse_known_args(argv)
    if not a.smoke:
        print(f"real runs: convert the checkpoint (utils/convert.py via the "
              f"family pipeline loaders), cache latents with "
              f"trainers/latent_cache.py, then run this recipe without "
              f"--smoke once paths are wired; --smoke demonstrates the "
              f"full loop on tiny models")
        return None

    from video_styler_tpu.trainers.lora_train import (init_lora,
                                                      save_lora_safetensors)
    if family in ("sd", "sdxl"):
        # v-prediction target through the SD trainer (sd_training.py); the
        # stand-in UNet matches tests/test_sd_training.py — the real UNet
        # trains identically through the same factory once converted
        from video_styler_tpu.trainers.sd_training import (
            make_sd_lora_train_step, init_sd_lora)
        d = 8
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        params = {"blocks": {"0": {
            n: {"w": jax.random.normal(k, (d, d)) * 0.1}
            for n, k in zip(("to_q", "to_k", "to_v", "to_out"), ks)}}}

        def forward(p, sample, timestep, ctx):
            b = p["blocks"]["0"]
            h = sample.reshape(sample.shape[0], -1, d)
            h = (h @ b["to_q"]["w"] + h @ b["to_k"]["w"]
                 + h @ b["to_v"]["w"]) @ b["to_out"]["w"]
            return (h + 0.01 * jnp.mean(ctx)).reshape(sample.shape)
        lora = init_sd_lora(jax.random.PRNGKey(1), params, rank=a.rank)
        opt = optax.adam(a.lr)
        step = make_sd_lora_train_step(forward, params, opt)
        opt_state = opt.init(lora)
        lat = jax.random.normal(_rng(4), (2, 4, d, d)) * 0.1
        ctx = jnp.zeros((2, 7, d))
        losses = []
        for i in range(a.steps):
            loss, lora, opt_state = step(lora, opt_state, lat, ctx,
                                         jax.random.PRNGKey(10 + i))
            losses.append(float(loss))
    else:
        from video_styler_tpu.trainers.image_training import \
            make_image_lora_train_step
        params, fwd, lat, ctx = _train_smoke_pack(family)
        lora = init_lora(jax.random.PRNGKey(1), params, rank=a.rank,
                         targets=("*",))
        opt = optax.adam(a.lr)
        step = make_image_lora_train_step(fwd, params, opt)
        opt_state = opt.init(lora)
        losses = []
        for i in range(a.steps):
            loss, lora, opt_state = step(lora, opt_state, lat, ctx,
                                         jax.random.PRNGKey(10 + i))
            losses.append(float(loss))
    print(f"[{family}] {a.steps} LoRA steps, loss {losses[0]:.4f} -> "
          f"{losses[-1]:.4f}")
    assert np.isfinite(losses).all(), "non-finite training loss"
    out = a.output_path or f"/tmp/{family}_lora_smoke.safetensors"
    save_lora_safetensors(lora, out)
    print(f"saved LoRA -> {out}")
    return losses
