"""Measure the Ditto-novel pipelines on the real chip (VERDICT r4 item 3)
plus the TeaCache speed/quality point (item 7).

Three measurements, all at the 1.3B architecture on one v5e:

- EDITOR (`pipelines/wan_video_editor.py`, the Ditto keyframe editor): the
  REAL `WanVideoEditorPipeline.__call__` denoise loop at the full Ditto edit
  shape — 73f 480x832 main video + K edited keyframes, joint [main | edit]
  sequence (29,640 + K*1,560 tokens, a different flash-attention shape than
  T2V), coupled noise, shared rope_indices, velocity correction every step,
  50 steps x 2 CFG branches.
- ENHANCER (`pipelines/wan_enhancer.py`): the dual-expert SDEdit path —
  UniPC add_noise at timesteps[-4], then 4 denoise steps x 2 branches with
  per-timestep expert switching (two resident 1.3B experts).
- TEACACHE: 50-step T2V denoise at the edit shape with
  tea_cache_l1_thresh=0.05 vs off — steps skipped, seconds saved, and the
  latent drift the skips introduce.

VAE/T5 stages are stubbed in-process (they measure separately in
tools/measure_14b.py — running tiled-VAE activations next to a resident DiT
OOMs the 16 GB HBM, docs/PERF_NOTES_r3.md) and composed from the committed
measured artifacts; every composed number is labeled as such.

Writes docs/artifacts_extra_r5.json (incrementally — partial on timeout);
bench.py carries the keys into its `extra`.
"""
import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _log(m):
    print(f"[measure_ee {time.strftime('%H:%M:%S')}] {m}", flush=True)


def _artifacts():
    merged = {}
    for name in ("artifacts_m14b_r3.json", "artifacts_m14b_r4.json"):
        try:
            with open(os.path.join(HERE, "docs", name)) as f:
                merged.update(json.load(f))
        except Exception:
            pass
    return merged


class Saver:
    def __init__(self, path):
        self.path = path
        self.out = {}
        try:    # merge: partial re-runs keep previously measured keys
            with open(path) as f:
                self.out = json.load(f)
        except Exception:
            pass

    def __setitem__(self, k, v):
        self.out[k] = v
        with open(self.path, "w") as f:
            json.dump(self.out, f, indent=1)


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


TINY = False            # --tiny: CPU smoke of the harness itself
LAT_HW = (60, 104)      # 480x832 latent grid (or 8x8 under --tiny)
LAT_T = 19              # 73 frames
N_FRAMES = 73
PIX = (480, 832)


def _dit_cfg():
    from video_styler_tpu.models.wan_dit import WAN_DIT_TINY, WAN_T2V_1_3B
    return WAN_DIT_TINY if TINY else WAN_T2V_1_3B


def _stub_pipe(pipe_cls, dtype, n_experts=1, seed=0):
    """A 1.3B-architecture pipeline with random bf16 weights and stubbed
    VAE/T5 (their costs are measured in measure_14b and composed)."""
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models.wan_dit import init_wan_dit
    from video_styler_tpu.models.wan_vae import WAN21_VAE

    cfg = _dit_cfg()
    pipe = pipe_cls(dtype=dtype)
    pipe.dit_cfg = pipe.dit2_cfg = cfg
    pipe.dit_params = init_wan_dit(jax.random.PRNGKey(seed), cfg,
                                   dtype=dtype)
    if n_experts == 2:
        pipe.dit2_params = init_wan_dit(jax.random.PRNGKey(seed + 1),
                                        cfg, dtype=dtype)
    pipe.vae_cfg = WAN21_VAE

    ctx = jax.random.normal(jax.random.PRNGKey(seed + 2),
                            (1, 512, cfg.text_dim), dtype)
    pipe.encode_prompt = lambda text: ctx
    return pipe


def _frames(n, h, w, seed=0):
    import numpy as np
    from PIL import Image
    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
            for _ in range(n)]


def measure_editor(save, steps, keyframes, art, with_teacache=True):
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.pipelines.wan_video_editor import \
        WanVideoEditorPipeline

    pipe = _stub_pipe(WanVideoEditorPipeline, jnp.bfloat16)
    lat_shape = (1, 16, LAT_T) + LAT_HW    # 73f 480x832 (tiny: 9f 64x64)
    kf_shape = (1, 16, keyframes) + LAT_HW
    z_main = jax.random.normal(jax.random.PRNGKey(30), lat_shape, jnp.bfloat16)
    z_kf = jax.random.normal(jax.random.PRNGKey(31), kf_shape, jnp.bfloat16)
    pipe.encode_video = lambda v, **kw: z_main
    pipe.encode_keyframes_independently = lambda kfs, **kw: z_kf

    src = _frames(N_FRAMES, *PIX)
    kfs = _frames(keyframes, *PIX, seed=1)
    kf_idx = [int(i * (N_FRAMES - 1) / max(keyframes - 1, 1))
              for i in range(keyframes)]

    tok = LAT_HW[0] * LAT_HW[1] // 4
    _log(f"editor: {steps}-step CFG denoise, joint seq "
         f"{LAT_T * tok} + {keyframes * tok} tokens (compile first)")
    t0 = time.perf_counter()
    out = pipe("measure", negative_prompt="bad", source_video=src,
               edited_keyframes=kfs, keyframe_indices=kf_idx, seed=7,
               height=PIX[0], width=PIX[1], num_frames=N_FRAMES, cfg_scale=5.0,
               num_inference_steps=steps, tiled=False, verbose=False,
               return_latents=True)
    _sync(out)
    first_s = time.perf_counter() - t0
    save["editor_first_run_s"] = round(first_s, 1)
    _log(f"editor first (compile+run): {first_s:.1f}s; steady run")
    t0 = time.perf_counter()
    out = pipe("measure", negative_prompt="bad", source_video=src,
               edited_keyframes=kfs, keyframe_indices=kf_idx, seed=7,
               height=PIX[0], width=PIX[1], num_frames=N_FRAMES, cfg_scale=5.0,
               num_inference_steps=steps, tiled=False, verbose=False,
               return_latents=True)
    _sync(out)
    denoise_s = time.perf_counter() - t0
    save["editor_steps"] = steps
    save["editor_keyframes"] = keyframes
    save["editor_denoise_s_measured"] = round(denoise_s, 1)

    # TeaCache through the editor's joint [main|edit] forward (round-5:
    # the editor accepts tea_cache_l1_thresh like the base pipeline)
    if with_teacache:
        _measure_editor_teacache(save, pipe, out, denoise_s, steps,
                                 keyframes, src, kfs, kf_idx)

    # compose the full-video number from the measured VAE/T5 artifacts:
    # source encode (73f) + K independent 1-frame encodes + decode + 2 T5
    if all(k in art for k in ("vae_encode_ms", "vae_decode_ms",
                              "t5_encode_ms")):
        kf_enc_s = keyframes * art["vae_encode_ms"] / 73.0 / 1e3
        vae_t5 = (art["vae_encode_ms"] + art["vae_decode_ms"]
                  + 2 * art["t5_encode_ms"]) / 1e3 + kf_enc_s
        save["editor_video_s_composed"] = round(denoise_s + vae_t5, 1)
        save["editor_video_note"] = (
            f"measured {steps}-step CFG editor denoise (joint "
            f"[main|{keyframes}kf] sequence, coupled noise + rope_indices + "
            "velocity correction, real WanVideoEditorPipeline.__call__) on "
            "one v5e + the separately-measured VAE/T5 stages (1-frame "
            "keyframe encodes scaled from the causal 73f encode)")
    del pipe
    gc.collect()
    return denoise_s


def _measure_editor_teacache(save, pipe, out, denoise_s, steps, keyframes,
                             src, kfs, kf_idx):
    """TeaCache over the editor's joint [main|edit] forward (round-5: the
    editor accepts tea_cache_l1_thresh like the base pipeline)."""
    import jax.numpy as jnp
    from video_styler_tpu.pipelines import wan_video as W
    skips = {"n": 0}
    orig_check = W.TeaCache.check

    def counting_check(self, t_mod):
        r = orig_check(self, t_mod)
        if r and self.previous_residual is not None:
            skips["n"] += 1
        return r
    W.TeaCache.check = counting_check
    try:
        tc_kw = dict(negative_prompt="bad", source_video=src,
                     edited_keyframes=kfs, keyframe_indices=kf_idx, seed=7,
                     height=PIX[0], width=PIX[1], num_frames=N_FRAMES,
                     cfg_scale=5.0, num_inference_steps=steps, tiled=False,
                     verbose=False, return_latents=True,
                     tea_cache_l1_thresh=0.05,
                     tea_cache_model_id="Wan2.1-T2V-1.3B")
        _log("editor+teacache: thresh=0.05 warm-up (skip-path compile), "
             "then timed")
        _sync(pipe("measure", **tc_kw))
        skips["n"] = 0
        t0 = time.perf_counter()
        out_tc = pipe("measure", **tc_kw)
        _sync(out_tc)
        tc_s = time.perf_counter() - t0
        drift = float(jnp.mean(jnp.abs(out_tc.astype(jnp.float32)
                                       - out.astype(jnp.float32))))
        scale = float(jnp.mean(jnp.abs(out.astype(jnp.float32))))
        save["editor_teacache_denoise_s"] = round(tc_s, 1)
        save["editor_teacache_steps_skipped"] = skips["n"]
        save["editor_teacache_total_branch_calls"] = 2 * steps
        save["editor_teacache_latent_rel_drift"] = round(drift / scale, 4)
        save["editor_teacache_speedup"] = round(denoise_s / tc_s, 3)
        save["editor_teacache_note"] = (
            f"{steps}-step CFG editor denoise with "
            f"tea_cache_l1_thresh=0.05 on the JOINT [main|{keyframes}kf] "
            f"sequence: {skips['n']}/{2 * steps} branch forwards skipped; "
            "velocity correction still applied every step on the "
            "approximated v (random-weight trajectory point, same caveat "
            "as teacache_note)")
    finally:
        W.TeaCache.check = orig_check


def measure_enhancer(save, art):
    import jax.numpy as jnp
    from video_styler_tpu.pipelines.wan_enhancer import WanEnhancerPipeline

    pipe = _stub_pipe(WanEnhancerPipeline, jnp.bfloat16, n_experts=2, seed=40)
    import jax
    lat = jax.random.normal(jax.random.PRNGKey(41), (1, 16, LAT_T) + LAT_HW,
                            jnp.bfloat16)
    pipe.encode_video = lambda v, **kw: lat
    src = _frames(N_FRAMES, *PIX, seed=2)

    _log("enhancer: dual-expert 4-step SDEdit (compile first)")
    t0 = time.perf_counter()
    out = pipe.enhance(src, prompt="measure", negative_prompt="bad",
                       forward_step=4, skip_backward_step=4,
                       sampling_steps=50, tiled=False, return_latents=True)
    _sync(out)
    first_s = time.perf_counter() - t0
    save["enhancer_first_run_s"] = round(first_s, 1)
    _log(f"enhancer first (compile+run): {first_s:.1f}s; steady run")
    t0 = time.perf_counter()
    out = pipe.enhance(src, prompt="measure", negative_prompt="bad",
                       forward_step=4, skip_backward_step=4,
                       sampling_steps=50, tiled=False, return_latents=True)
    _sync(out)
    denoise_s = time.perf_counter() - t0
    save["enhancer_denoise_s_measured"] = round(denoise_s, 1)
    if all(k in art for k in ("vae_encode_ms", "vae_decode_ms",
                              "t5_encode_ms")):
        vae_t5 = (art["vae_encode_ms"] + art["vae_decode_ms"]
                  + 2 * art["t5_encode_ms"]) / 1e3
        save["enhancer_video_s_composed"] = round(denoise_s + vae_t5, 1)
        save["enhancer_video_note"] = (
            "measured dual-expert SDEdit enhance (UniPC add_noise at "
            "timesteps[-4], 4 denoise steps x 2 branches, per-timestep "
            "expert switch, both 1.3B experts HBM-resident) + the "
            "separately-measured VAE/T5 stages")
    del pipe
    gc.collect()
    return denoise_s


def measure_teacache(save, steps):
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.pipelines import wan_video as W

    pipe = _stub_pipe(W.WanVideoPipeline, jnp.bfloat16, seed=50)
    noise = jax.random.normal(jax.random.PRNGKey(51), (1, 16, LAT_T) + LAT_HW)

    import numpy as np
    W_gen = W.generate_noise
    W.generate_noise = lambda shape, seed=None: np.asarray(noise, np.float32)
    skips = {"n": 0}
    orig_check = W.TeaCache.check

    def counting_check(self, t_mod):
        r = orig_check(self, t_mod)
        if r and self.previous_residual is not None:
            skips["n"] += 1
        return r
    W.TeaCache.check = counting_check
    try:
        common = dict(height=PIX[0], width=PIX[1], num_frames=N_FRAMES, seed=9,
                      num_inference_steps=steps, cfg_scale=5.0, tiled=False,
                      return_latents=True)
        _log(f"teacache: {steps}-step baseline (compile first)")
        lat_off = pipe("measure", **common)
        _sync(lat_off)
        t0 = time.perf_counter()
        lat_off = pipe("measure", **common)
        _sync(lat_off)
        off_s = time.perf_counter() - t0
        save["teacache_off_denoise_s"] = round(off_s, 1)

        _log("teacache: thresh=0.05 warm-up (skip-path compile), then timed")
        _sync(pipe("measure", tea_cache_l1_thresh=0.05,
                   tea_cache_model_id="Wan2.1-T2V-1.3B", **common))
        skips["n"] = 0
        t0 = time.perf_counter()
        lat_on = pipe("measure", tea_cache_l1_thresh=0.05,
                      tea_cache_model_id="Wan2.1-T2V-1.3B", **common)
        _sync(lat_on)
        on_s = time.perf_counter() - t0
        save["teacache_on_denoise_s"] = round(on_s, 1)
        save["teacache_steps_skipped"] = skips["n"]
        save["teacache_total_branch_calls"] = 2 * steps
        drift = float(jnp.mean(jnp.abs(lat_on.astype(jnp.float32)
                                       - lat_off.astype(jnp.float32))))
        scale = float(jnp.mean(jnp.abs(lat_off.astype(jnp.float32))))
        save["teacache_latent_mad"] = round(drift, 5)
        save["teacache_latent_rel_drift"] = round(drift / scale, 4)
        save["teacache_speedup"] = round(off_s / on_s, 3)
        save["teacache_note"] = (
            f"50-step CFG T2V denoise at the edit shape, "
            f"tea_cache_l1_thresh=0.05 + Wan2.1-T2V-1.3B poly(4) coeffs vs "
            f"off: {skips['n']}/{2 * steps} branch forwards skipped. Random "
            "bf16 weights — the skip rate depends on the residual "
            "trajectory, so treat as a harness point; rel drift is the "
            "exact latent cost of the skips for THIS trajectory")
    finally:
        W.TeaCache.check = orig_check
        W.generate_noise = W_gen
    del pipe
    gc.collect()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--keyframes", type=int, default=3)
    ap.add_argument("--skip-editor", action="store_true")
    ap.add_argument("--skip-enhancer", action="store_true")
    ap.add_argument("--skip-teacache", action="store_true")
    ap.add_argument("--editor-teacache", action="store_true",
                    help="measure editor+TeaCache even with --skip-teacache "
                         "(which otherwise disables both TeaCache stages)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke of the harness (tiny config/shapes)")
    ap.add_argument("--out", default=os.path.join(
        HERE, "docs", "artifacts_extra_r5.json"))
    args = ap.parse_args()
    if args.tiny:
        global TINY, LAT_HW, LAT_T, N_FRAMES, PIX
        TINY = True
        LAT_HW, LAT_T, N_FRAMES, PIX = (8, 8), 3, 9, (64, 64)
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    save = Saver(args.out)
    save["device"] = str(jax.devices()[0])
    art = _artifacts()
    if not args.skip_enhancer:
        measure_enhancer(save, art)
    if not args.skip_teacache:
        measure_teacache(save, args.steps)
    if not args.skip_editor:
        measure_editor(save, args.steps, args.keyframes, art,
                       with_teacache=(not args.skip_teacache
                                      or args.editor_teacache))
    _log(f"done -> {args.out}")
    print(json.dumps(save.out, indent=1))


if __name__ == "__main__":
    main()
