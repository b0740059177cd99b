"""Measured Wan2.1-VACE-14B runs on ONE chip via host block streaming.

Kills the round-2 asterisk: instead of extrapolating from a 4-layer stack,
this builds the REAL 48-block model (40 trunk + 8 VACE blocks at dim 5120 /
40 heads / ffn 13824), keeps what fits HBM resident and streams the rest
from host RAM with multi-stream prefetch (models/wan_streaming.py — the
reference vram_management capability, layers.py:95-188), then measures:

  * per-pass wall time of the full 48-block forward at the Ditto edit shape
    (480x832x73 -> 29,640 tokens), CFG-merged batch 2;
  * the full int8 4-step recipe (the baseline's own ComfyUI configuration:
    quantized 14B + distill LoRA, 4 steps) end-to-end in ONE process:
    umT5-xxl encode -> 2x VAE encode (VACE inactive/reactive) -> 4 denoise
    steps -> VAE decode, sequential on the chip;
  * one bf16 streamed pass for the 50-step full-quality composition.

Weights are random-filled at full size (no public checkpoints in this
offline environment); timing on TPU is value-independent.

Usage: python tools/measure_14b.py [--resident 16] [--steps 4]
       [--skip-bf16] [--tiny] [--out /tmp/m14b.json]
"""
import argparse
import gc
import json
import os
import sys
import time

# This VM provisions first-touch anonymous pages at ~10 MB/s (uffd-backed
# microVM memory). Large transient buffers (transfer staging, numpy temps)
# normally cycle through mmap/munmap and re-fault on EVERY allocation,
# throttling host->TPU streaming to ~10 MB/s. Forcing big allocations onto
# the (never-trimmed) heap makes pages fault once and be reused. glibc
# reads these at startup, so re-exec if they aren't set yet.
if os.environ.get("MALLOC_MMAP_THRESHOLD_") != "1073741824":
    os.environ["MALLOC_MMAP_THRESHOLD_"] = "1073741824"
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "2147483647"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"[14b {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def _mem(out, tag):
    """Record device memory stats if the backend exposes them."""
    import jax
    try:
        ms = jax.devices()[0].memory_stats() or {}
    except Exception:
        return
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in ms:
            out[f"mem_{tag}_{k}"] = ms[k]
    if "peak_bytes_in_use" in ms:
        _log(f"[{tag}] peak HBM {ms['peak_bytes_in_use']/1e9:.2f} GB")


def build_host_dit(cfg, vcfg, mode: str, seed: int = 0, alias: bool = True):
    """Full-size host param store, blocks pre-quantized for int8 mode.

    Weight VALUES are random fills (timing is value-independent on TPU);
    the structure exactly matches init_wan_dit/init_vace so the streamer
    and jitted pieces see the production pytrees.

    alias=True materializes ONE physical block and aliases it across the
    stacked-layer axis with numpy broadcast views (zero-copy). Transfer
    bytes, compute, and HBM behavior are identical to a full store — only
    host RAM differs, which matters here because this VM provisions
    first-touch pages at ~MB/s (uffd-backed microVM memory): a full 17 GB
    int8 store takes ~1 h to fault in, an aliased one seconds.
    """
    import numpy as np
    import ml_dtypes
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models.wan_dit import init_wan_dit, init_dit_block
    from video_styler_tpu.models.wan_vace import init_vace

    rng = np.random.default_rng(seed)
    bf16 = ml_dtypes.bfloat16

    def host_block(template, alias_axis0: bool = False):
        """Host params for a (possibly stacked) template; int8 leaves
        quantized directly. With alias_axis0, only ONE slice along the
        leading (stacked-layer) axis is materialized and broadcast."""
        def fill(shape, kind, alias=None):
            alias = alias_axis0 if alias is None else alias
            if alias and len(shape) >= 1:
                # materialize ONE real per-layer slice, broadcast along the
                # stacked-layer axis only (further dims stay contiguous so
                # split_host_blocks can alias without copying)
                one = fill(shape[1:], kind, alias=False)
                return np.broadcast_to(one, shape)
            if kind == "q":
                return rng.integers(-127, 127, shape, dtype=np.int8)
            if kind == "scale":
                return np.full(shape, 1e-3, np.float32)
            return (rng.random(shape, dtype=np.float32) * 0.02 - 0.01
                    ).astype(bf16)

        def walk(node):
            if isinstance(node, dict) and "w" in node and \
                    getattr(node["w"], "ndim", 0) >= 2 and \
                    node["w"].shape[-1] >= 128 and node["w"].shape[-2] >= 128 \
                    and mode in ("int8", "int4"):
                shape = node["w"].shape
                if mode == "int4":  # packed nibbles: in-axis halves
                    out = {"w_q4": fill(shape[:-2] + (shape[-2] // 2,
                                                      shape[-1]), "q"),
                           "w_scale": fill(shape[:-2] + (1, shape[-1]),
                                           "scale")}
                else:
                    out = {"w_q": fill(shape, "q"),
                           "w_scale": fill(shape[:-2] + (1, shape[-1]),
                                           "scale")}
                if "b" in node:
                    out["b"] = fill(node["b"].shape, "f")
                return out
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return fill(node.shape, "f")
        return walk(template)

    # eval_shape: structural templates without allocating 28 GB anywhere
    tpl = jax.eval_shape(lambda k: init_wan_dit(k, cfg, dtype=jnp.bfloat16),
                         jax.random.PRNGKey(0))
    vtpl = None
    if vcfg is not None:
        vtpl = jax.eval_shape(lambda k: init_vace(k, vcfg, dtype=jnp.bfloat16),
                              jax.random.PRNGKey(1))

    t0 = time.time()
    # alias only the scan-stacked subtrees (leading axis = layer)
    dit = {k: host_block(v, alias_axis0=(alias and k == "blocks"))
           for k, v in tpl.items()}
    vace = None
    if vtpl is not None:
        vace = {k: host_block(v, alias_axis0=(alias and
                                              k in ("blocks", "after_proj")))
                for k, v in vtpl.items()}
    _log(f"host store built in {time.time()-t0:.0f}s "
         f"(mode={mode}, alias={alias})")
    return dit, vace


def measure(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models.wan_dit import WanDiTConfig, WAN_T2V_14B
    from video_styler_tpu.models.wan_vace import VaceConfig, VACE_14B
    from video_styler_tpu.models.wan_streaming import WanBlockStreamer

    out = {"device": str(jax.devices()[0])}

    def save():
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    if args.tiny:
        cfg = WanDiTConfig(dim=256, in_dim=16, ffn_dim=512, out_dim=16,
                           num_heads=2, num_layers=8, text_dim=128)
        vcfg = VaceConfig(vace_layers=(0, 4), dim=256, num_heads=2,
                          ffn_dim=512)
        lat_shape = (args.batch, 16, 3, 16, 16)
        ctx_shape = (args.batch, 32, cfg.text_dim)
    else:
        cfg, vcfg = WAN_T2V_14B, VACE_14B
        # 73f 480x832 -> latent (16, 19, 60, 104) -> 29,640 tokens.
        # --batch 2 is the CFG-merged posi+nega branch pair (CfgMerger,
        # wan_video_new.py:951-969); --batch 1 (default) runs the two CFG
        # branches as separate passes — reference's unmerged default, and
        # it halves activation transients next to the 8.6 GB resident int4
        # stack (the merged pair OOMed the 16 GB chip).
        lat_shape = (args.batch, 16, 19, 60, 104)
        ctx_shape = (args.batch, 512, cfg.text_dim)
    branch_passes = max(1, 2 // args.batch)  # CFG branches per denoise step
    out["branches_per_pass"] = args.batch  # merged batch-2 covers both CFG branches

    # ---------------- stage 1: umT5-xxl encode (measured) ----------------
    if not args.tiny and not args.train_only and not args.bf16_only:
        from video_styler_tpu.models.t5 import UMT5_XXL, init_t5, t5_encode
        t5c = UMT5_XXL
        t5p = init_t5(jax.random.PRNGKey(0), t5c, dtype=jnp.bfloat16)
        ids = jnp.zeros((1, 512), jnp.int32)
        mask = jnp.ones((1, 512), jnp.int32)
        f = jax.jit(lambda p, i, m: t5_encode(p, t5c, i, m))
        _sync(f(t5p, ids, mask))
        t0 = time.perf_counter()
        _sync(f(t5p, ids, mask)); _sync(f(t5p, ids, mask))
        out["t5_encode_ms"] = (time.perf_counter() - t0) / 2 * 1e3
        _log(f"t5 {out['t5_encode_ms']:.0f} ms")
        save()
        jax.tree_util.tree_map(lambda x: x.delete(), t5p)
        del t5p; gc.collect()

    # ---------------- stage 2: VAE encode x2 + decode (measured) ---------
    if not args.tiny and not args.train_only and not args.bf16_only:
        import video_styler_tpu.models.wan_vae as V
        vaec = V.WAN21_VAE
        vaep = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            V.init_wan_vae(jax.random.PRNGKey(0), vaec))
        video = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 73, 480, 832),
                                  jnp.bfloat16)
        lat = V.encode(vaep, video, vaec, tiled=True); _sync(lat)  # compile
        t0 = time.perf_counter()
        lat = V.encode(vaep, video, vaec, tiled=True); _sync(lat)
        enc_ms = (time.perf_counter() - t0) * 1e3
        # the VACE edit's actual encode: ONE batch-2 pass over
        # [inactive, reactive] (build_vace_context, pipelines/wan_video.py:364)
        # — per-tile fixed costs amortize vs two batch-1 passes
        video2 = jnp.concatenate([video, video], axis=0)
        lat2 = V.encode(vaep, video2, vaec, tiled=True); _sync(lat2)
        t0 = time.perf_counter()
        lat2 = V.encode(vaep, video2, vaec, tiled=True); _sync(lat2)
        out["vae_encode2_ms"] = (time.perf_counter() - t0) * 1e3
        del video2, lat2
        outv = V.decode(vaep, lat.astype(jnp.bfloat16), vaec, tiled=True)
        _sync(outv)  # compile
        t0 = time.perf_counter()
        outv = V.decode(vaep, lat.astype(jnp.bfloat16), vaec, tiled=True)
        _sync(outv)
        dec_ms = (time.perf_counter() - t0) * 1e3
        out["vae_encode_ms"] = enc_ms
        out["vae_decode_ms"] = dec_ms
        _log(f"vae enc {enc_ms:.0f} ms dec {dec_ms:.0f} ms")
        save()
        del video, outv, lat
        jax.tree_util.tree_map(lambda x: x.delete(), vaep)
        del vaep; gc.collect()

    # ------- stage 3: quantized 14B+VACE denoise (int4 resident / int8
    # streamed — int4 fits the whole 17 GB stack into ~8.7 GB HBM) --------
    qmode = args.mode
    run_quant_denoise = not args.train_only and not args.bf16_only
    dit_host = vace_host = None
    if not args.bf16_only:
        # bf16-only runs skip the quantized store entirely: stage 4 builds
        # its own bf16 store, so materializing (and first-touch-faulting)
        # a quantized one here would be pure waste
        dit_host, vace_host = build_host_dit(cfg, vcfg, qmode,
                                             alias=not args.full_store)

    lat = jax.random.normal(jax.random.PRNGKey(2), lat_shape, jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(3), ctx_shape, jnp.bfloat16)
    vctx = jax.random.normal(jax.random.PRNGKey(4),
                             (lat_shape[0], 96) + lat_shape[2:], jnp.bfloat16)
    ts = jnp.asarray([800.0], jnp.float32)

    streamer = v = step_lat = None
    if run_quant_denoise:
        if args.sage:
            # int8 capped-softmax attention alongside the quantized linears —
            # the reference's own quantized path prefers sageattention
            # (wan_video_dit.py:9-26), so this matches the recipe class.
            # Gated on the quantized stage actually running: a '--bf16-only
            # --sage' run must NOT measure the bf16 pass with int8 attention
            from video_styler_tpu.ops.attention import set_quantized_attention
            set_quantized_attention(True)
            out["quantized_attention"] = True
        streamer = WanBlockStreamer(
            dit_host, cfg, vace_host, vcfg, mode=qmode,
            resident_blocks=args.resident, prefetch_depth=args.prefetch,
            num_streams=args.streams, overlap=not args.serial)
        out[f"plan_{qmode}"] = streamer.plan_summary()
        _log(f"plan: {out[f'plan_{qmode}']}")

        t0 = time.perf_counter()
        v, _, _ = streamer.forward(lat, ts, ctx, vace_context=vctx)
        _sync(v)
        # warm the Euler-update graph too: it otherwise compiles inside the
        # timed loop at the first step boundary (a ~2 s hit on ONE pass —
        # every prior run shows exactly one 11.4 s outlier at step 1 branch 0)
        _sync((lat - 0.02 * v).astype(jnp.bfloat16))
        out[f"{qmode}_pass_compile_s"] = time.perf_counter() - t0
        _log(f"{qmode} warmup (compile) "
             f"{out[f'{qmode}_pass_compile_s']:.0f}s")
        _mem(out, f"{qmode}_after_warmup")
        save()

        pass_times = []
        step_lat = lat
        t_recipe0 = time.perf_counter()
        for step in range(args.steps):
            for branch in range(branch_passes):
                t0 = time.perf_counter()
                v, _, _ = streamer.forward(step_lat, ts, ctx,
                                           vace_context=vctx)
                _sync(v)
                pass_times.append(time.perf_counter() - t0)
                _log(f"step {step} branch {branch}: {pass_times[-1]:.1f}s")
            # Euler step (posi branch drives; timing-neutral)
            step_lat = (step_lat - 0.02 * v).astype(jnp.bfloat16)
        out[f"{qmode}_denoise_s"] = time.perf_counter() - t_recipe0
        out[f"{qmode}_pass_s"] = sorted(pass_times)[len(pass_times) // 2]
        out[f"{qmode}_pass_times"] = pass_times
        _mem(out, f"{qmode}_after_denoise")
        save()

    # ------------ stage 3b: measured streaming LoRA train step -----------
    # The Ditto recipe at 14B-block scale (train.sh: VACE LoRA r128,
    # 480x832x73): frozen quantized trunk re-run fwd+bwd, boundary
    # activations offloaded to host, grads only into the VACE LoRA.
    if args.train_step:
        if args.sage:
            # int8 attention is inference-only (round/clip have zero
            # gradients); the train step differentiates through the bf16
            # flash kernel's custom_vjp
            from video_styler_tpu.ops.attention import set_quantized_attention
            set_quantized_attention(False)
        from video_styler_tpu.trainers.lora_train import init_lora
        from video_styler_tpu.trainers.streaming_train import StreamingTrainer
        # training needs HBM for the per-block vjp residuals and (in the
        # default device-checkpoint mode) the boundary stash: release the
        # resident inference stack and re-stream every block from host —
        # the backward's whole design point (fwd+bwd each re-stream
        # ~180 MB/block, fully overlapped with ~1 s/block of compute)
        del streamer, v, step_lat
        gc.collect()
        train_resident = 0
        if args.train_shape == "small" and not args.tiny:
            # cheap per-bench regression probe (VERDICT r3 item 7): the REAL
            # 48-block int4 stack, HBM-resident (no transfer wall), at a
            # reduced token count — exercises the full streamed-backward
            # machinery (segmented walk, sub-remat vjp, activation ckpt) in
            # minutes instead of ~17
            lat = jax.random.normal(jax.random.PRNGKey(2),
                                    (1, 16, 3, 30, 52), jnp.bfloat16)
            vctx = jax.random.normal(jax.random.PRNGKey(4),
                                     (1, 96, 3, 30, 52), jnp.bfloat16)
            train_resident = 48
            out["train_shape"] = "small(1,16,3,30,52)+resident"
        streamer = WanBlockStreamer(
            dit_host, cfg, vace_host, vcfg, mode=qmode,
            resident_blocks=train_resident,
            prefetch_depth=min(args.prefetch, 2),
            num_streams=args.streams, overlap=not args.serial)
        lat1, ctx1, vctx1 = lat[:1], ctx[:1], vctx[:1]
        target = jax.random.normal(jax.random.PRNGKey(9), lat1.shape,
                                   jnp.bfloat16)
        # LoRA factor shapes come from the unquantized template (the host
        # store's leaves may be int8/int4-packed)
        from video_styler_tpu.models.wan_vace import init_vace
        vtpl = jax.eval_shape(
            lambda k: init_vace(k, vcfg, dtype=jnp.bfloat16),
            jax.random.PRNGKey(1))
        vace_lora = init_lora(jax.random.PRNGKey(10),
                              {"blocks": vtpl["blocks"]}, rank=128,
                              targets=("blocks.self_attn.q",
                                       "blocks.self_attn.k",
                                       "blocks.self_attn.v",
                                       "blocks.self_attn.o",
                                       "blocks.ffn.fc1",
                                       "blocks.ffn.fc2"),
                              dtype=jnp.bfloat16)
        # activation_ckpt="device" (sqrt checkpointing, zero D2H): the
        # host-offload mode measured 1118 s on this tunnel because its
        # 48 x 304 MB boundary readbacks ran at the link's ~15-20 MB/s
        # D2H rate; the boundary stash + sub-remat'd per-block vjp fit
        # HBM beside the streamed weights (~10-11 GB peak)
        trainer = StreamingTrainer(streamer, activation_ckpt=args.act_ckpt,
                                   segment=args.segment)
        out["train_act_ckpt"] = args.act_ckpt
        out["train_segment"] = args.segment
        t0 = time.perf_counter()
        loss, _, g = trainer.loss_and_grads(
            lat1, ts, ctx1, target, vace_context=vctx1, vace_lora=vace_lora)
        _sync(g["blocks.self_attn.q"]["A"])
        out["train_step_compile_s"] = time.perf_counter() - t0
        _log(f"train warmup (compile) {out['train_step_compile_s']:.0f}s")
        _mem(out, "train_after_warmup")
        t0 = time.perf_counter()
        loss, _, g = trainer.loss_and_grads(
            lat1, ts, ctx1, target, vace_context=vctx1, vace_lora=vace_lora)
        _sync(g["blocks.self_attn.q"]["A"])
        out["train_step_s"] = time.perf_counter() - t0
        out["train_loss"] = float(loss)
        _log(f"train step {out['train_step_s']:.1f}s "
             f"loss={out['train_loss']:.4f}")
        save()
        del trainer, vace_lora, g

    # the train stage deletes v/step_lat and rebuilds only the streamer, so
    # drop leftovers individually (a grouped `del a, b, c` raises mid-way on
    # the first unbound name, and the except clause then re-deletes a name
    # the partial del already removed — that crash lost the end-of-run
    # recipe composition once)
    streamer = v = step_lat = None
    gc.collect()

    # ---------------- stage 4: bf16 streamed pass ------------------------
    if not args.skip_bf16:
        if args.sage:
            # quantized attention is a quantized-recipe choice; the bf16
            # full-quality measurement always uses the bf16 flash kernel
            from video_styler_tpu.ops.attention import set_quantized_attention
            set_quantized_attention(False)
        del dit_host, vace_host
        gc.collect()
        dit_host, vace_host = build_host_dit(cfg, vcfg, "bf16",
                                             alias=not args.full_store)
        streamer = WanBlockStreamer(
            dit_host, cfg, vace_host, vcfg, mode="bf16",
            resident_blocks=args.resident_bf16, prefetch_depth=args.prefetch,
            num_streams=args.streams, overlap=not args.serial)
        out["plan_bf16"] = streamer.plan_summary()
        _log(f"bf16 plan: {out['plan_bf16']}")
        save()
        t0 = time.perf_counter()
        v, _, _ = streamer.forward(lat, ts, ctx, vace_context=vctx)
        _sync(v)
        # pre-warm the Euler-update graph (same reason as the quantized
        # stage: it otherwise compiles inside the first timed step)
        _sync((lat - 0.02 * v).astype(jnp.bfloat16))
        out["bf16_pass_compile_s"] = time.perf_counter() - t0
        _mem(out, "bf16_after_warmup")
        save()
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            v, _, _ = streamer.forward(lat, ts, ctx, vace_context=vctx)
            _sync(v)
            times.append(time.perf_counter() - t0)
            _log(f"bf16 pass {times[-1]:.1f}s")
        out["bf16_pass_s"] = min(times)
        save()

        if args.bf16_steps:
            # REAL multi-step bf16 denoise (the full-quality 50-step path,
            # wan_video_new.py:461-473 defaults): every step runs the CFG
            # branch passes through the streamed 48-block bf16 stack and a
            # real Euler update. This is a measurement, not a composition.
            step_lat = lat
            pass_times = []
            t_all = time.perf_counter()
            for step in range(args.bf16_steps):
                for branch in range(branch_passes):
                    t0 = time.perf_counter()
                    v, _, _ = streamer.forward(step_lat, ts, ctx,
                                               vace_context=vctx)
                    _sync(v)
                    pass_times.append(time.perf_counter() - t0)
                    _log(f"bf16 step {step} branch {branch}: "
                         f"{pass_times[-1]:.1f}s")
                step_lat = (step_lat - 0.02 * v).astype(jnp.bfloat16)
                out[f"bf16_{args.bf16_steps}step_partial_s"] = (
                    time.perf_counter() - t_all)
                out["bf16_steps_done"] = step + 1
                save()
            out[f"bf16_{args.bf16_steps}step_denoise_s_measured"] = (
                time.perf_counter() - t_all)
            out["bf16_step_pass_times"] = pass_times
            out["bf16_step_pass_s_median"] = sorted(
                pass_times)[len(pass_times) // 2]
            _mem(out, "bf16_after_steps")
            step_lat = None
            save()

        # ------------ stage 5: measured streaming LoRA train step --------
        # The Ditto recipe at 14B-block scale (train.sh: VACE LoRA r128,
        # 480x832x73): frozen bf16 trunk re-streamed fwd+bwd, boundary
        # activations offloaded to host, grads only into the VACE LoRA.
        if args.train_step:
            from video_styler_tpu.trainers.lora_train import init_lora
            from video_styler_tpu.trainers.streaming_train import \
                StreamingTrainer
            lat1 = lat[:1]
            ctx1 = ctx[:1]
            vctx1 = vctx[:1]
            target = jax.random.normal(jax.random.PRNGKey(9), lat1.shape,
                                       jnp.bfloat16)
            vace_lora = init_lora(jax.random.PRNGKey(10),
                                  {"blocks": vace_host["blocks"]}, rank=128,
                                  targets=("blocks.self_attn.q",
                                           "blocks.self_attn.k",
                                           "blocks.self_attn.v",
                                           "blocks.self_attn.o",
                                           "blocks.ffn.fc1",
                                           "blocks.ffn.fc2"),
                                  dtype=jnp.bfloat16)
            trainer = StreamingTrainer(streamer)
            t0 = time.perf_counter()
            loss, _, g = trainer.loss_and_grads(
                lat1, ts, ctx1, target, vace_context=vctx1,
                vace_lora=vace_lora)
            _sync(g["blocks.self_attn.q"]["A"])
            out["train_step_compile_s"] = time.perf_counter() - t0
            _log(f"train warmup (compile) {out['train_step_compile_s']:.0f}s")
            t0 = time.perf_counter()
            loss, _, g = trainer.loss_and_grads(
                lat1, ts, ctx1, target, vace_context=vctx1,
                vace_lora=vace_lora)
            _sync(g["blocks.self_attn.q"]["A"])
            out["train_step_s"] = time.perf_counter() - t0
            out["train_loss"] = float(loss)
            _log(f"train step {out['train_step_s']:.1f}s "
                 f"loss={out['train_loss']:.4f}")
            save()

        del streamer, v
        gc.collect()

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="int4", choices=["int4", "int8"],
                    help="int4 (w4a8, ~8.7 GB, fully HBM-resident: no "
                         "per-pass streaming) or int8 (17 GB, streamed)")
    ap.add_argument("--resident", type=int, default=None,
                    help="trunk blocks to keep on device (default: auto "
                         "from the HBM budget; int4 fits all)")
    ap.add_argument("--full-store", action="store_true",
                    help="materialize distinct weights for every block "
                         "(slow first-touch on this VM); default aliases "
                         "one block across layers, timing-identical")
    ap.add_argument("--resident-bf16", type=int, default=0)
    ap.add_argument("--prefetch", type=int, default=3)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--serial", action="store_true",
                    help="serial (gated) walk: alternate transfer and "
                         "compute instead of overlapping — the right mode "
                         "on links whose DMA starves under concurrent "
                         "execution (this tunnel: 1.5 GB/s idle vs "
                         "~45 MB/s overlapped)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1, choices=[1, 2],
                    help="1 = CFG branches as separate passes (default; "
                         "fits HBM beside the resident int4 stack); 2 = "
                         "merged posi+nega batch")
    ap.add_argument("--sage", action="store_true",
                    help="route the quantized denoise's attention through "
                         "the int8 capped-softmax kernel (the reference's "
                         "sageattention analog)")
    ap.add_argument("--train-step", action="store_true", default=True)
    ap.add_argument("--skip-train", dest="train_step", action="store_false")
    ap.add_argument("--train-only", action="store_true",
                    help="skip the T5/VAE/denoise stages; measure only the "
                         "streaming LoRA train step")
    ap.add_argument("--train-shape", default="full",
                    choices=["full", "small"],
                    help="small = reduced-token, int4-resident train-step "
                         "probe (the per-bench regression check; minutes "
                         "instead of the full ~17-min restream-bound step)")
    ap.add_argument("--act-ckpt", default="device",
                    choices=["auto", "device", "host"],
                    help="train-step boundary activations: keep every k-th "
                         "on device (sqrt ckpt, zero D2H — default) or "
                         "offload all to host RAM")
    ap.add_argument("--segment", type=int, default=8,
                    help="device-ckpt segment length k")
    # True tunnel bandwidth is ~20-40 MB/s (docs/PERF_NOTES_r3.md): a
    # 32 GB bf16 streamed pass is ~15-25 min, so it is opt-in now.
    ap.add_argument("--skip-bf16", action="store_true", default=True)
    ap.add_argument("--bf16-only", action="store_true",
                    help="skip T5/VAE/quantized-denoise/train; measure only "
                         "the streamed bf16 pass (stage 4)")
    ap.add_argument("--with-bf16", dest="skip_bf16", action="store_false")
    ap.add_argument("--bf16-steps", type=int, default=0,
                    help="run a REAL N-step bf16 denoise loop in stage 4 "
                         "(50 = the reference full-quality default; each "
                         "step runs the CFG branch passes + an Euler "
                         "update). 0 = just the single-pass measurement")
    ap.add_argument("--prior", default="docs/artifacts_m14b_r3.json",
                    help="prior measure JSON to source T5/VAE timings from "
                         "when this run skips those stages (--bf16-only), "
                         "so the end-to-end composition is still emitted")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default="/tmp/measure_14b.json")
    args = ap.parse_args()
    if args.bf16_only:
        args.skip_bf16 = False
        args.train_step = False

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    out = measure(args)
    if not args.tiny:
        # fixed-stage timings: this run's measurements, else a prior
        # committed measure JSON (--prior) so stage-skipping modes
        # (--bf16-only) still emit the end-to-end composition
        fixed = {k: out.get(k) for k in
                 ("t5_encode_ms", "vae_encode_ms", "vae_decode_ms")}
        if not all(v is not None for v in fixed.values()) and args.prior \
                and os.path.exists(args.prior):
            with open(args.prior) as f:
                prior = json.load(f)
            for k in fixed:
                if fixed[k] is None and k in prior:
                    fixed[k] = prior[k]
                    out[f"prior_{k}"] = prior[k]
            if all(v is not None for v in fixed.values()):
                out["fixed_stage_source"] = args.prior
        have_fixed = all(v is not None for v in fixed.values())

        def compose(denoise_s):
            # the Ditto VACE edit: T5 + the VACE encode (ONE batched
            # inactive/reactive pass when measured — build_vace_context,
            # pipelines/wan_video.py:364 — else 2x the batch-1 encode) +
            # denoise (includes both CFG branches regardless of --batch)
            # + decode
            enc_s = (out["vae_encode2_ms"] / 1e3 if "vae_encode2_ms" in out
                     else 2 * fixed["vae_encode_ms"] / 1e3)
            return (fixed["t5_encode_ms"] / 1e3 + enc_s
                    + denoise_s + fixed["vae_decode_ms"] / 1e3)

        if f"{args.mode}_denoise_s" in out and have_fixed:
            out["recipe_video_s_measured"] = compose(
                out[f"{args.mode}_denoise_s"])
        key = f"bf16_{args.bf16_steps}step_denoise_s_measured"
        if key in out and have_fixed and args.bf16_steps:
            out[f"bf16_{args.bf16_steps}step_video_s_measured"] = compose(
                out[key])
        if "bf16_pass_s" in out:
            # full-quality 50-step CFG: 2 branches/step unless merged
            passes = 50 * max(1, 2 // args.batch)
            out["bf16_50step_denoise_s_composed"] = passes * out["bf16_pass_s"]
            if have_fixed:
                out["bf16_50step_video_s_composed_from_measured_pass"] = \
                    compose(passes * out["bf16_pass_s"])
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
