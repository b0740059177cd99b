"""Benchmark: the Ditto north-star (14B VACE edit, 480x832x73) on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

BASELINE.md's tracked metric is sec/video for the Wan2.1-VACE-14B instruction
edit at 832x480x73 (the reference quotes ~4 min on one A6000 for the
fp8-quantized + CausVid-distilled ComfyUI path; the full-quality bf16 path is
far slower).

Round 3: the headline is MEASURED, not projected. Stage A runs
tools/measure_14b.py — the real 48-block 14B+VACE model executes on the one
v5e via host block streaming (models/wan_streaming.py, the vram_management
capability), and the recipe (umT5 encode + 2x VAE encode + 4 int8 denoise
steps at merged-CFG batch 2 + VAE decode) is timed end-to-end in a single
process. A measured bf16 pass grounds the 50-step full-quality composition,
and a measured streaming LoRA train step covers the training side. Stage B
re-measures the 1.3B VACE branch for cross-round continuity. If stage A
yields nothing (timeout on a cold compile cache), the round-2
composed-projection stages run as a clearly-labeled fallback.

value / vs_baseline: measured sec/video for the baseline's own recipe class
on ONE v5e vs its 240 s A6000 figure.
"""
import gc
import json
import sys
import time


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _sync(x):
    """Force materialization; block_until_ready does not synchronize through
    the axon tunnel."""
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, n=3):
    import time
    out = fn()
    _sync(out)  # warm-up/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def bench_dit_block_14b(seq_tokens: int):
    """Measured ms per 14B-dimension DiT block at the edit sequence length."""
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models.wan_dit import (
        WanDiTConfig, init_wan_dit, wan_dit_forward)

    n_layers = 4  # ~1 GB bf16; measured cost scales linearly in layers
    cfg = WanDiTConfig(dim=5120, in_dim=16, ffn_dim=13824, out_dim=16,
                       num_heads=40, num_layers=n_layers)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # 73f 480x832 -> latent (1, 16, 19, 60, 104) -> seq 19*30*52 = 29,640
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 19, 60, 104), jnp.bfloat16)
    ts = jnp.asarray([800.0], jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 512, cfg.text_dim), jnp.bfloat16)
    fwd = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c))
    total_ms = _time(lambda: fwd(params, lat, ts, ctx))
    # embed/patchify/head overhead is measured inside total; attribute it by
    # measuring a 1-layer config too and solving block_ms from the difference
    cfg1 = WanDiTConfig(dim=5120, in_dim=16, ffn_dim=13824, out_dim=16,
                        num_heads=40, num_layers=1)
    params1 = jax.tree_util.tree_map(
        lambda x: x, init_wan_dit(jax.random.PRNGKey(0), cfg1, dtype=jnp.bfloat16))
    fwd1 = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg1, x, t, c))
    one_ms = _time(lambda: fwd1(params1, lat, ts, ctx))
    block_ms = (total_ms - one_ms) / (n_layers - 1)
    overhead_ms = max(one_ms - block_ms, 0.0)

    # int8-quantized block (the baseline's fp8 trick, TPU-style): same
    # solve with quantized linears
    from video_styler_tpu.ops.quant import quantize_params

    def pred(path, leaf):
        return not any(k in path for k in ("head", "modulation",
                                           "time_embedding"))
    qp = quantize_params(params, predicate=pred)
    qp1 = quantize_params(params1, predicate=pred)
    q_total_ms = _time(lambda: fwd(qp, lat, ts, ctx))
    q_one_ms = _time(lambda: fwd1(qp1, lat, ts, ctx))
    q_block_ms = (q_total_ms - q_one_ms) / (n_layers - 1)

    # int8 linears + SageAttention-style int8 attention (the reference
    # chain's sageattention backend) — fresh jits so the flag is traced
    from video_styler_tpu.ops.attention import set_quantized_attention
    set_quantized_attention(True)
    fwd_s = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c))
    fwd1_s = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg1, x, t, c))
    s_total_ms = _time(lambda: fwd_s(qp, lat, ts, ctx))
    s_one_ms = _time(lambda: fwd1_s(qp1, lat, ts, ctx))
    sage_block_ms = (s_total_ms - s_one_ms) / (n_layers - 1)
    set_quantized_attention(False)

    del params, params1, qp, qp1
    gc.collect()
    return block_ms, overhead_ms, total_ms, q_block_ms, sage_block_ms


def bench_t5():
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models.t5 import UMT5_XXL, init_t5, t5_encode

    cfg = UMT5_XXL
    params = init_t5(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    ids = jnp.zeros((1, 512), jnp.int32)
    mask = jnp.ones((1, 512), jnp.int32)
    fwd = jax.jit(lambda p, i, m: t5_encode(p, cfg, i, m))
    ms = _time(lambda: fwd(params, ids, mask))
    del params
    gc.collect()
    return ms


def bench_vae():
    """Full-size Wan2.1 VAE encode+decode at 480x832x73 via the streaming
    (temporal-chunked, cache-carried) path — exact vs full-sequence, no
    spatial tile-overlap recompute (V.encode/decode route tiled=True to it).

    First pass compiles (shape-specialized conv graphs are expensive to build
    on the single host core); the reported numbers are the steady-state
    second pass, which is what repeated production use pays."""
    import jax
    import jax.numpy as jnp
    import video_styler_tpu.models.wan_vae as V

    cfg = V.WAN21_VAE
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        V.init_wan_vae(jax.random.PRNGKey(0), cfg))
    video = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 73, 480, 832), jnp.bfloat16)

    enc_ms = dec_ms = compile_enc_ms = compile_dec_ms = 0.0
    for it in range(2):
        t0 = time.perf_counter()
        lat = V.encode(params, video, cfg, tiled=True)
        _sync(lat)
        enc_ms = (time.perf_counter() - t0) * 1e3
        if it == 0:
            compile_enc_ms = enc_ms
        t0 = time.perf_counter()
        out = V.decode(params, lat.astype(jnp.bfloat16), cfg, tiled=True)
        _sync(out)
        dec_ms = (time.perf_counter() - t0) * 1e3
        if it == 0:
            compile_dec_ms = dec_ms
        _log(f"vae pass {it}: enc={enc_ms:.0f}ms dec={dec_ms:.0f}ms")
    del params, video, lat, out
    gc.collect()
    return enc_ms, dec_ms, compile_enc_ms, compile_dec_ms


def bench_wan13b_step():
    """Measured 1.3B+VACE denoise step at full 480x832x73 (both CFG branches,
    the infer_ditto hot loop). VAE/T5 costs are measured in their own stages
    — running everything in one process OOMs 16 GB HBM (tiled-VAE
    activations + DiT params), so the e2e projection composes the pieces."""
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models.wan_dit import (WAN_T2V_1_3B, init_wan_dit,
                                                 wan_dit_forward)
    from video_styler_tpu.models.wan_vace import VACE_1_3B, init_vace

    cfg = WAN_T2V_1_3B
    vcfg = VACE_1_3B
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    vace_params = init_vace(jax.random.PRNGKey(1), vcfg, dtype=jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 19, 60, 104), jnp.bfloat16)
    vctx = jax.random.normal(jax.random.PRNGKey(3), (1, 96, 19, 60, 104), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 512, cfg.text_dim), jnp.bfloat16)
    ts = jnp.asarray([800.0], jnp.float32)

    fwd = jax.jit(lambda p, vp, x, t, c, vc: wan_dit_forward(
        p, cfg, x, t, c, vace_params=vp, vace_cfg=vcfg, vace_context=vc))
    branch_ms = _time(lambda: fwd(params, vace_params, lat, ts, ctx, vctx), n=4)

    # REAL bf16 full-quality 50-step denoise, measured end-to-end (the
    # reference's full-quality defaults: 50 steps, CFG -> 2 DiT passes/step,
    # wan_video_new.py:461-473) at the scale that fits one v5e HBM resident
    # in bf16 — the 1.3B+VACE Ditto edit shape. The 14B bf16 number is
    # composed from its measured streamed pass (see main_measured).
    denoise_50_s = None
    if int(__import__("os").environ.get("BENCH_13B_50STEP", "1")):
        import numpy as np
        from video_styler_tpu.schedulers.flow_match import FlowMatchScheduler
        sched = FlowMatchScheduler(shift=5.0, sigma_min=0.0,
                                   extra_one_step=True)
        sched.set_timesteps(50, shift=5.0)
        step_lat = lat
        t0 = time.perf_counter()
        for t in sched.timesteps:
            tj = jnp.asarray([float(t)], jnp.float32)
            v_posi = fwd(params, vace_params, step_lat, tj, ctx, vctx)
            v_nega = fwd(params, vace_params, step_lat, tj, ctx, vctx)
            v = v_nega + 5.0 * (v_posi - v_nega)  # cfg_scale 5 (reference)
            step_lat = jnp.asarray(
                sched.step(np.asarray(v, np.float32), float(t),
                           np.asarray(step_lat, np.float32)), jnp.bfloat16)
        _sync(step_lat)
        denoise_50_s = time.perf_counter() - t0

    del params, vace_params
    gc.collect()
    return branch_ms, denoise_50_s


def _artifact_value(key):
    """Read one value from the committed measured artifacts (newest round
    first); None if absent."""
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("artifacts_m14b_r4.json", "artifacts_m14b_r3.json"):
        try:
            with open(os.path.join(here, "docs", name)) as f:
                v = json.load(f).get(key)
            if v is not None:
                return v
        except Exception:
            continue
    return None


def bench_measured_14b():
    """The MEASURED 14B path: run tools/measure_14b.py in a subprocess (its
    own TPU client; builds the real 48-block model via host block streaming
    and measures umT5 + 2x VAE encode + 4 int8 denoise steps + decode
    end-to-end in one process, plus a bf16 pass and a streaming LoRA train
    step). Returns its (incrementally-written) JSON — partial on timeout."""
    import json
    import os
    import subprocess
    out_path = "/tmp/bench_14b.json"
    if os.path.exists(out_path):
        os.remove(out_path)
    timeout = int(os.environ.get("BENCH_14B_TIMEOUT", "5400"))
    # --skip-train: the streaming LoRA train step is ~17 min on this
    # tunnel-attached host (compile 687 s + step 329 s with device-ckpt,
    # H2D weight-restream-bound) and is already a committed measured
    # artifact (docs/artifacts_m14b_r3.json); the bench re-measures the
    # inference recipe fresh and carries the train number over with
    # provenance.
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "measure_14b.py"),
           "--steps", "4", "--skip-train", "--out", out_path]
    _log(f"stage A: measured 14B streamed run (subprocess, "
         f"timeout {timeout}s, log /tmp/measure_14b.log)")
    try:
        with open("/tmp/measure_14b.log", "w") as logf:
            proc = subprocess.run(cmd, timeout=timeout, stdout=logf,
                                  stderr=subprocess.STDOUT, text=True)
        if proc.returncode != 0:
            with open("/tmp/measure_14b.log") as logf:
                tail = logf.read()[-500:]
            _log(f"measured run rc={proc.returncode}: {tail}")
    except subprocess.TimeoutExpired:
        _log("measured run timed out; using partial results")
    if os.path.exists(out_path):
        with open(out_path) as f:
            return json.load(f)
    return {}


def main():
    import os

    # Stage A BEFORE any jax/TPU use in this process: the axon tunnel
    # serves one client at a time.
    measured = {}
    if os.environ.get("BENCH_SKIP_MEASURED") != "1":
        measured = bench_measured_14b()
    # Compose the recipe total parent-side when the subprocess was cut off
    # after the denoise stage but before its own end-of-run composition
    # (e.g. the train-step compile ran into the timeout): every component is
    # already in the incrementally-written JSON.
    if not measured.get("recipe_video_s_measured"):
        denoise = next((measured[k] for k in
                        ("int4_denoise_s", "int8_denoise_s", "bf16_denoise_s")
                        if k in measured), None)
        if denoise and all(k in measured for k in
                           ("t5_encode_ms", "vae_encode_ms", "vae_decode_ms")):
            enc_s = (measured["vae_encode2_ms"] / 1e3
                     if "vae_encode2_ms" in measured
                     else 2 * measured["vae_encode_ms"] / 1e3)
            measured["recipe_video_s_measured"] = (
                measured["t5_encode_ms"] / 1e3 + enc_s
                + denoise + measured["vae_decode_ms"] / 1e3)

    # stage A2: cheap streamed-train regression probe (VERDICT r3 item 7) —
    # one REAL 48-block int4-resident streamed backward at a reduced token
    # count, minutes not 17, so trainers/streaming_train.py regressions
    # surface in every BENCH instead of being carried forever.
    if os.environ.get("BENCH_SKIP_TRAIN_PROBE") != "1" and measured:
        import subprocess
        tp = "/tmp/bench_train_small.json"
        if os.path.exists(tp):
            os.remove(tp)
        cmd = [sys.executable,
               os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", "measure_14b.py"),
               "--train-only", "--train-shape", "small", "--out", tp]
        _log("stage A2: train-step regression probe (subprocess, "
             "timeout 2400s)")
        try:
            with open("/tmp/measure_train_small.log", "w") as logf:
                subprocess.run(cmd, timeout=2400, stdout=logf,
                               stderr=subprocess.STDOUT, text=True)
            if os.path.exists(tp):
                with open(tp) as f:
                    t = json.load(f)
                for k in ("train_step_s", "train_step_compile_s",
                          "train_loss", "train_shape"):
                    if k in t:
                        measured[f"train_probe_{k}"] = t[k]
                prior = _artifact_value("train_probe_step_s")
                if prior and t.get("train_step_s"):
                    drift = t["train_step_s"] / prior - 1.0
                    measured["train_probe_drift_vs_artifact"] = round(drift, 3)
        except subprocess.TimeoutExpired:
            _log("train probe timed out; skipping")

    import jax
    # persistent compilation cache: the expensive shape-specialized VAE/DiT
    # graphs compile once per machine, not once per process
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    device = str(jax.devices()[0])
    extra = {"device": device}

    if measured.get("recipe_video_s_measured"):
        return main_measured(measured, extra)
    _log("measured 14B results unavailable — falling back to the "
         "composed-projection stages")
    return main_projected()


def main_measured(m, extra):
    """Headline from the MEASURED streamed 14B run (round-3: kills the
    round-2 projection asterisk)."""
    import jax

    extra["measured"] = True
    extra["ditto14b_measured"] = m
    recipe_s = m["recipe_video_s_measured"]

    # carry the measured streaming-LoRA train step over from the committed
    # artifact (bench runs measure_14b with --skip-train; see the note in
    # bench_measured_14b)
    if "train_step_s" not in m:
        try:
            import os
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "docs", "artifacts_m14b_r3.json")) as f:
                art = json.load(f)
            for k in ("train_step_s", "train_step_compile_s", "train_loss"):
                if k in art:
                    extra[f"prior_measured_{k}"] = art[k]
            extra["prior_measured_train_note"] = (
                "streaming LoRA train step measured on this chip in a "
                "prior committed run (docs/artifacts_m14b_r3.json, "
                "device-resident sqrt activation ckpt); skipped at bench "
                "time (~17 min, weight-restream-bound on this tunnel)")
        except Exception:
            pass

    _log("stage B: 1.3B+VACE measured branch + REAL bf16 50-step denoise")
    try:
        branch13_ms, denoise50_s = bench_wan13b_step()
        extra["wan13b_vace_branch_ms"] = round(branch13_ms, 1)
        if denoise50_s:
            extra["wan13b_bf16_50step_denoise_s_measured"] = round(
                denoise50_s, 1)
            if all(k in m for k in ("t5_encode_ms", "vae_encode_ms",
                                    "vae_decode_ms")):
                enc_s = (m["vae_encode2_ms"] / 1e3 if "vae_encode2_ms" in m
                         else 2 * m["vae_encode_ms"] / 1e3)
                extra["wan13b_bf16_50step_video_s_measured"] = round(
                    denoise50_s + m["t5_encode_ms"] / 1e3 * 2 + enc_s
                    + m["vae_decode_ms"] / 1e3, 1)
                extra["wan13b_bf16_note"] = (
                    "REAL measured bf16 full-quality 50-step CFG denoise "
                    "(100 DiT passes + Euler, reference defaults "
                    "wan_video_new.py:461-473) at the 1.3B+VACE Ditto edit "
                    "shape on one v5e; VAE/T5 stages measured in stage A "
                    "(14B shares them). The 14B bf16 50-step number is "
                    "composed from its measured streamed pass.")
    except Exception as e:  # keep the headline robust
        _log(f"1.3B stage failed: {e}")

    # v5p-8 projection (clearly labeled; the measured bf16 pass on this
    # chip is TRANSFER-bound — a pod keeps params resident, so scale the
    # measured compute-bound quantized pass instead, conservative)
    pass_s = next((m[k] for k in ("int4_pass_s", "int8_pass_s")
                   if m.get(k)), None)
    if pass_s:
        v5p_scale = (459.0 / 197.0) * 8.0
        branches = m.get("branches_per_pass", 1)  # CFG branches per pass
        denoise_v5p8 = 50 * (2 // branches) * pass_s / v5p_scale
        vae_t5 = (2 * m["vae_encode_ms"] + m["vae_decode_ms"]
                  + 2 * m["t5_encode_ms"]) / 1e3
        extra["ditto14b_projected_video_s_v5p8"] = round(
            denoise_v5p8 + vae_t5, 1)
    # bf16 full-quality grounding: prefer a bf16 pass measured in THIS run,
    # else carry the committed measured one (bench runs with --skip-bf16 to
    # stay inside the round-end budget; the artifact run used --serial so the
    # streamed pass sees idle-link bandwidth)
    bf16_pass = m.get("bf16_pass_s")
    if not bf16_pass:
        bf16_pass = (extra.get("prior_measured_bf16_pass_s")
                     or _artifact_value("bf16_pass_s"))
        if bf16_pass:
            extra["prior_measured_bf16_pass_s"] = bf16_pass
    if bf16_pass:
        branches = m.get("branches_per_pass", 1)
        vae_t5 = (2 * m["vae_encode_ms"] + m["vae_decode_ms"]
                  + 2 * m["t5_encode_ms"]) / 1e3
        extra["ditto14b_bf16_50step_video_s_composed_from_measured_pass"] = \
            round(50 * (2 // branches) * bf16_pass + vae_t5, 1)
        extra["bf16_pass_note"] = (
            "the measured streamed bf16 pass on THIS harness is ~98% "
            "tunnel transfer (24.3 GB/pass at ~20 MB/s effective); the "
            "composed on-tunnel 50-step number reflects the harness link, "
            "not the architecture — see the PCIe-host composition")
        # production single-host composition: same measured per-block bf16
        # compute (262.4 ms x 48, docs/PERF_NOTES_r3.md), streamed transfer
        # hidden when link >= streamed_bytes/compute ~ 2 GB/s; PCIe gen4
        # hosts are 16-64 GB/s, so the pass is compute-bound.
        pcie_pass_s = max(48 * 0.2624, 24.314 / 16.0)
        extra["ditto14b_bf16_50step_video_s_composed_pcie_host"] = round(
            50 * (2 // branches) * pcie_pass_s + vae_t5, 1)
        extra["bf16_pcie_arithmetic"] = {
            "v5e_block_ms_measured": 262.4,
            "blocks": 48,
            "pass_compute_s": round(48 * 0.2624, 2),
            "streamed_gb_per_pass": 24.3,
            "pcie_gbps_assumed": 16,
            "note": "overlapped streaming: transfer 1.5 s hides under "
                    "12.6 s compute; measured on-chip overlap behavior "
                    "(trainers walk) confirms transfers hide when compute "
                    "dominates",
        }

    # v5p-8 bf16 full-quality projection, arithmetic spelled out
    # (BASELINE.md north star). Anchors: the MEASURED v5e bf16 DiT block
    # (262.4 ms at 29,640 tokens, docs/PERF_NOTES_r3.md — calibrated
    # wall-clock on this chip), 48 blocks/pass, 100 passes (50 steps x 2 CFG
    # branches). On a v5p-8 the 28 GB bf16 stack is HBM-resident sharded
    # (3.5 GB/chip) — no streaming — and the sequence shards 8-way over ICI
    # (Ulysses/GSPMD, parallel/): per-chip peak 459 bf16 TF/s vs v5e 197.
    # 0.85 = sequence-parallel efficiency margin for the all_to_alls.
    block_ms_bf16 = 262.4
    v5e_pass_compute_s = 48 * block_ms_bf16 / 1e3
    v5p8_pass_s = v5e_pass_compute_s * (197.0 / 459.0) / 8.0 / 0.85
    vae_t5_s = (2 * m["vae_encode_ms"] + m["vae_decode_ms"]
                + 2 * m["t5_encode_ms"]) / 1e3 if all(
        k in m for k in ("vae_encode_ms", "vae_decode_ms", "t5_encode_ms")) \
        else 0.0
    extra["ditto14b_bf16_50step_video_s_projected_v5p8"] = round(
        100 * v5p8_pass_s + vae_t5_s, 1)
    extra["bf16_v5p8_projection_arithmetic"] = {
        "v5e_block_ms_measured": block_ms_bf16,
        "blocks_per_pass": 48,
        "passes": "50 steps x 2 CFG branches = 100",
        "chip_ratio_v5e_over_v5p": round(197.0 / 459.0, 3),
        "sp_degree": 8,
        "sp_efficiency": 0.85,
        "v5p8_pass_s": round(v5p8_pass_s, 3),
        "vae_t5_fixed_s_at_v5e_speed": round(vae_t5_s, 1),
        "note": ("bf16 weights fully HBM-resident sharded on the pod "
                 "(28 GB / 8 chips); VAE+T5 conservatively at single-chip "
                 "v5e speed"),
    }
    mode = next((k[:-len("_denoise_s")] for k in
                 ("int4_denoise_s", "int8_denoise_s", "bf16_denoise_s")
                 if k in m), "int4")
    branches = ("merged-CFG batch 2" if m.get("branches_per_pass", 1) == 2
                else "2 passes/step (one per CFG branch)")
    resident = (m.get(f"plan_{mode}", {}) or {}).get("streamed_gb_per_pass")
    xfer = ("fully HBM-resident quantized stack" if resident == 0.0 else
            "host block streaming")
    extra["recipe_note"] = (
        f"MEASURED end-to-end on one v5e: the real 48-block {mode} 14B+VACE "
        f"({xfer}; the baseline ComfyUI recipe class: quantized 14B + "
        f"distill LoRA, 4 steps, {branches}), umT5 + 2x VAE encode + "
        "4 denoise steps + decode in one process. Host link here is a "
        "~1.3 GB/s tunnel; a production host (PCIe) hides streaming-mode "
        "transfers entirely.")
    extra["baseline_note"] = (
        "240 s = A6000 ComfyUI fp8+CausVid-distill path (README.md:78)")
    if m.get("int4_pass_compile_s"):
        extra["compile_amortization_note"] = (
            f"first-video cost on a fresh process adds "
            f"{m['int4_pass_compile_s']:.0f}s of XLA compile+warmup; the "
            "persistent compile cache (/root/.cache/jax_comp_cache) "
            "amortizes it across processes (measured: train-probe compile "
            "489s cold -> 274s warm), so the steady-state per-video number "
            "is the headline")

    result = {
        "metric": "ditto_vace14b_recipe_video_s_1xv5e",
        "value": round(recipe_s, 1),
        "unit": "s",
        "vs_baseline": round(240.0 / recipe_s, 3),
        "extra": extra,
    }
    print(json.dumps(result))
    return result


def main_projected():
    import jax
    device = str(jax.devices()[0])
    extra = {"device": device, "measured": False}

    seq = 19 * 30 * 52  # 29,640 tokens (73f 480x832 after (1,2,2) patchify)
    _log("stage 1/4: 14B-dim DiT block (bf16 + int8)")
    (block_ms, overhead_ms, meas4_ms, q_block_ms,
     sage_block_ms) = bench_dit_block_14b(seq)
    _log(f"block_ms={block_ms:.1f} int8_block_ms={q_block_ms:.1f} "
         f"int8+sage_block_ms={sage_block_ms:.1f}")
    extra["dit14b_block_ms"] = round(block_ms, 2)
    extra["dit14b_block_ms_int8"] = round(q_block_ms, 2)
    extra["dit14b_block_ms_int8_sage"] = round(sage_block_ms, 2)
    extra["dit14b_embed_head_overhead_ms"] = round(overhead_ms, 2)

    _log("stage 2/4: umT5-xxl encode")
    t5_ms = bench_t5()
    _log(f"t5_ms={t5_ms:.1f}")
    extra["umt5xxl_encode_ms"] = round(t5_ms, 1)

    _log("stage 3/4: VAE streaming encode/decode 480p73f")
    vae_enc_ms, vae_dec_ms, c_enc, c_dec = bench_vae()
    _log(f"vae steady enc={vae_enc_ms:.0f}ms dec={vae_dec_ms:.0f}ms")
    extra["vae_encode_ms_480p73f"] = round(vae_enc_ms, 1)
    extra["vae_decode_ms_480p73f"] = round(vae_dec_ms, 1)
    extra["vae_first_run_compile_ms"] = [round(c_enc), round(c_dec)]

    _log("stage 4/4: 1.3B+VACE denoise branch at 480x832x73")
    import os as _os
    _os.environ.setdefault("BENCH_13B_50STEP", "0")  # projected mode: skip
    branch13_ms, _ = bench_wan13b_step()
    _log(f"1.3B branch_ms={branch13_ms:.0f}")
    extra["wan13b_vace_branch_ms"] = round(branch13_ms, 1)
    wan13b_video_s = (50 * 2 * branch13_ms
                      + 2 * vae_enc_ms + vae_dec_ms + 2 * t5_ms) / 1e3
    extra["wan13b_vace_composed_video_s"] = round(wan13b_video_s, 1)
    extra["wan13b_vs_baseline_note"] = (
        "1.3B-vs-14B ratio is NOT like-for-like; headline uses the 14B projection")

    # 14B VACE edit projection on this one chip: 50 steps x 2 CFG branches x
    # (40 trunk + 8 VACE blocks of the measured 14B dimension + embed/head),
    # plus measured VAE (2 encodes for vace inactive/reactive + 1 decode) and
    # 2 T5 encodes. LoRA is merged (zero runtime cost).
    step_branch_s = ((40 + 8) * block_ms + overhead_ms) / 1e3
    denoise_s = 50 * 2 * step_branch_s
    video_s = denoise_s + (2 * vae_enc_ms + vae_dec_ms + 2 * t5_ms) / 1e3
    extra["ditto14b_projected_denoise_s_v5e"] = round(denoise_s, 1)

    # int8 projection — like-for-like with the fp8 baseline path
    q_denoise_s = 50 * 2 * ((40 + 8) * q_block_ms + overhead_ms) / 1e3
    q_video_s = q_denoise_s + (2 * vae_enc_ms + vae_dec_ms + 2 * t5_ms) / 1e3
    extra["ditto14b_projected_video_s_1xv5e_int8"] = round(q_video_s, 1)

    # THE like-for-like recipe: the baseline's 240 s A6000 figure is the
    # ComfyUI workflow (reference ditto_comfyui_workflow.json:
    # Wan2_1-T2V-14B_fp8_e4m3fn + CausVid rank-32 distill LoRA,
    # WanVideoSampler steps=4 cfg=1.2 unipc). Our framework runs the same
    # recipe (LoRA merge is free, FlowUniPC supported, int8 is the TPU
    # analog of fp8): 4 steps x 2 CFG branches of the int8 14B+VACE stack.
    recipe_denoise_s = 4 * 2 * ((40 + 8) * q_block_ms + overhead_ms) / 1e3
    recipe_video_s = recipe_denoise_s + (2 * vae_enc_ms + vae_dec_ms
                                         + 2 * t5_ms) / 1e3
    extra["ditto14b_recipe_video_s_1xv5e_int8_4step"] = round(recipe_video_s, 1)
    sage_denoise_s = 4 * 2 * ((40 + 8) * sage_block_ms + overhead_ms) / 1e3
    extra["ditto14b_recipe_video_s_1xv5e_int8_sage_4step"] = round(
        sage_denoise_s + (2 * vae_enc_ms + vae_dec_ms + 2 * t5_ms) / 1e3, 1)
    extra["recipe_note"] = (
        "recipe = baseline ComfyUI config (quantized 14B + CausVid distill "
        "LoRA, 4 steps, cfg 1.2): int8 14B+VACE, 4 steps x 2 branches + "
        "measured VAE/T5")

    # v5p-8 target projection (BASELINE.md north-star hardware): 8 chips,
    # v5p ~459 bf16 TF/s vs v5e ~197; sequence-parallel denoise scales the
    # block time, VAE/T5 conservatively kept at single-chip v5e speed.
    v5p_scale = (459.0 / 197.0) * 8.0
    video_s_v5p8 = denoise_s / v5p_scale + (2 * vae_enc_ms + vae_dec_ms + 2 * t5_ms) / 1e3
    extra["ditto14b_projected_video_s_v5p8"] = round(video_s_v5p8, 1)
    extra["baseline_note"] = (
        "240 s = A6000 ComfyUI fp8+CausVid-distill path; ours is bf16 "
        "full-quality 50-step CFG")

    # headline: the recipe-parity number (same model+LoRA+steps+quantization
    # class as the 240 s baseline, measured/composed on ONE v5e). The bf16
    # full-quality 50-step projection stays in extra, clearly labeled.
    extra["ditto14b_projected_video_s_1xv5e_bf16_50step"] = round(video_s, 1)
    result = {
        "metric": "ditto_vace14b_recipe_video_s_1xv5e",
        "value": round(recipe_video_s, 1),
        "unit": "s",
        "vs_baseline": round(240.0 / recipe_video_s, 3),
        "extra": extra,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
