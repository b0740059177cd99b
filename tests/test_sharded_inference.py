"""Multi-device inference: the pipeline's jitted model under a dp/fsdp/sp
mesh with the GSPMD sharding context, on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit, wan_dit_forward
from video_styler_tpu.parallel import (
    make_mesh, ShardingContext, use_sharding, shard_params_fsdp,
    ulysses_attention,
)
from video_styler_tpu.ops.attention import sdpa


# heads divisible by sp=2, head_dim 48
CFG = WanDiTConfig(dim=4 * 48, in_dim=16, ffn_dim=384, out_dim=16,
                   num_heads=4, num_layers=2, text_dim=64, freq_dim=32)


def test_sharded_forward_matches_single_device():
    params = init_wan_dit(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 4, 8, 8))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64))

    ref = wan_dit_forward(params, CFG, x, t, ctx)

    mesh = make_mesh(dp=1, fsdp=2, sp=4)
    sharded_params = shard_params_fsdp(params, mesh)
    with use_sharding(ShardingContext(mesh)):
        fwd = jax.jit(lambda p, x, t, c: wan_dit_forward(p, CFG, x, t, c))
        out = fwd(sharded_params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_sharded_forward_ragged_seq_pads_and_matches():
    """pad->shard->unpad (the reference's chunk+pad before rank slicing,
    xdit_context_parallel.py:76-80): a token count NOT divisible by sp must
    still shard — no constrain-drop warning — and match the single-device
    output exactly, because padded keys are masked per layer (kv_valid)."""
    import warnings

    params = init_wan_dit(jax.random.PRNGKey(0), CFG)
    # f=3, h=5, w=3 -> 45 tokens: not divisible by sp=4 (pads to 48)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 10, 6))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64))

    ref = wan_dit_forward(params, CFG, x, t, ctx)

    mesh = make_mesh(dp=1, fsdp=2, sp=4)
    sharded_params = shard_params_fsdp(params, mesh)
    with use_sharding(ShardingContext(mesh)):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            fwd = jax.jit(lambda p, x, t, c: wan_dit_forward(p, CFG, x, t, c))
            out = fwd(sharded_params, x, t, ctx)
            out.block_until_ready()
    dropped = [str(m.message) for m in w if "dropping the sharding" in str(m.message)]
    assert not dropped, f"seq axis serialized: {dropped}"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_sharded_vace_ragged_seq_matches():
    """Same ragged-shape guarantee through the VACE hint branch."""
    from video_styler_tpu.models.wan_vace import VaceConfig, init_vace

    vcfg = VaceConfig(vace_layers=(0, 1), dim=CFG.dim, num_heads=4,
                      ffn_dim=384)
    params = init_wan_dit(jax.random.PRNGKey(0), CFG)
    vace_params = init_vace(jax.random.PRNGKey(5), vcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 10, 6))
    vctx = jax.random.normal(jax.random.PRNGKey(3), (1, 96, 3, 10, 6))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64))

    ref = wan_dit_forward(params, CFG, x, t, ctx, vace_params=vace_params,
                          vace_cfg=vcfg, vace_context=vctx)
    mesh = make_mesh(dp=1, fsdp=2, sp=4)
    with use_sharding(ShardingContext(mesh)):
        fwd = jax.jit(lambda p, vp, x, t, c, vc: wan_dit_forward(
            p, CFG, x, t, c, vace_params=vp, vace_cfg=vcfg, vace_context=vc))
        out = fwd(shard_params_fsdp(params, mesh),
                  shard_params_fsdp(vace_params, mesh), x, t, ctx, vctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_ulysses_attention_matches_sdpa():
    mesh = make_mesh(dp=1, fsdp=1, sp=4)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 4, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 4, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 4, 16))
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(ulysses_attention(q, k, v, mesh, axis="sp"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pipeline_denoise_under_sharding():
    """Tiny end-to-end denoise with params FSDP-sharded over the mesh."""
    from test_pipeline import _tiny_pipe
    try:
        pipe = _tiny_pipe(with_vace=False)
    except Exception:
        pytest.skip("tiny pipe needs reference VAE")
    mesh = make_mesh(dp=1, fsdp=2, sp=2)
    pipe.dit_params = shard_params_fsdp(pipe.dit_params, mesh)
    with use_sharding(ShardingContext(mesh)):
        lat = pipe("a cat", num_frames=5, height=32, width=32, seed=7,
                   num_inference_steps=2, cfg_scale=1.0, tiled=False,
                   return_latents=True)
    assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())


def test_editor_sharded_matches_single_device():
    """The Ditto editor (coupled noise + rope_indices + velocity correction)
    under the dp/fsdp/sp mesh matches its single-device output — the joint
    [main|edit] token count is ragged, so this also exercises pad->shard->
    unpad through rope_indices."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import _tiny_pipe, _frames
    from video_styler_tpu.pipelines import WanVideoEditorPipeline
    from ref_loader import ref_available
    if not ref_available():
        pytest.skip("reference not mounted")

    kw = dict(source_video=_frames(5), edited_keyframes=_frames(2, seed=1),
              keyframe_indices=[0, 4], seed=5, height=32, width=32,
              num_frames=5, num_inference_steps=2, cfg_scale=1.0,
              tiled=False, verbose=False, return_latents=True)
    pipe = _tiny_pipe(cls=WanVideoEditorPipeline, with_vace=False)
    ref = np.asarray(pipe("edit", **kw), np.float32)

    mesh = make_mesh(dp=1, fsdp=2, sp=2)
    pipe2 = _tiny_pipe(cls=WanVideoEditorPipeline, with_vace=False)
    pipe2.dit_params = shard_params_fsdp(pipe2.dit_params, mesh)
    pipe2.sharding_ctx = ShardingContext(mesh)
    with use_sharding(pipe2.sharding_ctx):
        out = np.asarray(pipe2("edit", **kw), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_ring_attention_matches_full():
    """Ring attention (parallel/ring.py) == plain sdpa on an 8-way
    sequence-sharded mesh."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from video_styler_tpu.parallel.ring import ring_attention
    from video_styler_tpu.ops.attention import sdpa

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("sp",))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 64, 3, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 3, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 3, 16)), jnp.float32)
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(ring_attention(q, k, v, mesh, axis="sp"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # jit + odd head count (Ulysses can't shard 3 heads over 8 devices)
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, axis="sp"))
    np.testing.assert_allclose(np.asarray(f(q, k, v)), want, rtol=2e-5,
                               atol=2e-5)
