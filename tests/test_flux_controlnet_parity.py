"""Golden parity: FLUX ControlNet + FLUX IP-Adapter vs the reference modules
(/root/reference/diffsynth/models/flux_controlnet.py, flux_ipadapter.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.flux_dit import (FLUX_DIT_TINY, convert_flux_dit,
                                              flux_dit_forward)
import video_styler_tpu.models.flux_controlnet as FC
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = FC.FluxControlNetConfig(dit=FLUX_DIT_TINY, num_joint_blocks=2,
                              num_single_blocks=2, guidance_embed=True,
                              num_mode=3)
D = FLUX_DIT_TINY
MODE_DICT = {"canny": 0, "depth": 1, "pose": 2}


def _tiny_ref_controlnet():
    import torch
    ref = load_ref("models.flux_controlnet")
    fd = load_ref("models.flux_dit")

    class TinyFluxControlNet(ref.FluxControlNet):
        def __init__(self):
            torch.nn.Module.__init__(self)
            d, heads = D.dim, D.num_heads
            self.pos_embedder = fd.RoPEEmbedding(d, D.theta, list(D.axes_dim))
            self.time_embedder = fd.TimestepEmbeddings(D.time_freq_dim, d)
            self.guidance_embedder = fd.TimestepEmbeddings(D.time_freq_dim, d)
            self.pooled_text_embedder = torch.nn.Sequential(
                torch.nn.Linear(D.pooled_dim, d), torch.nn.SiLU(),
                torch.nn.Linear(d, d))
            self.context_embedder = torch.nn.Linear(D.context_dim, d)
            self.x_embedder = torch.nn.Linear(64, d)
            self.blocks = torch.nn.ModuleList(
                [fd.FluxJointTransformerBlock(d, heads)
                 for _ in range(CFG.num_joint_blocks)])
            self.single_blocks = torch.nn.ModuleList(
                [fd.FluxSingleTransformerBlock(d, heads)
                 for _ in range(CFG.num_single_blocks)])
            self.controlnet_blocks = torch.nn.ModuleList(
                [torch.nn.Linear(d, d) for _ in range(CFG.num_joint_blocks)])
            self.controlnet_single_blocks = torch.nn.ModuleList(
                [torch.nn.Linear(d, d)
                 for _ in range(CFG.num_single_blocks)])
            self.mode_dict = MODE_DICT
            self.controlnet_mode_embedder = torch.nn.Embedding(CFG.num_mode, d)
            self.controlnet_x_embedder = torch.nn.Linear(64, d)

    torch.manual_seed(0)
    return TinyFluxControlNet().eval()


def _inputs():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    cond = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    ctx = rng.standard_normal((1, 6, D.context_dim)).astype(np.float32)
    pooled = rng.standard_normal((1, D.pooled_dim)).astype(np.float32)
    g = np.asarray([3.5], np.float32)
    return x, cond, t, ctx, pooled, g


def test_flux_controlnet_parity():
    import torch
    model = _tiny_ref_controlnet()
    params = FC.convert_flux_controlnet(model.state_dict(), CFG,
                                        dtype=jnp.float32)
    x, cond, t, ctx, pooled, g = _inputs()
    with torch.no_grad():
        want_res, want_single = model(
            torch.from_numpy(x), torch.from_numpy(cond), torch.from_numpy(t),
            torch.from_numpy(ctx), torch.from_numpy(pooled),
            torch.from_numpy(g), text_ids=torch.zeros(1, 6, 3),
            processor_id="depth")
    res, single = FC.flux_controlnet_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(t),
        jnp.asarray(ctx), jnp.asarray(pooled), jnp.asarray(g),
        processor_id=MODE_DICT["depth"])
    res = FC.align_res_stack(res, 19)
    single = FC.align_res_stack(single, 38)
    assert res.shape[0] == 19 and single.shape[0] == 38
    for i in range(19):
        np.testing.assert_allclose(np.asarray(res[i]), want_res[i].numpy(),
                                   rtol=3e-4, atol=3e-4)
    for i in range(38):
        np.testing.assert_allclose(np.asarray(single[i]),
                                   want_single[i].numpy(), rtol=3e-4,
                                   atol=3e-4)


def test_flux_ipadapter_parity_and_dit_injection():
    import torch
    ref = load_ref("models.flux_ipadapter")
    torch.manual_seed(1)
    num_blocks = D.num_joint_blocks + D.num_single_blocks  # 4
    model = ref.FluxIpAdapter(num_attention_heads=D.num_heads,
                              attention_head_dim=D.head_dim,
                              cross_attention_dim=D.context_dim,
                              num_tokens=8, num_blocks=num_blocks).eval()
    params = FC.convert_flux_ipadapter(model.state_dict(),
                                       num_blocks=num_blocks,
                                       dtype=jnp.float32)

    rng = np.random.default_rng(2)
    image_emb = rng.standard_normal((1, 1152)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(image_emb), scale=0.7)
    ip_k, ip_v, scale = FC.flux_ipadapter_kv(params, D,
                                             jnp.asarray(image_emb),
                                             scale=0.7)
    assert ip_k.shape[0] == num_blocks and scale == 0.7
    for i in range(num_blocks):
        # reference layout (B, H, T, D) -> ours (B, T, H, D)
        np.testing.assert_allclose(
            np.asarray(ip_k[i]), want[i]["ip_k"].numpy().transpose(0, 2, 1, 3),
            rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(ip_v[i]), want[i]["ip_v"].numpy().transpose(0, 2, 1, 3),
            rtol=3e-4, atol=3e-4)

    # end-to-end: DiT forward with ip kv + controlnet residuals changes the
    # output and matches the reference-composed result
    from test_flux_parity import _tiny_ref_dit
    dit = _tiny_ref_dit()
    dparams = convert_flux_dit(dit.state_dict(), D, dtype=jnp.float32)
    x = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    ctx = rng.standard_normal((1, 6, D.context_dim)).astype(np.float32)
    pooled = rng.standard_normal((1, D.pooled_dim)).astype(np.float32)
    g = np.asarray([3.5], np.float32)
    kw = {f: torch.from_numpy(v) for f, v in
          (("hidden_states", x), ("timestep", t), ("prompt_emb", ctx),
           ("pooled_prompt_emb", pooled), ("guidance", g))}
    ip_kwargs = {i: {"ip_k": want[i]["ip_k"], "ip_v": want[i]["ip_v"],
                     "scale": 0.7} for i in range(num_blocks)}
    with torch.no_grad():
        want_out = _ref_dit_forward_with_ip(dit, kw, ip_kwargs).numpy()
    got = np.asarray(flux_dit_forward(
        dparams, D, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(pooled), jnp.asarray(g), ip_kv=(ip_k, ip_v),
        ip_scale=0.7), np.float32)
    np.testing.assert_allclose(got, want_out, rtol=4e-4, atol=4e-4)


def _ref_dit_forward_with_ip(dit, kw, ip_kwargs):
    """Reference model_fn_flux_image block loop with ipadapter_kwargs_list
    (flux_image_new.py:1252-1292), composed by hand for the tiny model."""
    import torch
    hidden_states = kw["hidden_states"]
    text_ids = torch.zeros(1, kw["prompt_emb"].shape[1], 3)
    image_ids = dit.prepare_image_ids(hidden_states)
    conditioning = (dit.time_embedder(kw["timestep"], hidden_states.dtype)
                    + dit.pooled_text_embedder(kw["pooled_prompt_emb"]))
    conditioning = conditioning + dit.guidance_embedder(
        kw["guidance"] * 1000, hidden_states.dtype)
    height, width = hidden_states.shape[-2:]
    hidden_states = dit.x_embedder(dit.patchify(hidden_states))
    prompt_emb = dit.context_embedder(kw["prompt_emb"])
    rot = dit.pos_embedder(torch.cat((text_ids, image_ids), dim=1))
    nj = len(dit.blocks)
    for i, block in enumerate(dit.blocks):
        hidden_states, prompt_emb = block(
            hidden_states, prompt_emb, conditioning, rot, None,
            ipadapter_kwargs_list=ip_kwargs.get(i))
    hidden_states = torch.cat([prompt_emb, hidden_states], dim=1)
    for i, block in enumerate(dit.single_blocks):
        hidden_states, prompt_emb = block(
            hidden_states, prompt_emb, conditioning, rot, None,
            ipadapter_kwargs_list=ip_kwargs.get(i + nj))
    hidden_states = hidden_states[:, prompt_emb.shape[1]:]
    hidden_states = dit.final_norm_out(hidden_states, conditioning)
    hidden_states = dit.final_proj_out(hidden_states)
    return dit.unpatchify(hidden_states, height, width)


def test_flux_eligen_entity_parity():
    """Entity bias + masked forward vs the reference process_entity_masks
    composition (flux_dit.py:290-345)."""
    import torch
    dit = __import__("test_flux_parity").__dict__["_tiny_ref_dit"]()
    dparams = convert_flux_dit(dit.state_dict(), D, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 16, 8, 8)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    prompt = rng.standard_normal((1, 6, D.context_dim)).astype(np.float32)
    ents = rng.standard_normal((1, 2, 6, D.context_dim)).astype(np.float32)
    masks = np.zeros((1, 2, 1, 8, 8), np.float32)
    masks[0, 0, :, :4] = 1.0
    masks[0, 1, :, 4:, 4:] = 1.0

    tx = torch.from_numpy(x)
    with torch.no_grad():
        image_ids = dit.prepare_image_ids(tx)
        text_ids = torch.zeros(1, 6, 3)
        cond = (dit.time_embedder(torch.from_numpy(t), tx.dtype)
                + dit.pooled_text_embedder(torch.from_numpy(
                    rng.standard_normal((1, D.pooled_dim)).astype(np.float32)
                    * 0)))
        cond = cond + dit.guidance_embedder(torch.tensor([3500.0]), tx.dtype)
        hid = dit.x_embedder(dit.patchify(tx))
        pe, rot, amask = dit.process_entity_masks(
            hid, torch.from_numpy(prompt), torch.from_numpy(ents),
            torch.from_numpy(masks), text_ids, image_ids, 16)
        h = hid
        for block in dit.blocks:
            h, pe_ = block(h, pe, cond, rot, amask)
            pe = pe_
        h = torch.cat([pe, h], dim=1)
        for block in dit.single_blocks:
            h, pe = block(h, pe, cond, rot, amask)
        h = h[:, pe.shape[1]:]
        h = dit.final_norm_out(h, cond)
        h = dit.final_proj_out(h)
        want = dit.unpatchify(h, 8, 8).numpy()

    # ours: concat [entities | global] prompts, build the additive bias
    prompt_cat = np.concatenate([ents[:, 0], ents[:, 1], prompt], axis=1)
    bias = F.build_entity_attention_bias if False else None
    from video_styler_tpu.models.flux_dit import (build_entity_attention_bias,
                                                  flux_dit_forward)
    bias = build_entity_attention_bias(masks, 6, 16)
    np.testing.assert_allclose(
        np.where(np.isinf(bias), 1.0, 0.0),
        np.where(np.isinf(amask.numpy()), 1.0, 0.0))
    got = np.asarray(flux_dit_forward(
        dparams, D, jnp.asarray(x), jnp.asarray(t), jnp.asarray(prompt_cat),
        jnp.zeros((1, D.pooled_dim), jnp.float32), jnp.asarray([3.5]),
        attn_bias=jnp.asarray(bias)), np.float32)
    np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)
