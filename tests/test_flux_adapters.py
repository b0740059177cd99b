"""Golden parity: FLUX conditioning adapters (InfiniteYou projector, value
controller, LoRA encoder) vs the reference torch modules, plus their
pipeline wiring."""
import numpy as np
import jax.numpy as jnp
import pytest

from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


def test_infiniteyou_projector_parity():
    import torch
    from video_styler_tpu.models.flux_adapters import (
        infiniteyou_projector_forward, convert_infiniteyou_projector)
    ref = load_ref("models.flux_infiniteyou")
    torch.manual_seed(0)
    model = ref.InfiniteYouImageProjector(
        dim=64, depth=2, dim_head=8, heads=8, num_queries=4,
        embedding_dim=512, output_dim=96, ff_mult=4).eval()
    params = convert_infiniteyou_projector(model.state_dict(),
                                           dtype=jnp.float32)
    torch.manual_seed(1)
    x = torch.randn(2, 3, 512)
    with torch.no_grad():
        want = model(x).numpy()
    got = np.asarray(infiniteyou_projector_forward(
        params, jnp.asarray(x.numpy()), heads=8, dim_head=8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_value_encoder_parity():
    import torch
    from video_styler_tpu.models.flux_adapters import (
        single_value_encoder_forward, multi_value_encoder_forward,
        convert_value_encoder)
    ref = load_ref("models.flux_value_control")
    torch.manual_seed(0)
    enc = ref.SingleValueEncoder(dim_in=16, dim_out=32, prefer_len=4).eval()
    with torch.no_grad():   # undo the zero init so the MLP actually matters
        enc.prefer_value_embedder[-1].weight.normal_(std=0.05)
        enc.prefer_value_embedder[-1].bias.normal_(std=0.05)
    params = convert_value_encoder(enc.state_dict(), dtype=jnp.float32)
    with torch.no_grad():
        want = enc(torch.tensor([0.37]), torch.float32).numpy()
    got = np.asarray(single_value_encoder_forward(
        params, jnp.asarray([0.37], jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # MultiValueEncoder skips None values (flux_value_control.py:10-17)
    torch.manual_seed(1)
    enc2 = ref.SingleValueEncoder(dim_in=16, dim_out=32, prefer_len=4).eval()
    with torch.no_grad():
        enc2.prefer_value_embedder[-1].weight.normal_(std=0.05)
        enc2.prefer_value_embedder[-1].bias.normal_(std=0.05)
    multi = ref.MultiValueEncoder([enc, enc2]).eval()
    with torch.no_grad():
        want2 = multi([torch.tensor(0.2), torch.tensor(0.9)],
                      torch.float32).numpy()
    p2 = convert_value_encoder(enc2.state_dict(), dtype=jnp.float32)
    got2 = np.asarray(multi_value_encoder_forward(
        [params, p2], [0.2, 0.9]))
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-5)
    got_skip = np.asarray(multi_value_encoder_forward(
        [params, p2], [None, 0.9]))
    with torch.no_grad():
        want_skip = multi([None, torch.tensor(0.9)], torch.float32).numpy()
    np.testing.assert_allclose(got_skip, want_skip, rtol=1e-4, atol=1e-5)


def _fake_lora(patterns, rank=2, seed=0):
    rng = np.random.default_rng(seed)
    lora = {}
    for pat in patterns:
        din, dout = pat["dim"]
        lora[pat["name"] + ".lora_A.default.weight"] = \
            rng.standard_normal((rank, din)).astype(np.float32) * 0.02
        lora[pat["name"] + ".lora_B.default.weight"] = \
            rng.standard_normal((dout, rank)).astype(np.float32) * 0.02
    return lora


def test_flux_lora_encoder_parity():
    import torch
    from video_styler_tpu.models.flux_adapters import (
        flux_lora_encoder_forward, convert_flux_lora_encoder,
        default_lora_patterns)
    ref = load_ref("models.flux_lora_encoder")
    torch.manual_seed(0)
    model = ref.FluxLoRAEncoder(embed_dim=64, encoder_intermediate_size=128,
                                num_encoder_layers=1, num_embeds_per_lora=2,
                                num_special_embeds=1).eval()
    params = convert_flux_lora_encoder(model.state_dict(), dtype=jnp.float32)
    patterns = default_lora_patterns()
    lora_np = _fake_lora(patterns)
    lora_t = {k: torch.from_numpy(v) for k, v in lora_np.items()}
    with torch.no_grad():
        want = model(lora_t).numpy()
    got = np.asarray(flux_lora_encoder_forward(params, lora_np,
                                               num_heads=32))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_flux_pipeline_value_and_lora_tokens():
    """Wiring: value-control tokens extend both cfg branches; the id
    embedding replaces the ControlNet prompt (iy routing)."""
    import jax
    from video_styler_tpu.pipelines.flux_image import FluxImagePipeline
    from video_styler_tpu.models import flux_dit as F
    from video_styler_tpu.models.flux_adapters import init_value_encoder
    from video_styler_tpu.models.flux_dit import FLUX_DIT_TINY

    pipe = FluxImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = FLUX_DIT_TINY
    key = jax.random.PRNGKey(0)
    pipe.dit_params = F.init_flux_dit(key, FLUX_DIT_TINY, dtype=jnp.float32)
    pipe.value_controller_params = [
        init_value_encoder(jax.random.PRNGKey(1), dim_in=16,
                           dim_out=FLUX_DIT_TINY.context_dim, prefer_len=4)]
    d_text = FLUX_DIT_TINY.context_dim

    calls = {}
    orig = pipe._model_fns

    def spy(*a, **k):
        fns = orig(*a, **k)

        def full(*args, **kw):
            calls["prompt_len"] = args[3].shape[1]
            return fns[0](*args, **kw)
        return (full,) + fns[1:]

    pipe._model_fns = spy
    pipe.encode_prompt = lambda p, n: (
        jnp.zeros((1, 8, d_text), jnp.float32),
        jnp.zeros((1, FLUX_DIT_TINY.pooled_dim), jnp.float32), None)
    pipe.decode_image = lambda z: jnp.zeros((1, 3, 32, 32), jnp.float32)
    pipe(prompt="x", height=32, width=32, num_inference_steps=1,
         cfg_scale=1.0, seed=0, value_controller_inputs=[0.5],
         return_latents=True)
    assert calls["prompt_len"] == 8 + 4      # prompt + value tokens
