"""Golden parity: NexusGen adapters vs the reference projector modules
(/root/reference/diffsynth/models/nexus_gen_projector.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

import video_styler_tpu.models.nexus_gen as N
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

CFG = N.NEXUS_GEN_MERGER_TINY


def test_nexus_gen_adapter_parity():
    ref = load_ref("models.nexus_gen_projector")
    torch.manual_seed(0)
    model = ref.NexusGenAdapter(input_dim=16, output_dim=24).eval()
    params = N.convert_nexus_gen_adapter(model.state_dict(),
                                         dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 5, 16)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = np.asarray(N.nexus_gen_adapter_forward(params, jnp.asarray(x)),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _tiny_ref_merger():
    ref = load_ref("models.nexus_gen_projector")
    from transformers import Qwen2_5_VLConfig
    from transformers.activations import ACT2FN

    class TinyMerger(ref.NexusGenImageEmbeddingMerger):
        def __init__(self):
            torch.nn.Module.__init__(self)
            config = Qwen2_5_VLConfig(
                hidden_size=CFG.hidden_size, num_attention_heads=CFG.num_heads,
                num_key_value_heads=CFG.num_kv_heads,
                intermediate_size=CFG.intermediate_size,
                rms_norm_eps=CFG.rms_eps, rope_theta=CFG.rope_theta,
                hidden_act="silu", attention_dropout=0.0,
                rope_scaling={"mrope_section": list(CFG.mrope_section),
                              "rope_type": "default", "type": "default"},
                vocab_size=64)
            self.config = config
            self.num_layers = CFG.num_layers
            self.layers = torch.nn.ModuleList(
                [ref.Qwen2_5_VLDecoderLayer(config, i)
                 for i in range(CFG.num_layers)])
            oc, ex = CFG.out_channel, CFG.expand_ratio
            self.projector = torch.nn.Sequential(
                ref.Qwen2RMSNorm(config.hidden_size, eps=config.rms_norm_eps),
                torch.nn.Linear(config.hidden_size, oc * ex),
                ref.Qwen2RMSNorm(oc * ex, eps=config.rms_norm_eps),
                ACT2FN[config.hidden_act], torch.nn.Linear(oc * ex, oc),
                ref.Qwen2RMSNorm(oc, eps=config.rms_norm_eps))
            self.base_grid = torch.tensor([list(CFG.base_grid)])
            self.rotary_emb = ref.Qwen2_5_VLRotaryEmbedding(config=config)

    torch.manual_seed(1)
    return TinyMerger().eval()


@pytest.mark.parametrize("with_ref", [False, True])
def test_nexus_gen_merger_parity(with_ref):
    model = _tiny_ref_merger()
    params = N.convert_nexus_gen_merger(model.state_dict(), CFG,
                                        dtype=jnp.float32)
    rng = np.random.default_rng(2)
    grid = np.asarray([[1, 4, 4]], np.int64)        # 2x2 merged tokens
    embeds = rng.standard_normal((1, 4, CFG.hidden_size)).astype(np.float32)
    ref_embeds = ref_grid = None
    t_ref = [None, None]
    if with_ref:
        ref_grid = np.asarray([[1, 8, 8]], np.int64)
        ref_embeds = rng.standard_normal((1, 16, CFG.hidden_size)
                                         ).astype(np.float32)
        t_ref = [torch.from_numpy(ref_embeds), torch.from_numpy(ref_grid)]
    with torch.no_grad():
        want = model(torch.from_numpy(embeds), torch.from_numpy(grid),
                     t_ref[0], t_ref[1]).numpy()
    got = np.asarray(N.nexus_gen_merger_forward(
        params, CFG, jnp.asarray(embeds), grid,
        None if ref_embeds is None else jnp.asarray(ref_embeds), ref_grid),
        np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_flux_pipeline_nexus_gen_path():
    """NexusGen conditioning replaces prompt_emb/text_ids in the FLUX
    pipeline (generation + editing branches)."""
    from video_styler_tpu.models.flux_dit import FLUX_DIT_TINY, init_flux_dit
    from video_styler_tpu.pipelines.flux_image import FluxImagePipeline
    D = FLUX_DIT_TINY
    pipe = FluxImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = D
    pipe.dit_params = init_flux_dit(jax.random.PRNGKey(0), D)
    pipe.encode_image = lambda arr: jnp.zeros((1, 16, 4, 4), jnp.float32)
    pipe.decode_image = lambda z: jnp.zeros((1, 3, 32, 32))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, D.pooled_dim))
    pipe.encode_prompt = lambda p, n=512: (
        jnp.zeros((1, 8, D.context_dim)), pooled, np.zeros((8, 3)))

    hid = 16
    pipe.nexus_gen_generation_adapter = N.init_nexus_gen_adapter(
        jax.random.PRNGKey(3), in_dim=hid, out_dim=D.context_dim)
    m_cfg = N.NexusGenMergerConfig(
        hidden_size=hid, num_heads=2, num_kv_heads=1, intermediate_size=24,
        out_channel=D.context_dim, mrope_section=(2, 1, 1), base_grid=(1, 8, 8))
    pipe.nexus_gen_editing_adapter = (
        N.init_nexus_gen_merger(jax.random.PRNGKey(4), m_cfg), m_cfg)

    def fake_ar(prompt, ref_image=None):
        rng = np.random.default_rng(0)
        embed = rng.standard_normal((4, hid)).astype(np.float32)
        if ref_image is None:
            return embed, None, np.asarray([[1, 4, 4]])
        ref = rng.standard_normal((4, hid)).astype(np.float32)
        return embed, ref, np.asarray([[1, 4, 4], [1, 4, 4]])

    pipe.nexus_gen = fake_ar
    a = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             return_latents=True)
    assert bool(jnp.isfinite(a).all())
    from PIL import Image
    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    b = pipe("edit", nexus_gen_reference_image=img, height=32, width=32,
             seed=0, num_inference_steps=2, return_latents=True)
    assert bool(jnp.isfinite(b).all())
    assert float(jnp.abs(a - b).mean()) > 1e-6
