"""Oracle test: our algorithmic civitai converters must reproduce the
reference's static rename tables exactly (tables read from the reference
at test time, never copied into the repo)."""
import numpy as np
import pytest

from video_styler_tpu.utils.sd_civitai import (
    convert_sd_unet_from_civitai, convert_sd_text_encoder_from_civitai,
    convert_sd_vae_encoder_from_civitai, convert_sd_vae_decoder_from_civitai,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


def _extract_table(converter_cls, method="from_civitai"):
    """Run the reference converter on a synthetic civitai dict built from its
    own rename table (pulled via a probe call on empty input + source
    inspection is fragile; instead drive it with generated names)."""
    return converter_cls()


def _oracle_pairs(module_name, cls_name):
    """Feed every civitai key the reference table knows about (discovered by
    probing its source rename_dict) through the reference converter."""
    import inspect
    import re
    ref = load_ref(module_name)
    src = inspect.getsource(getattr(ref, cls_name).from_civitai)
    pairs = re.findall(r'"([^"]+)":\s*"([^"]+)"', src)
    # keep tensor-name pairs only
    return [(a, b) for a, b in pairs if "." in a]


@needs_ref
def test_unet_civitai_mapping_matches_reference_table():
    pairs = _oracle_pairs("models.sd_unet", "SDUNetStateDictConverter")
    assert len(pairs) > 600
    fake = {a: np.zeros((2, 2, 1, 1), np.float32) for a, _ in pairs}
    got = convert_sd_unet_from_civitai(fake)
    want_names = {b for _, b in pairs}
    got_names = set(got.keys())
    missing = want_names - got_names
    extra = got_names - want_names
    assert not missing, f"missing {sorted(missing)[:8]}"
    assert not extra, f"extra {sorted(extra)[:8]}"
    # and each maps from the same source key
    remap = dict(pairs)
    for src_key, dst_key in remap.items():
        fake2 = {src_key: np.ones((2, 2, 1, 1), np.float32)}
        out = convert_sd_unet_from_civitai(fake2)
        assert list(out.keys()) == [dst_key], (src_key, dst_key, list(out.keys()))


@needs_ref
def test_text_encoder_civitai_mapping_matches_reference_table():
    pairs = _oracle_pairs("models.sd_text_encoder", "SDTextEncoderStateDictConverter")
    assert len(pairs) > 100
    remap = dict(pairs)
    for src_key, dst_key in remap.items():
        out = convert_sd_text_encoder_from_civitai(
            {src_key: np.zeros((4, 4), np.float32)})
        assert list(out.keys()) == [dst_key], (src_key, dst_key, list(out.keys()))


@needs_ref
def test_vae_civitai_mapping_matches_reference_tables():
    enc_pairs = _oracle_pairs("models.sd_vae_encoder", "SDVAEEncoderStateDictConverter")
    dec_pairs = _oracle_pairs("models.sd_vae_decoder", "SDVAEDecoderStateDictConverter")
    assert len(enc_pairs) > 50 and len(dec_pairs) > 50
    for src_key, dst_key in dict(enc_pairs).items():
        out = convert_sd_vae_encoder_from_civitai(
            {src_key: np.zeros((2, 2, 1, 1), np.float32)})
        assert list(out.keys()) == [dst_key], (src_key, dst_key, list(out.keys()))
    for src_key, dst_key in dict(dec_pairs).items():
        out = convert_sd_vae_decoder_from_civitai(
            {src_key: np.zeros((2, 2, 1, 1), np.float32)})
        assert list(out.keys()) == [dst_key], (src_key, dst_key, list(out.keys()))
