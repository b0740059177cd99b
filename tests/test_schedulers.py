"""Scheduler math parity vs the reference implementations."""
import numpy as np
import pytest

from video_styler_tpu.schedulers import (
    FlowMatchScheduler, EnhancedDDIMScheduler, ContinuousODEScheduler,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


@needs_ref
@pytest.mark.parametrize("kwargs,steps,shift", [
    (dict(shift=5.0, sigma_min=0.0, extra_one_step=True), 50, 5.0),   # Wan inference
    (dict(shift=3.0), 100, None),                                      # defaults
    (dict(shift=5.0, sigma_min=0.0, extra_one_step=True), 10, 7.0),
    (dict(exponential_shift=True, exponential_shift_mu=1.0), 30, None),
    (dict(shift_terminal=0.1), 25, None),
    (dict(inverse_timesteps=True, reverse_sigmas=True), 20, None),
])
def test_flow_match_sigmas_match_reference(kwargs, steps, shift):
    import torch
    ref_mod = load_ref("schedulers.flow_match")
    ref = ref_mod.FlowMatchScheduler(**kwargs)
    ref.set_timesteps(steps, shift=shift)
    ours = FlowMatchScheduler(**kwargs)
    ours.set_timesteps(steps, shift=shift)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy(), rtol=1e-5, atol=1e-4)

    # step / add_noise parity on random tensors
    x = torch.randn(2, 4, 3, 8, 8)
    v = torch.randn_like(x)
    for tid in [0, steps // 2, steps - 1]:
        t = ref.timesteps[tid]
        got = ours.step(v.numpy(), float(t), x.numpy())
        want = ref.step(v, t, x).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        got = ours.add_noise(x.numpy(), v.numpy(), float(t))
        want = ref.add_noise(x, v, t).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_ref
def test_flow_match_training_weights():
    ref_mod = load_ref("schedulers.flow_match")
    ref = ref_mod.FlowMatchScheduler(shift=3.0)
    ref.set_timesteps(1000, training=True)
    ours = FlowMatchScheduler(shift=3.0)
    ours.set_timesteps(1000, training=True)
    np.testing.assert_allclose(ours.linear_timesteps_weights,
                               ref.linear_timesteps_weights.numpy(), rtol=1e-4)


@needs_ref
@pytest.mark.parametrize("pred,zsnr", [("epsilon", False), ("v_prediction", True)])
def test_ddim_matches_reference(pred, zsnr):
    import torch
    ref_mod = load_ref("schedulers.ddim")
    ref = ref_mod.EnhancedDDIMScheduler(prediction_type=pred, rescale_zero_terminal_snr=zsnr)
    ref.set_timesteps(20)
    ours = EnhancedDDIMScheduler(prediction_type=pred, rescale_zero_terminal_snr=zsnr)
    ours.set_timesteps(20)
    np.testing.assert_allclose(ours.timesteps, ref.timesteps.numpy(), atol=0)
    np.testing.assert_allclose(ours.alphas_cumprod, ref.alphas_cumprod, rtol=1e-4, atol=1e-9)
    x = torch.randn(1, 4, 8, 8)
    e = torch.randn_like(x)
    for tid in [0, 10, 19]:
        t = ref.timesteps[tid]
        np.testing.assert_allclose(
            ours.step(e.numpy(), t.numpy(), x.numpy()),
            ref.step(e, t, x).numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        ours.add_noise(x.numpy(), e.numpy(), ref.timesteps[5].numpy()),
        ref.add_noise(x, e, ref.timesteps[5]).numpy(), rtol=1e-5, atol=1e-6)


@needs_ref
def test_continuous_ode_matches_reference():
    import torch
    ref_mod = load_ref("schedulers.continuous_ode")
    ref = ref_mod.ContinuousODEScheduler(num_inference_steps=25)
    ours = ContinuousODEScheduler(num_inference_steps=25)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-4)
    x = torch.randn(1, 4, 8, 8)
    e = torch.randn_like(x)
    for tid in [0, 12, 24]:
        t = ref.timesteps[tid]
        np.testing.assert_allclose(
            ours.step(e.numpy(), float(t), x.numpy().copy()),
            ref.step(e, t, x.clone()).numpy(), rtol=1e-3, atol=1e-4)


def test_flow_match_euler_invariant():
    """Standalone: integrating the exact linear velocity field recovers x0."""
    s = FlowMatchScheduler(shift=5.0, sigma_min=0.0, extra_one_step=True)
    s.set_timesteps(50, shift=5.0)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    eps = rng.standard_normal(x0.shape).astype(np.float32)
    x = s.add_noise(x0, eps, s.timesteps[0])
    for t in s.timesteps:
        x = s.step(eps - x0, t, x)
    np.testing.assert_allclose(x, x0, rtol=1e-3, atol=1e-4)
