"""Golden parity: FlowDPMSolver scheduler vs the vendored reference solver
(/root/reference/denoising_enhancing/wan/utils/fm_solvers.py)."""
import numpy as np
import pytest

from video_styler_tpu.schedulers import FlowDPMSolverMultistepScheduler
from ref_loader import ref_available, REF_ROOT
from test_unipc import _install_diffusers_stub

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


def _load_ref_dpm():
    _install_diffusers_stub()
    import sys
    import types
    if "diffusers.utils.torch_utils" not in sys.modules:
        import torch
        tu = types.ModuleType("diffusers.utils.torch_utils")

        def randn_tensor(shape, generator=None, device=None, dtype=None):
            return torch.randn(shape, generator=generator, dtype=dtype)

        tu.randn_tensor = randn_tensor
        sys.modules["diffusers.utils"].torch_utils = tu
        sys.modules["diffusers.utils.torch_utils"] = tu
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_fm_dpm", f"{REF_ROOT}/denoising_enhancing/wan/utils/fm_solvers.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_ref
@pytest.mark.parametrize("steps,shift,order,solver_type", [
    (10, 5.0, 2, "midpoint"),
    (6, 1.0, 2, "heun"),
    (20, 3.0, 3, "midpoint"),
])
def test_dpm_trajectory_matches_reference(steps, shift, order, solver_type):
    import torch
    ref_mod = _load_ref_dpm()
    ref = ref_mod.FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000, shift=1, use_dynamic_shifting=False,
        solver_order=order, solver_type=solver_type)
    ref.set_timesteps(steps, shift=shift)

    ours = FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000, shift=1, use_dynamic_shifting=False,
        solver_order=order, solver_type=solver_type)
    ours.set_timesteps(steps, shift=shift)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-5)
    np.testing.assert_array_equal(ours.timesteps, ref.timesteps.numpy())

    rng = np.random.default_rng(0)
    x_ref = torch.tensor(rng.standard_normal((1, 4, 2, 8, 8)),
                         dtype=torch.float32)
    x_ours = x_ref.numpy().copy()
    field = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)

    for t in ref.timesteps:
        v_np = (0.3 * field + 0.1 * x_ours).astype(np.float32)
        v_t = torch.tensor(0.3 * field, dtype=torch.float32) + 0.1 * x_ref
        x_ref = ref.step(v_t, t, x_ref, return_dict=False)[0]
        x_ours = ours.step(v_np, int(t), x_ours)
        np.testing.assert_allclose(x_ours, x_ref.numpy(), rtol=2e-4, atol=2e-5)


@needs_ref
def test_dpm_sde_trajectory_matches_reference():
    import torch
    ref_mod = _load_ref_dpm()
    ref = ref_mod.FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000, shift=1, solver_order=2,
        algorithm_type="sde-dpmsolver++")
    ref.set_timesteps(8, shift=4.0)
    ours = FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000, shift=1, solver_order=2,
        algorithm_type="sde-dpmsolver++")
    ours.set_timesteps(8, shift=4.0)

    rng = np.random.default_rng(1)
    x_ref = torch.tensor(rng.standard_normal((1, 4, 8, 8)),
                         dtype=torch.float32)
    x_ours = x_ref.numpy().copy()
    field = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    for t in ref.timesteps:
        noise = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
        v_np = (0.3 * field + 0.1 * x_ours).astype(np.float32)
        v_t = torch.tensor(0.3 * field, dtype=torch.float32) + 0.1 * x_ref
        x_ref = ref.step(v_t, t, x_ref,
                         variance_noise=torch.tensor(noise),
                         return_dict=False)[0]
        x_ours = ours.step(v_np, int(t), x_ours, noise=noise)
        np.testing.assert_allclose(x_ours, x_ref.numpy(), rtol=2e-4,
                                   atol=2e-5)


@needs_ref
def test_dpm_add_noise_matches_reference():
    import torch
    ref_mod = _load_ref_dpm()
    ref = ref_mod.FlowDPMSolverMultistepScheduler(num_train_timesteps=1000,
                                                  shift=1, solver_order=2)
    ref.set_timesteps(10, shift=5.0)
    ours = FlowDPMSolverMultistepScheduler(num_train_timesteps=1000, shift=1,
                                           solver_order=2)
    ours.set_timesteps(10, shift=5.0)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    n = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    t = ref.timesteps[3]
    want = ref.add_noise(torch.tensor(x), torch.tensor(n),
                         torch.tensor([t])).numpy()
    got = ours.add_noise(x, n, int(t))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
