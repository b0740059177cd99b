"""Golden parity: FlowUniPC scheduler vs the vendored reference solver.

The reference fm_solvers_unipc.py imports diffusers only for ConfigMixin /
SchedulerMixin / deprecate scaffolding; we stub those to load it without the
dependency, then compare full multistep trajectories.
"""
import inspect
import sys
import types

import numpy as np
import pytest

from video_styler_tpu.schedulers.flow_unipc import FlowUniPCMultistepScheduler
from ref_loader import ref_available, REF_ROOT

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    diffusers = types.ModuleType("diffusers")
    cfg_mod = types.ModuleType("diffusers.configuration_utils")
    sched_mod = types.ModuleType("diffusers.schedulers")
    sched_utils = types.ModuleType("diffusers.schedulers.scheduling_utils")
    utils_mod = types.ModuleType("diffusers.utils")

    class FrozenDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    class ConfigMixin:
        @property
        def config(self):
            return self._internal_dict

        def register_to_config(self, **kwargs):
            if not hasattr(self, "_internal_dict"):
                self._internal_dict = FrozenDict()
            self._internal_dict.update(kwargs)

    def register_to_config(init):
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            ba = sig.bind(self, *args, **kwargs)
            ba.apply_defaults()
            cfg = {k: v for k, v in ba.arguments.items() if k != "self"}
            self._internal_dict = FrozenDict(cfg)
            init(self, *args, **kwargs)
        return wrapper

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample=None):
            self.prev_sample = prev_sample

    def deprecate(*args, **kwargs):
        pass

    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config
    sched_utils.SchedulerMixin = SchedulerMixin
    sched_utils.SchedulerOutput = SchedulerOutput
    sched_utils.KarrasDiffusionSchedulers = []
    utils_mod.deprecate = deprecate
    utils_mod.is_scipy_available = lambda: False
    diffusers.configuration_utils = cfg_mod
    diffusers.schedulers = sched_mod
    diffusers.utils = utils_mod
    sched_mod.scheduling_utils = sched_utils
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.configuration_utils"] = cfg_mod
    sys.modules["diffusers.schedulers"] = sched_mod
    sys.modules["diffusers.schedulers.scheduling_utils"] = sched_utils
    sys.modules["diffusers.utils"] = utils_mod


def _load_ref_unipc():
    _install_diffusers_stub()
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_fm_unipc",
        f"{REF_ROOT}/denoising_enhancing/wan/utils/fm_solvers_unipc.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_ref
@pytest.mark.parametrize("steps,shift,order", [(10, 5.0, 2), (6, 1.0, 2), (12, 3.0, 3)])
def test_unipc_trajectory_matches_reference(steps, shift, order):
    import torch
    ref_mod = _load_ref_unipc()
    ref = ref_mod.FlowUniPCMultistepScheduler(
        num_train_timesteps=1000, shift=1, use_dynamic_shifting=False,
        solver_order=order)
    ref.set_timesteps(steps, shift=shift)

    ours = FlowUniPCMultistepScheduler(num_train_timesteps=1000, shift=1,
                                       use_dynamic_shifting=False,
                                       solver_order=order)
    ours.set_timesteps(steps, shift=shift)
    np.testing.assert_allclose(ours.sigmas, ref.sigmas.numpy(), rtol=1e-5)
    np.testing.assert_array_equal(ours.timesteps, ref.timesteps.numpy())

    # drive both with the same synthetic "model": v = eps_hat - x_hat derived
    # from a fixed random field so outputs vary per step
    rng = np.random.default_rng(0)
    x_ref = torch.tensor(rng.standard_normal((1, 4, 2, 8, 8)), dtype=torch.float32)
    x_ours = x_ref.numpy().copy()
    field = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)

    for i, t in enumerate(ref.timesteps):
        v_np = (0.3 * field + 0.1 * x_ours).astype(np.float32)
        v_t = torch.tensor(0.3 * field, dtype=torch.float32) + 0.1 * x_ref
        x_ref = ref.step(v_t, t, x_ref, return_dict=False)[0]
        x_ours = ours.step(v_np, int(t), x_ours)
        np.testing.assert_allclose(x_ours, x_ref.numpy(), rtol=2e-4, atol=2e-5)


@needs_ref
def test_unipc_add_noise_matches_reference():
    import torch
    ref_mod = _load_ref_unipc()
    ref = ref_mod.FlowUniPCMultistepScheduler(num_train_timesteps=1000, shift=1,
                                              use_dynamic_shifting=False)
    ref.set_timesteps(40, shift=5.0)
    ours = FlowUniPCMultistepScheduler(num_train_timesteps=1000, shift=1)
    ours.set_timesteps(40, shift=5.0)
    x = torch.randn(1, 4, 2, 4, 4)
    n = torch.randn_like(x)
    t = ref.timesteps[-4]
    want = ref.add_noise(x, n, torch.IntTensor([int(t)])).numpy()
    got = ours.add_noise(x.numpy(), n.numpy(), int(t))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_unipc_device_resident_stepping_matches_host():
    """The update math is array-polymorphic: feeding jnp arrays keeps the
    multistep state and the latent on device (how the pipelines call it
    since round 5 — no 47 MB host round-trip per step) and must produce the
    same trajectory as host-numpy stepping."""
    import jax.numpy as jnp

    host = FlowUniPCMultistepScheduler(num_train_timesteps=1000, shift=1)
    host.set_timesteps(12, shift=5.0)
    dev = FlowUniPCMultistepScheduler(num_train_timesteps=1000, shift=1)
    dev.set_timesteps(12, shift=5.0)

    rng = np.random.default_rng(3)
    x_h = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    x_d = jnp.asarray(x_h)
    field = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    for t in host.timesteps:
        v_h = (0.3 * field + 0.1 * x_h).astype(np.float32)
        v_d = 0.3 * jnp.asarray(field) + 0.1 * x_d
        x_h = host.step(v_h, int(t), x_h)
        x_d = dev.step(v_d, int(t), x_d)
        assert isinstance(x_d, jnp.ndarray)
        np.testing.assert_allclose(np.asarray(x_d), x_h, rtol=2e-5,
                                   atol=2e-6)


def test_flow_dpm_device_resident_stepping_matches_host():
    from video_styler_tpu.schedulers.flow_dpm import \
        FlowDPMSolverMultistepScheduler
    import jax.numpy as jnp

    host = FlowDPMSolverMultistepScheduler(num_train_timesteps=1000, shift=1)
    host.set_timesteps(10, shift=5.0)
    dev = FlowDPMSolverMultistepScheduler(num_train_timesteps=1000, shift=1)
    dev.set_timesteps(10, shift=5.0)
    rng = np.random.default_rng(5)
    x_h = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    x_d = jnp.asarray(x_h)
    field = rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32)
    for t in host.timesteps:
        v_h = (0.3 * field + 0.1 * x_h).astype(np.float32)
        v_d = 0.3 * jnp.asarray(field) + 0.1 * x_d
        x_h = host.step(v_h, int(t), x_h)
        x_d = dev.step(v_d, int(t), x_d)
        np.testing.assert_allclose(np.asarray(x_d), x_h, rtol=2e-5,
                                   atol=2e-6)
