"""Motion/camera controller parity vs reference modules."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_controllers import (
    motion_controller_forward, convert_motion_controller,
    generate_camera_coordinates, process_pose_file,
    simple_adapter_forward, convert_simple_adapter,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


@needs_ref
def test_motion_controller_parity():
    import torch
    ref = load_ref("models.wan_video_motion_controller")
    torch.manual_seed(0)
    model = ref.WanMotionControllerModel(freq_dim=32, dim=64).eval()
    params = convert_motion_controller(model.state_dict(), dtype=jnp.float32)
    mid = torch.tensor([5.0])
    with torch.no_grad():
        want = model(mid).numpy()
    got = np.asarray(motion_controller_forward(params, jnp.asarray(mid.numpy()),
                                               freq_dim=32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_ref
def test_camera_coordinates_and_plucker_parity():
    import torch
    ref = load_ref("models.wan_video_camera_controller")
    coords_ref = ref.generate_camera_coordinates("LeftUp", 5, 0.05)
    coords = generate_camera_coordinates("LeftUp", 5, 0.05)
    np.testing.assert_allclose(coords, coords_ref)
    want = ref.process_pose_file(coords_ref, width=32, height=16).numpy()
    got = process_pose_file(coords, width=32, height=16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_ref
def test_simple_adapter_parity():
    import torch
    ref = load_ref("models.wan_video_camera_controller")
    torch.manual_seed(0)
    model = ref.SimpleAdapter(6, 32, kernel_size=(2, 2), stride=(2, 2)).eval()
    params = convert_simple_adapter(model.state_dict(), dtype=jnp.float32)
    torch.manual_seed(1)
    x = torch.randn(1, 6, 3, 32, 32)
    with torch.no_grad():
        want = model(x).numpy()
    got = np.asarray(simple_adapter_forward(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
