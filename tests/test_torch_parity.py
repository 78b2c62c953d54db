"""Golden parity vs the PyTorch reference implementation (SURVEY.md §7.1-2).

Requires the read-only reference checkout at /root/reference (skipped when
unavailable). Instantiates the reference model with random weights and
realistic BN stats, converts its state_dict through
utils.checkpoint.torch_state_dict_to_variables, and asserts the full
eval-mode [B, 8400, 4+nc] output matches within float tolerance — validating
topology, C2f concat order, BN semantics, DFL decode, and anchor order in
one shot.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "yolov8")),
    reason="reference checkout not available",
)


@pytest.mark.parametrize("version,nc", [("n", 80), ("n", 1), ("s", 80)])
def test_eval_output_parity(version, nc):
    import torch

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from yolov8.yolov8 import YOLOv8 as TorchYOLO

    import jax.numpy as jnp

    from yolo_ms_tpu.models.decode import decode_predictions
    from yolo_ms_tpu.models.registry import build_model
    from yolo_ms_tpu.utils.checkpoint import torch_state_dict_to_variables

    torch.manual_seed(0)
    tm = TorchYOLO(version=version, num_classes=nc).eval()
    tm.head.stride = torch.tensor([8.0, 16.0, 32.0])
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.8, 1.2)
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.normal_(0, 0.05)

    x = torch.randn(1, 3, 320, 320) * 0.5
    with torch.no_grad():
        ref_out = tm(x).numpy()

    variables = torch_state_dict_to_variables(tm.state_dict())
    model = build_model(version, num_classes=nc)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    raw = model.apply(variables, xj, train=False)
    ours = np.asarray(decode_predictions(raw, nc))

    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=2e-2)
    # boxes are in pixels (max ~320); tighter relative check
    rel = np.abs(ours[..., :4] - ref_out[..., :4]).max() / np.abs(
        ref_out[..., :4]
    ).max()
    assert rel < 1e-3
