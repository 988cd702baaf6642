"""Helpers to import the upstream PyTorch reference for parity testing.

The reference depends on timm for three utilities; timm is not installed
here, so a minimal shim is injected before import. This module is used
ONLY by tests — the framework itself never touches the reference code.
"""

import sys
import types

import numpy as np

REFERENCE = "/root/reference"


def _install_timm_shim():
    if "timm.models.layers" in sys.modules:
        return
    import torch
    from torch import nn

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn=None, **kw: (fn if fn is not None
                                                     else (lambda f: f))
    models.layers = layers
    models.registry = registry
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm.models.registry"] = registry


def import_reference_networks():
    """Returns the reference 'networks' modules (torch), shimmed."""
    _install_timm_shim()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import networks.swin_transformer_sr as swin_sr  # noqa
    import networks.swinIR_variations as variations  # noqa

    return swin_sr, variations


def torch_forward_nhwc(model, x_nhwc: np.ndarray, *extra) -> np.ndarray:
    """Run a torch NCHW model on NHWC numpy input, return NHWC numpy."""
    import torch

    model.eval()
    with torch.no_grad():
        t = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
        y = model(t.float(), *extra)
    return y.numpy().transpose(0, 2, 3, 1)
