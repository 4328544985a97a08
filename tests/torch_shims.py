"""Minimal timm shim so the reference torch models (/root/reference) can be
instantiated for converter parity tests without timm installed.  Provides
exactly the three symbols reference models/mae.py imports (mae.py:19-20):
DropPath, Mlp, to_2tuple."""
import importlib
import sys
import types

import torch
import torch.nn as nn


def import_reference(modname: str):
    """Import a module from /root/reference without leaving the reference on
    sys.path (it would shadow this repo's top-level main.py/model.py)."""
    install_timm_shim()
    sys.path.insert(0, "/root/reference")
    try:
        return importlib.import_module(modname)
    finally:
        sys.path.remove("/root/reference")


def install_timm_shim():
    if "timm" in sys.modules:
        return

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = torch.rand(x.shape[0], *([1] * (x.ndim - 1)), device=x.device) < keep
            return x * mask / keep

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    def to_2tuple(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vit_mod = types.ModuleType("timm.models.vision_transformer")
    vit_mod.DropPath = DropPath
    vit_mod.Mlp = Mlp
    layers = types.ModuleType("timm.models.layers")
    helpers = types.ModuleType("timm.models.layers.helpers")
    helpers.to_2tuple = to_2tuple
    layers.helpers = helpers
    models.vision_transformer = vit_mod
    models.layers = layers
    timm.models = models
    sys.modules.update({
        "timm": timm,
        "timm.models": models,
        "timm.models.vision_transformer": vit_mod,
        "timm.models.layers": layers,
        "timm.models.layers.helpers": helpers,
    })

    # torchvision stub (reference utils/torch_mlp_clf.py:24 imports
    # torchvision.datasets but the parity tests never touch it)
    tv = types.ModuleType("torchvision")
    tv_datasets = types.ModuleType("torchvision.datasets")
    tv.datasets = tv_datasets
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.datasets", tv_datasets)

    # tqdm-free einops already present; reference pos_embed.py uses np.float
    # (removed in numpy>=1.24)
    import numpy as np

    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
