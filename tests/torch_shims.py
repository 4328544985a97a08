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

    class PatchEmbed(nn.Module):
        """timm PatchEmbed (conv proj, flatten to (B, N, D)) — the old-tree
        mae.py imports it directly (old/models/mae.py:19,106)."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True):
            super().__init__()
            img_size = to_2tuple(img_size)
            patch_size = to_2tuple(patch_size)
            self.img_size = img_size
            self.patch_size = patch_size
            self.grid_size = (img_size[0] // patch_size[0],
                              img_size[1] // patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim,
                                  kernel_size=patch_size, stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vit_mod = types.ModuleType("timm.models.vision_transformer")
    vit_mod.DropPath = DropPath
    vit_mod.PatchEmbed = PatchEmbed
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


def install_torchaudio_shim():
    """torchaudio.transforms.MelSpectrogram built from its documented
    algorithm (torch.stft center/reflect/periodic-hann + HTK mel filterbank,
    norm=None, power=2) — torchaudio itself is not installed here.  Same
    oracle construction as tests/test_mel.py."""
    if "torchaudio" in sys.modules:
        return
    import numpy as np

    class MelSpectrogram(nn.Module):
        def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                     hop_length=None, f_min=0.0, f_max=None, n_mels=128,
                     power=2.0, **_ignored):
            super().__init__()
            self.sample_rate = sample_rate
            self.n_fft = n_fft
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.win_length // 2
            self.power = power
            f_max = f_max if f_max is not None else sample_rate / 2.0
            n_freqs = n_fft // 2 + 1

            def to_mel(f):
                return 2595.0 * np.log10(1.0 + f / 700.0)

            def from_mel(m):
                return 700.0 * (10 ** (m / 2595.0) - 1.0)

            freqs = np.linspace(0, sample_rate / 2, n_freqs)
            mels = np.linspace(to_mel(f_min), to_mel(f_max), n_mels + 2)
            fpts = from_mel(mels)
            fb = np.zeros((n_freqs, n_mels), np.float32)
            for m in range(n_mels):
                lo, ce, hi = fpts[m], fpts[m + 1], fpts[m + 2]
                up = (freqs - lo) / (ce - lo)
                down = (hi - freqs) / (hi - ce)
                fb[:, m] = np.clip(np.minimum(up, down), 0, None)
            self.register_buffer("fb", torch.from_numpy(fb))
            self.register_buffer(
                "window", torch.hann_window(self.win_length, periodic=True)
            )

        def forward(self, wav):
            st = torch.stft(
                wav, n_fft=self.n_fft, hop_length=self.hop_length,
                win_length=self.win_length, window=self.window, center=True,
                pad_mode="reflect", normalized=False, onesided=True,
                return_complex=True,
            )
            spec = st.abs() ** self.power                  # (..., F, T)
            return torch.matmul(
                spec.transpose(-1, -2), self.fb
            ).transpose(-1, -2)                            # (..., n_mels, T)

    ta = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")
    transforms.MelSpectrogram = MelSpectrogram
    ta.transforms = transforms
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = transforms


def install_easydict_shim():
    if "easydict" in sys.modules:
        return
    try:
        import easydict  # noqa: F401

        return
    except ImportError:
        pass

    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in {**(d or {}), **kw}.items():
                self[k] = EasyDict(v) if isinstance(v, dict) else v
                setattr(self, k, self[k])

        def get(self, k, default=None):
            return dict.get(self, k, default)

    ed = types.ModuleType("easydict")
    ed.EasyDict = EasyDict
    sys.modules["easydict"] = ed


def import_reference_hear(modname: str):
    """Import a module from the reference's `hear` namespace package (e.g.
    "hear.sample.vit").  The repo's own regular `hear` package would win the
    import-system race, so the reference tree is wired in via synthetic
    package objects for the duration of the import."""
    install_timm_shim()
    install_torchaudio_shim()
    install_easydict_shim()
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "hear" or k.startswith("hear.")}
    sys.path.insert(0, "/root/reference")
    try:
        pkg = types.ModuleType("hear")
        pkg.__path__ = ["/root/reference/hear"]
        sys.modules["hear"] = pkg
        sub = types.ModuleType("hear.sample")
        sub.__path__ = ["/root/reference/hear/sample"]
        sys.modules["hear.sample"] = sub
        return importlib.import_module(modname)
    finally:
        sys.path.remove("/root/reference")
        for k in list(sys.modules):
            if k == "hear" or k.startswith("hear."):
                del sys.modules[k]
        sys.modules.update(saved)


def install_audio_dep_stubs():
    """Empty-module stubs for the heavyweight audio deps the reference's
    old-tree data_manager imports at module scope (librosa, audiomentations)
    — absent in this environment and unused by the objective/oracle code
    paths the tests exercise."""
    if "librosa" not in sys.modules:
        sys.modules["librosa"] = types.ModuleType("librosa")
    if "torchaudio.functional" not in sys.modules:
        taf = types.ModuleType("torchaudio.functional")
        sys.modules["torchaudio.functional"] = taf
        ta = sys.modules.get("torchaudio")
        if ta is not None:
            ta.functional = taf
            # mark as package so `import torchaudio.functional` resolves
            if not hasattr(ta, "__path__"):
                ta.__path__ = []
    if "audiomentations" not in sys.modules:
        am = types.ModuleType("audiomentations")
        for name in ("Compose", "TimeStretch", "PitchShift"):
            setattr(am, name, type(name, (), {}))
        sys.modules["audiomentations"] = am
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.ModuleType("wandb")


def import_reference_old(modname: str):
    """Import a module from the reference's legacy tree (/root/reference/old)
    — e.g. "methods.dino" or "utils.utils" — with its own root on sys.path
    (its intra-package imports are absolute: `from utils import utils`,
    `from models import mae`).  Any live modules that would collide with the
    old tree's top-level package names are parked for the duration."""
    install_timm_shim()
    install_torchaudio_shim()
    install_easydict_shim()
    install_audio_dep_stubs()
    roots = ("utils", "models", "methods", "data_manager", "byola")
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k.split(".")[0] in roots}
    sys.path.insert(0, "/root/reference/old")
    try:
        return importlib.import_module(modname)
    finally:
        sys.path.remove("/root/reference/old")
        for k in list(sys.modules):
            if k.split(".")[0] in roots:
                del sys.modules[k]
        sys.modules.update(saved)
