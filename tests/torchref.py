"""Load the EXECUTING torch reference (/root/reference) for non-circular
weight-converter parity tests.

The reference needs only torch (installed, CPU) plus `omegaconf` and — for
ALIKED — two `torchvision` symbols; neither package exists in this
environment, so this module installs minimal test-only shims into
``sys.modules`` before importing the reference package.  The shims implement
just the API surface the reference touches (see
`/root/reference/gluefactory/models/base_model.py:8-90` for omegaconf and
`/root/reference/gluefactory/models/extractors/aliked.py:5-8,320` for
torchvision).

This makes parity tests *non-circular*: the torch side is the actual
reference code executing, not a numpy re-derivation of its semantics.
"""

from __future__ import annotations

import contextlib
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


# ---------------------------------------------------------------------------
# omegaconf shim
# ---------------------------------------------------------------------------


def _wrap(value):
    if isinstance(value, DictConfig):
        return value
    if isinstance(value, dict):
        return DictConfig(value)
    if isinstance(value, tuple):
        return list(value)
    return value


class DictConfig(dict):
    """Mutable dict with attribute access; recursive wrapping of sub-dicts."""

    def __init__(self, data=None):
        super().__init__()
        for k, v in dict(data or {}).items():
            self[k] = v

    def __setitem__(self, key, value):
        super().__setitem__(key, _wrap(value))

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key) from None

    def __setattr__(self, key, value):
        self[key] = value

    def __deepcopy__(self, memo):
        import copy

        return DictConfig({k: copy.deepcopy(v, memo) for k, v in self.items()})


class OmegaConf:
    @staticmethod
    def create(data=None):
        if data is None:
            return DictConfig()
        if isinstance(data, str):
            import yaml

            return DictConfig(yaml.safe_load(data) or {})
        return DictConfig(dict(data))

    @staticmethod
    def merge(*configs):
        out = DictConfig()
        for conf in configs:
            if conf is None:
                continue
            _merge_into(out, conf)
        return out

    @staticmethod
    def set_struct(conf, flag):  # struct/readonly are advisory in the shim
        pass

    @staticmethod
    def set_readonly(conf, flag):
        pass

    @staticmethod
    def is_readonly(conf):
        return False

    @staticmethod
    def to_container(conf, resolve=False):
        def plain(v):
            if isinstance(v, dict):
                return {k: plain(x) for k, x in v.items()}
            if isinstance(v, list):
                return [plain(x) for x in v]
            return v

        return plain(conf)

    @staticmethod
    def to_yaml(conf):
        import yaml

        return yaml.safe_dump(OmegaConf.to_container(conf), sort_keys=False)


def _merge_into(dst: DictConfig, src):
    for key, value in dict(src).items():
        if isinstance(value, dict) and isinstance(dst.get(key), dict):
            _merge_into(dst[key], value)
        else:
            dst[key] = value


@contextlib.contextmanager
def _passthrough(conf):
    yield conf


def _make_omegaconf_module() -> types.ModuleType:
    mod = types.ModuleType("omegaconf")
    mod.DictConfig = DictConfig
    mod.ListConfig = list
    mod.OmegaConf = OmegaConf
    mod.read_write = _passthrough
    mod.open_dict = _passthrough
    return mod


# ---------------------------------------------------------------------------
# torchvision shim (only what ALIKED touches)
# ---------------------------------------------------------------------------


def _deform_conv2d(input, offset, weight, bias=None, stride=(1, 1), padding=(0, 0), dilation=(1, 1), mask=None):
    """Pure-torch modulated deformable convolution (DCNv2 semantics).

    Implements the documented contract of ``torchvision.ops.deform_conv2d``:
    for output location p and kernel tap k, sample the input bilinearly at
    ``p*stride - padding + k*dilation + offset[..., k, p]`` (zeros outside),
    scale by ``mask[..., k, p]`` if given, and combine with ``weight``.
    Written from the torchvision documentation, not from any JAX code, so it
    can serve as the reference side of a parity test.
    """
    import torch
    import torch.nn.functional as F

    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    B, C_in, H, W = input.shape
    C_out, C_in_w, kh, kw = weight.shape
    assert C_in_w == C_in, "groups unsupported in shim"
    H_out = (H + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    W_out = (W + 2 * padding[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1
    K = kh * kw
    # offset: (B, 2K, H_out, W_out) with channel layout [y0, x0, y1, x1, ...]
    off = offset.view(B, K, 2, H_out, W_out)
    oy, ox = off[:, :, 0], off[:, :, 1]  # (B, K, H_out, W_out)
    device, dtype = input.device, input.dtype
    py = torch.arange(H_out, device=device, dtype=dtype) * stride[0] - padding[0]
    px = torch.arange(W_out, device=device, dtype=dtype) * stride[1] - padding[1]
    ky = torch.arange(kh, device=device, dtype=dtype) * dilation[0]
    kx = torch.arange(kw, device=device, dtype=dtype) * dilation[1]
    ktap_y = ky[:, None].expand(kh, kw).reshape(K)
    ktap_x = kx[None, :].expand(kh, kw).reshape(K)
    sy = py[None, None, :, None] + ktap_y[None, :, None, None] + oy  # (B,K,Ho,Wo)
    sx = px[None, None, None, :] + ktap_x[None, :, None, None] + ox

    # bilinear sampling with zero padding outside
    def gather(iy, ix):
        valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        iyc = iy.clamp(0, H - 1).long()
        ixc = ix.clamp(0, W - 1).long()
        flat = (iyc * W + ixc).view(B, -1)  # (B, K*Ho*Wo)
        vals = torch.gather(
            input.view(B, C_in, H * W), 2, flat.unsqueeze(1).expand(B, C_in, flat.shape[1])
        ).view(B, C_in, K, H_out, W_out)
        return vals * valid.unsqueeze(1)

    y0, x0 = sy.floor(), sx.floor()
    wy, wx = sy - y0, sx - x0
    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    w00 = ((1 - wy) * (1 - wx)).unsqueeze(1)
    w01 = ((1 - wy) * wx).unsqueeze(1)
    w10 = (wy * (1 - wx)).unsqueeze(1)
    w11 = (wy * wx).unsqueeze(1)
    samples = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11  # (B,C_in,K,Ho,Wo)
    if mask is not None:
        samples = samples * mask.view(B, 1, K, H_out, W_out)
    out = torch.einsum("bckp,ock->bop", samples.view(B, C_in, K, -1), weight.view(C_out, C_in, K))
    out = out.view(B, C_out, H_out, W_out)
    if bias is not None:
        out = out + bias.view(1, C_out, 1, 1)
    return out


def _make_torchvision_module() -> types.ModuleType:
    import torch.nn as nn

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.deform_conv2d = _deform_conv2d
    models = types.ModuleType("torchvision.models")
    resnet = types.ModuleType("torchvision.models.resnet")

    def conv3x3(in_planes, out_planes, stride=1, groups=1, dilation=1):
        return nn.Conv2d(
            in_planes,
            out_planes,
            kernel_size=3,
            stride=stride,
            padding=dilation,
            groups=groups,
            bias=False,
            dilation=dilation,
        )

    def conv1x1(in_planes, out_planes, stride=1):
        return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride, bias=False)

    resnet.conv3x3 = conv3x3
    resnet.conv1x1 = conv1x1
    models.resnet = resnet
    tv.ops = ops
    tv.models = models
    for mod in (tv, ops, models, resnet):
        _give_spec(mod)
    return tv, ops, models, resnet


# ---------------------------------------------------------------------------
# albumentations shim (only construction: the conf-merge parity tests read
# `photo_augment.conf`, they never execute a transform pipeline)
# ---------------------------------------------------------------------------


class _ShimTransform:
    """Stands in for any albumentations transform/compose class: accepts any
    constructor signature (reference `datasets/augmentations.py` builds ~20
    different A.* transforms at dataset construction time)."""

    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs

    def __call__(self, *args, **kwargs):
        raise NotImplementedError(
            "albumentations shim supports construction only (conf parity tests)"
        )


def _make_albumentations_module():
    A = types.ModuleType("albumentations")

    def _shim_getattr(name: str):
        # PEP 562: every A.* transform class — but NOT dunders: inspect/
        # importlib probe module attributes like __file__ and must get a
        # clean AttributeError, not a class (torch.library's custom_op
        # walks module files at import time)
        if name.startswith("__"):
            raise AttributeError(name)
        return _ShimTransform

    A.__getattr__ = _shim_getattr
    A.ImageOnlyTransform = _ShimTransform
    pytorch = types.ModuleType("albumentations.pytorch")
    transforms = types.ModuleType("albumentations.pytorch.transforms")
    transforms.ToTensorV2 = _ShimTransform
    pytorch.transforms = transforms
    A.pytorch = pytorch
    for mod in (A, pytorch, transforms):
        _give_spec(mod)
    return A, pytorch, transforms


def _give_spec(mod: types.ModuleType) -> None:
    """`importlib.util.find_spec` raises ValueError on an in-sys.modules
    module whose __spec__ is None (e.g. transformers probes torchvision at
    import time) — give shim modules a minimal ModuleSpec."""
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

_loaded = False


def load_reference():
    """Make `import gluefactory` resolve to the executing reference package."""
    global _loaded
    if not _loaded:
        if "omegaconf" not in sys.modules:
            try:
                import omegaconf  # noqa: F401
            except ImportError:
                _om = _make_omegaconf_module()
                _give_spec(_om)
                sys.modules["omegaconf"] = _om
        if "torchvision" not in sys.modules:
            try:
                import torchvision  # noqa: F401
            except ImportError:
                tv, ops, models, resnet = _make_torchvision_module()
                sys.modules["torchvision"] = tv
                sys.modules["torchvision.ops"] = ops
                sys.modules["torchvision.models"] = models
                sys.modules["torchvision.models.resnet"] = resnet
        if "albumentations" not in sys.modules:
            try:
                import albumentations  # noqa: F401
            except ImportError:
                A, pytorch, transforms = _make_albumentations_module()
                sys.modules["albumentations"] = A
                sys.modules["albumentations.pytorch"] = pytorch
                sys.modules["albumentations.pytorch.transforms"] = transforms
        if "kornia" not in sys.modules:
            try:
                import kornia  # noqa: F401
            except ImportError:
                # geometry/depth.py imports kornia only for depth_to_normals
                # (unused by the code paths under test)
                k = types.ModuleType("kornia")
                kg = types.ModuleType("kornia.geometry")
                kd = types.ModuleType("kornia.geometry.depth")

                def _unavailable(*a, **kw):
                    raise NotImplementedError("kornia is not installed")

                kd.depth_to_normals = _unavailable
                kh = types.ModuleType("kornia.geometry.homography")
                # eval/utils.py imports this at module scope; only
                # eval_homography_dlt calls it (not under parity test)
                kh.find_homography_dlt = _unavailable
                kg.depth = kd
                kg.homography = kh
                k.geometry = kg
                for _m in (k, kg, kd, kh):
                    _give_spec(_m)
                sys.modules["kornia"] = k
                sys.modules["kornia.geometry"] = kg
                sys.modules["kornia.geometry.depth"] = kd
                sys.modules["kornia.geometry.homography"] = kh
        # Resolve ONLY `gluefactory` / `gluefactory_nonfree` from the
        # reference checkout via a meta-path finder.  /root/reference must
        # NOT go on sys.path: its `tests/` is a regular package (has
        # __init__.py) and a regular package shadows this repo's namespace
        # `tests` package from ANY sys.path position (breaking e.g. the
        # dotted-path lr-schedule test's
        # pydoc.locate('tests.test_config._half_lr')).
        import importlib.abc
        import importlib.machinery

        class _RefFinder(importlib.abc.MetaPathFinder):
            _names = ("gluefactory", "gluefactory_nonfree")

            def find_spec(self, fullname, path=None, target=None):
                if fullname.split(".")[0] not in self._names:
                    return None
                return importlib.machinery.PathFinder.find_spec(
                    fullname, path if path is not None else [str(REFERENCE)]
                )

        if not any(type(f).__name__ == "_RefFinder" for f in sys.meta_path):
            sys.meta_path.append(_RefFinder())
        # Zero-egress environment: neutralize the reference's pretrained-weight
        # auto-downloads (e.g. superpoint.py:199). strict=False loads of an
        # empty dict keep the default random init, which is exactly what the
        # random-weights parity tests need.
        import torch.hub

        torch.hub.load_state_dict_from_url = lambda *a, **k: {}
        _loaded = True
    import gluefactory  # noqa: F401

    return gluefactory
