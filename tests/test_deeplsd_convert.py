"""DeepLSD official-checkpoint converter: structure round-trip + numeric
parity against a torch mirror of the package layout.

VERDICT r2 mandate #5. The `deeplsd` package is not installable here
(zero egress), so the test fabricates a state dict in the documented
`deeplsd_inference.DeepLSD` layout (VGGUNet + df/angle Sequential heads),
converts it with `convert_deeplsd`, and checks the flax
`DeepLSDPackageNet` forward matches a torch execution of the same
architecture on the same input. Executing-package parity remains pending
the real package (docs/weights.md).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gluefactory_tpu.compat.torch_conversion import convert_deeplsd  # noqa: E402
from gluefactory_tpu.models.lines.deeplsd import DeepLSDPackageNet  # noqa: E402


def _double_conv(cin, cout):
    return torch.nn.Sequential(
        torch.nn.Conv2d(cin, cout, 3, padding=1),
        torch.nn.BatchNorm2d(cout),
        torch.nn.ReLU(inplace=True),
        torch.nn.Conv2d(cout, cout, 3, padding=1),
        torch.nn.BatchNorm2d(cout),
        torch.nn.ReLU(inplace=True),
    )


class _TorchVGGUNet(torch.nn.Module):
    """Mirror of the assumed official VGGUNet (non-tiny): DoubleConv
    encoder with max-pool between blocks, bilinear-upsample +
    skip-concat decoder."""

    def __init__(self):
        super().__init__()
        self.inc = _double_conv(1, 32)
        self.down1 = _double_conv(32, 64)
        self.down2 = _double_conv(64, 128)
        self.down3 = _double_conv(128, 128)
        self.up1 = _double_conv(128 + 128, 64)
        self.up2 = _double_conv(64 + 64, 32)
        self.up3 = _double_conv(32 + 32, 32)

    def forward(self, x):
        pool = torch.nn.functional.max_pool2d
        up = lambda t: torch.nn.functional.interpolate(  # noqa: E731
            t, scale_factor=2, mode="bilinear", align_corners=False
        )
        x1 = self.inc(x)
        x2 = self.down1(pool(x1, 2))
        x3 = self.down2(pool(x2, 2))
        x4 = self.down3(pool(x3, 2))
        y = self.up1(torch.cat([x3, up(x4)], 1))
        y = self.up2(torch.cat([x2, up(y)], 1))
        y = self.up3(torch.cat([x1, up(y)], 1))
        return y


def _head(dim, last_act):
    return torch.nn.Sequential(
        torch.nn.Conv2d(dim, 32, 3, padding=1),
        torch.nn.ReLU(inplace=True),
        torch.nn.BatchNorm2d(32),
        torch.nn.Conv2d(32, 32, 3, padding=1),
        torch.nn.ReLU(inplace=True),
        torch.nn.BatchNorm2d(32),
        torch.nn.Conv2d(32, 1, 1),
        last_act,
    )


class _TorchDeepLSD(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = _TorchVGGUNet()
        self.df_head = _head(32, torch.nn.ReLU())
        self.angle_head = _head(32, torch.nn.Sigmoid())

    def forward(self, x):
        feat = self.backbone(x)
        return self.df_head(feat)[:, 0], self.angle_head(feat)[:, 0] * math.pi


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = _TorchDeepLSD()
    # randomize BN stats so the running-average path is actually tested
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    return net.eval()


def test_convert_deeplsd_roundtrip(torch_net):
    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    params, stats, spec = convert_deeplsd(sd)
    assert spec["enc"] == ((32, 32), (64, 64), (128, 128), (128, 128))
    assert spec["dec"] == ((64, 64), (32, 32), (32, 32))
    assert spec["head"] == (32, 32)

    net = DeepLSDPackageNet(enc=spec["enc"], dec=spec["dec"], head=spec["head"])
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (2, 64, 80, 1)).astype(np.float32)

    df, angle = net.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(img), train=False
    )
    with torch.no_grad():
        df_norm_t, angle_t = torch_net(torch.from_numpy(img).permute(0, 3, 1, 2))
    # the flax net folds the package's DF denormalization in: exp(-df_norm)
    df_t = np.minimum(np.exp(-df_norm_t.numpy()), 1.0)
    np.testing.assert_allclose(np.asarray(df), df_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(angle), angle_t.numpy(), atol=2e-5)


def test_convert_deeplsd_maps_every_tensor(torch_net):
    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    params, stats, _ = convert_deeplsd(sd)
    n_in = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    n_out = sum(np.asarray(leaf).size > 0 for leaf in jax.tree.leaves(params))
    n_out += sum(np.asarray(leaf).size > 0 for leaf in jax.tree.leaves(stats))
    assert n_in == n_out, (n_in, n_out)


def test_convert_deeplsd_rejects_unknown_topology(torch_net):
    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    sd["backbone.extra.weight"] = np.zeros((8, 99, 3, 3), np.float32)
    with pytest.raises(ValueError):
        convert_deeplsd(sd)


def test_package_layout_backend_runs(torch_net):
    """backend: package-layout drives the converted net through the shared
    field vectorizer to padded/masked line outputs."""
    from gluefactory_tpu.models import get_model

    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()}
    params, stats, spec = convert_deeplsd(sd)
    model = get_model("deeplsd").from_conf(
        {
            "backend": "package-layout",
            "package_spec": {k: list(map(list, v)) if k != "head" else list(v)
                             for k, v in spec.items()},
            "max_num_lines": 16,
        }
    )
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 80, 1)).astype(np.float32))
    pred = model.apply(
        {"params": {"net": params}, "batch_stats": {"net": stats}}, {"image": img}
    )
    assert pred["lines"].shape == (1, 16, 2, 2)
    assert pred["line_scores"].shape == (1, 16)
    assert pred["line_mask"].shape == (1, 16)
    assert np.isfinite(np.asarray(pred["df"])).all()
    assert (np.asarray(pred["df"]) >= 0).all() and (np.asarray(pred["df"]) <= 1).all()
