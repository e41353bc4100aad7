"""End-to-end `-official` weights path: a fabricated OFFICIAL-LAYOUT torch
checkpoint goes through the converter CLI (`compat.torch_conversion.main`),
the msgpack lands in a pipeline config via `model.<comp>.weights_file`, the
eval loader (`eval/io.load_component_weights`) merges it into initialized
variables, and the resulting TwoViewPipeline forward produces the SAME
matched keypoint pairs as the executing torch reference (SuperPoint ->
LightGlue chained on identical inputs).

This is the path a real user of converted official weights exercises
(docs/weights.md); with random official-layout weights it proves the
plumbing + numerics end-to-end without any download.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torchref import load_reference  # noqa: E402

load_reference()

import gluefactory_tpu.compat.torch_conversion as conv  # noqa: E402
from gluefactory_tpu.eval.io import load_component_weights  # noqa: E402
from gluefactory_tpu.models import get_model  # noqa: E402

DIM, HEADS, LAYERS, K = 64, 2, 2, 64


def _save_ref_checkpoints(tmp_path):
    from gluefactory.models.matchers.lightglue import LightGlue as RefLightGlue
    from gluefactory_nonfree.superpoint import SuperPoint as RefSuperPoint

    torch.manual_seed(11)
    ref_sp = RefSuperPoint(
        {
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "nms_radius": 4,
            "remove_borders": 4,
            "legacy_sampling": False,
        }
    ).eval()
    ref_lg = RefLightGlue(
        {
            "features": None,
            "input_dim": 256,
            "descriptor_dim": DIM,
            "n_layers": LAYERS,
            "num_heads": HEADS,
            "flash": False,
            "depth_confidence": -1,
            "width_confidence": -1,
            "weights": None,
            "filter_threshold": 0.0,
        }
    ).eval()
    sp_path = tmp_path / "superpoint_v1.pth"
    lg_path = tmp_path / "superpoint_lightglue.pth"
    torch.save(ref_sp.state_dict(), sp_path)
    torch.save(ref_lg.state_dict(), lg_path)
    return ref_sp, ref_lg, sp_path, lg_path


def test_official_weights_path_end_to_end(tmp_path, monkeypatch):
    ref_sp, ref_lg, sp_path, lg_path = _save_ref_checkpoints(tmp_path)

    # 1. converter CLI (the exact command documented in docs/weights.md)
    sp_msgpack = tmp_path / "sp.msgpack"
    lg_msgpack = tmp_path / "lg.msgpack"
    monkeypatch.setattr(
        sys, "argv",
        ["torch_conversion", "superpoint", str(sp_path), str(sp_msgpack)],
    )
    conv.main()
    # lightglue's converter needs the architecture dims -> in-process call
    # with the same load/save plumbing the CLI uses
    sd = conv.load_torch_state_dict(str(lg_path))
    conv.save_params(
        conv.convert_lightglue(sd, n_layers=LAYERS, dim=DIM, num_heads=HEADS),
        str(lg_msgpack),
    )
    assert sp_msgpack.exists() and lg_msgpack.exists()

    # 2. pipeline config pointing at the msgpacks (role of the
    #    superpoint+lightglue-official.yaml recipe)
    pipeline = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint",
                "max_num_keypoints": K,
                "detection_threshold": 0.0,
                "nms_radius": 4,
                "remove_borders": 4,
                "trainable": False,
                "weights_file": str(sp_msgpack),
            },
            "matcher": {
                "name": "lightglue",
                "input_dim": 256,
                "descriptor_dim": DIM,
                "n_layers": LAYERS,
                "num_heads": HEADS,
                "filter_threshold": 0.0,
                "checkpointed": False,
                "weights_file": str(lg_msgpack),
            },
        }
    )

    import jax

    rng = np.random.default_rng(5)
    img0 = rng.uniform(0, 1, (1, 96, 128, 1)).astype(np.float32)
    img1 = np.clip(
        img0 + rng.normal(0, 0.02, img0.shape).astype(np.float32), 0, 1
    )
    size = np.asarray([[128.0, 96.0]], np.float32)
    batch = {
        "view0": {"image": jnp.asarray(img0), "image_size": jnp.asarray(size)},
        "view1": {"image": jnp.asarray(img1), "image_size": jnp.asarray(size)},
    }
    variables = pipeline.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch
    )
    variables = load_component_weights(pipeline, dict(variables))
    out = pipeline.apply(variables, batch, rngs={"sample": jax.random.key(2)})

    # 3. the executing reference chained on the same inputs
    with torch.no_grad():
        t0 = torch.from_numpy(img0.transpose(0, 3, 1, 2))
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        p0 = ref_sp({"image": t0})
        p1 = ref_sp({"image": t1})
        ref_out = ref_lg(
            {
                "keypoints0": p0["keypoints"],
                "keypoints1": p1["keypoints"],
                "descriptors0": p0["descriptors"],
                "descriptors1": p1["descriptors"],
                "view0": {"image_size": torch.from_numpy(size)},
                "view1": {"image_size": torch.from_numpy(size)},
            }
        )

    # keypoint ORDER differs between the static-top-K and the reference's
    # variable-size decode — align by (exact grid) position, then compare
    # the FULL log-assignment matrix and the match pairs through the
    # permutation. With random weights the match count is tiny (~1 mutual
    # fixed point of a random assignment); the log-assignment comparison is
    # the strong end-to-end numeric check.
    assert np.asarray(out["keypoint_mask0"])[0].all()
    assert np.asarray(out["keypoint_mask1"])[0].all()

    def perm_to_ref(my_kpts, ref_kpts):
        key = lambda p: (round(float(p[0]), 2), round(float(p[1]), 2))
        my_idx = {key(p): i for i, p in enumerate(np.asarray(my_kpts))}
        ref_k = [key(p) for p in np.asarray(ref_kpts)]
        assert set(my_idx) == set(ref_k), "keypoint sets differ"
        return np.asarray([my_idx[k] for k in ref_k])

    perm0 = perm_to_ref(np.asarray(out["keypoints0"])[0], p0["keypoints"][0].numpy())
    perm1 = perm_to_ref(np.asarray(out["keypoints1"])[0], p1["keypoints"][0].numpy())

    my_la = np.asarray(out["log_assignment"])[0][:K, :K][np.ix_(perm0, perm1)]
    ref_la = ref_out["log_assignment"][0][:K, :K].numpy()
    np.testing.assert_allclose(my_la, ref_la, atol=5e-4)

    # matches agree through the permutation
    inv1 = np.argsort(perm1)  # my kp1 index -> ref kp1 index
    my_m0 = np.asarray(out["matches0"])[0][perm0]
    my_m0_ref_idx = np.where(my_m0 >= 0, inv1[np.clip(my_m0, 0, K - 1)], -1)
    np.testing.assert_array_equal(
        my_m0_ref_idx, ref_out["matches0"][0].numpy()
    )


def test_official_weights_path_batch_stats(tmp_path, monkeypatch):
    """Same loop for a BatchNorm-carrying stack (SuperPoint-open +
    SuperGlue): the converters emit (params, batch_stats) and
    `load_component_weights` must merge BOTH collections."""
    import gluefactory.models.extractors.superpoint_open as ref_open_mod
    from gluefactory_nonfree.superglue import SuperGlue as RefSuperGlue

    monkeypatch.setattr(
        ref_open_mod.SuperPoint, "load_state_dict", lambda self, sd, **kw: None
    )
    monkeypatch.setattr(
        torch.hub, "load_state_dict_from_url", lambda *a, **kw: {}, raising=False
    )

    torch.manual_seed(3)
    ref_sp = ref_open_mod.SuperPoint(
        {
            "max_num_keypoints": K,
            "detection_threshold": 0.0,
            "nms_radius": 4,
            "remove_borders": 4,
        }
    ).eval()
    gen = torch.Generator().manual_seed(5)
    with torch.no_grad():
        for m in ref_sp.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=gen))
                m.bias.copy_(torch.rand(m.bias.shape, generator=gen) - 0.5)
                m.running_mean.copy_(
                    torch.rand(m.running_mean.shape, generator=gen) - 0.5
                )
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=gen)
                )
    n_layers = 2
    ref_sg = RefSuperGlue(
        {
            "weights": None,
            "descriptor_dim": 256,
            "GNN_layers": ["self", "cross"] * n_layers,
            "num_sinkhorn_iterations": 20,
            "filter_threshold": 0.2,
        }
    ).eval()

    sp_msgpack = tmp_path / "sp_open.msgpack"
    sg_msgpack = tmp_path / "sg.msgpack"
    sp_sd = {k: v.numpy() for k, v in ref_sp.state_dict().items()}
    sp_params, sp_stats = conv.convert_superpoint_open(sp_sd)
    conv.save_params(sp_params, str(sp_msgpack), sp_stats)
    sg_sd = {k: v.numpy() for k, v in ref_sg.state_dict().items()}
    sg_params, sg_stats = conv.convert_superglue(
        sg_sd, n_layers=n_layers, dim=256, num_heads=4
    )
    conv.save_params(sg_params, str(sg_msgpack), sg_stats)

    pipeline = get_model("two_view_pipeline").from_conf(
        {
            "extractor": {
                "name": "superpoint_open",
                "max_num_keypoints": K,
                "detection_threshold": 0.0,
                "nms_radius": 4,
                "remove_borders": 4,
                "trainable": False,
                "weights_file": str(sp_msgpack),
            },
            "matcher": {
                "name": "superglue",
                "descriptor_dim": 256,
                "n_layers": n_layers,
                "sinkhorn_iterations": 20,
                "filter_threshold": 0.2,
                "checkpointed": False,
                "weights_file": str(sg_msgpack),
            },
        }
    )

    import jax

    rng = np.random.default_rng(9)
    img0 = rng.uniform(0, 1, (1, 96, 128, 1)).astype(np.float32)
    img1 = np.clip(
        img0 + rng.normal(0, 0.02, img0.shape).astype(np.float32), 0, 1
    )
    size = np.asarray([[128.0, 96.0]], np.float32)
    batch = {
        "view0": {"image": jnp.asarray(img0), "image_size": jnp.asarray(size)},
        "view1": {"image": jnp.asarray(img1), "image_size": jnp.asarray(size)},
    }
    variables = pipeline.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch
    )
    variables = load_component_weights(pipeline, dict(variables))
    out = pipeline.apply(variables, batch, rngs={"sample": jax.random.key(2)})

    with torch.no_grad():
        t0 = torch.from_numpy(img0.transpose(0, 3, 1, 2))
        t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
        p0 = ref_sp({"image": t0})
        p1 = ref_sp({"image": t1})
        ref_out = ref_sg(
            {
                "keypoints0": p0["keypoints"],
                "keypoints1": p1["keypoints"],
                "descriptors0": p0["descriptors"],
                "descriptors1": p1["descriptors"],
                "keypoint_scores0": p0["keypoint_scores"],
                "keypoint_scores1": p1["keypoint_scores"],
                "view0": {
                    "image": t0,
                    "image_size": torch.from_numpy(size),
                },
                "view1": {
                    "image": t1,
                    "image_size": torch.from_numpy(size),
                },
            }
        )

    assert np.asarray(out["keypoint_mask0"])[0].all()
    assert np.asarray(out["keypoint_mask1"])[0].all()

    def perm_to_ref(my_kpts, ref_kpts):
        key = lambda p: (round(float(p[0]), 2), round(float(p[1]), 2))
        my_idx = {key(p): i for i, p in enumerate(np.asarray(my_kpts))}
        ref_k = [key(p) for p in np.asarray(ref_kpts)]
        assert set(my_idx) == set(ref_k), "keypoint sets differ"
        return np.asarray([my_idx[k] for k in ref_k])

    perm0 = perm_to_ref(np.asarray(out["keypoints0"])[0], p0["keypoints"][0].numpy())
    perm1 = perm_to_ref(np.asarray(out["keypoints1"])[0], p1["keypoints"][0].numpy())

    my_la = np.asarray(out["log_assignment"])[0][:K, :K][np.ix_(perm0, perm1)]
    ref_la = ref_out["log_assignment"][0][:K, :K].numpy()
    np.testing.assert_allclose(my_la, ref_la, atol=1e-3)
