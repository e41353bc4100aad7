"""MegaDepth split parity: (a) the packaged canonical scene lists byte-match
the reference's data files; (b) `sample_new_items` produces the exact same
item sequence as the EXECUTING reference on a fabricated multi-scene D2-Net
layout (same seeds, same RNG call order)."""

from pathlib import Path

import numpy as np
import pytest

REF_LISTS = Path("/root/reference/gluefactory/datasets/megadepth_scene_lists")
PKG_LISTS = (
    Path(__file__).parent.parent
    / "gluefactory_tpu"
    / "data"
    / "megadepth_scene_lists"
)

LIST_FILES = [
    "train_scenes.txt",
    "train_scenes_clean.txt",
    "valid_scenes.txt",
    "valid_scenes_clean.txt",
    "test_scenes_clean.txt",
    "valid_pairs.txt",
]


@pytest.mark.skipif(not REF_LISTS.exists(), reason="reference checkout absent")
@pytest.mark.parametrize("name", LIST_FILES)
def test_packaged_scene_lists_byte_match(name):
    assert (PKG_LISTS / name).read_bytes() == (REF_LISTS / name).read_bytes()


def test_default_split_uses_packaged_lists():
    """With no scene_lists/ in the data dir, the canonical packaged lists
    resolve (the reference's split is the default)."""
    import gluefactory_tpu.data.megadepth as md

    items = md._MegaDepthItems.__new__(md._MegaDepthItems)
    items.scene_lists_path = Path("/nonexistent/scene_lists")
    items.split = "train"
    path = items._resolve_scene_list("train_scenes_clean.txt")
    assert path == PKG_LISTS / "train_scenes_clean.txt"
    scenes = path.read_text().rstrip("\n").split("\n")
    assert len(scenes) == 153 and scenes[0].strip() != ""


# ---------------------------------------------------------------------------
# executing-reference parity of the pair sampler
# ---------------------------------------------------------------------------


def _fabricate_scene_infos(root: Path, rng: np.random.Generator, n_scenes=2, n_imgs=14):
    (root / "scene_info").mkdir(parents=True)
    scenes = []
    for s in range(n_scenes):
        scene = f"{s:04d}"
        image_paths = np.array(
            [f"Undistorted_SfM/{scene}/images/im{i}.jpg" for i in range(n_imgs)],
            object,
        )
        depth_paths = np.array(
            [f"depth_undistorted/{scene}/im{i}.h5" for i in range(n_imgs)], object
        )
        # a couple of missing entries to exercise the validity mask
        image_paths[1] = None
        depth_paths[2] = None
        overlap = rng.uniform(0.0, 1.0, (n_imgs, n_imgs))
        overlap[rng.uniform(size=overlap.shape) < 0.3] = 0.0
        np.fill_diagonal(overlap, 1.0)
        np.savez(
            root / "scene_info" / f"{scene}.npz",
            image_paths=image_paths,
            depth_paths=depth_paths,
            poses=np.tile(np.eye(4, dtype=np.float32)[None], (n_imgs, 1, 1)),
            intrinsics=np.tile(np.eye(3, dtype=np.float32)[None], (n_imgs, 1, 1)),
            overlap_matrix=overlap,
        )
        scenes.append(scene)
    return scenes


def _norm_items(items):
    return [
        (it[0],) + tuple(int(v) for v in it[1:-1]) + (round(float(it[-1]), 6),)
        for it in items
    ]


@pytest.mark.torchref
@pytest.mark.parametrize(
    "sampling",
    [
        {"train_num_per_scene": 20, "num_overlap_bins": 3},
        {"train_num_per_scene": [16, 4], "num_overlap_bins": 2},
        {"train_num_per_scene": 20, "num_overlap_bins": 3, "sort_by_overlap": True},
        {"train_num_per_scene": None},
    ],
)
def test_sample_new_items_parity(tmp_path, monkeypatch, sampling):
    torch = pytest.importorskip("torch")  # noqa: F841
    from torchref import load_reference

    load_reference()
    import gluefactory.datasets.megadepth as ref_md
    from omegaconf import OmegaConf

    import gluefactory_tpu.data.megadepth as my_md

    root = tmp_path / "megadepth"
    scenes = _fabricate_scene_infos(root, np.random.default_rng(7))

    conf = {
        **{
            k: v
            for k, v in my_md.MegaDepth.default_conf.items()
            if k not in ("scene_lists_dir", "detect_lines")
        },
        "train_split": scenes,
        "min_overlap": 0.1,
        "max_overlap": 0.7,
        **sampling,
    }
    ref_conf = OmegaConf.create(conf)

    monkeypatch.setattr(ref_md, "DATA_PATH", tmp_path)
    monkeypatch.setattr(my_md, "DATA_PATH", tmp_path)

    from gluefactory_tpu.core.config import Config

    ref_ds = ref_md._PairDataset(ref_conf, "train", load_sample=False)
    my_items = my_md._MegaDepthItems(
        Config({**conf, "scene_lists_dir": "scene_lists/", "detect_lines": {"do": False}}),
        "train",
        load_sample=False,
    )
    for seed in (0, 1, 42):
        ref_ds.sample_new_items(seed)
        my_items.sample_new_items(seed)
        assert _norm_items(my_items.items) == _norm_items(ref_ds.items), (
            f"seed {seed}: item sequences diverge"
        )
        assert len(ref_ds.items) > 0
