"""HPatches homography-benchmark dataset (role of reference
`datasets/hpatches.py:37-148`).

Layout: `hpatches-sequences-release/<i_X|v_X>/{1..6}.ppm, H_1_{2..6}`.
116 sequences x 5 pairs; 8 over-large scenes excluded. The GT homography is
rescaled into processed coordinates via the per-view preprocessing scales.
No auto-download (zero-egress): point `data_dir` at an existing copy.
"""

from __future__ import annotations

import numpy as np

from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .preprocess import ImagePreprocessor, read_image

# scenes excluded by the reference (image size > 1200px, hpatches.py:47-56)
IGNORED_SCENES = (
    "i_contruction",
    "i_crownnight",
    "i_dc",
    "i_pencils",
    "i_whitebuilding",
    "v_artisans",
    "v_astronautis",
    "v_talent",
)


def read_homography(path) -> np.ndarray:
    with open(path) as f:
        result = []
        for line in f.readlines():
            while "  " in line:
                line = line.replace("  ", " ")
            line = line.replace(" \n", "").replace("\n", "")
            for coeff in line.split(" "):
                if coeff != "":
                    result.append(float(coeff))
    return np.array(result).reshape(3, 3).astype(np.float32)


class _HPatchesItems:
    def __init__(self, parent, items):
        self.parent = parent
        self.items = items
        self.conf = parent.conf

    def __len__(self):
        return len(self.items)

    def _read_view(self, seq: str, idx: int) -> dict:
        path = self.parent.root / seq / f"{idx}.ppm"
        img = read_image(path, grayscale=self.conf.grayscale)
        out = self.parent.preprocessor(img)
        return out

    def __getitem__(self, i: int) -> dict:
        seq, q_idx = self.items[i]
        view0 = self._read_view(seq, 1)
        view1 = self._read_view(seq, q_idx)
        H = read_homography(self.parent.root / seq / f"H_1_{q_idx}")
        # rescale into processed coordinates: H' = S1 H S0^-1
        s0 = view0["scales"]
        s1 = view1["scales"]
        S0_inv = np.diag([1.0 / s0[0], 1.0 / s0[1], 1.0])
        S1 = np.diag([s1[0], s1[1], 1.0])
        H = (S1 @ H @ S0_inv).astype(np.float32)
        return {
            "view0": view0,
            "view1": view1,
            "H_0to1": H,
            "idx": i,
            "name": f"{seq}/{q_idx}.ppm",
            "scene": seq,
        }


class HPatchesDataset(BaseDataset):
    default_conf = {
        "data_dir": "hpatches-sequences-release",
        "preprocessing": {"resize": 480, "side": "short"},
        "subset": None,  # "i" | "v" | None
        "ignore_large_images": True,
        "grayscale": False,
    }

    def _init(self, conf):
        self.root = DATA_PATH / conf.data_dir
        if not self.root.exists():
            raise FileNotFoundError(
                f"HPatches not found at {self.root}; download "
                "hpatches-sequences-release there (no auto-download in this env)"
            )
        self.preprocessor = ImagePreprocessor(conf.preprocessing)
        sequences = sorted(x.name for x in self.root.iterdir() if x.is_dir())
        items = []
        for seq in sequences:
            if conf.ignore_large_images and seq in IGNORED_SCENES:
                continue
            if conf.subset is not None and conf.subset != seq[0]:
                continue
            for q_idx in range(2, 7):
                items.append((seq, q_idx))
        self.items = items

    def get_dataset(self, split: str):
        assert split in ("val", "test")
        return _HPatchesItems(self, self.items)


if __name__ == "__main__":
    # dataset visualizer (reference datasets/hpatches.py:118-148)
    import argparse

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..visualization.viz2d import plot_image_grid

    parser = argparse.ArgumentParser()
    parser.add_argument("--num_items", type=int, default=4)
    parser.add_argument("--out", type=str, default="hpatches_samples.png")
    args = parser.parse_args()
    ds = HPatchesDataset({})
    tds = ds.get_dataset("test")
    rows = []
    for i in range(min(args.num_items, len(tds))):
        item = tds[i]
        rows.append([item["view0"]["image"], item["view1"]["image"]])
    plot_image_grid(rows)
    plt.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
