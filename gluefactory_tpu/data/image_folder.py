"""Plain image-folder dataset for feature export (role of reference
`datasets/image_folder.py:15-59`)."""

from __future__ import annotations

from pathlib import Path

from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .preprocess import ImagePreprocessor, read_image


class _FolderItems:
    def __init__(self, parent):
        self.parent = parent

    def __len__(self):
        return len(self.parent.images)

    def __getitem__(self, idx):
        path = self.parent.images[idx]
        img = read_image(path, grayscale=self.parent.conf.grayscale)
        data = self.parent.preprocessor(img)
        data["name"] = str(path.relative_to(self.parent.root))
        data["idx"] = idx
        return data


class ImageFolder(BaseDataset):
    default_conf = {
        "glob": ["*.jpg", "*.png", "*.jpeg", "*.JPG", "*.PNG", "*.ppm"],
        "images": "???",  # folder path or list of image paths
        "root_folder": "/",
        "preprocessing": {},
        "grayscale": False,
    }

    def _init(self, conf):
        self.root = Path(conf.root_folder)
        if isinstance(conf.images, str):
            folder = Path(conf.images)
            if not folder.is_absolute():
                folder = DATA_PATH / folder
            if not folder.exists():
                raise FileNotFoundError(f"image folder {folder} not found")
            self.images = []
            for g in conf.glob:
                self.images += sorted(folder.rglob(g))
            self.root = folder
        else:
            self.images = [Path(p) for p in conf.images]
            self.root = Path(self.images[0]).parent if self.images else Path("/")
        self.preprocessor = ImagePreprocessor(conf.preprocessing)

    def get_dataset(self, split):
        return _FolderItems(self)
