"""ImageNet data stack (unimodal pretraining path).

Re-expresses the pl_bolts-derived ``/root/reference/datasets/
imagenet_dataset.py``: standard folder-per-class layout, train transforms
random-resized-crop(224) + horizontal flip, eval transforms resize(256) +
center-crop(224), ImageNet normalization.
"""

from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

from .lazy import LazyDataModule
from .transforms import image_to_chw, imagenet_normalize

__all__ = ["ImagenetDataModule"]


class ImagenetDataModule(LazyDataModule):
    def __init__(self, data_dir: str, batch_size: int = 32, num_workers: int = 0,
                 image_size: int = 224, **kwargs):
        super().__init__(batch_size=batch_size, shuffle_train=True, num_workers=num_workers)
        self.data_dir = data_dir
        self.image_size = image_size
        self.samples: dict = {}
        self.class_to_idx: dict = {}

    def setup(self, stage: Optional[str] = None) -> None:
        if self.samples:
            return
        for split, sub in (("train", "train"), ("dev", "val"), ("test", "val")):
            root = os.path.join(self.data_dir, sub)
            rows = []
            if os.path.isdir(root):
                classes = sorted(os.listdir(root))
                self.class_to_idx = {c: i for i, c in enumerate(classes)}
                for c in classes:
                    cdir = os.path.join(root, c)
                    for fname in sorted(os.listdir(cdir)):
                        rows.append((os.path.join(cdir, fname), self.class_to_idx[c]))
            self.samples[split] = rows
            self.split_sizes[split] = len(rows)

    def load_sample(self, split: str, idx: int):
        from PIL import Image

        path, label = self.samples[split][idx]
        img = Image.open(path).convert("RGB")
        s = self.image_size
        if split == "train":
            # random resized crop + horizontal flip
            scale = random.uniform(0.08, 1.0)
            w, h = img.size
            area = w * h * scale
            side = max(1, int(area**0.5))
            side = min(side, w, h)
            x0 = random.randint(0, w - side)
            y0 = random.randint(0, h - side)
            img = img.crop((x0, y0, x0 + side, y0 + side)).resize((s, s), Image.BICUBIC)
            if random.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        else:
            # resize shorter side to 256, center crop
            w, h = img.size
            ratio = 256 / min(w, h)
            img = img.resize((int(w * ratio), int(h * ratio)), Image.BICUBIC)
            w, h = img.size
            x0, y0 = (w - s) // 2, (h - s) // 2
            img = img.crop((x0, y0, x0 + s, y0 + s))
        chw = imagenet_normalize(image_to_chw(img))
        return {"image": chw, "label": np.int32(label)}
