"""Real-scan dataset (.npy objects/scenes/boxes).

Matches reference ``datasets/real_data.py``: object scans are centred and
scaled into a 0.9 box, resampled to 1024; ``inverse_scale[_to_scene]``
undoes the normalisation back into scene coordinates.
"""

from __future__ import annotations

from os import listdir
from os.path import join

import numpy as np

from hyperpocket_tpu.data.base import resample_pcd


class RealDataNPYDataset:
    def __init__(self, root_dir: str):
        self.root_dir = root_dir
        self.scenes: list[str] = []
        self.objs: list[str] = []
        self.boxes: list[str] = []
        for f in sorted(listdir(root_dir)):
            if f.startswith("object_box"):
                self.boxes.append(f)
            elif f.startswith("object"):
                self.objs.append(f)
            elif f.startswith("scen"):
                self.scenes.append(f)

    @staticmethod
    def _get_scales(pcd: np.ndarray) -> tuple[np.ndarray, float]:
        axis_mins = pcd.min(axis=0)
        axis_maxs = pcd.max(axis=0)
        scale = float((axis_maxs - axis_mins).max())
        center = (axis_maxs + axis_mins) / 2
        return center, scale / 0.9

    def __len__(self) -> int:
        return len(self.objs)

    def __getitem__(self, idx: int):
        pcd = np.load(join(self.root_dir, self.objs[idx])).astype(np.float32)
        center, scale = self._get_scales(pcd)
        pcd = (pcd - center) / scale
        return resample_pcd(pcd, 1024), 0, 0, idx

    def get_full_object(self, idx: int) -> np.ndarray:
        return np.load(join(self.root_dir, self.objs[idx])).astype(np.float32)

    def get_scene(self, idx: int) -> np.ndarray:
        if not self.scenes:
            raise ValueError("Dataset does not include scenes")
        return np.load(join(self.root_dir, self.scenes[idx])).astype(np.float32)

    def get_obj_box(self, idx: int) -> np.ndarray:
        if not self.boxes:
            raise ValueError("Dataset does not include object boxes")
        return np.load(join(self.root_dir, self.boxes[idx])).astype(np.float32)

    def inverse_scale(self, idx: int, scaled_pcd: np.ndarray) -> np.ndarray:
        pcd = self.get_full_object(idx)
        center, scale = self._get_scales(pcd)
        _, scaled_scale = self._get_scales(scaled_pcd)
        return (scaled_pcd / scaled_scale * scale) + center

    def inverse_scale_to_scene(self, idx: int, scaled_pcd: np.ndarray) -> np.ndarray:
        return np.concatenate([self.get_scene(idx), self.inverse_scale(idx, scaled_pcd)])
