"""Dataset protocol and the name-dispatched factory.

Datasets yield ``(existing, missing, gt, label)`` quadruples of numpy arrays
(clouds in the natural (N, 3) float32 layout), matching the reference item
contract (datasets/shapenet.py:66-94). ``get_datasets`` mirrors
datasets/__init__.py:6-34.
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class Dataset(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, idx: int) -> tuple[Any, Any, Any, Any]: ...


class ConcatDataset:
    """Sequential concatenation of datasets (bounds-checked).

    Backs ``dataset.multiclass_train`` (the reference's 3depn train branch
    reads one class; see get_datasets) and any caller needing one index
    space over per-class sets.
    """

    def __init__(self, parts):
        self.parts = list(parts)
        self._lens = [len(p) for p in self.parts]

    def __len__(self) -> int:
        return sum(self._lens)

    def __getitem__(self, idx: int):
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        for part, n in zip(self.parts, self._lens):
            if idx < n:
                return part[idx]
            idx -= n
        raise IndexError(idx)  # unreachable


def get_datasets(config: dict):
    """name -> (train_dataset, val_dataset_dict, test_dataset_dict).

    Supported names: ``shapenet`` (MissingShapeNet), ``completion``
    (Completion3D), ``3depn`` (3D-EPN) — the same three families as the
    reference factory.
    """
    name = config["name"]
    if name == "shapenet":
        from hyperpocket_tpu.data.shapenet import MissingShapeNetDataset

        common = dict(
            root_dir=config["path"],
            classes=config.get("classes", []),
            is_random_rotated=config.get("is_rotated", False),
            num_samples=config.get("num_samples", 1),
            use_pcn_model_list=True,
            cache=config.get("cache", False),
        )
        train = MissingShapeNetDataset(split="train", **common)
        val = MissingShapeNetDataset.get_validation_datasets(**common)
        test = MissingShapeNetDataset.get_test_datasets(
            is_gen=config.get("gen_test_set", False), **common
        )
        return train, val, test
    if name == "completion":
        from hyperpocket_tpu.data.completion3d import Completion3DDataset

        train = Completion3DDataset(
            root_dir=config["path"], split="train", classes=config.get("classes", [])
        )
        val = Completion3DDataset.get_validation_datasets(
            config["path"], classes=config.get("classes", [])
        )
        test = Completion3DDataset.get_test_datasets(config["path"])
        return train, val, test
    if name == "3depn":
        from hyperpocket_tpu.data.shapenet_3depn import ShapeNet3DEPNDataset

        classes = config.get("classes", [])
        common = dict(
            root_dir=config["path"],
            num_samples=config.get("num_samples", 4),
            cache=config.get("cache", False),
            split_by_csv=config.get("split_by_csv", False),
        )
        if config.get("multiclass_train", False) and len(classes) > 1:
            # framework extension: the reference's 3depn train branch reads
            # classes[0] only (shapenet_3depn.py:102-104 — it ships per-class
            # configs, so multi-class training does not exist upstream);
            # multiclass_train=true concatenates real per-class train sets
            from hyperpocket_tpu.data.category_mapping import normalize_classes

            # dedup after normalization: a config listing both a name and
            # its synset id ('airplane' + '02691156') must not concatenate
            # the same train set twice (val collapses them into one key)
            train = ConcatDataset([
                ShapeNet3DEPNDataset(split="train", classes=[c], **common)
                for c in dict.fromkeys(normalize_classes(list(classes)))
            ])
        else:
            train = ShapeNet3DEPNDataset(split="train", classes=classes, **common)
        val = ShapeNet3DEPNDataset.get_validation_datasets(classes=classes, **common)
        test = ShapeNet3DEPNDataset.get_test_datasets(
            config["path"], classes=classes
        )
        return train, val, test
    raise ValueError(
        f"Invalid dataset name. Expected `shapenet`, `completion` or `3depn`. Got: `{name}`"
    )


def get_filenames_by_cat(path: str):
    """DataFrame of (category, filename) over all known synset dirs.

    Parity with reference utils/util.py:78-84 (drives the offline slicer).
    """
    import os

    import pandas as pd

    from hyperpocket_tpu.data.category_mapping import synth_id_to_category

    filenames = []
    for category_id in synth_id_to_category:
        cat_dir = os.path.join(path, category_id)
        if not os.path.isdir(cat_dir):
            continue
        for f in sorted(os.listdir(cat_dir)):
            if f != ".DS_Store":
                filenames.append((category_id, f))
    return pd.DataFrame(filenames, columns=["category", "filename"])


def resample_pcd(pcd, n: int, rng=None):
    """Random drop/duplicate to exactly n points (reference utils/util.py:95-100)."""
    import numpy as np

    rand = rng if rng is not None else np.random
    idx = rand.permutation(pcd.shape[0])
    if idx.shape[0] < n:
        idx = np.concatenate([idx, rand.integers(0, pcd.shape[0], size=n - pcd.shape[0])
                              if rng is not None else rand.randint(pcd.shape[0], size=n - pcd.shape[0])])
    return pcd[idx[:n]]
