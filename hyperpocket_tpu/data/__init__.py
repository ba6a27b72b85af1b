"""Dataset families, PLY I/O, plane slicer, batch loader.

Mirrors the reference's ``datasets/`` capability surface
(datasets/__init__.py:6-34): name-dispatched factory returning
``(train_dataset, val_dataset_dict_by_category, test_dataset_dict)``.
"""

from hyperpocket_tpu.data.base import Dataset, get_datasets
from hyperpocket_tpu.data.loader import BatchLoader
from hyperpocket_tpu.data.plyio import (
    ListProperty,
    load_ply,
    load_ply_elements,
    save_ply,
    save_ply_elements,
)
from hyperpocket_tpu.data.slicer import HyperPlane, slice_point_cloud
from hyperpocket_tpu.data.category_mapping import (
    synth_id_to_category,
    category_to_synth_id,
    synth_id_to_number,
)

__all__ = [
    "Dataset",
    "get_datasets",
    "BatchLoader",
    "ListProperty",
    "load_ply",
    "load_ply_elements",
    "save_ply",
    "save_ply_elements",
    "HyperPlane",
    "slice_point_cloud",
    "synth_id_to_category",
    "category_to_synth_id",
    "synth_id_to_number",
]
