"""Download + unpack the uniform 2048-point ShapeNet archive.

Capability parity with reference ``util_scripts/download_shapenet_2048.py``:
fetches the public shape_net_core_uniform_samples_2048 zip into the dataset
dir and flattens the category folders to the root.
"""

from __future__ import annotations

import os
import shutil
import sys
import urllib.request
from os import listdir, makedirs, remove
from os.path import exists, join
from zipfile import ZipFile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpocket_tpu.train.config import parse_config

URL = "https://www.dropbox.com/s/vmsdrae6x5xws1v/shape_net_core_uniform_samples_2048.zip?dl=1"


def main(config: dict, url: str = URL) -> None:
    """``url`` is overridable so the flow is testable against a local
    ``file://`` archive (tests/test_utils.py) — urllib serves both schemes."""
    dataset_path = config["dataset"]["path"]
    if exists(dataset_path):
        raise Exception(f"directory {dataset_path} already exists")
    makedirs(dataset_path)

    filename = url.rpartition("/")[2].removesuffix("?dl=1")
    file_path = join(dataset_path, filename)
    with urllib.request.urlopen(url) as response, open(file_path, "wb") as fh:
        shutil.copyfileobj(response, fh)

    print("Extracting...")
    with ZipFile(file_path) as zf:
        zf.extractall(dataset_path)
    remove(file_path)

    extracted = join(dataset_path, "shape_net_core_uniform_samples_2048")
    for d in listdir(extracted):
        shutil.move(join(extracted, d), dataset_path)
    shutil.rmtree(extracted)


if __name__ == "__main__":
    main(parse_config())
