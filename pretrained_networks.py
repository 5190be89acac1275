#!/usr/bin/env python3
"""Pretrained-network registry — surface parity with
/root/reference/pretrained_networks.py (:16-78): alias→path/URL map and a
cached loader. The reference's gdrive pickles embed TF graph source and
cannot be executed here; point aliases at converted
``inclusivegan_tpu.network_snapshot.v1`` pkls instead (convert with
scripts/convert_reference_pkl.py)."""

import os
import pickle
from typing import Tuple

gdrive_urls = {
    # reference aliases (:16-53) kept for documentation; actual use requires
    # converted snapshots placed under models/
    "gdrive:stacked-mnist-240k.pkl": "models/stacked-mnist-240k.pkl",
    "gdrive:celeba-30k.pkl": "models/celeba-30k.pkl",
    "gdrive:celeba-30k-eyeglasses.pkl": "models/celeba-30k-eyeglasses.pkl",
}

_cached_networks = {}


def get_path_or_url(path_or_gdrive_path: str) -> str:
    return gdrive_urls.get(path_or_gdrive_path, path_or_gdrive_path)


def load_networks(path_or_gdrive_path: str) -> Tuple:
    """→ (G, D, Gs-params-dict) like the reference's (G, D, Gs) triple."""
    path = get_path_or_url(path_or_gdrive_path)
    if path in _cached_networks:
        return _cached_networks[path]
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"{path} not found. Reference pkls must be converted to the "
            "inclusivegan_tpu snapshot format first "
            "(scripts/convert_reference_pkl.py).")
    from inclusivegan_tpu.training.training_loop import load_snapshot
    G, D, params = load_snapshot(path)
    nets = (G, D, params)
    _cached_networks[path] = nets
    return nets
