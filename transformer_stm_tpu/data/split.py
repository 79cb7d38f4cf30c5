"""Deterministic train/validation split.

Reference semantics (models/CvT(Par).py:437-453, CvT_test(Par).py:485-507):
for each group of 5 specimen rows, the *first* piece that survived outlier
filtering goes to validation; every other valid piece goes to train.  With 40
groups x 200 layers this yields exactly 8,000 validation images and the
27.8-30.2k train mounts recorded in the committed metric spreadsheets
(BASELINE.md).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def first_valid_per_group(valid_indices: Sequence[int], count: int,
                          group_size: int = 5) -> List[int]:
    valid = set(int(v) for v in valid_indices)
    firsts = []
    for d in range(0, count, group_size):
        for j in range(d, d + group_size):
            if j in valid:
                firsts.append(j)
                break
    return firsts


def train_val_split(valid_indices: np.ndarray, count: int,
                    image_layers: int, group_size: int = 5):
    """Returns (train_rows, val_rows): flat per-image index arrays into the
    (V * image_layers)-long replicated arrays produced by
    labels.build_target_arrays / the image loader."""
    firsts = set(first_valid_per_group(valid_indices, count, group_size))
    train_rows, val_rows = [], []
    for i, spec_idx in enumerate(valid_indices):
        rows = np.arange(i * image_layers, (i + 1) * image_layers)
        if int(spec_idx) in firsts:
            val_rows.append(rows)
        else:
            train_rows.append(rows)
    cat = lambda parts: (np.concatenate(parts) if parts
                         else np.zeros((0,), np.int64))
    return cat(train_rows), cat(val_rows)
