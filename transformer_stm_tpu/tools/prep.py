"""Offline data-preparation tools.

- ``pick_up_data``: IQR outlier filter per specimen group -> writes
  Processed_Circle_test.xlsx (reference: tools/PickUpData.py:15-66;
  `make Pick_up_datas`).
- ``rotate_augment``: saves 90/180/270-degree rotated copies of each layer
  image as layer_{n+L}/{n+2L}/{n+3L}.jpg (reference: tools/Rotate.py:4-46).
- ``to_ml_excel``: splits the processed label sheet into test (first valid
  piece per group) / train sheets with 'X' masking for the external
  classical-ML pipeline (reference: tools/toMLexcel.py:15-49).
"""

from __future__ import annotations

import os
from typing import List, Optional

from ..config import FREQUENCIES
from ..data.labels import iqr_filter
from ..data.split import first_valid_per_group
from ..data.xlsx import read_table, write_xlsx


def pick_up_data(in_path: str, out_path: str, group_size: int = 5) -> int:
    """IQR-filter every target column per group-of-5 rows; outliers become
    empty cells.  Returns the number of cells dropped."""
    cols, rows = read_table(in_path)
    target_cols = [i for i, c in enumerate(cols) if c in FREQUENCIES]
    dropped = 0
    for ci in target_cols:
        for g0 in range(0, len(rows), group_size):
            group = rows[g0:g0 + group_size]
            vals = [r[ci] if ci < len(r) else None for r in group]
            filtered = iqr_filter(vals)
            for r, v_old, v_new in zip(group, vals, filtered):
                if v_old is not None and v_new is None:
                    dropped += 1
                while len(r) <= ci:
                    r.append(None)
                r[ci] = v_new
    # reference blanks cell A1 (tools/PickUpData.py:61-62)
    header = list(cols)
    header[0] = None
    write_xlsx(out_path, {"Sheet1": [header] + rows})
    return dropped


def rotate_augment(data_dir: str, image_layers: int = 200,
                   folders: Optional[List[str]] = None) -> int:
    """Write rotated copies; returns number of images written."""
    from PIL import Image

    if folders is None:
        folders = sorted(d for d in os.listdir(data_dir)
                         if d.startswith("trail"))
    count = 0
    for folder in folders:
        fp = os.path.join(data_dir, folder)
        for i in range(1, image_layers + 1):
            src = os.path.join(fp, f"layer_{i:02d}.jpg")
            if not os.path.exists(src):
                continue
            img = Image.open(src)
            for k, angle in enumerate((90, 180, 270), start=1):
                dst = os.path.join(
                    fp, f"layer_{i + k * image_layers:02d}.jpg")
                img.rotate(angle, expand=True).save(dst)
                count += 1
    return count


def renumber_folders(data_dir: str, dry_run: bool = True,
                     pieces: int = 5) -> List[tuple]:
    """Data-dir maintenance (reference: data/circle(340x345)/rename.py,
    reoder.py — one-shot `item*` -> `trail{g}_{p:02d}` renumbering).
    Returns the (src, dst) plan; executes it when dry_run=False."""
    entries = sorted(d for d in os.listdir(data_dir)
                     if os.path.isdir(os.path.join(data_dir, d))
                     and not d.startswith("trail"))
    plan = []
    for i, name in enumerate(entries):
        group = i // pieces + 1
        piece = i % pieces + 1
        dst = f"trail{group:01d}_{piece:02d}"
        plan.append((name, dst))
    if not dry_run:
        for src, dst in plan:
            os.rename(os.path.join(data_dir, src),
                      os.path.join(data_dir, dst))
    return plan


def to_ml_excel(in_path: str, out_path: str, group_size: int = 5) -> None:
    """Test sheet keeps only the first valid piece per group ('X'
    elsewhere); train sheet masks the test rows with 'X'."""
    cols, rows = read_table(in_path)
    target_cols = [i for i, c in enumerate(cols) if c in FREQUENCIES]
    # a row is "valid" if any target survives
    valid = [ri for ri, r in enumerate(rows)
             if any(ci < len(r) and r[ci] is not None for ci in target_cols)]
    firsts = set(first_valid_per_group(valid, len(rows), group_size))

    def masked(keep_test: bool):
        out = [list(cols)]
        for ri, r in enumerate(rows):
            rr = list(r)
            is_test = ri in firsts
            if is_test != keep_test:
                for ci in target_cols:
                    if ci < len(rr):
                        rr[ci] = "X"
            out.append(rr)
        return out

    write_xlsx(out_path, {"test": masked(True), "train": masked(False)})
