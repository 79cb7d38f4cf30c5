"""Data layer: label/parameter tables, deterministic splits, image pipeline.

The reference reads its labels and process parameters from xlsx spreadsheets
via pandas+openpyxl (models/CvT(Par).py:60-61) and re-decodes the full 28-40k
JPEG corpus once per regression target — 20x redundantly
(models/CvT(Par).py:499-504).  Here:

- ``xlsx``:   a dependency-free xlsx reader/writer (stdlib zipfile + XML) so
  the framework reads the reference's committed spreadsheets and writes
  byte-compatible metric/record artifacts without openpyxl.
- ``labels``: label tables, per-target valid-index (NaN-outlier) logic,
  process-parameter gather + standardisation.
- ``split``:  the deterministic first-valid-piece-per-group holdout.
- ``images``: decode once to a shared uint8 cache (memmap), reused by all 20
  targets; device-side resize/grayscale/normalize for the fused path.
"""

from .xlsx import read_xlsx, write_xlsx  # noqa: F401
from .labels import LabelTable, ProcessTable, standard_scale  # noqa: F401
from .split import first_valid_per_group, train_val_split  # noqa: F401
from .images import (  # noqa: F401
    decode_corpus, load_dataset, preprocess_images_device,
)
