"""Spec-driven model builders.

- ``cvt``: the CvT regression model, image-only or image+process-parameters
  (reference: create_cvt_model, models/CvT(Par).py:292-354 and
  models/CvT(Img).py).
- ``ffn``: the params-only MLP baseline (reference: models/FFN(OnlyPar).py).
- ``vit``: plain ViT-Ti/S/B classifiers for the BASELINE.json configs.
"""

from .cvt import init_cvt, cvt_forward, cvt_param_count  # noqa: F401
from .ffn import init_ffn, ffn_forward  # noqa: F401
from .vit import init_vit, vit_forward  # noqa: F401
