"""Single config system for every entry point.

The reference has no config system: constants are duplicated per script and
have drifted between variants (reference: models/CvT(Par).py:22-72 vs
models/CvT_test(Par)(many).py:15-23).  Here one set of dataclasses is consumed
by train, test, tools and the CLI, serialisable to/from JSON.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

# The 20 regression targets: 5 magnetic properties x 4 excitation frequencies
# (reference: models/CvT(Par).py:22).
FREQUENCIES: Tuple[str, ...] = tuple(
    f"{hz}HZ_{prop}"
    for hz in (50, 200, 400, 800)
    for prop in ("Bm", "Hc", "μa", "Br", "Pcv")
)

# Process-parameter column names in Excel/Process_parameters.xlsx
# (reference: models/CvT(Par).py:388): oxygen concentration, laser scan speed,
# laser power, hatch spacing, energy density.
PROCESS_PARAMETERS: Tuple[str, ...] = (
    "氧濃度",
    "雷射掃描速度",
    "雷射功率",
    "線間距",
    "能量密度",
)


@dataclass(frozen=True)
class StageSpec:
    """One CvT pyramid stage (reference: models/CvT(Par).py:66-72)."""

    embed_dim: int
    patch_size: int
    stride: int
    num_heads: int
    kernel_size: int = 3
    strides: int = 1  # stride of the conv QKV projection
    qkv_method: str = "dw_bn"  # dw_bn | avg | linear
    with_cls_token: bool = False
    depth: int = 1  # blocks per stage (reference always uses 1)
    mlp_ratio: int = 4
    dropout_rate: float = 0.1


@dataclass(frozen=True)
class CvTSpec:
    """Full CvT model spec.

    Defaults reproduce the reference's 3-stage pyramid
    (reference: models/CvT(Par).py:66-72): 128px input -> 32x32x64 ->
    16x16x128 -> 8x8x256 (+ cls token in stage 3).
    """

    stages: Tuple[StageSpec, ...] = (
        StageSpec(embed_dim=64, patch_size=7, stride=4, num_heads=1),
        StageSpec(embed_dim=128, patch_size=3, stride=2, num_heads=2),
        StageSpec(embed_dim=256, patch_size=3, stride=2, num_heads=4,
                  with_cls_token=True),
    )
    image_height: int = 128
    image_width: int = 128
    num_channels: int = 1
    num_classes: int = 1  # regression: a single scalar
    proc_dim: int = 5  # 0 disables the process-parameter branch
    proc_hidden: int = 256
    # Preserve reference quirk: ConvEmbed's LayerNorm is dead at runtime
    # (string-vs-class compare, reference: models/CvT(Par).py:209).  Set True
    # to enable the norm the reference author *intended*.
    embed_norm: bool = False

    def with_projection(self, method: str, cls_token: bool) -> "CvTSpec":
        """Reference global switches `projection_method`/`cls_token_switch`
        (models/CvT(Par).py:25-28): method applies to every stage, the cls
        token only to the last."""
        n = len(self.stages)
        stages = tuple(
            dataclasses.replace(
                s, qkv_method=method,
                with_cls_token=(cls_token and i == n - 1))
            for i, s in enumerate(self.stages)
        )
        return dataclasses.replace(self, stages=stages)


@dataclass(frozen=True)
class ViTSpec:
    """Plain ViT classifier spec (BASELINE.json configs 1-3)."""

    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: int = 4
    image_size: int = 224
    num_channels: int = 3
    num_classes: int = 1000
    dropout_rate: float = 0.0
    drop_path_rate: float = 0.0


VIT_PRESETS = {
    "ViT-Ti/16": ViTSpec(embed_dim=192, depth=12, num_heads=3),
    "ViT-S/16": ViTSpec(embed_dim=384, depth=12, num_heads=6),
    "ViT-B/16": ViTSpec(embed_dim=768, depth=12, num_heads=12),
}


def cvt_highres_spec(size: int = 384) -> "CvTSpec":
    """High-res melt-pool stretch config (BASELINE.json config 5):
    the same CvT pyramid at 384/512px.  Stage-1 sequences reach
    96x96=9,216 (384px) / 128x128=16,384 (512px) tokens — past the
    1M-score threshold where attention auto-routes to the Pallas flash
    kernel (ops/attention._attention_core), keeping memory O(seq)."""
    return CvTSpec(image_height=size, image_width=size)


@dataclass(frozen=True)
class DataConfig:
    """Dataset ranges (reference: models/CvT(Par).py:30-42)."""

    data_root: str = "/root/reference/data"
    excel_labels: str = "/root/reference/Excel/Processed_Circle_test.xlsx"
    excel_process: str = "/root/reference/Excel/Process_parameters.xlsx"
    group_start: int = 1
    group_end: int = 40
    piece_num_start: int = 1
    piece_num_end: int = 5
    image_layers: int = 200
    image_height: int = 128
    image_width: int = 128
    cache_dir: str = "cache"  # decoded-image cache, shared across targets


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: models/CvT(Par).py:44-50,464-476).

    lr decays x0.8 every 50 epochs (reference lr_scheduler,
    models/CvT(Par).py:357-360)."""

    learning_rate: float = 1e-3
    lr_decay: float = 0.8
    lr_decay_every: int = 50
    epochs: int = 1000
    batch_size: int = 128
    seed: int = 0
    optimizer: str = "adam"  # adam | adamw
    weight_decay: float = 0.0
    label_smoothing: float = 0.0
    loss: str = "mse"  # mse | softmax_xent
    compute_dtype: str = "float32"  # float32 | bfloat16
    checkpoint_every: int = 0  # epochs between mid-run checkpoints; 0 = off
    repeats: int = 1  # "(many)" repeat-run mode (reference CvT(Par)(many).py)
    # jax PRNG implementation for dropout/shuffle streams.  Production runs
    # use 'unsafe_rbg' (TPU RngBitGenerator): threefry mask generation cost
    # ~10% of a profiled multi-target epoch on the VPU, and dropout/shuffle
    # only need equidistribution, not cryptographic splitting.  Recorded
    # here (not just in scripts) so checkpoints/configs capture the choice
    # the determinism story depends on.  'threefry2x32' restores the jax
    # default.
    prng_impl: str = "unsafe_rbg"

    def apply_prng_impl(self):
        """Set the global jax PRNG implementation to this config's choice —
        call before building any PRNG keys (training scripts do this right
        after constructing their config)."""
        import jax

        jax.config.update("jax_default_prng_impl", self.prng_impl)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit sharding.  axis 'data' carries DP (batch),
    'model' carries TP (heads / MLP hidden)."""

    data: int = -1  # -1: all devices
    model: int = 1


@dataclass(frozen=True)
class ExperimentConfig:
    """Top-level config consumed by the CLI."""

    inputs: str = "img+par"  # img | par | img+par
    projection_method: str = "dw_bn"
    cls_token: bool = True
    frequencies: Tuple[str, ...] = FREQUENCIES
    model: CvTSpec = field(default_factory=CvTSpec)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    result_dir: str = "Result"
    # hidden width of the params-only FFN variant (reference hardcodes
    # 256, models/FFN(OnlyPar).py:46-47; a config knob here so the
    # hyperparameter sweep runner can search it — train/sweep.py)
    ffn_hidden: int = 256

    @property
    def variant_dir(self) -> str:
        """Artifact sub-directory per input variant (reference:
        models/CvT(Par).py:479, CvT(Img).py save paths)."""
        return {
            "img+par": "Images & Parameters",
            "img": "Images",
            "par": "Parameters",
        }[self.inputs]

    def weight_name(self, freq: str, time: Optional[int] = None) -> str:
        """Checkpoint naming convention = config encoding (reference:
        models/CvT(Par).py:489, CvT(Par)(many).py:489,
        FFN(OnlyPar).py weight name)."""
        # "(many)" repeat runs insert the run index right after the target,
        # matching the reference convention
        # cvt_model_weights_{freq}_{time}_{proj}_cls{bool}.h5
        # (models/CvT(Par)(many).py:489).
        suffix = f"_{time}" if time is not None else ""
        if self.inputs == "par":
            return f"Vit_model_weights_{freq}{suffix}"
        return (f"cvt_model_weights_{freq}{suffix}_{self.projection_method}"
                f"_cls{self.cls_token}")


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    return obj


# nested-dataclass fields, keyed by (owning class, field name) so plain
# fields that happen to share a name (e.g. MeshConfig.data: int) are left
# alone
_NESTED = {
    (CvTSpec, "stages"): ("tuple", StageSpec),
    (ExperimentConfig, "model"): ("one", CvTSpec),
    (ExperimentConfig, "data"): ("one", DataConfig),
    (ExperimentConfig, "train"): ("one", TrainConfig),
    (ExperimentConfig, "mesh"): ("one", MeshConfig),
}


def _from_dict(cls, d):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        nested = _NESTED.get((cls, f.name))
        if nested is not None:
            kind, sub = nested
            v = (tuple(_from_dict(sub, s) for s in v) if kind == "tuple"
                 else _from_dict(sub, v))
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def save_config(cfg: ExperimentConfig, path: str) -> None:
    with open(path, "w") as f:
        json.dump(_to_jsonable(cfg), f, indent=2, ensure_ascii=False)


def load_config(path: str) -> ExperimentConfig:
    with open(path) as f:
        return _from_dict(ExperimentConfig, json.load(f))
