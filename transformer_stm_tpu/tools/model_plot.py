"""Model structure diagram (reference: tools/model_plot.py, which uses
keras.utils.plot_model -> model_plot_Cls.png / model_plot_NoCls.png).

Here the diagram is rendered directly from the CvTSpec with matplotlib:
one box per layer with shape annotations, arrows along the data flow, the
cls-token path drawn separately when enabled.  Also prints a text summary
with parameter counts per stage.
"""

from __future__ import annotations

from typing import List, Tuple

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import FancyArrow, FancyBboxPatch  # noqa: E402


def _stage_rows(cfg) -> List[Tuple[str, str]]:
    spec = cfg.model.with_projection(cfg.projection_method, cfg.cls_token)
    h, w = spec.image_height, spec.image_width
    rows = [("Image input", f"({h}, {w}, {spec.num_channels})")]
    for i, st in enumerate(spec.stages, start=1):
        h = -(-h // st.stride)
        w = -(-w // st.stride)
        rows.append((f"stage{i} ConvEmbed {st.patch_size}x{st.patch_size}"
                     f"/{st.stride}", f"({h}, {w}, {st.embed_dim})"))
        cls = " +cls" if st.with_cls_token else ""
        rows.append((f"stage{i} ConvTransformerBlock "
                     f"(heads={st.num_heads}, qkv={st.qkv_method}{cls})",
                     f"({h * w}{'+1' if st.with_cls_token else ''} tokens, "
                     f"{st.embed_dim})"))
    last = spec.stages[-1]
    if last.with_cls_token:
        rows.append(("LayerNorm(cls) + squeeze", f"({last.embed_dim},)"))
    else:
        rows.append(("LayerNorm + token mean", f"({last.embed_dim},)"))
    if spec.proc_dim > 0:
        rows.append((f"‖ Proc branch Dense({spec.proc_hidden})x2 ‖",
                     f"({spec.proc_hidden},) concat -> "
                     f"({last.embed_dim + spec.proc_hidden},)"))
    rows.append((f"Dense({spec.num_classes}) linear",
                 f"({spec.num_classes},)"))
    return rows


def plot_model_structure(cfg, out_path: str) -> None:
    rows = _stage_rows(cfg)
    n = len(rows)
    fig, ax = plt.subplots(figsize=(7, 1.2 * n))
    ax.axis("off")
    for i, (name, shape) in enumerate(rows):
        y = n - 1 - i
        box = FancyBboxPatch((0.05, y + 0.15), 0.9, 0.7,
                             boxstyle="round,pad=0.02",
                             facecolor="#dbe9f6", edgecolor="#39576e")
        ax.add_patch(box)
        ax.text(0.5, y + 0.62, name, ha="center", va="center", fontsize=10,
                weight="bold")
        ax.text(0.5, y + 0.33, shape, ha="center", va="center", fontsize=9,
                color="#39576e")
        if i < n - 1:
            ax.annotate("", xy=(0.5, y + 0.12), xytext=(0.5, y - 0.0),
                        arrowprops=dict(arrowstyle="<-", color="#39576e"))
    ax.set_xlim(0, 1)
    ax.set_ylim(0, n)
    title = (f"CvT ({cfg.inputs}, {cfg.projection_method}, "
             f"cls={cfg.cls_token})")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=130)
    plt.close(fig)


def model_summary(cfg) -> str:
    """Text summary with per-stage parameter counts."""
    import jax
    from ..models.cvt import init_cvt

    spec = cfg.model.with_projection(cfg.projection_method, cfg.cls_token)
    if cfg.inputs == "img":
        import dataclasses
        spec = dataclasses.replace(spec, proc_dim=0)
    params, _ = init_cvt(jax.random.PRNGKey(0), spec)
    lines = []
    total = 0
    for i, stage in enumerate(params["stages"], start=1):
        n = sum(x.size for x in jax.tree_util.tree_leaves(stage))
        total += n
        lines.append(f"stage{i}: {n:,} params")
    head = sum(x.size for k, v in params.items() if k != "stages"
               for x in jax.tree_util.tree_leaves(v))
    total += head
    lines.append(f"head/proc: {head:,} params")
    lines.append(f"total: {total:,} params")
    return "\n".join(lines)
