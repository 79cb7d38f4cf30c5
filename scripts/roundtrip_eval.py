"""Migration evidence on REAL trained weights.

Takes a trained flagship checkpoint (default: 200HZ_Pcv from the round-4
chunkY run), exports it into the reference's OWN Keras model
(/root/reference/models/CvT(Par).py create_cvt_model + the save_weights
h5 layout, via train/h5_export.py), and verifies the unmodified reference
stack reproduces our held-out predictions and metrics.  This closes the
migration loop on production weights rather than the random-init fixtures
tests/test_reference_parity.py uses: a reference user can take weights
trained by this framework and evaluate them with the reference's shipped
eval scripts (models/CvT_test(Par).py:513-527).

CPU-only (forces jax_platforms=cpu before backend init) so it can run
while a TPU training chunk is in flight.  Writes
Result/roundtrip_eval_{freq}.json.

Usage: python scripts/roundtrip_eval.py [freq] [n_images]
       n_images 0/absent = the full held-out split.
"""

import json
import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    freq = sys.argv[1] if len(sys.argv) > 1 else "200HZ_Pcv"
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from transformer_stm_tpu.config import ExperimentConfig
    from transformer_stm_tpu.harness import _load_target, _paths, _spec_for
    from transformer_stm_tpu.train.checkpoint import (latest_checkpoint,
                                                      load_checkpoint)
    from transformer_stm_tpu.train.h5_export import (export_cvt_reference_h5,
                                                     load_reference_module)
    from transformer_stm_tpu.train.loop import TrainLoop
    from transformer_stm_tpu.train.metrics import mae, mse, r2_score

    cfg = ExperimentConfig(inputs="img+par", frequencies=(freq,))
    spec = _spec_for(cfg)
    data, train_rows, val_rows = _load_target(cfg, freq, None, None)
    paths = _paths(cfg, freq)
    ckpt = latest_checkpoint(paths["weights"])
    if ckpt is None:
        raise SystemExit(f"no trained checkpoint for {freq}")
    print(f"checkpoint: {ckpt}")

    if n_images and n_images < len(val_rows):
        val_rows = val_rows[:n_images]
    y = np.asarray(data["labels"])[val_rows]
    # /255 normalization is part of the eval protocol on BOTH stacks (ours:
    # TrainLoop._prep; reference: models/CvT_test(Par).py:432).  Feeding
    # raw 0-255 to one side is nearly masked by LayerNorm scale-invariance
    # (R² drops only 0.99->0.95) — normalize explicitly here so the
    # comparison is exact.
    imgs = np.asarray(data["images"][val_rows], np.float32) / 255.0
    proc = np.asarray(data["proc_scaled"][val_rows], np.float32)

    loop = TrainLoop(spec, cfg.train)
    loop.params, loop.state, _, _ = load_checkpoint(
        ckpt, loop.params, loop.state)
    ours = np.asarray(loop.predict(imgs, proc)).ravel()
    r2_ours = r2_score(y, ours)
    print(f"ours      R² {r2_ours:.4f} on {len(val_rows)} held-out images")

    mod = load_reference_module()
    h5_path = f"/tmp/roundtrip_{freq}.h5"
    export_cvt_reference_h5(loop.params, loop.state, spec, h5_path, mod=mod)
    # the reference's own eval path: rebuild + load_weights + predict
    # (models/CvT_test(Par).py:513-527); export_cvt_reference_h5 already
    # pushed our spec into the module's config globals
    model2 = mod.create_cvt_model(spec.image_height, spec.image_width,
                                  spec.num_channels, spec.proc_dim,
                                  spec.num_classes)
    model2.load_weights(h5_path)
    theirs = np.asarray(
        model2.predict([imgs, proc], batch_size=256, verbose=0)).ravel()
    r2_theirs = r2_score(y, theirs)
    max_diff = float(np.max(np.abs(ours - theirs)))
    scale = float(np.mean(np.abs(ours)) + 1e-9)
    print(f"reference R² {r2_theirs:.4f}; max |Δpred| {max_diff:.5f} "
          f"({max_diff / scale:.2e} of mean |pred|)")

    rec = {
        "freq": freq,
        "checkpoint": ckpt,
        "n_heldout": int(len(val_rows)),
        "ours": {"r2": float(r2_ours), "mse": float(mse(y, ours)),
                 "mae": float(mae(y, ours))},
        "reference_stack": {"r2": float(r2_theirs),
                            "mse": float(mse(y, theirs)),
                            "mae": float(mae(y, theirs))},
        "max_abs_pred_diff": max_diff,
        "rel_pred_diff": max_diff / scale,
    }
    os.makedirs("Result", exist_ok=True)
    out = f"Result/roundtrip_eval_{freq}.json"
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out}")
    ok = abs(r2_ours - r2_theirs) < 1e-3 and max_diff / scale < 1e-2
    print("ROUNDTRIP", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
