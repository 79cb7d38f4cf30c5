"""Re-evaluate committed Predictions_Metrics at true float32.

Motivation (round 4): train_all's end-of-chunk `test_target` runs on the
TPU, where DEFAULT matmul precision computes f32 dots as a single bf16
MXU pass — systematically understating the committed metrics vs the
reference's true-f32 TF eval (measured 200HZ_Pcv: R² 0.9868 TPU-default
vs 0.9875 exact, where 0.9875 equals the TF reference stack to 8
decimals, Result/roundtrip_eval_200HZ_Pcv.json).  harness.test_target
now uses the exact eval; this driver re-runs it ON CPU for targets whose
checkpoints exist, rewriting the xlsx + plots in place.

Usage: python scripts/reeval_metrics.py [freq ...]
       (default: every target with a checkpoint on disk)
"""

import os
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from transformer_stm_tpu.config import ExperimentConfig
    from transformer_stm_tpu.harness import _paths, test_target
    from transformer_stm_tpu.train.checkpoint import latest_checkpoint

    cfg = ExperimentConfig(inputs="img+par")
    targets = sys.argv[1:] or list(cfg.frequencies)
    done, skipped = [], []
    for freq in targets:
        fcfg = ExperimentConfig(inputs="img+par", frequencies=(freq,))
        if latest_checkpoint(_paths(fcfg, freq)["weights"]) is None:
            skipped.append(freq)
            continue
        res = test_target(fcfg, freq, verbose=True)
        done.append((freq, res["r2"]))
    print(f"re-evaluated {len(done)} targets at exact f32; "
          f"skipped (no checkpoint): {skipped or 'none'}")


if __name__ == "__main__":
    main()
