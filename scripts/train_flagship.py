"""Train the flagship CvT (img+par) on real SLS data for one target with the
reference's full protocol (Adam 1e-3, MSE, batch 128, lr x0.8@50,
1000 epochs — models/CvT(Par).py:464-476), then evaluate and write the
Predictions_Metrics artifact.  Resume-safe via periodic checkpoints.

Usage: python scripts/train_flagship.py [freq] [epochs]
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

from transformer_stm_tpu.config import DataConfig, ExperimentConfig, TrainConfig
from transformer_stm_tpu.harness import test_target, train_target


def main():
    freq = sys.argv[1] if len(sys.argv) > 1 else "50HZ_Bm"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cfg = ExperimentConfig(
        inputs="img+par",
        frequencies=(freq,),
        train=TrainConfig(epochs=epochs, batch_size=128,
                          compute_dtype="bfloat16", checkpoint_every=50),
        result_dir="Result",
    )
    t0 = time.time()
    train_target(cfg, freq, verbose=True)
    print(f"training done in {(time.time() - t0) / 60:.1f} min")
    res = test_target(cfg, freq, verbose=True)
    print(f"FINAL {freq}: R2 {res['r2']:.4f} MSE {res['mse']:.2f} "
          f"MAE {res['mae']:.3f}")


if __name__ == "__main__":
    main()
