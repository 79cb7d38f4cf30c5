"""Throughput probe for the multi-target trainer on the real TPU:
measures s/epoch for T targets at the production config without writing
any artifacts.  Usage: python scripts/probe_multi.py [T] [impl] [epochs]
"""

import sys
import time

sys.path.insert(0, ".")

from transformer_stm_tpu.config import ExperimentConfig, TrainConfig

ALL = [f"{f}HZ_{p}" for f in (50, 200, 400, 800)
       for p in ("Bm", "Hc", "μa", "Br", "Pcv")]


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    impl = sys.argv[2] if len(sys.argv) > 2 else "auto"
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    targets = ALL[:T]
    cfg = ExperimentConfig(
        inputs="img+par", frequencies=tuple(targets),
        train=TrainConfig(epochs=epochs, batch_size=128,
                          compute_dtype="bfloat16"),
        result_dir="/tmp/probe_result")

    import jax
    print("devices:", jax.devices(), flush=True)
    from transformer_stm_tpu.train.multi import MultiTargetTrainer
    t0 = time.time()
    tr = MultiTargetTrainer(cfg, [(f, 0, None) for f in targets],
                            impl=impl, epochs_per_call=1)
    print(f"setup {time.time() - t0:.1f}s  steps/epoch={tr.steps_per_epoch}",
          flush=True)
    t0 = time.time()
    tr.fit(epochs=epochs, verbose=True)
    total = time.time() - t0
    # first epoch includes compile; steady state = later epochs
    imgs = tr.steps_per_epoch * cfg.train.batch_size * T
    print(f"total {total:.1f}s for {epochs} epochs "
          f"(~{imgs} train imgs/epoch aggregate)", flush=True)


if __name__ == "__main__":
    main()
