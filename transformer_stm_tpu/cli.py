"""Single CLI replacing the reference's Makefile-dispatched script zoo
(reference Makefile:48-79; SURVEY.md §5.6).

  python -m transformer_stm_tpu.cli train  --inputs img+par [--freq ...]
  python -m transformer_stm_tpu.cli test   --inputs img+par [--freq ...]
  python -m transformer_stm_tpu.cli heatmap --freq 50HZ_Bm
  python -m transformer_stm_tpu.cli pickup
  python -m transformer_stm_tpu.cli memory
  python -m transformer_stm_tpu.cli plot-records --records PATH
  python -m transformer_stm_tpu.cli model-plot
  python -m transformer_stm_tpu.cli bench

Every mutable setting comes from one JSON config (--config) with CLI
overrides — the reference's per-script constant drift cannot happen.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from .config import (ExperimentConfig, FREQUENCIES, load_config,
                     save_config)


def _build_cfg(args) -> ExperimentConfig:
    cfg = load_config(args.config) if args.config else ExperimentConfig()
    if getattr(args, "inputs", None):
        cfg = dataclasses.replace(cfg, inputs=args.inputs)
    if getattr(args, "projection", None):
        cfg = dataclasses.replace(cfg, projection_method=args.projection)
    if getattr(args, "cls_token", None) is not None:
        cfg = dataclasses.replace(cfg, cls_token=args.cls_token)
    if getattr(args, "freq", None):
        cfg = dataclasses.replace(cfg, frequencies=tuple(args.freq))
    tr = cfg.train
    if getattr(args, "epochs", None):
        tr = dataclasses.replace(tr, epochs=args.epochs)
    if getattr(args, "batch_size", None):
        tr = dataclasses.replace(tr, batch_size=args.batch_size)
    if getattr(args, "repeats", None):
        tr = dataclasses.replace(tr, repeats=args.repeats)
    if getattr(args, "seed", None) is not None:
        tr = dataclasses.replace(tr, seed=args.seed)
    cfg = dataclasses.replace(cfg, train=tr)
    if getattr(args, "result_dir", None):
        cfg = dataclasses.replace(cfg, result_dir=args.result_dir)
    return cfg


def _add_common(p):
    p.add_argument("--config", help="JSON config path")
    p.add_argument("--inputs", choices=["img", "par", "img+par"])
    p.add_argument("--projection", choices=["dw_bn", "avg", "linear"])
    p.add_argument("--cls-token", dest="cls_token", type=lambda s: s == "1",
                   help="1/0")
    p.add_argument("--freq", nargs="*", choices=list(FREQUENCIES),
                   help="subset of targets (default: all 20)")
    p.add_argument("--epochs", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--repeats", type=int,
                   help=">1 = repeat-run '(many)' mode")
    p.add_argument("--seed", type=int)
    p.add_argument("--result-dir")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="transformer-stm-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("train", "test"):
        p = sub.add_parser(name)
        _add_common(p)

    p = sub.add_parser("heatmap", help="Grad-CAM over trained weights")
    _add_common(p)
    p.add_argument("--layers", type=int, default=10,
                   help="images per specimen (reference uses 10)")

    sub.add_parser("memory", help="CPU/RAM/TPU-HBM monitor (1 Hz)")

    p = sub.add_parser("pickup", help="IQR label prep (make Pick_up_datas)")
    p.add_argument("--in", dest="in_path",
                   default="/root/reference/Excel/Circle_test.xlsx")
    p.add_argument("--out", dest="out_path",
                   default="Excel/Processed_Circle_test.xlsx")

    p = sub.add_parser("plot-records")
    p.add_argument("--records", required=True)
    p.add_argument("--out", default="records.png")

    p = sub.add_parser("model-plot", help="model structure diagram")
    _add_common(p)
    p.add_argument("--out", default="model_plot.png")

    p = sub.add_parser("save-config", help="write the default config JSON")
    _add_common(p)
    p.add_argument("--out", default="config.json")

    sub.add_parser("bench", help="run the throughput benchmark")

    p = sub.add_parser("export-h5", help="export trained weights into the "
                       "reference's own Keras model (.h5 its unmodified "
                       "eval scripts can load_weights)")
    _add_common(p)
    p.add_argument("--out", help="output .h5 path (default: next to the "
                   "checkpoint, reference naming convention)")

    p = sub.add_parser("sweep", help="hyperparameter sweep (the lineage's "
                       "keras-tuner search, TPU-native: CvT points train "
                       "simultaneously as vmapped slots; FFN points also "
                       "sweep hidden width)")
    _add_common(p)
    p.add_argument("--lr", default="1e-3",
                   help="comma list of learning rates")
    p.add_argument("--dropout", default=None,
                   help="comma list of dropout rates (CvT only)")
    p.add_argument("--seeds", default="0", help="comma list of init seeds")
    p.add_argument("--hidden", default=None,
                   help="comma list of FFN hidden widths (par only)")

    p = sub.add_parser("compare", help="CvT vs classical-ML baselines")
    p.add_argument("--metrics-dir", required=True,
                   help="dir of Predictions_Metrics_{freq}.xlsx")
    p.add_argument("--glcm-dir",
                   default="/root/reference/Result/Excel/glcm")
    p.add_argument("--prop", default="Hc",
                   choices=["Bm", "Hc", "μa", "Br", "Pcv"])
    p.add_argument("--out", default="compare_r2.png")

    p = sub.add_parser("plot-labels", help="label distribution plot")
    p.add_argument("--config", help="JSON config path")
    p.add_argument("--out", default="labels.png")

    p = sub.add_parser("plot-data", help="dataset visualizer: per-image "
                       "values vs group averages (Plot_Original_Data)")
    p.add_argument("--config", help="JSON config path")
    p.add_argument("--freq", default="50HZ_Bm")
    p.add_argument("--out", default="original_data_{freq}.png")
    p.add_argument("--params", action="store_true",
                   help="also write the labels-vs-parameters twin-axis view")

    args = ap.parse_args(argv)

    if args.cmd in ("train", "test"):
        from .harness import run
        cfg = _build_cfg(args)
        run(cfg, mode=args.cmd, verbose=True)
    elif args.cmd == "heatmap":
        from .harness import heatmap_target
        cfg = _build_cfg(args)
        for freq in cfg.frequencies:
            heatmap_target(cfg, freq, layers=args.layers)
    elif args.cmd == "memory":
        from .tools.monitor import monitor_loop
        monitor_loop()
    elif args.cmd == "pickup":
        from .tools.prep import pick_up_data
        n = pick_up_data(args.in_path, args.out_path)
        print(f"wrote {args.out_path} ({n} outlier cells dropped)")
    elif args.cmd == "plot-records":
        from .tools.plots import plot_records
        plot_records(args.records, args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "model-plot":
        from .tools.model_plot import plot_model_structure
        cfg = _build_cfg(args)
        plot_model_structure(cfg, args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "save-config":
        cfg = _build_cfg(args)
        save_config(cfg, args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "bench":
        import runpy
        runpy.run_module("bench", run_name="__main__")
    elif args.cmd == "export-h5":
        import os

        import jax
        from .harness import _paths, _spec_for
        from .train.checkpoint import latest_checkpoint, load_checkpoint
        from .train.h5_export import (export_cvt_reference_h5,
                                      load_reference_module)

        cfg = _build_cfg(args)

        def out_for(paths, freq):
            # a single --out with several frequencies would silently
            # overwrite itself per iteration (advisor r3) — suffix it
            if args.out and len(cfg.frequencies) > 1:
                root, ext = os.path.splitext(args.out)
                return f"{root}_{freq}{ext or '.h5'}"
            return args.out or (paths["weights"].rstrip("/") + ".h5")

        if cfg.inputs == "par":
            import numpy as np

            from .models.ffn import init_ffn
            from .train.h5_export import (REF_FFN,
                                          export_ffn_reference_h5)

            mod = load_reference_module(REF_FFN)
            for freq in cfg.frequencies:
                paths = _paths(cfg, freq)
                ckpt = latest_checkpoint(paths["weights"])
                if ckpt is None:
                    print(f"{freq}: no checkpoint under {paths['weights']}")
                    continue
                # derive the layer dims from the checkpoint itself — the
                # harness trains with proc_dim from the process table and
                # num_classes from cfg.model, not the init defaults
                # (advisor r3); load_checkpoint rejects shape mismatches
                with np.load(ckpt) as z:
                    fc1 = next((z[k] for k in z.files
                                if "fc1" in k and "kernel" in k), None)
                    final = next((z[k] for k in z.files
                                  if "final" in k and "kernel" in k), None)
                if fc1 is None or final is None:
                    print(f"{freq}: {ckpt} is not an FFN checkpoint "
                          f"(no fc1/final kernels); skipping")
                    continue
                params = init_ffn(jax.random.PRNGKey(0),
                                  proc_dim=fc1.shape[0],
                                  hidden=fc1.shape[1],
                                  num_classes=final.shape[1])
                params, _, _, _ = load_checkpoint(ckpt, params, {})
                out = out_for(paths, freq)
                export_ffn_reference_h5(params, out, mod=mod)
                print(f"{freq}: wrote {out}")
            return 0
        from .models.cvt import init_cvt
        spec = _spec_for(cfg)
        mod = load_reference_module()
        for freq in cfg.frequencies:
            paths = _paths(cfg, freq)
            ckpt = latest_checkpoint(paths["weights"])
            if ckpt is None:
                print(f"{freq}: no checkpoint under {paths['weights']}")
                continue
            params, state = init_cvt(jax.random.PRNGKey(0), spec)
            params, state, _, _ = load_checkpoint(ckpt, params, state)
            out = out_for(paths, freq)
            export_cvt_reference_h5(params, state, spec, out, mod=mod)
            print(f"{freq}: wrote {out}")
        return 0
    elif args.cmd == "sweep":
        from .train.sweep import grid_points, run_sweep, write_summary

        cfg = _build_cfg(args)
        split = lambda s, t: tuple(t(x) for x in s.split(",")) if s \
            else (None,)
        points = grid_points(split(args.lr, float),
                             split(args.dropout, float),
                             split(args.seeds, int) or (0,),
                             split(args.hidden, int))
        for freq in cfg.frequencies:
            summary = run_sweep(cfg, freq, points,
                                epochs=cfg.train.epochs)
            path = write_summary(summary, cfg.result_dir)
            b = summary["best"]
            print(f"{freq}: best {b} -> {path}")
        return 0
    elif args.cmd == "compare":
        import os
        from .config import FREQUENCIES
        from .tools.plots import plot_compare_r2
        metrics_by_freq = {}
        for f in FREQUENCIES:
            if not f.endswith(args.prop):
                continue
            path = os.path.join(args.metrics_dir,
                                f"Predictions_Metrics_{f}.xlsx")
            if os.path.exists(path):
                metrics_by_freq[f] = path
        if not metrics_by_freq:
            print(f"no Predictions_Metrics files for {args.prop} in "
                  f"{args.metrics_dir}")
            return 1
        plot_compare_r2(metrics_by_freq, args.glcm_dir, args.prop, args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "plot-labels":
        from .config import FREQUENCIES
        from .data.labels import LabelTable
        from .tools.plots import plot_label_distribution
        cfg = load_config(args.config) if args.config else ExperimentConfig()
        lt = LabelTable.load(cfg.data.excel_labels)
        labels_by_freq = {}
        for f in FREQUENCIES:
            vals = [v for v in lt.target_values(f) if v is not None]
            labels_by_freq[f] = vals
        plot_label_distribution(labels_by_freq, args.out)
        print(f"wrote {args.out}")
    elif args.cmd == "plot-data":
        import numpy as np

        from .data.labels import LabelTable, ProcessTable, standard_scale
        from .tools.plots import (plot_labels_vs_parameters,
                                  plot_values_vs_group_average)
        cfg = load_config(args.config) if args.config else ExperimentConfig()
        lt = LabelTable.load(cfg.data.excel_labels)
        values = lt.target_values(args.freq)
        out = args.out.format(freq=args.freq)
        plot_values_vs_group_average(values, args.freq, out)
        print(f"wrote {out}")
        if args.params:
            pt = ProcessTable.load(cfg.data.excel_process)
            per_piece = np.array(
                [pt.group_params(g) for g in range(len(pt.rows))
                 for _ in range(5)][:len(values)])
            scaled = standard_scale(per_piece)[0]
            pout = out.replace(".png", "_params.png")
            plot_labels_vs_parameters(values, scaled, args.freq, pout)
            print(f"wrote {pout}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
