"""Analysis & observability tools (reference tools/ parity, SURVEY.md §2.1
components 14-22):

- ``grad_cam``: Grad-CAM heatmaps over the stage-3 feature map
  (reference: tools/grad_cam_CvT.py — here via jax.grad, no GradientTape).
- ``plots``: training-records curves, prediction scatter/line plots,
  baseline-comparison plots (reference: tools/Plot_records.py,
  Compare_plot.py, Compare_r.py, and the eval harness plot dumps).
- ``monitor``: CPU/RAM/TPU-HBM usage monitor (reference: tools/memory.py,
  nvidia-smi polling -> jax device memory_stats).
- ``prep``: offline label prep (IQR filter -> Processed xlsx), rotation
  augmentation, ML-export (reference: tools/PickUpData.py, Rotate.py,
  toMLexcel.py).
- ``model_plot``: model structure diagram (reference: tools/model_plot.py).
"""
