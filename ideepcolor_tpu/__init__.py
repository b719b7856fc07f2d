"""ideepcolor_tpu — TPU-native interactive deep colorization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
junyanz/interactive-deep-colorization ("Real-Time User-Guided Image
Colorization with Learned Deep Priors", SIGGRAPH 2017).

The reference is an interactive inference application driving Caffe/PyTorch
CNN backends from a Qt GUI and two notebooks. This framework re-designs that
stack TPU-first:

  * one jit-compiled XLA program per network variant (no graph interpreter),
  * colorspace / quantization / hint-rasterization / suggestion-sampling as
    vectorized on-device ops (Pallas kernels on the hot paths),
  * a ``ColorizeImageBase``-compatible API facade so reference-style GUI code
    and notebook sessions run against the TPU backend unchanged,
  * data-parallel scaling over a ``jax.sharding.Mesh`` for batched/streaming
    configurations, and a training step (the reference delegates training to
    an external repo; we keep it first-class).

Layer map (mirrors SURVEY.md section 1 of the reference):
  apps/   -- CLI entry + notebook-style demos        (ref: ideepcolor.py)
  ui/     -- Qt GUI widgets + headless hint control  (ref: ui/)
  api/    -- backend-agnostic colorize-image API     (ref: data/colorize_image.py)
  engine/ -- fused jitted inference pipelines        (ref: caffe/torch engines)
  models/ -- network definitions + weight converters (ref: models/)
  ops/    -- colorspace, quantize, gamut, hints, resize, kmeans kernels
             (ref: caffe_files/, data/lab_gamut.py, cv2/sklearn/scipy calls)
  parallel/ -- mesh + sharding utilities (no equivalent in reference)
  train/  -- losses + DP training step (reference: external repo)
  utils/  -- IO, timing, profiling, session dumps
"""

__version__ = "0.1.0"
