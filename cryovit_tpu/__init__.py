"""cryovit_tpu: a TPU-native framework for cryo-electron tomogram segmentation.

Re-implements the capabilities of the reference CryoVIT stack (PyTorch
Lightning + Hydra + torch.hub DINOv2) as an idiomatic JAX/XLA/Pallas/pjit
framework:

- ``cryovit_tpu.io``       — HDF5 / MRC / TIFF readers & writers (pure numpy).
- ``cryovit_tpu.types``    — sample/model registries and pytree batch types.
- ``cryovit_tpu.config``   — YAML-composition config system (hydra-compatible
  group/option layout) with dataclass schemas.
- ``cryovit_tpu.data``     — host-side datasets, split-policy datamodules and a
  double-buffered device feed.
- ``cryovit_tpu.models``   — flax models: CryoVIT 3D decoder, 3D U-Net,
  DINOv2 ViT-g/14 (+registers), losses and metrics.
- ``cryovit_tpu.ops``      — Pallas TPU kernels (flash attention) and
  torch-parity image ops.
- ``cryovit_tpu.parallel`` — mesh construction and sharding rules.
- ``cryovit_tpu.train``    — jit train/eval step functions, SWA, checkpoints.
- ``cryovit_tpu.run``      — dino_features / train_model / eval_model /
  infer_model entry points.
- ``cryovit_tpu.cli``      — ``cryovit {features,train,evaluate,infer}``.
"""

__version__ = "0.1.0"
