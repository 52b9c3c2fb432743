"""langscenex_tpu: a TPU-native (JAX/XLA/Pallas) language-embedded 3D Gaussian
splatting framework with the capabilities of LangScene-X.

Four-stage pipeline (reference: /root/reference/quick_start.sh:14-61):
  1. TriMap video diffusion (CogVideoX keyframe interpolation)  -> models.cogvideox
  2. Auto-segmentation (SAM/SAM2 video mask propagation)        -> models.sam2 / autoseg
  3. Language feature lifting (OpenSeg/CLIP + per-scene AE)     -> models.autoencoder
  4. 3DGS + language-surface field construction                 -> ops.rasterize + train.field
"""

__version__ = "0.1.0"
