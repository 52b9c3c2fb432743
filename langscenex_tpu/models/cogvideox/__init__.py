"""TriMap video diffusion: CogVideoX keyframe-interpolation DiT, 3D causal
VAE, schedulers, and the interpolation pipeline (reference:
cogvideox_interpolation/pipeline.py, video_inference.py)."""

from .transformer import CogVideoXTransformer, TransformerConfig  # noqa: F401
from .scheduler import DDIMScheduler, SchedulerConfig             # noqa: F401
