"""bf16-exp2 softmax probe at the mask-free DiT-aligned shape."""
import jax, jax.numpy as jnp, numpy as np, time, math
from ab_attention2 import timed, flash_exp2_bf16
from langscenex_tpu.ops.flash_attention import flash_attention

timed("prod (bias-col exp2) T=18432",
      lambda q, k, v: flash_attention(q, k, v), 18432)
timed("exp2-bf16 T=18432",
      lambda q, k, v: flash_exp2_bf16(q, k, v), 18432)
