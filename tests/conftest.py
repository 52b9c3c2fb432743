import os

# Tests run on CPU with a virtual 8-device mesh so sharding logic is
# exercised without TPU hardware. The axon TPU plugin (sitecustomize.py)
# force-sets JAX_PLATFORMS=axon at interpreter start, so we must override
# both the env var and the live jax config here, before any backend is
# initialized lazily.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
