import os

# Honor FEA_TPU_PLATFORM=cpu|tpu|axon before any backend init. In this
# container sitecustomize imports jax (and pins JAX_PLATFORMS=axon) at
# interpreter start, so plain env retargeting is impossible — but the
# backend only initializes on first device use, and jax.config.update
# still works here. Lets every CLI surface run on the host CPU when the
# tunneled TPU is hung (the tunnel has multi-minute stalls ~50% of cold
# runs).
_platform = os.environ.get("FEA_TPU_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)

from .cli import main

if __name__ == "__main__":
    main()
