"""DP train-step sharding efficiency on the virtual n-device CPU mesh.

Companion to the datagen scaling number bench.py emits
(`sharding_efficiency_virtual_mesh`): measures the TRAINING half —
fixed total batch, 1-device vs n-device 'dp' mesh, same jitted SPMD
step (reference counterpart: train_model.py's Accelerate DDP loop).

Run:  JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/train_scaling.py [n_devices]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from fea_tpu.parallel.scaling import measure_train_sharding_efficiency  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = measure_train_sharding_efficiency(n)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
