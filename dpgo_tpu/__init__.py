"""dpgo_tpu: TPU-native distributed pose-graph optimization (MM-PGO family).

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference C++ DPGO implementation (Fan & Murphey, IEEE T-RO 2024).
"""

import jax as _jax

# On TPU, f32 matmuls default to bf16 MXU passes (~1e-3 relative error) —
# ruinous for a second-order optimizer whose restart logic compares nearby
# objective values (the f32 solver literally diverges with the default).
# Force true-f32 (6-pass) matmuls; the MXU cost is still negligible at our
# operator sizes. f64 paths are unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.graph import partition_measurements, build_multigraph

__version__ = "0.1.0"

__all__ = [
    "read_g2o_file",
    "partition_measurements",
    "build_multigraph",
]
