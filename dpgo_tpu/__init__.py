"""dpgo_tpu: TPU-native distributed pose-graph optimization (MM-PGO family).

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference C++ DPGO implementation (Fan & Murphey, IEEE T-RO 2024).
"""

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.graph import partition_measurements, build_multigraph

__version__ = "0.1.0"

__all__ = [
    "read_g2o_file",
    "partition_measurements",
    "build_multigraph",
]
