from dpgo_tpu.parallel.spmd import ShardedDPGOSolver

__all__ = ["ShardedDPGOSolver"]
