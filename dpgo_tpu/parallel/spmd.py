"""Multi-chip SPMD execution: the node axis sharded over a device mesh.

The reference simulates a robot network in one process with shared-memory
copies (DPGO_utils.h:397-453). Here the same rectangular node axis is laid out
over `Mesh(('nodes',))` with `shard_map`: each device owns N/D node blocks and
runs the identical per-node math; the halo/separator exchange becomes one
`all_gather` of the (tiny) per-node own states over ICI followed by a local
gather — the TPU-native equivalent of the reference's message schedules. The
objective pieces needed by metrics / AMM-PGO* master tests are `psum`s of
per-shard sums.

Numerics are identical to the vmapped single-device simulation (the per-node
functions are the same code), so `DPGOSolver` tests validate this path too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.io.g2o import Measurements
from dpgo_tpu.losses import Loss
from dpgo_tpu.problem import NodeState
from dpgo_tpu.solvers import mm as mm_mod
from dpgo_tpu.solvers.mm import MMOptions, MMState


class ShardedDPGOSolver(DPGOSolver):
    """DPGOSolver whose step runs under shard_map over a `nodes` mesh axis."""

    def __init__(self, meas: Measurements, num_nodes: int,
                 mesh: Mesh | None = None,
                 opts: MMOptions | None = None,
                 loss: Loss = Loss.TRIVIAL, loss_reg: float = 1.0,
                 dtype=jnp.float64):
        super().__init__(meas, num_nodes, opts=opts, loss=loss,
                         loss_reg=loss_reg, dtype=dtype)
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("nodes",))
        self.mesh = mesh
        ndev = mesh.devices.size
        if num_nodes % ndev != 0:
            raise ValueError(
                f"num_nodes ({num_nodes}) must be divisible by the mesh size "
                f"({ndev})")
        self._node_sharding = NamedSharding(mesh, P("nodes"))
        self._step = jax.jit(self._sharded_step_impl)

    # The per-leaf spec: every per-node array has the node axis leading.
    def _shard_state(self, st: MMState) -> MMState:
        return jax.device_put(
            st, jax.tree.map(lambda _: self._node_sharding, st))

    def initialize(self, t=None, R=None) -> MMState:
        st = super().initialize(t, R)
        return self._shard_state(st)

    def _sharded_step_impl(self, st: MMState, k):
        opts = self.opts
        probs = self.probs
        halo_owner = self.halo_owner
        halo_lpose = self.halo_lpose

        nspec = P("nodes")

        # check_vma=False: TNT's while_loop carries fresh scalar constants
        # (trust radius, counters) whose varying-axis tags the static checker
        # cannot infer; the computation itself is per-node-parallel.
        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(nspec, nspec, nspec, nspec, P()),
                 out_specs=nspec, check_vma=False)
        def step(probs_l, st_l, owner_l, lpose_l, kk):
            if opts.accelerated:
                st2 = mm_mod.iterate_amm(probs_l, st_l, opts, kk)
            else:
                st2 = mm_mod.iterate_mm(probs_l, st_l, opts, kk)
            # Halo exchange: all_gather own states over ICI, gather locally.
            t_all = lax.all_gather(st2.Z.t, "nodes", axis=0, tiled=True)
            R_all = lax.all_gather(st2.Z.R, "nodes", axis=0, tiled=True)
            Z = NodeState(t=st2.Z.t, R=st2.Z.R,
                          th=t_all[owner_l, lpose_l],
                          Rh=R_all[owner_l, lpose_l])
            st2 = st2._replace(Z=Z)
            return mm_mod.update_state(probs_l, st2, opts, kk + 1,
                                       first=False)

        return step(probs, st, halo_owner, halo_lpose, k)
