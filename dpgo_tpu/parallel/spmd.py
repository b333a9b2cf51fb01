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

from dpgo_tpu.driver import DPGOSolver, DPGOStarSolver
from dpgo_tpu.io.g2o import Measurements
from dpgo_tpu.losses import Loss
from dpgo_tpu.problem import NodeState
from dpgo_tpu.solvers import mm as mm_mod
from dpgo_tpu.solvers import star as star_mod
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
            probs_w = mm_mod.reweighted_problems(probs_l, st_l, opts)
            if opts.accelerated:
                st2 = mm_mod.iterate_amm(probs_w, st_l, opts, kk)
            else:
                st2 = mm_mod.iterate_mm(probs_w, st_l, opts, kk)
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


class ShardedDPGOStarSolver(DPGOStarSolver):
    """AMM-PGO* under shard_map: the master's exact global objective is a
    psum of per-shard node objective shares over gathered candidate states
    (no physical master device; reference DPGOStar.cpp:126-213)."""

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
        if num_nodes % mesh.devices.size != 0:
            raise ValueError("num_nodes must divide the mesh size")
        self._node_sharding = NamedSharding(mesh, P("nodes"))
        self._step = jax.jit(self._sharded_step_impl)

    def _state_spec(self, st):
        # Node-axis leaves are sharded; scalar leaves (the master reference
        # F) are replicated.
        N = self.num_nodes
        return jax.tree.map(
            lambda x: P("nodes") if (getattr(x, "ndim", 0) >= 1
                                     and x.shape[0] == N) else P(), st)

    def initialize(self, t=None, R=None):
        st = super().initialize(t, R)
        mesh = self.mesh
        return jax.device_put(
            st, jax.tree.map(lambda sp: NamedSharding(mesh, sp),
                             self._state_spec(st)))

    def _sharded_step_impl(self, st, k):
        opts = self.opts
        probs = self.probs
        nspec = P("nodes")
        sspec = self._state_spec(st)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(nspec, sspec, nspec, nspec, P()),
                 out_specs=sspec, check_vma=False)
        def step(probs_l, st_l, owner_l, lpose_l, kk):
            def global_f(t_own_l, R_own_l):
                # Gather every node's candidate own state, rebuild halos,
                # and psum the per-node objective shares.
                t_all = lax.all_gather(t_own_l, "nodes", axis=0, tiled=True)
                R_all = lax.all_gather(R_own_l, "nodes", axis=0, tiled=True)
                Z = NodeState(t=t_own_l, R=R_own_l,
                              th=t_all[owner_l, lpose_l],
                              Rh=R_all[owner_l, lpose_l])
                local = jnp.sum(jax.vmap(
                    lambda p, z: p.local_fobj(z))(probs_l, Z))
                return lax.psum(local, "nodes")

            st2 = star_mod.iterate_star(probs_l, st_l, opts, global_f, kk)
            t_all = lax.all_gather(st2.Z.t, "nodes", axis=0, tiled=True)
            R_all = lax.all_gather(st2.Z.R, "nodes", axis=0, tiled=True)
            Z = NodeState(t=st2.Z.t, R=st2.Z.R,
                          th=t_all[owner_l, lpose_l],
                          Rh=R_all[owner_l, lpose_l])
            st2 = st2._replace(Z=Z)
            return star_mod.update_star(probs_l, st2, opts, first=False)

        return step(probs, st, self.halo_owner, self.halo_lpose, k)
