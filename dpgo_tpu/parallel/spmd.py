"""Multi-chip SPMD execution: the node axis sharded over a device mesh.

The reference simulates a robot network in one process with shared-memory
copies (DPGO_utils.h:397-453). Here the same rectangular node axis is laid out
over `Mesh(('nodes',))` with `shard_map`: each device owns N/D node blocks and
runs the identical per-node math; the halo/separator exchange is a collective
over ICI — the TPU-native equivalent of the reference's per-node
`sent`/`recv` message schedules (DPGO_utils.cpp:326-438). The objective
pieces needed by metrics / AMM-PGO* master tests are `psum`s of per-shard
sums.

Three exchange strategies (`halo=`):

- "boundary" (default): all_gather of compacted per-node separator buffers —
  only the poses some other node actually reads cross the interconnect
  (the reference's dense ((d+1)|sep| x d) messages, padded rectangular).
- "gather": all_gather of the full own-state blocks (simplest; bytes scale
  with n0_max instead of |separator|).
- "ring": neighbor ppermute ring rotation of the boundary buffers, running
  only as many rounds as the widest device distance any edge spans —
  bandwidth-optimal for chain-like partitions where communication is
  between adjacent blocks.

Numerics are identical to the vmapped single-device simulation (the per-node
functions are the same code), so `DPGOSolver` tests validate this path too.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpgo_tpu.driver import DPGOSolver, DPGOStarSolver
from dpgo_tpu.graph import MultiGraph
from dpgo_tpu.io.g2o import Measurements
from dpgo_tpu.losses import Loss
from dpgo_tpu.problem import NodeState
from dpgo_tpu.solvers import mm as mm_mod
from dpgo_tpu.solvers import star as star_mod
from dpgo_tpu.solvers.mm import MMOptions, MMState


@dataclasses.dataclass
class HaloSchedule:
    """Compacted separator-exchange schedule (host-built, static).

    bnd[o, s] is the local pose index of owner o's s-th boundary pose (a pose
    some other node reads); halo_slot[a, h] maps node a's h-th halo entry to
    the owner's boundary-buffer slot. (The ring strategy's round count is
    device-count-dependent and computed per-solver by `_ring_rounds`.)
    """

    bnd: np.ndarray        # [N, B] int32
    halo_slot: np.ndarray  # [N, n1_max] int32
    B: int


def build_halo_schedule(mg: MultiGraph) -> HaloSchedule:
    N = mg.num_nodes
    bnd_sets = [set() for _ in range(N)]
    for a in range(N):
        for h in range(mg.halo_owner.shape[1]):
            if mg.halo_mask[a, h]:
                bnd_sets[int(mg.halo_owner[a, h])].add(
                    int(mg.halo_lpose[a, h]))
    bnd_lists = [sorted(s) for s in bnd_sets]
    B = max([len(s) for s in bnd_lists] + [1])
    bnd = np.zeros((N, B), np.int32)
    slot_of = np.zeros((N, mg.n0_max), np.int32)
    for o, lst in enumerate(bnd_lists):
        if lst:
            bnd[o, :len(lst)] = lst
            slot_of[o, lst] = np.arange(len(lst), dtype=np.int32)
    halo_slot = slot_of[mg.halo_owner, mg.halo_lpose].astype(np.int32)
    return HaloSchedule(bnd=bnd, halo_slot=halo_slot, B=B)


def _ring_rounds(mg: MultiGraph, num_devices: int) -> int:
    """Max (owner_dev - reader_dev) mod D over real halo entries."""
    N = mg.num_nodes
    npd = N // num_devices
    rounds = 0
    for a in range(N):
        my_dev = a // npd
        for h in range(mg.halo_owner.shape[1]):
            if mg.halo_mask[a, h]:
                od = int(mg.halo_owner[a, h]) // npd
                rounds = max(rounds, (od - my_dev) % num_devices)
    return rounds


def _halo_exchange(t_own, R_own, owner_l, slot_l, bnd_l, halo: str,
                   num_devices: int, nodes_per_dev: int, ring_rounds: int,
                   dc_l=None):
    """Refresh halos from own states inside shard_map (axis name 'nodes').

    All arrays carry the LOCAL node axis leading ([npd, ...]); owner_l holds
    GLOBAL owner node ids. `dc_l` [npd, n1_max, d] re-expresses the owner's
    locally-centered translations in the reader's frame (local gauge
    centering, driver._set_gauge).
    """
    def shift(th):
        return th if dc_l is None else th + dc_l

    if halo == "gather":
        t_all = lax.all_gather(t_own, "nodes", axis=0, tiled=True)
        R_all = lax.all_gather(R_own, "nodes", axis=0, tiled=True)
        return shift(t_all[owner_l, slot_l[1]]), R_all[owner_l, slot_l[1]]

    slot = slot_l[0]
    tb = jnp.take_along_axis(t_own, bnd_l[:, :, None], axis=1)
    Rb = jnp.take_along_axis(R_own, bnd_l[:, :, None, None], axis=1)
    if halo == "boundary":
        t_all = lax.all_gather(tb, "nodes", axis=0, tiled=True)   # [N, B, d]
        R_all = lax.all_gather(Rb, "nodes", axis=0, tiled=True)
        return shift(t_all[owner_l, slot]), R_all[owner_l, slot]

    assert halo == "ring"
    D, npd = num_devices, nodes_per_dev
    my = lax.axis_index("nodes")
    owner_dev = owner_l // npd
    owner_loc = owner_l % npd
    th = jnp.zeros(owner_l.shape + (t_own.shape[-1],), t_own.dtype)
    Rh = jnp.zeros(owner_l.shape + R_own.shape[-2:], R_own.dtype)
    buf_t, buf_R = tb, Rb
    perm = [((i + 1) % D, i) for i in range(D)]
    for r in range(ring_rounds + 1):
        take = owner_dev == ((my + r) % D)
        th = jnp.where(take[..., None], buf_t[owner_loc, slot], th)
        Rh = jnp.where(take[..., None, None], buf_R[owner_loc, slot], Rh)
        if r < ring_rounds:
            buf_t = lax.ppermute(buf_t, "nodes", perm)
            buf_R = lax.ppermute(buf_R, "nodes", perm)
    return shift(th), Rh


class ShardedDPGOSolver(DPGOSolver):
    """DPGOSolver whose step runs under shard_map over a `nodes` mesh axis."""

    def __init__(self, meas: Measurements, num_nodes: int,
                 mesh: Mesh | None = None,
                 opts: MMOptions | None = None,
                 loss: Loss = Loss.TRIVIAL, loss_reg: float = 1.0,
                 halo: str = "boundary",
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
        if halo not in ("gather", "boundary", "ring"):
            raise ValueError(f"unknown halo strategy {halo!r}")
        self.halo = halo
        self.nodes_per_dev = num_nodes // ndev
        self.num_devices = ndev
        sched = build_halo_schedule(self.mg)
        self.halo_sched = sched
        self.bnd = jnp.asarray(sched.bnd)
        self.halo_slot = jnp.asarray(sched.halo_slot)
        self.ring_rounds = _ring_rounds(self.mg, ndev) if halo == "ring" \
            else 0
        self._node_sharding = NamedSharding(mesh, P("nodes"))
        # _make_jits already ran in super().__init__ with late-bound method
        # dispatch, so the jitted entry points trace THIS class's _step_impl.

    # The per-leaf spec: every per-node array has the node axis leading.
    def _shard_state(self, st: MMState) -> MMState:
        return jax.device_put(
            st, jax.tree.map(lambda _: self._node_sharding, st))

    def initialize(self, t=None, R=None) -> MMState:
        st = super().initialize(t, R)
        return self._shard_state(st)

    def _exchange(self, t_own, R_own, owner_l, slot_pair, bnd_l, dc_l=None):
        return _halo_exchange(t_own, R_own, owner_l, slot_pair, bnd_l,
                              self.halo, self.num_devices,
                              self.nodes_per_dev, self.ring_rounds,
                              dc_l=dc_l)

    def _dc(self):
        """Per-halo-entry gauge offsets (zeros when centering is off)."""
        if getattr(self, "halo_dc", None) is not None:
            return self.halo_dc
        return jnp.zeros(self.halo_owner.shape + (self.mg.d,), self.dtype)

    def _place_global(self, t, R):
        # Shard the gathered pose axis over the mesh: the coupled polish TNT
        # then runs distributed under GSPMD, each CG Hessian product's halo
        # reads becoming ICI collectives.
        sh = NamedSharding(self.mesh, P("nodes"))
        return jax.device_put(t, sh), jax.device_put(R, sh)

    def _step_impl(self, probs, st: MMState, k):
        opts = self.opts
        nspec = P("nodes")

        # check_vma=False: TNT's while_loop carries fresh scalar constants
        # (trust radius, counters) whose varying-axis tags the static checker
        # cannot infer; the computation itself is per-node-parallel.
        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(nspec, nspec, nspec, nspec, nspec, nspec, nspec,
                           P()),
                 out_specs=nspec, check_vma=False)
        def step(probs_l, st_l, owner_l, lpose_l, slot_l, bnd_l, dc_l, kk):
            probs_w = mm_mod.reweighted_problems(probs_l, st_l, opts)
            scheme = mm_mod.resolve_scheme(opts)
            if scheme == "amm":
                st2 = mm_mod.iterate_amm(probs_w, st_l, opts, kk)
            elif scheme == "aa":
                st2 = mm_mod.iterate_aa(probs_w, st_l, opts, kk)
            else:
                st2 = mm_mod.iterate_mm(probs_w, st_l, opts, kk)
            th, Rh = self._exchange(st2.Z.t, st2.Z.R, owner_l,
                                    (slot_l, lpose_l), bnd_l, dc_l)
            Z = NodeState(t=st2.Z.t, R=st2.Z.R, th=th, Rh=Rh)
            st2 = st2._replace(Z=Z)
            return mm_mod.update_state(probs_l, st2, opts, kk + 1,
                                       first=False)

        return step(probs, st, self.halo_owner, self.halo_lpose,
                    self.halo_slot, self.bnd, self._dc(), k)


class ShardedDPGOStarSolver(DPGOStarSolver):
    """AMM-PGO* under shard_map: the master's exact global objective is a
    psum of per-shard node objective shares over gathered candidate states
    (no physical master device; reference DPGOStar.cpp:126-213)."""

    def __init__(self, meas: Measurements, num_nodes: int,
                 mesh: Mesh | None = None,
                 opts: MMOptions | None = None,
                 loss: Loss = Loss.TRIVIAL, loss_reg: float = 1.0,
                 halo: str = "boundary",
                 dtype=jnp.float64):
        super().__init__(meas, num_nodes, opts=opts, loss=loss,
                         loss_reg=loss_reg, dtype=dtype)
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("nodes",))
        self.mesh = mesh
        if num_nodes % mesh.devices.size != 0:
            raise ValueError("num_nodes must divide the mesh size")
        if halo not in ("gather", "boundary", "ring"):
            raise ValueError(f"unknown halo strategy {halo!r}")
        self.halo = halo
        self.num_devices = mesh.devices.size
        self.nodes_per_dev = num_nodes // self.num_devices
        sched = build_halo_schedule(self.mg)
        self.bnd = jnp.asarray(sched.bnd)
        self.halo_slot = jnp.asarray(sched.halo_slot)
        self.ring_rounds = _ring_rounds(self.mg, self.num_devices) \
            if halo == "ring" else 0
        self._node_sharding = NamedSharding(mesh, P("nodes"))

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

    def _exchange(self, t_own, R_own, owner_l, slot_pair, bnd_l, dc_l=None):
        return _halo_exchange(t_own, R_own, owner_l, slot_pair, bnd_l,
                              self.halo, self.num_devices,
                              self.nodes_per_dev, self.ring_rounds,
                              dc_l=dc_l)

    def _dc(self):
        if getattr(self, "halo_dc", None) is not None:
            return self.halo_dc
        return jnp.zeros(self.halo_owner.shape + (self.mg.d,), self.dtype)

    def _step_impl(self, probs, st, k):
        opts = self.opts
        nspec = P("nodes")
        sspec = self._state_spec(st)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(nspec, sspec, nspec, nspec, nspec, nspec, nspec,
                           P()),
                 out_specs=sspec, check_vma=False)
        def step(probs_l, st_l, owner_l, lpose_l, slot_l, bnd_l, dc_l, kk):
            def global_f(t_own_l, R_own_l):
                # Gather every node's candidate separator state, rebuild
                # halos, and psum the per-node objective shares (per-node
                # terms are shift-invariant, so the local gauge frames drop
                # out of the sum).
                th, Rh = self._exchange(t_own_l, R_own_l, owner_l,
                                        (slot_l, lpose_l), bnd_l, dc_l)
                Z = NodeState(t=t_own_l, R=R_own_l, th=th, Rh=Rh)
                local = jnp.sum(jax.vmap(
                    lambda p, z: p.local_fobj(z))(probs_l, Z))
                return lax.psum(local, "nodes")

            st2 = star_mod.iterate_star(probs_l, st_l, opts, global_f, kk)
            th, Rh = self._exchange(st2.Z.t, st2.Z.R, owner_l,
                                    (slot_l, lpose_l), bnd_l, dc_l)
            Z = NodeState(t=st2.Z.t, R=st2.Z.R, th=th, Rh=Rh)
            st2 = st2._replace(Z=Z)
            return star_mod.update_star(probs_l, st2, opts, first=False)

        return step(probs, st, self.halo_owner, self.halo_lpose,
                    self.halo_slot, self.bnd, self._dc(), k)
