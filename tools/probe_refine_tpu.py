"""Probe the TNT refinement on the real TPU: per-node CG counts / rho /
acceptance at several points along a sphere2500 8-node run, using
driver.refine_stats (the TNTResult instrumentation). Attributes refined-path
cost to CG trip counts vs outer iterations vs per-iteration kernel cost.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_refine_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpgo_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dpgo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.solvers.mm import MMOptions

meas = read_g2o_file(os.environ.get(
    "PROBE_DATASET", "/root/reference/dataset/sphere2500.g2o"))
NODES = int(os.environ.get("PROBE_NODES", "8"))

opts = MMOptions(accelerated=True)
s = DPGOSolver(meas, num_nodes=NODES, opts=opts, dtype=jnp.float32)
st = s.initialize()
k = jnp.zeros((), jnp.int32)
for stage in (1, 9, 30, 60):
    st, k = s.run_steps(st, k, stage)
    d = s.refine_stats(st)
    cnt = d["count"]
    f, g = map(float, s._metrics(st))
    print(f"@k={int(np.asarray(k))}: 2f={f:.3f} 2|g|={g:.3e} "
          f"refined={d['refined_mask'].sum()}/{NODES} counts={cnt}",
          flush=True)
    for a in range(NODES):
        c = int(cnt[a])
        if c == 0:
            continue
        print(f"  node{a}: cg={d['inner_iterations'][a][:c]} "
              f"rho={np.round(d['rho'][a][:c], 3)} "
              f"acc={d['accepted'][a][:c]} "
              f"hM={np.round(d['h_M_norm'][a][:c], 4)}", flush=True)
