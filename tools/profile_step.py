"""Per-component TPU timing of the solver step (maintained profiling tool).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_step.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpgo_jax_cache")
import jax, time
jax.config.update("jax_compilation_cache_dir", "/tmp/dpgo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.solvers.mm import MMOptions, _tnt_batch
from dpgo_tpu.solvers import mm as mm_mod

meas = read_g2o_file("/root/reference/dataset/sphere2500.g2o")
solver = DPGOSolver(meas, num_nodes=8, opts=MMOptions(accelerated=True), dtype=jnp.float32)
st = solver.initialize()
probs = solver.probs

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms", flush=True)
    return out

step = jax.jit(solver._step_impl)
timeit("full step", step, probs, st, jnp.asarray(1, jnp.int32), n=10)
tb = jax.jit(lambda st: _tnt_batch(probs, st.Z.t, st.Z.R, st.g_t, st.g_R, st.f, solver.opts.tnt))
timeit("tnt batch (dense)", tb, st, n=10)
# measure sustained: 50 steps
t0=time.perf_counter()
s2 = st
for k in range(50):
    s2 = step(s2, jnp.asarray(k+1, jnp.int32))
jax.block_until_ready(s2.fobj)
print("sustained: %.1f it/s" % (50/(time.perf_counter()-t0)), flush=True)
