"""Quickstart: build a synthetic basin, integrate it, route the discharge.

Everything a Tiger_HLM_GPU user needs, end to end, without data files:

    python examples/quickstart.py            # runs on whatever backend JAX has

For real basins, use the CLI instead (tiger-tpu --config simulation.yaml) —
see examples/simulation.yaml.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

# Runnable straight from a git checkout, no install needed.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiger_tpu import ForcingSet, Model204, SolverConfig, solve
from tiger_tpu import routing
from tiger_tpu.models.model204 import Y0_COMMON

# ---- a 1000-link synthetic basin ------------------------------------------
rng = np.random.default_rng(0)
n_links = 1000

# Spatial parameters (see tiger_tpu.params for the CSV loader + conversions).
c1 = 0.001 / 60.0
params = {
    "c1": jnp.full(n_links, c1),
    "infil": jnp.asarray(rng.uniform(3, 8, n_links) * c1),
    "perco": jnp.asarray(rng.uniform(1, 4, n_links) * c1),
    "Hu": jnp.asarray(rng.uniform(0.2, 0.6, n_links)),
    "lat": jnp.full(n_links, 41.5),
    "sw": jnp.full(n_links, 0.2),
    "ss": jnp.full(n_links, 0.8),
    "n_mann": jnp.full(n_links, 0.03),
    "slope": jnp.asarray(rng.uniform(0.01, 0.08, n_links)),
    "L": jnp.asarray(rng.uniform(0.5, 3.0, n_links)),
    "A_h": jnp.asarray(rng.uniform(5, 30, n_links)),
    "alpha3": jnp.full(n_links, 2.0 * 1440.0),
    "alpha4": jnp.full(n_links, 5.0 * 1440.0),
    "melt_f": jnp.full(n_links, 1e-4),
    "temp_thr": jnp.zeros(n_links),
}

# Hourly rain + daily temperature for 2 days (already remapped to links;
# tiger_tpu.forcing.load_forcings does NetCDF + lookup remap for real data).
pr = rng.uniform(0, 0.0015, (48, n_links)).astype(np.float32)
t2m = rng.uniform(2, 12, (2, n_links)).astype(np.float32)
forcings = ForcingSet.from_series([pr, t2m], [60.0, 1440.0])

# A random river network: every link drains to a higher-numbered one.
stream = np.arange(1, n_links + 1)
nxt = np.where(
    rng.uniform(size=n_links) < 0.9,
    np.minimum(stream + rng.integers(1, 50, n_links), n_links),
    -1,
)
nxt[-1] = -1

# ---- integrate -------------------------------------------------------------
y0 = jnp.tile(jnp.asarray(Y0_COMMON, jnp.float32), (n_links, 1))
query_times = jnp.arange(0.0, 2881.0, 60.0, dtype=jnp.float32)
cfg = SolverConfig(rtol=1e-5, atol=1e-8)

res = solve(Model204(), y0, 0.0, 2880.0, query_times,
            params=params, forcings=forcings, config=cfg)
jax.block_until_ready(res.y_final)

print(f"integrated {n_links} links x 2 days: "
      f"{int(np.asarray(res.rk_stats.n_attempts).sum())} steps, "
      f"{res.n_stiff} stiff, {int(np.asarray(res.failed).sum())} failed")
print("final state of link 0:", np.asarray(res.y_final[0]).round(5))

# ---- route the discharge ---------------------------------------------------
topo = routing.build_topology(stream, nxt)
q = routing.routed_discharge(jnp.nan_to_num(res.dense), params, topo)
outlet = int(np.argmax(np.asarray(q[:, -1])))
print(f"network depth {topo.depth}; biggest outlet is link {outlet} with "
      f"discharge {float(q[outlet, -1]):.4f} at t=2880 min")
