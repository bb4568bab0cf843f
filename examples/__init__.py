"""Runnable examples / CLI benchmarks.

Python equivalents of the reference example binaries (``examples/`` in the
reference: bfs, sssp, pr, tc, pi, convert — ``examples/options.hpp:34-66``):
each loads a MatrixMarket graph, runs the algorithm on the accelerator
(TPU) and on the CPU backend, validates against the sequential naive
oracle, and prints per-lap timings.

Run as modules::

    python -m examples.bfs --mtxpath graph.mtx --source 0
    python -m examples.pr  --mtxpath graph.mtx --alpha 0.85 --eps 1e-6
    python -m examples.pi  --n 1000000
    python -m examples.convert --in graph.mtx --out out.mtx --stats-only
"""

import os

# The axon TPU plugin ignores JAX_PLATFORMS, so SPLA_PLATFORM=cpu forces
# the CPU backend through jax.config — this must run before ANY module
# touches a backend (spla_tpu.algorithms materializes jnp scalars at
# import), hence here in the package __init__ rather than in common.py.
if os.environ.get("SPLA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SPLA_PLATFORM"])
