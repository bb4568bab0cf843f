"""Parallel primitive parity wrappers.

Named equivalents of the reference's OpenCL device primitives — each maps
to ONE native XLA TPU op, which is the whole point of the redesign:

* ``sort_by_key``   <- bitonic/radix ``cl_sort_by_key.hpp:44-95``
* ``reduce_by_key`` <- ``cl_reduce_by_key.hpp:43-90``
* ``prefix_sum``    <- recursive block scan ``cl_prefix_sum.hpp:39-85``
* ``exclusive_scan``/``inclusive_scan`` convenience forms
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .segments import segment_fold

__all__ = [
    "sort_by_key",
    "reduce_by_key",
    "prefix_sum",
    "inclusive_scan",
    "exclusive_scan",
]


@jax.jit
def sort_by_key(keys, *values):
    """Stable ascending sort of (keys, values...) by keys (reference
    radix/bitonic sort-by-key; on TPU this is ``lax.sort``'s sort unit)."""
    out = lax.sort((keys, *values), num_keys=1, is_stable=True)
    return out


@partial(jax.jit, static_argnames=("op", "num_segments"))
def reduce_by_key(keys, values, op, num_segments):
    """Combine adjacent equal-key runs (keys sorted).  Returns dense
    ``(out[num_segments], has[num_segments])`` — out[k] = fold over key k.
    """
    valid = jnp.ones(keys.shape, jnp.bool_)
    ident = getattr(op, "identity", None)
    init = jnp.asarray(0 if ident is None else ident, values.dtype)
    return segment_fold(values, keys, valid, num_segments, op, init)


@jax.jit
def prefix_sum(x):
    """Exclusive prefix sum (the reference's cl_prefix_sum semantics)."""
    return jnp.cumsum(x) - x


@jax.jit
def inclusive_scan(x):
    return jnp.cumsum(x)


exclusive_scan = prefix_sum
