"""Pytree-registered dataclass helper.

All framework objects (prox operators, smooth objectives, stepsize rules,
linear operators) are frozen dataclasses registered as JAX pytrees so they
can cross `jit` boundaries, live in `lax.scan`/`while_loop` carries, and be
`vmap`-ed over their numeric fields (e.g. a regularization path over
``L1Norm.lam`` or a coupling sweep over ``AdaPGMRule.t``).
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta=()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields named in ``meta`` are static (part of the treedef, must be
    hashable); all other fields are dynamic leaves.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        names = [f.name for f in dataclasses.fields(c)]
        data = [n for n in names if n not in meta]
        jax.tree_util.register_dataclass(c, data_fields=data, meta_fields=list(meta))
        return c

    if cls is None:
        return wrap
    return wrap(cls)

