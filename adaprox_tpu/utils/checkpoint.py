"""Checkpoint / resume (SURVEY §5: absent in the reference, trivial here —
solver state is a small pytree).

``save_pytree`` / ``load_pytree`` serialize any pytree of arrays to .npz
(host-side; device arrays are fetched). The PD engine exposes its loop carry
via ``return_state=True`` and accepts it back via ``resume_state=`` so a
solve can be checkpointed mid-run and continued bit-exactly — counters,
adaptive rule state, and the previous-iterate curvature memory all ride
along.
"""

from __future__ import annotations

import numpy as np

import jax

__all__ = ["save_pytree", "load_pytree"]

_NONE = "__none__"


def _npz_path(path):
    """np.savez silently appends '.npz' when the extension is missing;
    normalize so save/load round-trip for any path the caller chose."""
    path = str(path)
    return path if path.endswith(".npz") else path + ".npz"


def save_pytree(path, tree):
    """Serialize a pytree of arrays/scalars to an .npz file. Returns the
    actual path written ('.npz' appended when missing)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    path = _npz_path(path)
    np.savez(path, **arrays)
    return path


def load_pytree(path, like):
    """Load arrays saved by ``save_pytree`` into the structure of ``like``
    (the treedef string is stored for sanity only — the target structure
    comes from ``like``, which must match leaf-for-leaf in count, shape,
    and dtype; a same-count checkpoint from a different solver is rejected
    instead of silently loading garbage)."""
    data = np.load(_npz_path(path))
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len([k for k in data.files if k.startswith("leaf_")])
    if n != len(leaves_like):
        raise ValueError(
            f"checkpoint has {n} leaves but target structure has "
            f"{len(leaves_like)}. If this checkpoint was written by an "
            "older framework version, the solver's loop-carry schema may "
            "have grown since (e.g. r5 added a rule_nan diagnostic to the "
            "PD engines and gamma to fixed_nesterov's carry) — carries are "
            "not migrated across schema changes; re-run the solve to "
            "produce a fresh checkpoint."
        )
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    for i, (got, want) in enumerate(zip(leaves, leaves_like)):
        want = np.asarray(want)
        if tuple(got.shape) != tuple(want.shape) or got.dtype != want.dtype:
            raise ValueError(
                f"checkpoint leaf {i} is {got.dtype}{got.shape} but target "
                f"structure expects {want.dtype}{tuple(want.shape)}"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)
