"""Checkpoint / resume for solver states.

The reference has no on-disk checkpointing but is *designed* for warm
starts: `approx` takes an initial x, `alm` takes :x0, make-alm accepts
prior multipliers (SURVEY.md §5 "Checkpoint/resume").  Every solver state
here is a pytree of arrays, so orbax gives durable checkpoints for free:
save mid-solve state (or final multipliers/iterates), restore later —
possibly on a different topology — and warm-start any solver from it.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, state: Any) -> None:
    """Write a solver state pytree to ``path`` (directory, created)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, state, force=True)


def load(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save`.

    ``template`` is a matching pytree (e.g. a freshly-built state for the
    same LP) providing structure/shape/dtype/sharding information; its
    array values are ignored.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
        if hasattr(x, "shape")
        else x,
        template,
    )
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(path, abstract)
