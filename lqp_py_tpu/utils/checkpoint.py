"""Checkpoint/resume for the training workload (SURVEY.md §5 aux).

The reference trains in-memory only (experiments/experiment_2.py:43-99 —
an interrupted run restarts from scratch).  Here the train state (params
pytree + epoch counter + loss trajectory so far) can be saved and
restored with orbax, the standard JAX checkpointing library: sharded
arrays are written as such, so a state saved from a multi-chip run
restores onto the same (or a differently laid-out) mesh.

Resume is exact: ``tests/test_checkpoint.py`` asserts that training K
epochs, checkpointing, restoring, and training the remaining epochs
reproduces the uninterrupted loss trajectory bit-for-bit.
"""

from __future__ import annotations

import pathlib
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


class TrainState(NamedTuple):
    """Minimal resumable state for the Experiment-2 workload."""

    params: Any            # model params pytree (e.g. LinearQPParams)
    epoch: jax.Array       # () int32 — epochs completed
    losses: jax.Array      # (n_epochs,) trajectory; entries past `epoch`
    #                        are the fill value (nan) until written


def init_train_state(params, n_epochs: int, dtype=jnp.float32) -> TrainState:
    return TrainState(params=params,
                      epoch=jnp.zeros((), jnp.int32),
                      losses=jnp.full((n_epochs,), jnp.nan, dtype))


def save_train_state(path, state: TrainState, *, overwrite: bool = False
                     ) -> None:
    """Write ``state`` under ``path``.  Blocking — returns once the
    checkpoint is durable.  ``overwrite=False`` raises if ``path`` already
    holds a checkpoint; ``overwrite=True`` replaces it (atomically, via
    orbax's tmp-dir + rename protocol)."""
    path = pathlib.Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        # NamedTuples round-trip as dicts through orbax; save the dict
        # form explicitly so the on-disk layout is stable.
        ckptr.save(path, state._asdict(), force=overwrite)


def restore_train_state(path, template: TrainState) -> TrainState:
    """Restore a state saved by :func:`save_train_state`.

    ``template`` supplies the pytree structure/shapes/dtypes (and, for
    sharded arrays, the target sharding): pass a freshly-initialized
    state — e.g. ``init_train_state(init_params(...), n_epochs)`` — and
    the stored values overwrite it.
    """
    path = pathlib.Path(path).absolute()
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, template._asdict())
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, abstract)
    return TrainState(**restored)


def latest_checkpoint(root) -> Optional[pathlib.Path]:
    """Return the highest-numbered ``step_*`` checkpoint under ``root``
    (the layout :func:`checkpointed_run` writes), or None."""
    root = pathlib.Path(root)
    if not root.is_dir():
        return None
    steps = sorted(root.glob("step_*"),
                   key=lambda p: int(p.name.split("_")[1]))
    return steps[-1] if steps else None


def checkpointed_run(run, state: TrainState, sel, *data,
                     root=None, every: int = 0):
    """Drive a ``make_train_scan``-style ``run`` in checkpointed chunks.

    Splits the epoch index matrix ``sel`` into chunks of ``every`` epochs,
    scans each chunk in one dispatch, and writes ``root/step_<epoch>``
    after each chunk (``every=0`` → single chunk, no checkpoints unless
    ``root`` is set, in which case the final state is written).  Returns
    the final TrainState.  To resume after an interruption, restore the
    latest checkpoint and call again with the SAME full-run ``sel`` —
    ``state.epoch`` records how many epochs are done and the loop skips
    them by index, so passing only the remaining rows would silently
    train the wrong epochs.
    """
    n_epochs = sel.shape[0]
    if n_epochs > state.losses.shape[0]:
        raise ValueError(
            f"sel has {n_epochs} epochs but state.losses only holds "
            f"{state.losses.shape[0]}.")
    if int(state.epoch) > 0 and n_epochs != state.losses.shape[0]:
        # Epoch indices are global: a resumed call must see the SAME
        # full-run sel (rows already done are skipped via state.epoch).
        # Passing only the remaining rows would silently train the wrong
        # epochs and clamp loss writes into wrong slots.
        raise ValueError(
            f"resuming at epoch {int(state.epoch)} with a {n_epochs}-row "
            f"sel, but state.losses was sized for "
            f"{state.losses.shape[0]} epochs: pass the FULL run's sel, "
            f"not the remaining rows.")
    chunk = every if every > 0 else n_epochs
    done = int(state.epoch)
    for start in range(done, n_epochs, chunk):
        stop = min(start + chunk, n_epochs)
        params, losses = run(state.params, sel[start:stop], *data)
        state = TrainState(
            params=params,
            epoch=jnp.asarray(stop, jnp.int32),
            losses=jax.lax.dynamic_update_slice(
                state.losses, losses.astype(state.losses.dtype), (start,)),
        )
        if root is not None:
            # Overwrite: a run retried from scratch (or from an earlier
            # checkpoint) legitimately re-saves step directories a previous
            # attempt left behind; without it the retry trains a full chunk
            # and then dies on orbax's 'checkpoint already exists'.
            save_train_state(pathlib.Path(root) / f"step_{stop}", state,
                             overwrite=True)
    return state
