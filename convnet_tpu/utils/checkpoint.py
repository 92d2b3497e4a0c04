"""Checkpoint save/restore for pytree training state.

Rebuild of the reference's ``save_checkpoint`` (utils/log.py:~260–300
approx.): a checkpoint directory holds ``checkpoint.npz`` (+
``model_best.npz`` copy when a new best arrives, optional per-epoch
``checkpoint_epoch_N.npz`` with ``save_all``). Arrays are stored as a
flat ``path/to/leaf`` → ndarray mapping (np.savez), metadata (epoch,
model name, config, best_prec1) as JSON inside the archive. Schedules
are NOT checkpointed — regimes recompute from (epoch, step)
(SURVEY.md §5.4), which keeps resume logic stateless.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "/"

# at most ONE background checkpoint write in flight (the next save — or
# process exit — joins it first); a failed write surfaces at the join
_pending_save: Optional[threading.Thread] = None
_pending_error: Optional[BaseException] = None
_pending_lock = threading.Lock()


def wait_for_pending_save():
    """Join the in-flight background checkpoint write, if any, and
    re-raise its error. Called automatically at the start of every
    ``save_checkpoint`` and at interpreter exit — training code only
    needs it when reading a just-written checkpoint back."""
    global _pending_save, _pending_error
    with _pending_lock:
        t = _pending_save
        _pending_save = None
    if t is not None:
        t.join()
    with _pending_lock:
        err, _pending_error = _pending_error, None
    if err is not None:
        raise err


atexit.register(wait_for_pending_save)


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_checkpoint(ckpt: Dict[str, Any], is_best: bool, path: str = ".",
                    filename: str = "checkpoint.npz", save_all: bool = False,
                    background: bool = False):
    """``ckpt`` = {'epoch', 'model', 'config', 'params', 'state',
    'opt_state', 'best_prec1', 'training_steps'} — array trees are
    flattened; scalars/strings go into a JSON meta blob.

    ``background=True`` overlaps the npz serialization + atomic rename
    with training: the device→host fetch still happens synchronously
    (the next train step DONATES the very buffers being saved — they
    must be off-device before returning), but the disk write runs in a
    daemon thread. At most one write is in flight; the next save (or
    process exit) joins it, and any write error re-raises there."""
    wait_for_pending_save()
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    extended_dtypes: Dict[str, str] = {}
    def to_host(x):
        # Multi-host ZeRO: P(data)-sharded moment vectors span hosts,
        # so device_get would raise on the non-fully-addressable array;
        # gather the global value first (no-op cost single-host — the
        # branch never triggers there).
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            x = multihost_utils.process_allgather(x, tiled=True)
        return jax.device_get(x)

    for key, value in ckpt.items():
        if key in ("params", "state", "opt_state"):
            host = jax.tree_util.tree_map(to_host, value)
            arrays.update(flatten_tree(host, f"{key}{_SEP}"))
        else:
            meta[key] = value
    # npz can't store ml_dtypes (bfloat16, fp8) — view as raw uint bits
    # and record the true dtype for reload.
    for key, arr in list(arrays.items()):
        if arr.dtype.kind not in "biufc":
            extended_dtypes[key] = str(arr.dtype)
            arrays[key] = arr.view(np.uint16 if arr.dtype.itemsize == 2
                                   else np.uint8)
    meta["__extended_dtypes__"] = extended_dtypes
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta, default=str).encode(), dtype=np.uint8)

    target = os.path.join(path, filename)

    def write():
        tmp = target + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, target)  # atomic on the same filesystem
        if is_best:
            shutil.copyfile(target, os.path.join(path, "model_best.npz"))
        if save_all and "epoch" in meta:
            shutil.copyfile(target, os.path.join(
                path, f"checkpoint_epoch_{meta['epoch']}.npz"))

    if background:
        def guarded():
            global _pending_error
            try:
                write()
            except BaseException as e:  # surfaced at the next join
                with _pending_lock:
                    _pending_error = e

        global _pending_save
        t = threading.Thread(target=guarded, daemon=True,
                             name="ckpt-write")
        with _pending_lock:
            _pending_save = t
        t.start()
    else:
        write()
    return target


def peek_checkpoint_meta(path: str) -> Dict[str, Any]:
    """Read only the JSON meta blob (model name, config, epoch, …)
    without materializing any array member — npz members decompress
    lazily, so this stays cheap on multi-GB checkpoints. Returns {} for
    archives without metadata; raises on unreadable/non-npz files (the
    caller decides whether torch checkpoints are acceptable there)."""
    if os.path.isdir(path):
        path = os.path.join(path, "checkpoint.npz")
    with np.load(path, allow_pickle=False) as data:
        if "__meta__" not in data:
            return {}
        meta = json.loads(bytes(data["__meta__"]).decode())
    meta.pop("__extended_dtypes__", None)
    return meta


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Accepts a file or a directory (looks for checkpoint.npz)."""
    if os.path.isdir(path):
        path = os.path.join(path, "checkpoint.npz")
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
        extended = meta.pop("__extended_dtypes__", {})
        flat: Dict[str, Dict[str, np.ndarray]] = {}
        for key in data.files:
            if key == "__meta__":
                continue
            arr = data[key]
            if key in extended:
                import ml_dtypes
                name = extended[key]
                dt = (np.dtype(getattr(ml_dtypes, name))
                      if hasattr(ml_dtypes, name) else np.dtype(name))
                arr = arr.view(dt)
            root, rest = key.split(_SEP, 1)
            flat.setdefault(root, {})[rest] = arr
    ckpt = dict(meta)
    for root, leaves in flat.items():
        ckpt[root] = unflatten_tree(leaves)
    return ckpt


def tree_place_like(tree, template):
    """device_put each loaded leaf with the placement of the matching
    template leaf — resuming preserves whatever sharding the trainer
    chose at initialize() (fully replicated, or ZeRO-1 P(data)-sharded
    flat moment vectors) instead of forcing replication."""
    return jax.tree_util.tree_map(
        lambda loaded, cur: (jax.device_put(loaded, cur.sharding)
                             if hasattr(cur, "sharding") else loaded),
        tree, template)


def adapt_opt_state(loaded, template):
    """Elastic resume: fit a loaded optimizer state to the CURRENT
    run's layout. Three mismatches are adapted (all arise from changing
    the device count or toggling --shard-opt-state between save and
    resume — the checkpoint stores full arrays, so no information is
    lost):

    - flat → flat, different length: ZeRO-1 moment vectors are flat
      params padded to a multiple of the data-parallel degree
      (parallel/zero.py flat_size; e.g. 78048 @ 8 devices vs 78044
      @ 4). Keep the true prefix, re-zero-pad (the tail is zeros by
      construction — padded grads are zero, so padded moments stay
      zero).
    - tree → flat (resume adds --shard-opt-state): ravel the loaded
      per-parameter moment tree in ravel_pytree order (the order the
      ZeRO step uses) and pad.
    - flat → tree (resume drops --shard-opt-state): unravel the true
      prefix into the template's tree structure.

    Slots the template has but the checkpoint lacks (optimizer class
    switched across the resume) keep the template's fresh init; extra
    checkpoint slots are dropped with a warning. Parameter trees are
    NOT handled here — genuine model mismatches still fail loudly on
    the shape-checked parameter restore."""
    import logging
    from jax.flatten_util import ravel_pytree
    logger = logging.getLogger(__name__)

    def fit(cur, old):
        cur_flat = getattr(cur, "ndim", None) == 1
        old_flat = getattr(old, "ndim", None) == 1
        if isinstance(old, dict) and isinstance(cur, dict):
            return {k: fit(v, old[k]) if k in old else v
                    for k, v in cur.items()}
        if isinstance(old, dict) and cur_flat:        # tree → flat
            flat, _ = ravel_pytree(
                jax.tree_util.tree_map(np.asarray, old))
            out = np.zeros(int(cur.shape[0]), flat.dtype)
            out[:flat.shape[0]] = np.asarray(flat)
            return out
        if old_flat and isinstance(cur, dict):        # flat → tree
            ref_flat, unravel = ravel_pytree(cur)
            return jax.tree_util.tree_map(
                np.asarray,
                unravel(jnp.asarray(np.asarray(old)[:ref_flat.size])))
        if (old_flat and cur_flat
                and np.shape(old) != np.shape(cur)):  # re-pad
            out = np.zeros(int(np.shape(cur)[0]), np.asarray(old).dtype)
            m = min(out.shape[0], int(np.shape(old)[0]))
            out[:m] = np.asarray(old)[:m]
            return out
        return old

    out = {}
    for key, cur in template.items():
        if key in loaded:
            out[key] = fit(cur, loaded[key])
        else:
            logger.warning("opt_state slot %r absent from checkpoint "
                           "(optimizer switched?) — keeping fresh init", key)
            out[key] = cur
    for key in loaded:
        if key not in template:
            logger.warning("dropping checkpoint opt_state slot %r not "
                           "used by the current optimizer", key)
    return out


def tree_dtype_cast_like(tree, template):
    """Cast loaded numpy arrays to the dtypes of a freshly-initialized
    template tree (e.g. bf16 params round-trip through npz as-is, but
    guards against dtype drift)."""
    return jax.tree_util.tree_map(
        lambda loaded, ref: np.asarray(loaded, dtype=ref.dtype), tree, template)
