"""Checkpointing: per-task parameter pytrees and the task chain.

Parity: the reference saves one state_dict per task (ckpt{t}.pt,
experiments/vargp.py:69-71) and the checkpoint chain IS the model — task t
is reconstructed from [ckpt0..ckpt_{t-1}] + its own ckpt (mnist.ipynb cell
12).  Same contract here: ``save_chain``/``load_chain`` round-trip a list
of VARGPParams; storage is msgpack-free .npz of flattened pytree leaves
(no framework lock-in, works under any jax version).
"""

import json
import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays to .npz + a structure descriptor."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)
    with open(path + ".structure.json", "w") as f:
        json.dump({"treedef": str(treedef), "n_leaves": len(leaves)}, f)


# --- orbax backend (optional): async/multi-host-capable checkpoints -------


def save_pytree_orbax(path: str, tree) -> None:
    """Save via orbax-checkpoint (sharding-aware, multi-host safe)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_pytree_orbax(path: str, like):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), like)


def load_pytree(path: str, like):
    """Load arrays saved by save_pytree back into the structure of ``like``
    (an example pytree with matching topology)."""
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_chain(log_dir: str, task_id: int, params) -> str:
    """Save task ``task_id``'s best params as ckpt{t}.npz (parity with
    ckpt{t}.pt)."""
    path = os.path.join(log_dir, f"ckpt{task_id}.npz")
    save_pytree(path, params)
    return path


def load_chain(log_dir: str, n_tasks: int, like):
    """Load [ckpt0..ckpt_{n_tasks-1}]; ``like`` is an example params pytree
    per task (list or single template applied to all)."""
    chain = []
    for t in range(n_tasks):
        template = like[t] if isinstance(like, (list, tuple)) else like
        chain.append(load_pytree(os.path.join(log_dir, f"ckpt{t}.npz"), template))
    return chain
