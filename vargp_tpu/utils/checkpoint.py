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
        out[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return out, treedef


class CheckpointStructureError(RuntimeError):
    """The checkpoint on disk does not match the template pytree — e.g.
    resuming with a different cfg (wrong M, dkl flag, out_size)."""


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays to .npz (path-keyed leaves) + a structure
    descriptor used to validate loads."""
    arrays, treedef = _flatten_with_paths(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)
    with open(path + ".structure.json", "w") as f:
        json.dump(
            {
                "treedef": str(treedef),
                "n_leaves": len(arrays),
                "leaves": {
                    k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                    for k, v in arrays.items()
                },
            },
            f,
        )


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
    """Load arrays saved by save_pytree back into the structure of ``like``.

    The load is validated leaf-by-leaf against the template: a missing or
    extra path, or a shape mismatch (e.g. a checkpoint written with a
    different M / dkl / out_size than the resuming cfg), raises
    CheckpointStructureError naming the checkpoint and the offending leaf
    instead of silently mis-assembling parameters.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    want = {jax.tree_util.keystr(p): leaf for p, leaf in flat}
    with np.load(path) as data:
        stored = {k: data[k] for k in data.files}

    if all(k.startswith("leaf_") for k in stored) and stored:
        # legacy order-keyed checkpoint (round-1 format): count-checked
        if len(stored) != len(want):
            raise CheckpointStructureError(
                f"{path}: legacy checkpoint has {len(stored)} leaves but the "
                f"template expects {len(want)} — was it written with a "
                f"different model configuration?"
            )
        leaves = [stored[f"leaf_{i}"] for i in range(len(stored))]
    else:
        missing = sorted(set(want) - set(stored))
        extra = sorted(set(stored) - set(want))
        if missing or extra:
            raise CheckpointStructureError(
                f"{path}: checkpoint structure mismatch — "
                f"missing leaves {missing[:4]}{'...' if len(missing) > 4 else ''}, "
                f"unexpected leaves {extra[:4]}{'...' if len(extra) > 4 else ''}. "
                f"Check that cfg (M, out_size, dkl) matches the saved run."
            )
        leaves = []
        for p, template_leaf in flat:
            k = jax.tree_util.keystr(p)
            arr = stored[k]
            tshape = tuple(getattr(template_leaf, "shape", ()))
            if tuple(arr.shape) != tshape:
                raise CheckpointStructureError(
                    f"{path}: leaf {k!r} has shape {tuple(arr.shape)} but the "
                    f"template expects {tshape} — cfg mismatch (M/out_size/in_size?)"
                )
            leaves.append(arr)
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
