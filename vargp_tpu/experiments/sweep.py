"""Hyperparameter sweeps.

Parity: experiments/wandb_utils.py:6-44 generates a W&B random-search
sweep over VARGP hyperparameters.  Here: the same search space emitted as
a local JSON spec, plus a dependency-free local sweep runner (wandb is
optional — if installed and WANDB_MODE permits, the spec is also
submitted via wandb.sweep)."""

import json
import os

import numpy as np

# Search space mirrors wandb_utils.py:13-38
DEFAULT_SPACE = {
    "method": "random",
    "metric": {"name": "val/acc", "goal": "maximize"},
    "parameters": {
        "lr": {"distribution": "log_uniform_values", "min": 1e-4, "max": 1e-1},
        "beta": {"distribution": "log_uniform_values", "min": 1e-2, "max": 1e2},
        "M": {"values": [20, 40, 60, 80, 100, 150, 200]},
        "batch_size": {"values": [256, 512]},
        "ep_var_mean": {"values": [True, False]},
        "map_est_hypers": {"values": [True, False]},
    },
}


def generate_vargp_sweep(experiment="s_mnist", out=None, submit_wandb=False):
    """Emit the sweep spec; optionally submit to wandb if available."""
    spec = dict(DEFAULT_SPACE)
    spec["program"] = f"python -m vargp_tpu {experiment}"
    out = out or f"sweep_{experiment}.json"
    with open(out, "w") as f:
        json.dump(spec, f, indent=2)
    print(f"wrote {out}")
    if submit_wandb:
        try:
            import wandb

            sweep_id = wandb.sweep(spec)
            print(f"wandb sweep: {sweep_id}")
        except Exception as e:  # wandb optional / offline
            print(f"wandb unavailable ({e}); local spec only")
    return out


def _sample(space, rng):
    cfg = {}
    for name, p in space["parameters"].items():
        if "values" in p:
            cfg[name] = p["values"][rng.integers(len(p["values"]))]
        elif p.get("distribution") == "log_uniform_values":
            lo, hi = np.log(p["min"]), np.log(p["max"])
            cfg[name] = float(np.exp(rng.uniform(lo, hi)))
    return cfg


def run_sweep(experiment="toy", n_trials=4, seed=0, spec=None, **overrides):
    """Local random-search runner: samples configs and runs the experiment
    in-process, tracking the best final average accuracy."""
    from vargp_tpu.experiments import vargp_run

    fns = {
        "toy": vargp_run.toy,
        "s_mnist": vargp_run.split_mnist,
        "p_mnist": vargp_run.permuted_mnist,
    }
    fn = fns[experiment]
    space = spec or DEFAULT_SPACE
    rng = np.random.default_rng(seed)
    results = []
    import inspect

    accepted = set(inspect.signature(fn).parameters)
    for trial in range(n_trials):
        cfg = _sample(space, rng)
        # filter on the actual signature — co_varnames includes every
        # LOCAL variable of the driver, so a spec key named like one
        # (e.g. 'hp', 'cfg') would pass the filter and crash at call time
        cfg = {k: v for k, v in cfg.items() if k in accepted}
        cfg.update(overrides)
        if "seed" in cfg:
            raise ValueError(
                "run_sweep assigns per-trial seeds itself (seed+trial); "
                "pass the base via the seed= parameter, not overrides/spec"
            )
        cfg["log_dir"] = os.path.join(
            os.environ.get("VARGP_TPU_LOGDIR", "runs"),
            f"sweep_{experiment}_{trial}",
        )
        print(f"[sweep {trial}] {cfg}")
        _, summaries = fn(seed=seed + trial, **cfg)
        final = summaries[-1] if summaries else {}
        score = max(
            (v for k, v in final.items() if k.endswith("test/acc")), default=0.0
        )
        results.append((score, cfg))
        print(f"[sweep {trial}] score={score:.4f}")
    results.sort(key=lambda r: -r[0])
    print(f"best: score={results[0][0]:.4f} cfg={results[0][1]}")
    return results
