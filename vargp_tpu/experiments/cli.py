"""Command-line interface.

Parity: the reference exposes python-fire auto-CLIs over driver function
kwargs (experiments/vargp.py:193).  Same UX here without the fire
dependency: ``python -m vargp_tpu <command> --key=value ...`` where values
are parsed as Python literals.  Commands mirror the reference entry points
plus the analysis/bench additions.
"""

import ast
import inspect
import os
import sys


def _pin_platform(name: str) -> None:
    """Pin the JAX backend BEFORE first device use.

    ``--platform=cpu`` / ``VARGP_TPU_PLATFORM=cpu`` is the supported way
    to run experiments when the TPU is unavailable (e.g. a dead tunnel,
    where the first device touch blocks forever — the JAX_PLATFORMS env
    var alone does not help against force-registered PJRT plugins).
    """
    import jax

    jax.config.update("jax_platforms", name)


def _commands():
    from vargp_tpu.experiments import (
        analysis,
        global_run,
        regression,
        retrain_run,
        sweep,
        vargp_run,
    )

    return {
        # reference: python experiments/vargp.py {toy,s_mnist,p_mnist}
        "toy": vargp_run.toy,
        "s_mnist": vargp_run.split_mnist,
        "p_mnist": vargp_run.permuted_mnist,
        "s_digits": vargp_run.split_digits,
        "varying_m": vargp_run.varying_m,
        # reference: experiments/{mnist_global,toy_global}.py
        "toy_global": global_run.toy_global,
        "s_mnist_global": global_run.split_mnist,
        "p_mnist_global": global_run.permuted_mnist,
        # reference: experiments/vargp_retrain.py
        "toy_retrain": retrain_run.toy,
        # Gaussian-likelihood regression (unused-in-reference capability)
        "regression": regression.regression,
        # reference: notebooks (analysis protocol as code)
        "analyze_smnist": analysis.analyze_smnist,
        "analyze_pmnist": analysis.analyze_pmnist,
        "analyze_sdigits": analysis.analyze_sdigits,
        "analyze_toy": analysis.analyze_toy,
        "analyze_toy_global": analysis.analyze_toy_global,
        "analyze_smnist_global": analysis.analyze_smnist_global,
        # reference: mnist.ipynb VCL-comparison cells (external baselines)
        "compare_methods": analysis.compare_methods,
        "compare_vcl": analysis.compare_vcl,
        # reference: experiments/wandb_utils.py sweep generator
        "gen_sweep": sweep.generate_vargp_sweep,
        "run_sweep": sweep.run_sweep,
    }


def _parse_value(s: str):
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def _parse_args(argv):
    args, kwargs = [], {}
    for a in argv:
        if a.startswith("--"):
            k, sep, v = a[2:].partition("=")
            if sep and not v:
                # `--log_dir=` would silently parse to True and fail far
                # downstream (os.path.join(base, True)); reject here
                raise SystemExit(f"empty value for --{k} (use --{k}=VALUE)")
            kwargs[k.replace("-", "_")] = _parse_value(v) if sep else True
        else:
            args.append(_parse_value(a))
    return args, kwargs


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cmds = _commands()
    if not argv or argv[0] in ("-h", "--help", "help"):
        print("usage: python -m vargp_tpu <command> [--key=value ...]\n")
        for name, fn in cmds.items():
            sig = inspect.signature(fn)
            print(f"  {name}{sig}")
        print(
            "\nglobal flags: --platform=cpu|tpu (pin backend);"
            " --coordinator_address=HOST:PORT --num_processes=N"
            " --process_id=I (join a multi-process jax.distributed job —"
            " combine with --n_devices over the global device set)"
        )
        return 0
    name = argv[0]
    if name not in cmds:
        print(f"unknown command {name!r}; run with --help")
        return 1
    # persistent XLA compile cache: reruns of the same protocol skip the
    # multi-minute eval-predictor compile (VARGP_TPU_COMPILE_CACHE=off to
    # disable; see utils/compile_cache.py).  ANALYSIS COMMANDS ONLY: the
    # training drivers dispatch a device block asynchronously and then
    # compile the eval program while it is in flight, and with the
    # persistent cache enabled that compile+execute overlap deadlocks the
    # axon tunnel client (reproduced 2026-08-21: any train driver with the
    # cache on hangs at the first eval, zero CPU, futex_do_wait; identical
    # run with VARGP_TPU_COMPILE_CACHE=off completes).  The analyze_*
    # drivers compile and execute sequentially and are measured safe —
    # and they are where the win lives (chain-reload analysis 1145 s ->
    # 169 s cold / 74 s warm).
    if name.startswith(("analyze_", "compare_")):
        from vargp_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    args, kwargs = _parse_args(argv[1:])
    platform = kwargs.pop("platform", os.environ.get("VARGP_TPU_PLATFORM"))
    if platform:
        if not isinstance(platform, str) or platform is True:
            # a bare `--platform` parses to True; pinning the backend to
            # the string 'True' fails confusingly at first device use
            raise SystemExit("--platform needs a value, e.g. --platform=cpu")
        _pin_platform(platform)
    # multi-process launch (pod / multi-host): every worker runs the SAME
    # command with its own --process_id; jax.distributed joins them and
    # --n_devices then builds the mesh over the job's GLOBAL device set
    # (checkpoint/metrics writes are process-0-gated in the drivers)
    coord = kwargs.pop("coordinator_address", None)
    nproc = kwargs.pop("num_processes", None)
    procid = kwargs.pop("process_id", None)
    if coord is not None or nproc is not None or procid is not None:
        from vargp_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=coord,
            num_processes=None if nproc is None else int(nproc),
            process_id=None if procid is None else int(procid),
        )
    cmds[name](*args, **kwargs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
