"""Driver benchmark: full VAR-GP ELBO training steps/sec on TPU.

Workload: the reference's Split-MNIST final task (the heaviest step of the
flagship experiment) — 5-task AR chain, M=60 inducing points/class,
out=10 classes, D=784, batch 512, n_f=10 function samples, n_var_samples=3
hyper samples.  One step = fused forward (one Cholesky + inverse, AR chain,
whitened marginal, KLs, MC softmax NLL) + backward + Yogi update.

Baseline: the reference PyTorch implementation on CPU, same workload and
step definition (see bench_baseline.py; measured 0.166 steps/s on this
image's single-core host — mint a fresh number with
`python bench_baseline.py` to produce baseline_ref.json, which takes
precedence over the checked-in constant).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

# Checked-in fallback: reference torch CPU steps/sec measured on this image
# (1-core host, torch 2.13; see baseline_ref.json provenance).
FALLBACK_BASELINE_STEPS_PER_SEC = 0.166

N_STEPS = int(os.environ.get("VARGP_TPU_BENCH_STEPS", "100"))


def _baseline() -> float:
    path = os.path.join(os.path.dirname(__file__) or ".", "baseline_ref.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["steps_per_sec"])
    return FALLBACK_BASELINE_STEPS_PER_SEC


def _ensure_backend() -> str:
    """Return 'tpu' if the tunneled chip answers, else pin CPU and return 'cpu'.

    The axon TPU tunnel occasionally drops; jax.devices() then blocks
    indefinitely in-process (PJRT connection retries), which would hang the
    driver's bench run.  Probe from a killable subprocess (bounded retries
    to ride out a short outage), and fall back to a clearly-labeled CPU run
    rather than hanging.
    """
    import subprocess
    import sys

    tries = int(os.environ.get("VARGP_TPU_BENCH_PROBE_TRIES", "5"))
    probe_timeout = float(os.environ.get("VARGP_TPU_BENCH_PROBE_TIMEOUT", "60"))
    for attempt in range(tries):
        try:
            res = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if res.returncode == 0:
                plat = res.stdout.strip().splitlines()[-1].lower()
                if plat == "tpu":
                    return "tpu"
                break  # healthy non-TPU default backend: no point retrying
        except subprocess.TimeoutExpired:
            pass
        if attempt < tries - 1:
            time.sleep(probe_timeout * min(attempt + 1, 3))
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu"


def main():
    platform = _ensure_backend()

    # persistent XLA compile cache: the 100-step block is a multi-minute
    # first compile through the tunnel; cached reruns start in seconds
    from vargp_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from vargp_tpu.train.loop import (
        TrainHyperparams,
        make_optimizer,
        make_device_train_fn,
    )

    cfg, params, prev, prior, x, y, w, key = g._flagship()
    hp = TrainHyperparams(lr=3e-3, beta=10.0)
    tx = make_optimizer(hp)
    opt_state = tx.init(params)
    # THE production path: device-resident dataset, on-device shuffle +
    # batch + N_STEPS updates in one compiled program (train_task uses the
    # same builder between evals)
    run_block = make_device_train_fn(
        cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=N_STEPS
    )
    chain_mask = jnp.ones((len(prev),), jnp.float32)
    n_train = jnp.asarray(50000.0)

    key2 = jax.random.fold_in(key, 1)  # pre-built: keep host compiles out of
    key2.block_until_ready()  # the timed section

    # compile + warmup
    params, opt_state, loss_val, _ = run_block(
        params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key
    )
    float(loss_val)  # hard sync

    t0 = time.time()
    params, opt_state, loss_val, _ = run_block(
        params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key2
    )
    final = float(loss_val)  # device_get forces the whole chain to finish
    dt = (time.time() - t0) / N_STEPS

    assert final == final, "non-finite loss in benchmark"
    steps_per_sec = 1.0 / dt
    baseline = _baseline()
    metric = "smnist_task4_elbo_steps_per_sec"
    if platform != "tpu":
        metric += f"_{platform}_fallback"  # tunnel down: NOT a TPU number

    # The north-star's second metric (BASELINE.json): achieved TFLOP/s.
    # Audit the EXACT dispatched block's jaxpr (trace-only, no device work)
    # and divide by the measured step time.  pct_matmul_peak weighs each
    # precision class by its own v5e roofline (HIGHEST ~33, HIGH ~65 TF/s).
    from vargp_tpu.utils import flops as F

    one_step = make_device_train_fn(cfg, tx, hp.beta, batch_size=x.shape[0], n_epochs=1)
    summary, _, _ = F.audit(
        lambda *a: one_step(*a),
        params, opt_state, prev, prior, chain_mask, n_train, x, y, w, key,
    )
    ach = F.achieved(summary, dt)
    print(
        json.dumps(
            dict(
                metric=metric,
                value=round(steps_per_sec, 2),
                unit="steps/s",
                vs_baseline=round(steps_per_sec / baseline, 1),
                tflops=round(ach["tflops"], 2),
                pct_matmul_peak=round(ach["pct_matmul_peak"], 1),
                pct_sol=round(ach["pct_sol"], 1),
                sol_ms=round(summary["sol_ms"], 3),
                step_ms=round(dt * 1e3, 3),
            )
        )
    )


if __name__ == "__main__":
    main()
