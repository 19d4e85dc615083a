"""Mint the reference (PyTorch CPU) baseline for bench.py.

Runs the upstream VAR-GP training step (Split-MNIST final-task workload:
5-task chain, M=60, out=10, D=784, B=512, n_f=10, n_var_samples=3) using
the reference implementation at /root/reference, and records steps/sec to
baseline_ref.json.  Two runtime monkeypatches work around torch-2.13
incompatibilities in the (2021-era) reference code — deprecated
torch.triangular_solve backward and non-contiguous nll_loss grads — they
do not change the math or favor either side.

Run manually: python bench_baseline.py  (bench.py falls back to the
checked-in measurement if /root/reference or torch is unavailable).
"""

import json
import sys
import time

REFERENCE_DIR = "/root/reference"
WORKLOAD = dict(D=784, out=10, M=60, B=512, n_f=10, n_v=3, n_prev=4)


def measure(n_steps: int = 5) -> dict:
    sys.path.insert(0, REFERENCE_DIR)
    import numpy as np
    import torch
    import torch.nn.functional as TF

    def patched_trsolve(b, A, upper=True, transpose=False, unitriangular=False):
        sol = torch.linalg.solve_triangular(A.contiguous(), b, upper=upper)
        return sol, A

    torch.triangular_solve = patched_trsolve

    _orig_nll = TF.nll_loss

    def patched_nll(input, target, *a, **k):
        return _orig_nll(input.contiguous(), target, *a, **k)

    TF.nll_loss = patched_nll

    torch.manual_seed(0)
    from var_gp.kernels import RBFKernel
    from var_gp.likelihoods import MulticlassSoftmax
    from var_gp.vargp import VARGP

    W = WORKLOAD
    D, out, M, B = W["D"], W["out"], W["M"], W["B"]
    rng = np.random.default_rng(0)
    f32 = np.float32
    prev = [
        dict(
            z=torch.tensor(rng.standard_normal((out, M, D)).astype(f32) * 0.1),
            u_mean=torch.tensor(rng.standard_normal((out, M, 1)).astype(f32) * 0.3),
            u_tril_vec=torch.tensor(
                rng.standard_normal((out, M * (M + 1) // 2)).astype(f32) * 0.1
            ),
        )
        for _ in range(W["n_prev"])
    ]
    gp = VARGP(
        torch.tensor(rng.standard_normal((out, M, D)).astype(f32) * 0.1),
        RBFKernel(D),
        MulticlassSoftmax(n_f=W["n_f"]),
        n_var_samples=W["n_v"],
        ep_var_mean=True,
        prev_params=prev,
    )
    x = torch.tensor(rng.standard_normal((B, D)).astype(f32))
    y = torch.tensor(rng.integers(0, out, B))
    optim = torch.optim.Adam(gp.parameters(), lr=3e-3)

    def step():
        optim.zero_grad()
        klh, klu, nll = gp.loss(x, y)
        loss = 10.0 * klh + klu + (50000 / B) * nll
        loss.backward()
        optim.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(n_steps):
        step()
    dt = (time.time() - t0) / n_steps
    return dict(
        steps_per_sec=1.0 / dt,
        ms_per_step=dt * 1e3,
        torch_threads=torch.get_num_threads(),
        workload=W,
    )


if __name__ == "__main__":
    result = measure()
    with open("baseline_ref.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
