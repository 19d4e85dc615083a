"""Model families (pure-function ELBOs over parameter pytrees).

- vargp:         the paper's method (auto-regressive continual GP)
- global_svgp:   "VAR-GP (Global)" streaming-SVGP baseline (re-designed
                 working version of the reference's import-broken module)
- vargp_retrain: retraining ablation (past variational params trainable)
"""

from vargp_tpu.models import vargp, global_svgp, vargp_retrain

__all__ = ["vargp", "global_svgp", "vargp_retrain"]
