"""Model families (pure-function ELBOs over parameter pytrees)."""

from vargp_tpu.models import vargp

__all__ = ["vargp"]
