"""Pallas TPU kernels. See fused_mll for the fused GP-MLL episode kernel."""
from . import blocked_cholesky, fused_mll

__all__ = ["blocked_cholesky", "fused_mll"]
