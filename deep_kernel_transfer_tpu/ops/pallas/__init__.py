"""Pallas TPU kernels. See fused_mll for the fused GP-MLL episode kernel,
blocked_cholesky for the VMEM-tiled factorisation, hbm_cholesky for the
HBM-resident large-N variant (incl. the fused-Gram mode)."""
from . import blocked_cholesky, fused_mll, hbm_cholesky

__all__ = ["blocked_cholesky", "fused_mll", "hbm_cholesky"]
