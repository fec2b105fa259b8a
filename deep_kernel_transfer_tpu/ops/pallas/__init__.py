"""Pallas TPU kernels. See fused_mll for the fused GP-MLL episode kernel."""
from . import fused_mll

__all__ = ["fused_mll"]
