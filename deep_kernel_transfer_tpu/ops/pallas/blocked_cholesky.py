"""Blocked batched Cholesky for the large-support-set regime (N > 128).

The reference caps episodes at N = n_way*(S+Q) <= 105, but the framework's
scaling dimension is exactly this Gram size (SURVEY.md §5: the analog of
sequence parallelism here is Gram-dimension blocking). This kernel runs
the classic tile-blocked right-looking factorisation with the O(N^3)
trailing updates on the MXU and only the per-tile factorisation/inversion
on the VPU:

  for k in tiles:                       (static unroll, N/128 tiles)
    L_kk   = chol(A_kk)                  VPU, 128 masked sweep steps
    Linv_kk = L_kk^-1                    VPU, 128 masked sweep steps
    A_ik  <- A_ik @ Linv_kk^T            MXU (panel)
    A_ij  <- A_ij - A_ik @ A_jk^T        MXU (trailing block)

Mosaic forbids dynamically-indexed lane reads, so the in-tile loops use the
same masked full-tile formulation as fused_mll.py; every MXU dot pins
precision=HIGHEST (Mosaic otherwise silently computes f32 dots in bf16 on
this toolchain). The whole matrix lives in VMEM, which caps N at 512 under
the 16 MB scoped-vmem limit (input + output pipelining buffers + the
factorisation scratch); N=1024 needs the HBM-resident tiled variant
(built: hbm_cholesky.py) and currently falls back to XLA.

Differentiation uses the standard Cholesky reverse-mode formula
(Murray 2016) evaluated with XLA triangular solves over the kernel's L.

Measured on one v5e chip: batch-dependent. At B=40, XLA wins (9.1 vs
4.5 ms at N=256; 18.9 vs 7.3 at N=512) — its batched factorisation
amortises well, while this kernel is bound by the ~256 sequential
fori_loop steps per tile that the masked-sweep formulation forces. At
B=8, the kernel wins at N=256 (3.9 vs 8.0 ms) and loses at N=512 (9.9 vs
3.8). It is NOT wired into the default path (reference episode batches
favour XLA); it stands as correct, tested infrastructure for the
HBM-resident tiled regime (N >> 512), where fusing Gram assembly with the
factorisation changes the memory economics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

T = 128  # tile size: one f32 VMEM tile
MAX_N = 512


def _tile_chol_and_inv(A, L_inv, k: int, rows1d, colsrow, rows2d, cols2d):
    """Factor the diagonal tile A[kT:(k+1)T, kT:(k+1)T] in place and write
    its lower-triangular inverse into the L_inv scratch ([T, T])."""
    lo = k * T

    def chol_step(j, _):
        blk = A[lo:lo + T, lo:lo + T]
        colj = jnp.sum(jnp.where(cols2d == j, blk, 0.0), axis=1, keepdims=True)
        d = jnp.sqrt(jnp.sum(jnp.where(rows1d == j, colj, 0.0)))
        col_below = jnp.where(rows1d > j, colj / d, 0.0)
        newcol = jnp.where(rows1d == j, d, col_below)
        updated = blk - col_below * col_below.reshape(1, T)
        A[lo:lo + T, lo:lo + T] = jnp.where(cols2d == j, newcol, updated)
        return 0

    jax.lax.fori_loop(0, T, chol_step, 0)
    # zero the strict upper triangle of the tile (stale trailing values)
    blk = A[lo:lo + T, lo:lo + T]
    A[lo:lo + T, lo:lo + T] = jnp.where(cols2d > rows2d, 0.0, blk)

    # forward-substitute L X = I row by row: X[j,:] = (e_j - L[j,:j] X) / L_jj
    L_inv[...] = jnp.zeros((T, T), jnp.float32)

    def inv_step(j, _):
        Lblk = A[lo:lo + T, lo:lo + T]
        rowj = jnp.sum(jnp.where(rows2d == j, Lblk, 0.0), axis=0,
                       keepdims=True)  # [1, T] row j of L
        ljj = jnp.sum(jnp.where(colsrow == j, rowj, 0.0))
        # s = L[j, :j] @ X[:j, :] ([1, T]); X rows >= j are still zero and
        # rowj entries >= j contribute only the diagonal, excluded below
        rowj_strict = jnp.where(colsrow < j, rowj, 0.0)
        s = jnp.sum(rowj_strict.reshape(T, 1) * L_inv[...], axis=0,
                    keepdims=True)  # [1, T]
        ej = jnp.where(colsrow == j, 1.0, 0.0)
        newrow = (ej - s) / ljj
        L_inv[...] = jnp.where(rows2d == j, newrow, L_inv[...])
        return 0

    jax.lax.fori_loop(0, T, inv_step, 0)

    # one Newton refinement X <- X (2I - L X): the explicit substitution
    # inverse carries ~1e-3 f32 error that would cascade through the
    # trailing updates; refinement squares the error at the cost of two
    # MXU matmuls
    Lblk = A[lo:lo + T, lo:lo + T]
    eye2 = jnp.where(rows2d == cols2d, 2.0, 0.0)
    LX = jax.lax.dot_general(Lblk, L_inv[...],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    L_inv[...] = jax.lax.dot_general(L_inv[...], eye2 - LX,
                                     dimension_numbers=(((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def _make_kernel(n: int):
    n_tiles = n // T

    def kernel(k_ref, out_ref, A, L_inv):
        rows2d = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        cols2d = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        rows1d = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        colsrow = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

        A[...] = k_ref[0]
        for k in range(n_tiles):  # static
            _tile_chol_and_inv(A, L_inv, k, rows1d, colsrow, rows2d, cols2d)
            lo, hi = k * T, (k + 1) * T
            if hi < n:
                # panel: A[hi:, lo:hi] <- A[hi:, lo:hi] @ L_inv^T   (MXU)
                panel = A[hi:n, lo:hi]
                A[hi:n, lo:hi] = jax.lax.dot_general(
                    panel, L_inv[...],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
                # trailing: A[hi:, hi:] -= panel_new @ panel_new^T  (MXU)
                pnew = A[hi:n, lo:hi]
                A[hi:n, hi:n] = A[hi:n, hi:n] - jax.lax.dot_general(
                    pnew, pnew, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
                # zero the block row above the diagonal for column-block k
                A[lo:hi, hi:n] = jnp.zeros((T, n - hi), jnp.float32)
        out_ref[0] = A[...]

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def blocked_cholesky(kmat: Array) -> Array:
    """Lower Cholesky of a batched SPD matrix [B, N, N], N a multiple of 128
    and <= 512 (whole-matrix-in-VMEM). Falls back to XLA otherwise."""
    return _forward(kmat)


def _forward(kmat: Array) -> Array:
    b, n, n2 = kmat.shape
    assert n == n2
    if n % T != 0 or n > MAX_N:
        return jnp.linalg.cholesky(kmat)
    return pl.pallas_call(
        _make_kernel(n),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        # alias K -> L: halves HBM residency and lets the compiler reuse
        # the buffer (the pipeline still double-buffers in/out, which is
        # what caps N at 512 under the 16 MB scoped-vmem limit)
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((n, n), jnp.float32),
            pltpu.VMEM((T, T), jnp.float32),
        ],
    )(kmat)


def _fwd(kmat):
    L = _forward(kmat)
    return L, L


def _bwd(L, Lbar):
    """Standard Cholesky reverse mode (Murray 2016, eq. 8-10):
    Kbar = 0.5 * L^-T (P + P^T) L^-1 with P = Phi(L^T Lbar),
    Phi = lower triangle with halved diagonal."""
    n = L.shape[-1]
    P = jnp.einsum("...ji,...jk->...ik", L, Lbar)  # L^T Lbar
    tri = jnp.tril(jnp.ones((n, n), L.dtype))
    P = P * tri - 0.5 * P * jnp.eye(n, dtype=L.dtype)
    S = P + jnp.swapaxes(P, -1, -2)
    # X = L^-T S L^-1 via two batched triangular solves
    tmp = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), S, lower=False)
    X = jnp.swapaxes(jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2),
        jnp.swapaxes(tmp, -1, -2), lower=False), -1, -2)
    return (0.5 * X,)


blocked_cholesky.defvjp(_fwd, _bwd)
