"""HBM-resident blocked Cholesky + fused Gram assembly for N >> 512.

The VMEM-resident kernel (blocked_cholesky.py) caps at N=512 because the
whole matrix must fit on chip. This module removes the cap with the
classic left-looking panel factorisation, streaming tiles through VMEM
with async DMA while the O(N^2) factor stays in HBM:

  for k in tiles:                               (static unroll)
    A_kk  = G(k,k) - L[k,:k] @ L[k,:k]^T         MXU strip contraction
    L_kk  = chol(A_kk); Linv = L_kk^-1           VPU masked sweeps + Newton
    for i > k:                                   fori_loop, double-buffered
      A_ik = G(i,k) - L[i,:k] @ L[k,:k]^T        MXU strip contraction
      L_ik = A_ik @ Linv^T                       MXU
      DMA L_ik -> HBM

where G(i,k) is either a tile of a precomputed HBM-resident K
(`hbm_blocked_cholesky`) or — the fused mode `fused_gram_cholesky` —
computed on the fly from the feature matrix Z as
scale * Z_i @ Z_k^T (+ diag on the diagonal), so the N^2 Gram matrix is
NEVER materialised in HBM — the only N x N object is the output factor L
itself, halving peak HBM (Gram + factor -> factor alone) and removing
the Gram assembly read/write traffic. This is the GP engine's
large-support-set regime (SURVEY.md §5: Gram-dimension blocking is this
framework's sequence-parallel analog; the reference outsources it to
GPyTorch's CUDA solvers).

Two layout/overlap decisions carry the performance:
  * L lives in HBM in TILE-BLOCKED layout [B, nt, nt, T, T], so every
    strip L[i, :k] is one contiguous DMA (the row-major [N, N] layout
    costs ~100s of us per panel tile in strided-DMA row overheads; the
    wrapper un-tiles with one XLA transpose at the end).
  * The panel loop double-buffers the next row's strip + Z tile DMAs
    behind the current row's MXU work.

Every MXU dot pins precision=HIGHEST: Mosaic silently lowers f32 dots to
bf16 on this toolchain (CLAUDE.md convention). Mosaic also forbids
dynamically-indexed lane reads, so the in-tile factorisation uses masked
full-tile sweeps (same formulation as blocked_cholesky.py).

HONEST BENCHMARK (one v5e chip, in-jit scan repetition so tunnel dispatch
latency is excluded; benchmarks/report.json "hbm_chol_*"): this kernel
reaches 0.5-5.4 TFLOP/s-equivalent (N=1024-4096) but XLA's own blocked
cholesky is excellent on this toolchain (up to ~8.5 TF/s-equivalent at
N=4096) and stays 1.4-1.8x FASTER at every size measured. Round 1's
"XLA loses at large N" finding was an artifact of a measurement bug
(utils/profiling.sync used to read the ENTIRE result array back through
the ~10-60 MB/s tunnel, so every large-output benchmark measured readback,
not compute). The kernel therefore stays OFF the default path — XLA is
the right production choice — and is kept as correct, tested
infrastructure: it is the only path when a separate Gram buffer must not
be materialised (fused mode streams Z tiles; the single N x N object is
the output L, vs Gram + factor for XLA's assemble-then-factor), and for
the linear-kernel family the GP
engine's Woodbury path (gp/low_rank.py) is the true large-N answer
(O(N*D^2), no N x N object at all).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
T = 128  # tile size: one f32 VMEM tile
_HIGH = jax.lax.Precision.HIGHEST


def _dot_t(a, b):
    """a @ b^T on the MXU in f32."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH)


def _strip_update(acc, read_a, read_b, k: int):
    """acc - sum_{j<k} A_j @ B_j^T where read_a/read_b(j) load [T, T]
    tiles (Mosaic has no multi-contracting-dim matmul, so the tile index
    is a fori_loop of MXU rank-T updates)."""
    if k == 0:
        return acc
    return jax.lax.fori_loop(
        0, k, lambda j, a: a - _dot_t(read_a(j), read_b(j)), acc)


def _factor_tile(diag, linv):
    """In-place Cholesky of the SYMMETRIC [T, T] VMEM tile `diag`,
    factored in TRANSPOSED space: on exit `diag` holds U = L^T (upper) and
    `linv` holds inv(U) = inv(L)^T.

    Why transposed: extracting the pivot slice becomes a sublane (axis-0)
    reduction instead of a full-tile lane reduction — the per-step serial
    cost drops substantially — and the panel solve downstream becomes a
    plain (untransposed) MXU matmul. The symmetric input costs nothing to
    "transpose". Mosaic forbids dynamic lane indexing, so steps are masked
    full-tile sweeps.

    The inverse is a Newton iteration X <- X (2I - U X) from
    X0 = diag(U)^-1: the residual E = I - X0 U is STRICTLY triangular,
    hence nilpotent of index <= T, and Newton squares it (E_m = E_0^(2^m))
    so ceil(log2 T) = 7 iterations are EXACT up to f32 rounding. 14 MXU
    matmuls replace a 128-step serial substitution sweep."""
    rows2d = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols2d = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    colsrow = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    def chol_step(j, _):
        blk = diag[...]
        rowj = jnp.sum(jnp.where(rows2d == j, blk, 0.0), axis=0,
                       keepdims=True)                      # [1, T] sublane
        d = jnp.sqrt(jnp.sum(jnp.where(colsrow == j, rowj, 0.0)))
        r = jnp.where(colsrow > j, rowj / d, 0.0)          # U[j, j+1:]
        newrow = jnp.where(colsrow == j, d, r)
        updated = blk - r.reshape(T, 1) * r                # symmetric outer
        diag[...] = jnp.where(rows2d == j, newrow, updated)
        return 0

    jax.lax.fori_loop(0, T, chol_step, 0)
    diag[...] = jnp.where(rows2d > cols2d, 0.0, diag[...])

    Ublk = diag[...]
    dvec = jnp.sum(jnp.where(rows2d == cols2d, Ublk, 0.0), axis=0,
                   keepdims=True)
    linv[...] = jnp.where(rows2d == cols2d, 1.0 / dvec, 0.0)
    eye2 = jnp.where(rows2d == cols2d, 2.0, 0.0)
    for _ in range(7):
        linv[...] = _dot(linv[...], eye2 - _dot(Ublk, linv[...]))


def _make_kernel(n: int, d: int, fused: bool, ablate: frozenset = frozenset()):
    """Left-looking factorisation over tile-blocked HBM buffers.

    refs (in order): [scale_smem (fused only)], diag_smem, src_hbm
    (Z [B, N, D] if fused else K tiled [B, nt, nt, T, T]), out_hbm (tiled),
    then scratch: zk, zi[2], strip_k [nt-1, T, T], strip_i[2] [nt-1, T, T],
    diag, linv, tile, sems."""
    nt = n // T

    def kernel(*refs):
        if fused:
            scale_ref, diag_ref, src, out, zk, zi, strip_k, strip_i, \
                diag, linv, tile, sem, wsem = refs
            scale = scale_ref[0]
        else:
            diag_ref, src, out, zk, zi, strip_k, strip_i, \
                diag, linv, tile, sem, wsem = refs
            scale = None
        b = pl.program_id(0)
        dconst = diag_ref[0]
        rows2d = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        cols2d = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        eye = jnp.where(rows2d == cols2d, 1.0, 0.0)

        def start_row_loads(i, k, slot):
            """Kick off the DMAs a panel row i needs at step k."""
            if fused:
                pltpu.make_async_copy(src.at[b, pl.ds(i * T, T), :],
                                      zi.at[slot], sem.at[slot]).start()
            else:
                pltpu.make_async_copy(src.at[b, i, k], zi.at[slot],
                                      sem.at[slot]).start()
            if k > 0:
                pltpu.make_async_copy(out.at[b, i, pl.ds(0, k)],
                                      strip_i.at[slot, pl.ds(0, k)],
                                      sem.at[2 + slot]).start()

        def wait_row_loads(i, k, slot):
            if fused:
                pltpu.make_async_copy(src.at[b, pl.ds(i * T, T), :],
                                      zi.at[slot], sem.at[slot]).wait()
            else:
                pltpu.make_async_copy(src.at[b, i, k], zi.at[slot],
                                      sem.at[slot]).wait()
            if k > 0:
                pltpu.make_async_copy(out.at[b, i, pl.ds(0, k)],
                                      strip_i.at[slot, pl.ds(0, k)],
                                      sem.at[2 + slot]).wait()

        for k in range(nt):  # static unroll: strip widths stay static
            # ---- pivot row inputs (Z_k / K_kk and the L_k strip)
            if fused:
                ck = pltpu.make_async_copy(src.at[b, pl.ds(k * T, T), :],
                                           zk, sem.at[4])
            else:
                ck = pltpu.make_async_copy(src.at[b, k, k], tile, sem.at[4])
            ck.start()
            if k > 0:
                cs = pltpu.make_async_copy(out.at[b, k, pl.ds(0, k)],
                                           strip_k.at[pl.ds(0, k)],
                                           sem.at[5])
                cs.start()
                cs.wait()
            ck.wait()

            # ---- diagonal tile
            if fused:
                acc = scale * _dot_t(zk[...], zk[...]) + dconst * eye
            else:
                acc = tile[...] + dconst * eye
            if "strips" not in ablate:
                acc = _strip_update(acc, lambda j: strip_k[j],
                                    lambda j: strip_k[j], k)
            diag[...] = acc
            if "factor" not in ablate:
                _factor_tile(diag, linv)
            else:
                linv[...] = jnp.where(rows2d == cols2d, 1.0, 0.0)
            diag[...] = diag[...].T  # U -> L for the write-back
            wd = pltpu.make_async_copy(diag, out.at[b, k, k], wsem.at[0])
            wd.start()

            # ---- panel rows i > k, double-buffered
            if k + 1 < nt:
                start_row_loads(k + 1, k, 0)

                def body(i, _):
                    slot = (i - (k + 1)) % 2

                    @pl.when(i + 1 < nt)
                    def _():
                        start_row_loads(i + 1, k, 1 - slot)

                    wait_row_loads(i, k, slot)
                    if "gram" in ablate:
                        a_ik = zi[slot][..., :T] * 1.0
                    elif fused:
                        a_ik = scale * _dot_t(zi[slot], zk[...])
                    else:
                        a_ik = zi[slot][...]
                    if "strips" not in ablate:
                        a_ik = _strip_update(
                            a_ik, lambda j: strip_i[slot, j],
                            lambda j: strip_k[j], k)
                    # wait for the previous row's result DMA before reusing
                    # the staging tile, then panel-solve and write back
                    @pl.when(i > k + 1)
                    def _():
                        pltpu.make_async_copy(
                            tile, out.at[b, i - 1, k], wsem.at[1]).wait()
                    if "solve" in ablate:
                        tile[...] = a_ik
                    else:
                        tile[...] = _dot(a_ik, linv[...])  # A_ik @ inv(U)
                    pltpu.make_async_copy(tile, out.at[b, i, k],
                                          wsem.at[1]).start()
                    return 0

                jax.lax.fori_loop(k + 1, nt, body, 0)
                pltpu.make_async_copy(tile, out.at[b, nt - 1, k],
                                      wsem.at[1]).wait()
            wd.wait()

    return kernel


def _call(kern_args, n: int, d: int, b: int, fused: bool,
          ablate: frozenset = frozenset()):
    out = _call_tiled(kern_args, n, d, b, fused, ablate)
    # un-tile [B, nt, nt, T, T] -> [B, N, N] and mask the upper triangle
    # (tiles above the diagonal are never written). NOTE this transpose
    # materialises a second N x N buffer — the memory-bound regime uses
    # fused_gram_cholesky_tiled + tiled_log_det instead.
    full = out.transpose(0, 1, 3, 2, 4).reshape(b, n, n)
    return _tril(full)


def _call_tiled(kern_args, n: int, d: int, b: int, fused: bool,
                ablate: frozenset = frozenset()):
    nt = n // T
    ns = max(nt - 1, 1)
    n_smem = 2 if fused else 1
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem
        + [pl.BlockSpec(memory_space=pltpu.ANY)]
    )
    zshape = (T, d) if fused else (T, T)
    out = pl.pallas_call(
        _make_kernel(n, d, fused, ablate),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, nt, nt, T, T), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(zshape, jnp.float32),          # zk
            pltpu.VMEM((2,) + zshape, jnp.float32),   # zi double buffer
            pltpu.VMEM((ns, T, T), jnp.float32),      # strip_k
            pltpu.VMEM((2, ns, T, T), jnp.float32),   # strip_i double buffer
            pltpu.VMEM((T, T), jnp.float32),          # diag
            pltpu.VMEM((T, T), jnp.float32),          # linv
            pltpu.VMEM((T, T), jnp.float32),          # tile
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*kern_args)
    return out


def _tile_matrix(kmat):
    """[B, N, N] -> tile-blocked [B, nt, nt, T, T]."""
    b, n, _ = kmat.shape
    nt = n // T
    return kmat.reshape(b, nt, T, nt, T).transpose(0, 1, 3, 2, 4)


def _tril(x):
    n = x.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(r >= c, x, 0.0)


# ------------------------------------------------------------------ general
@jax.custom_vjp
def hbm_blocked_cholesky(kmat: Array, diag: Array | float = 0.0) -> Array:
    """Lower Cholesky of [B, N, N] SPD + diag*I, N a multiple of 128, with
    the matrix HBM-resident (no VMEM size cap)."""
    return _hbm_fwd_impl(kmat, diag)


def _hbm_fwd_impl(kmat, diag):
    b, n, n2 = kmat.shape
    assert n == n2 and n % T == 0, f"N={n} must be a multiple of {T}"
    diag_arr = jnp.asarray(diag, jnp.float32).reshape((1,))
    tiled = _tile_matrix(kmat.astype(jnp.float32))
    return _call((diag_arr, tiled), n, T, b, fused=False)


def _hbm_fwd(kmat, diag):
    L = _hbm_fwd_impl(kmat, diag)
    return L, L


def _hbm_bwd(L, Lbar):
    kbar = _chol_rev(L, Lbar)
    dbar = jnp.sum(jnp.diagonal(kbar, axis1=-2, axis2=-1))
    return kbar, dbar


hbm_blocked_cholesky.defvjp(_hbm_fwd, _hbm_bwd)


# ------------------------------------------------------------------- fused
@jax.custom_vjp
def fused_gram_cholesky(z: Array, scale: Array | float,
                        diag: Array | float) -> Array:
    """chol(scale * Z Z^T + diag * I) for Z [B, N, D] without materialising
    the [N, N] Gram matrix in HBM. Covers the linear/cossim/bncossim kernel
    family (reference methods/DKT.py:366-370 — cossim kernels are a scaled
    linear kernel over normalised features). N, D multiples of 128."""
    return _fused_fwd_impl(z, scale, diag)


def _fused_fwd_impl(z, scale, diag):
    b, n, d = z.shape
    assert n % T == 0, f"N={n} must be a multiple of {T}"
    assert d % 128 == 0, f"D={d} must be lane-aligned (pad features to 128)"
    scale_arr = jnp.asarray(scale, jnp.float32).reshape((1,))
    diag_arr = jnp.asarray(diag, jnp.float32).reshape((1,))
    return _call((scale_arr, diag_arr, z.astype(jnp.float32)), n, d, b,
                 fused=True)


def _fused_fwd(z, scale, diag):
    L = _fused_fwd_impl(z, scale, diag)
    return L, (z, jnp.asarray(scale, jnp.float32), L)


def _fused_bwd(res, Lbar):
    z, scale, L = res
    kbar = _chol_rev(L, Lbar)
    # Gram-free contractions: materialising Z Z^T here would allocate the
    # very [B, N, N] buffer the fused forward exists to avoid. kbar@z is
    # shared between zbar and sbar (sum(kbar * ZZ^T) == sum((kbar@Z) * Z)).
    kz = jnp.einsum("bnm,bmd->bnd", kbar, z)
    kzt = jnp.einsum("bmn,bmd->bnd", kbar, z)
    zbar = scale * (kz + kzt)
    sbar = jnp.sum(kz * z)
    dbar = jnp.sum(jnp.diagonal(kbar, axis1=-2, axis2=-1))
    return zbar, sbar, dbar


fused_gram_cholesky.defvjp(_fused_fwd, _fused_bwd)


def fused_gram_cholesky_tiled(z: Array, scale: Array | float,
                              diag: Array | float) -> Array:
    """chol(scale * Z Z^T + diag * I) in TILE-BLOCKED layout
    [B, nt, nt, T, T] (tiles above the diagonal undefined), skipping the
    un-tile transpose of fused_gram_cholesky.

    This is the memory-bound-regime entry point: peak HBM is ONE N x N
    object (the factor itself, plus the N x D features) — XLA's
    assemble-then-factor needs the Gram AND the factor (2 N x N), and even
    fused_gram_cholesky's un-tile transpose briefly holds 2 N x N. At N
    where 2 N x N buffers exceed the chip's HBM, this is the only
    completing path (demonstrated in benchmarks/hbm_memory_demo.py).
    Consumers read reductions straight off the tiled layout (tiled_log_det
    below); forward-only (the memory regime precludes storing residuals)."""
    b, n, d = z.shape
    assert n % T == 0, f"N={n} must be a multiple of {T}"
    assert d % 128 == 0, f"D={d} must be lane-aligned (pad features to 128)"
    scale_arr = jnp.asarray(scale, jnp.float32).reshape((1,))
    diag_arr = jnp.asarray(diag, jnp.float32).reshape((1,))
    return _call_tiled((scale_arr, diag_arr, z.astype(jnp.float32)), n, d, b,
                       fused=True)


def tiled_log_det(lt: Array) -> Array:
    """logdet(K) = 2 sum log diag(L) from a tile-blocked factor
    [B, nt, nt, T, T] (allocates only [B, nt, T, T] for the diagonal
    tiles, never the untiled N x N)."""
    nt = lt.shape[1]
    idx = jnp.arange(nt)
    diag_tiles = lt[:, idx, idx]  # [B, nt, T, T]
    d = jnp.diagonal(diag_tiles, axis1=-2, axis2=-1)  # [B, nt, T]
    return 2.0 * jnp.sum(jnp.log(d), axis=(-1, -2))


def _chol_rev(L, Lbar):
    """Standard Cholesky reverse mode (Murray 2016): Kbar = 0.5 L^-T
    (P + P^T) L^-1 with P = Phi(L^T Lbar), Phi = lower w/ halved diag."""
    n = L.shape[-1]
    P = jnp.einsum("...ji,...jk->...ik", L, Lbar)
    tri = jnp.tril(jnp.ones((n, n), L.dtype))
    P = P * tri - 0.5 * P * jnp.eye(n, dtype=L.dtype)
    S = P + jnp.swapaxes(P, -1, -2)
    tmp = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), S, lower=False)
    X = jnp.swapaxes(jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), jnp.swapaxes(tmp, -1, -2), lower=False),
        -1, -2)
    return 0.5 * X
