"""Fused log-domain Sinkhorn as a Pallas TPU kernel.

The XLA version (openglue_tpu.ops.sinkhorn) materializes ``M + v`` / ``M + u``
in HBM on every one of the 20 iterations — ~40 full passes over the
[B, N+1, M+1] score matrix (reference hot loop, optimal_transport.py:24-26).
This kernel keeps the matrix and both potentials in VMEM for the whole
iteration: one HBM read of S, one write of log_P, everything else on-chip.

Numerics match ops.sinkhorn.log_optimal_transport (same update order, f32).
Shapes are padded to TPU tiles with -1e9 so the logsumexp over padded lanes is
exact; the dustbin row/column marginals and the mask semantics are identical
to the XLA path.

Two variants, dispatched by ``fits_vmem``:
  * in-VMEM (N <= ~1500): the whole score block lives in VMEM; the kernel
    emits only the potentials so a single double-buffered input block is the
    entire footprint;
  * HBM-streaming (N = 2048 eval graphs and beyond): K = exp(M − rmax) is
    pre-exponentiated into HBM once, and every iteration streams row stripes
    of K through two double-buffered VMEM buffers running the pure-FMA
    scale-domain update (row matvec + online column accumulation) — one HBM
    read per iteration and zero full-matrix transcendentals, vs two
    read+write logsumexp passes per iteration for XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglue_tpu.ops import sinkhorn as sinkhorn_ref

_NEG_INF = -1e9
_VMEM_BUDGET_BYTES = 13 * 1024 * 1024  # ~16 MB/core minus headroom


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_vmem(num_rows: int, num_cols: int) -> bool:
    # The score block is double-buffered across grid steps; potentials are tiny.
    rp = _round_up(num_rows, 8)
    cp = _round_up(num_cols, 128)
    return 2 * rp * cp * 4 + 8 * (rp + cp) * 4 < _VMEM_BUDGET_BYTES


_TINY = 1e-30


def _sinkhorn_kernel(
    s_hbm, log_a_ref, log_b_ref, u_ref, m_vmem, sems, *, num_iters: int
):
    """One batch element per grid step, iterating in the SCALE domain.

    The log-domain loop pays two full-matrix logsumexp passes per iteration —
    2T·Rp·Cp transcendentals, which is what the VPU spends its time on (the
    kernel is exp-throughput-bound, not bandwidth-bound). The classic
    matrix-scaling form of the same recursion,

        K = exp(M − rmax)           (row-stabilized, entries ≤ 1, ONCE)
        û = a ⊘ (K v̂),  v̂ = b ⊘ (Kᵀ û)     with a = e^{log_a}, b = e^{log_b}

    is algebraically identical (û ≡ e^{u + rmax}, v̂ ≡ e^{v}) but its loop is
    two MXU matvecs against the resident K per iteration — zero full-matrix
    transcendentals after the initial exp. The final u is recovered as

        u_T = log_a − rmax − log(K v̂_{T−1})

    whose rmax factoring reproduces the log-domain lse stabilizer row-wise
    exactly (dead/masked rows: K row ≡ 1, a ≡ 0 → u = −log Σv̂, the reference
    value). The matching final v_T = log_b − lse_rows(M + u_T) needs COLUMN
    stabilization that the row-stabilized K cannot provide (dead columns
    hard-underflow to 0), so it runs OUTSIDE as one fused XLA pass over the
    original M — see log_sinkhorn. Keeping only K resident (exp'd in place
    over the DMA'd M) and using dot_general for the matvecs holds the
    in-module VMEM to one [Rp, Cp] buffer + vectors; the two-buffer variant
    measured 18.6 MB of scoped VMEM under Mosaic's stack allocator and failed
    to compile at the flagship shape in some surrounding contexts.

    s_hbm: [B, Rp, Cp] in ANY (M already /reg, −1e9 padding).
    log_a_ref: [1, Rp, 1]; log_b_ref: [1, 1, Cp]. Output: u [1, Rp, 1].

    f32 range note: a column whose every entry sits ≫80 nats below its row's
    max underflows Kᵀû mid-loop; the guard divides keep iterates finite and
    the exact XLA final pass restores reference semantics. Model score
    spreads (≲40 nats) never approach this."""
    b = pl.program_id(0)
    m_in = pltpu.make_async_copy(s_hbm.at[b], m_vmem, sems.at[0])
    m_in.start()

    log_a = log_a_ref[0]  # [Rp, 1]
    log_b = log_b_ref[0]  # [1, Cp]
    a = jnp.exp(log_a)  # masked rows: exp(-1e9) = 0 exactly
    bb = jnp.exp(log_b)

    m_in.wait()
    rmax = jnp.max(m_vmem[...], axis=1, keepdims=True)  # [Rp, 1]
    m_vmem[...] = jnp.exp(m_vmem[...] - rmax)  # K, in place

    def kv(v_hat):  # K @ v̂ -> [Rp, 1]
        return jax.lax.dot_general(
            m_vmem[...], v_hat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def ktu(u_hat):  # Kᵀ @ û -> [1, Cp]
        return jax.lax.dot_general(
            u_hat, m_vmem[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def body(_, v_hat):
        u_hat = a / jnp.maximum(kv(v_hat), _TINY)
        return bb / jnp.maximum(ktu(u_hat), _TINY)

    v_hat = jax.lax.fori_loop(0, num_iters - 1, body, jnp.ones_like(log_b))
    u_ref[0] = log_a - rmax - jnp.log(jnp.maximum(kv(v_hat), _TINY))


def _sinkhorn_kernel_pair(
    s_hbm, log_a_ref, log_b_ref, u_ref, m_vmem, sems, *, num_iters: int
):
    """TWO batch elements per grid step, same scale-domain recursion as
    _sinkhorn_kernel. The 20 iterations are a strictly sequential chain of
    [Rp, Cp] x [Cp, 1] matvecs — latency-bound, not throughput-bound, on one
    element (each matvec uses 1/256 of an MXU pass and its result feeds the
    next). Two resident K matrices give the scheduler two INDEPENDENT
    recursions to interleave, hiding each matvec's latency behind the other
    element's work. VMEM: 2 x [Rp, Cp] f32 — fits at the flagship N=1024
    (9.5 MB); the fits_vmem dispatch accounts for the pair.

    s_hbm: [B, Rp, Cp] (B even) in ANY; log_a [2, Rp, 1]; log_b [2, 1, Cp];
    u out [2, Rp, 1]."""
    g = pl.program_id(0)
    m_in = pltpu.make_async_copy(
        s_hbm.at[pl.ds(2 * g, 2)], m_vmem, sems.at[0]
    )
    m_in.start()

    a = jnp.exp(log_a_ref[...])  # [2, Rp, 1]; masked rows exp(-1e9) = 0
    bb = jnp.exp(log_b_ref[...])  # [2, 1, Cp]

    m_in.wait()
    rmax = jnp.max(m_vmem[...], axis=2, keepdims=True)  # [2, Rp, 1]
    m_vmem[...] = jnp.exp(m_vmem[...] - rmax)

    # VPU broadcast-multiply + reduction, NOT a dot_general: the matvec uses
    # 1 column of a 256-wide MXU pass, while the VPU form streams K once per
    # sweep at full lane width (measured 0.790 vs 0.819 ms at N=1024 B=16)
    def kv(j, v_hat):  # K_j @ v̂_j -> [Rp, 1]
        return jnp.sum(m_vmem[j] * v_hat, axis=1, keepdims=True)

    def ktu(j, u_hat):  # K_j' @ û_j -> [1, Cp]
        return jnp.sum(m_vmem[j] * u_hat, axis=0, keepdims=True)

    def body(_, carry):
        v0, v1 = carry
        # the two elements' updates are independent — issue both matvecs
        # before either divide so they pipeline
        y0 = kv(0, v0)
        y1 = kv(1, v1)
        u0 = a[0] / jnp.maximum(y0, _TINY)
        u1 = a[1] / jnp.maximum(y1, _TINY)
        r0 = ktu(0, u0)
        r1 = ktu(1, u1)
        return bb[0] / jnp.maximum(r0, _TINY), bb[1] / jnp.maximum(r1, _TINY)

    v0, v1 = jax.lax.fori_loop(
        0, num_iters - 1, body, (jnp.ones_like(bb[0]), jnp.ones_like(bb[0]))
    )
    u_ref[0] = log_a_ref[0] - rmax[0] - jnp.log(jnp.maximum(kv(0, v0), _TINY))
    u_ref[1] = log_a_ref[1] - rmax[1] - jnp.log(jnp.maximum(kv(1, v1), _TINY))


def _pad_granularity(rows: int, cols: int, r_blk: int = 256):
    """(rp, cp, blocked) for the variant the shape dispatches to."""
    blocked = not fits_vmem(rows, cols)
    rp = _round_up(rows, r_blk if blocked else 8)
    return rp, _round_up(cols, 128), blocked


def _padded_marginals(log_a, log_b, rows, cols, rp, cp):
    """Padded rows/cols get -inf marginals: their potentials never matter
    because every matrix entry they touch is -inf too."""
    batch = log_a.shape[0]
    la = jnp.full((batch, rp, 1), _NEG_INF, jnp.float32)
    la = la.at[:, :rows, 0].set(log_a.astype(jnp.float32))
    lb = jnp.full((batch, 1, cp), _NEG_INF, jnp.float32)
    lb = lb.at[:, 0, :cols].set(log_b.astype(jnp.float32))
    return la, lb


def log_sinkhorn(
    log_a: jnp.ndarray,
    log_b: jnp.ndarray,
    M: jnp.ndarray,
    num_iters: int = 20,
    reg: float = 1.0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in for ops.sinkhorn.log_sinkhorn. M: [B, R, C]. Dispatches to the
    HBM-streaming blocked kernel when the matrix exceeds VMEM."""
    batch, rows, cols = M.shape
    rp, cp, blocked = _pad_granularity(rows, cols)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    M_pad = jnp.full((batch, rp, cp), _NEG_INF, jnp.float32)
    M_pad = M_pad.at[:, :rows, :cols].set((M / reg).astype(jnp.float32))
    la, lb = _padded_marginals(log_a, log_b, rows, cols, rp, cp)
    return _sinkhorn_from_padded(
        la, lb, M_pad, rows, cols, num_iters, interpret, blocked
    ).astype(M.dtype)


def _sinkhorn_from_padded(
    la, lb, M_pad, rows, cols, num_iters, interpret, blocked, r_blk: int = 256
):
    """Run the dispatch-selected kernel on an ALREADY padded/regularized
    [B, rp, cp] matrix (callers that own the padding — the model's OT entry —
    build it in one fused XLA pass from the raw scores instead of
    materializing the augmented matrix, its masked copy, AND the padded copy).
    Returns log_P [B, rows, cols] f32."""
    batch, rp, cp = M_pad.shape
    if blocked:
        return _blocked_from_padded(
            la, lb, M_pad, rows, cols, num_iters, interpret, r_blk
        )

    if batch >= 2:
        # two elements per grid step: the sequential matvec recursion is
        # latency-bound; pairing gives the scheduler independent work
        # (measured 1.35x at flagship N=1024 B=16 — BASELINE.md round 3)
        pad_b = batch % 2
        M_in, la_in, lb_in = M_pad, la, lb
        if pad_b:
            # dummy element: all -1e9 scores and -inf marginals iterate to
            # clamp values without NaN and are sliced off (the final XLA
            # half-iteration below still sees the UNpadded M_pad/lb)
            M_in = jnp.concatenate([M_pad, jnp.full((1, rp, cp), _NEG_INF)], 0)
            la_in = jnp.concatenate([la, jnp.full((1, rp, 1), _NEG_INF)], 0)
            lb_in = jnp.concatenate([lb, jnp.full((1, 1, cp), _NEG_INF)], 0)
        kernel = functools.partial(_sinkhorn_kernel_pair, num_iters=num_iters)
        u = pl.pallas_call(
            kernel,
            grid=((batch + pad_b) // 2,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # M, DMA'd manually
                pl.BlockSpec((2, rp, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1, cp), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2, rp, 1), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch + pad_b, rp, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, rp, cp), jnp.float32),  # M pair, exp'd in place
                pltpu.SemaphoreType.DMA((1,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=4 * batch * num_iters * rp * cp,
                bytes_accessed=batch * rp * cp * 4,
                transcendentals=batch * rp * cp,
            ),
        )(M_in, la_in, lb_in)
        u = u[:batch]
    else:
        kernel = functools.partial(_sinkhorn_kernel, num_iters=num_iters)
        u = pl.pallas_call(
            kernel,
            grid=(batch,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # M, DMA'd manually
                pl.BlockSpec((1, rp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, rp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((batch, rp, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((rp, cp), jnp.float32),  # M, exp'd into K in place
                pltpu.SemaphoreType.DMA((1,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=4 * batch * num_iters * rp * cp,
                bytes_accessed=batch * rp * cp * 4,
                transcendentals=batch * rp * cp,
            ),
        )(M_pad, la, lb)
    # Final half-iteration in XLA (one fused pass over M): the column-wise
    # logsumexp needs column stabilization the row-stabilized in-kernel K
    # cannot represent for dead columns (see kernel docstring).
    u = u[:, :rows, :]
    x = M_pad[:, :rows, :cols] + u  # [B, rows, cols]
    cmax = jnp.max(x, axis=1, keepdims=True)
    v = lb[:, :, :cols] - (
        cmax + jnp.log(jnp.sum(jnp.exp(x - cmax), axis=1, keepdims=True))
    )
    return x + v


def _blocked_scale_kernel(
    k_hbm, log_a_ref, log_b_ref, y_ref, v_hat_ref,
    stripe, sems, *, num_iters: int, r_blk: int, matvec: str = "vpu",
):
    """Scale-domain variant of the HBM-streaming kernel (same reformulation
    as _sinkhorn_kernel): the caller pre-exponentiates K = exp(M − rmax) into
    HBM once, and every iteration is then ONE streamed FMA pass over K —
    row matvec y = K v̂, row update û = a ⊘ y, online column accumulation
    r += ûᵀK — with zero full-matrix transcendentals (the log-domain blocked
    kernel paid two logsumexp's worth of exp per stripe per iteration and was
    ~2× the DMA roofline at N=2048). The final u is recovered row-wise as
    u = log_a − rmax − log(y_T) by the CALLER (which also runs the final
    column-stabilized half-iteration over the original M, as the in-VMEM
    kernel does — see log_sinkhorn).

    f32 dynamic-range assumption: K is ROW-stabilized only, so entries more
    than ~88 nats below their row max flush to zero and the column
    accumulation r is unstabilized — a valid column whose every entry
    underflows hits the _TINY clamp mid-loop. The exact column-stabilized XLA
    final half-iteration restores reference semantics for log_P: parity vs
    the log-domain reference is ≤1e-4 even at a ±60σ score spread (~500-nat
    dynamic range, tests/test_pallas_kernels.py::
    test_blocked_sinkhorn_extreme_dynamic_range); model score spreads are
    ≲40 nats. Potentials of FULLY-underflowed columns are clamp-valued
    mid-loop but enter log_P only through the exact final pass.

    Grid step = one batch element. k_hbm: [B, Rp, Cp] in ANY (K, dead rows
    all-ones); log_a [1, Rp, 1]; log_b [1, 1, Cp]. Output: y [1, Rp, 1], the
    LAST iteration's row matvec K v̂_{T−1} (u recovery). v_hat_ref: VMEM
    scratch vector.
    """
    rp = y_ref.shape[1]
    cp = v_hat_ref.shape[1]
    n_blocks = rp // r_blk
    b = pl.program_id(0)

    bb = jnp.exp(log_b_ref[0])  # [1, Cp]

    def dma_in(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(blk * r_blk, r_blk), :], stripe.at[slot], sems.at[slot]
        )

    v_hat_ref[...] = jnp.ones_like(v_hat_ref)
    k_dtype = stripe.dtype

    def iteration(it, _):
        if matvec in ("mxu", "mxu_y"):
            # row matvec on the MXU: y = K_blk @ v_col. A width-1 output
            # pads to the full 128-lane tile either way, so broadcast v̂ to
            # 8 columns once per iteration (bf16 operand, f32 accumulate);
            # the measured VPU lane-reduce was what pushed the kernel ~1.8x
            # past its DMA roofline at N=2048 (bench/sinkhorn_matvec_sweep).
            v_col = jnp.broadcast_to(
                jnp.transpose(v_hat_ref[...]), (cp, 8)
            ).astype(k_dtype)

        def pass_over_stripes(r_col, blk, slot):
            dma_in(slot, blk).wait()
            nxt = blk + 1

            @pl.when(nxt < n_blocks)
            def _():
                dma_in(1 - slot, nxt).start()

            K_blk = stripe[slot]  # [r_blk, cp]
            if matvec in ("mxu", "mxu_y"):
                y_full = jax.lax.dot_general(
                    K_blk, v_col,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [r_blk, 8]
                y_blk = jnp.maximum(y_full[:, 0:1], _TINY)
            else:
                y_blk = jnp.maximum(
                    jnp.sum(K_blk * v_hat_ref[...], axis=1, keepdims=True), _TINY
                )
            # dead rows: exp(-1e9) = 0 exactly -> no column contribution
            a_blk = jnp.exp(log_a_ref[0, pl.ds(blk * r_blk, r_blk), :])
            u_hat = a_blk / y_blk
            y_ref[0, pl.ds(blk * r_blk, r_blk), :] = y_blk
            if matvec == "mxu":
                u_row = jnp.transpose(u_hat).astype(k_dtype)  # [1, r_blk]
                return r_col + jax.lax.dot_general(
                    u_row, K_blk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return r_col + jnp.sum(K_blk * u_hat, axis=0, keepdims=True)

        dma_in(0, 0).start()

        def body(blk, carry):
            return pass_over_stripes(carry, blk, blk % 2)

        r_col = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((1, cp), jnp.float32))
        v_hat_ref[...] = bb / jnp.maximum(r_col, _TINY)
        return 0

    # num_iters - 1 full iterations + the final row matvec (its y feeds the
    # caller's u recovery; the final column update runs outside on M)
    jax.lax.fori_loop(0, num_iters, iteration, 0)


def _log_sinkhorn_blocked(
    log_a: jnp.ndarray,
    log_b: jnp.ndarray,
    M: jnp.ndarray,
    num_iters: int,
    reg: float,
    interpret: bool,
    r_blk: int = 256,
    k_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Blocked drop-in for log_sinkhorn for matrices beyond VMEM."""
    batch, rows, cols = M.shape
    rp = _round_up(rows, r_blk)
    cp = _round_up(cols, 128)
    M_pad = jnp.full((batch, rp, cp), _NEG_INF, jnp.float32)
    M_pad = M_pad.at[:, :rows, :cols].set((M / reg).astype(jnp.float32))
    la, lb = _padded_marginals(log_a, log_b, rows, cols, rp, cp)
    return _blocked_from_padded(
        la, lb, M_pad, rows, cols, num_iters, interpret, r_blk, k_dtype
    ).astype(M.dtype)


def _blocked_from_padded(
    la, lb, M_pad, rows, cols, num_iters, interpret, r_blk: int = 256,
    k_dtype=jnp.bfloat16, matvec: str = "vpu",
):
    """Blocked runner on an already padded/regularized matrix.

    XLA pre-exponentiates K = exp(M − rmax) into HBM once (one fused pass);
    the kernel then streams pure-FMA scale-domain iterations over K (the
    previous log-domain streaming kernel paid two full-matrix exp's per
    iteration and ran ~2× the DMA roofline at N=2048); the final
    column-stabilized half-iteration and the log_P assembly are one more
    fused XLA pass over M — identical structure to the in-VMEM variant.

    ``k_dtype``: HBM storage dtype for K. The kernel is DMA-roofline-bound
    (one full K read per iteration), so bf16 storage halves the wall time.
    K ∈ [0, 1] row-stabilized, so bf16's 8-bit mantissa gives ≤0.4% relative
    error per entry — below the truncation error of 20 un-converged Sinkhorn
    iterations — and the final half-iteration + log_P assembly run in exact
    f32 over the ORIGINAL M (only the u potential carries the ~4e-3-nat
    perturbation; parity + decode-agreement pinned in
    tests/test_pallas_kernels.py::test_blocked_sinkhorn_k_dtype). All
    iteration ARITHMETIC stays f32 — bf16 is storage/DMA only."""
    batch, rp, cp = M_pad.shape

    # row-stabilized K; dead/padded rows are all-ones (rmax = M = -1e9), their
    # marginal a = 0 keeps them out of every column accumulation
    rmax = jnp.max(M_pad, axis=2, keepdims=True)  # [B, Rp, 1]
    K = jnp.exp(M_pad - rmax).astype(k_dtype)

    kernel = functools.partial(
        _blocked_scale_kernel, num_iters=num_iters, r_blk=r_blk, matvec=matvec
    )
    y = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # K; indexed by program_id
            pl.BlockSpec((1, rp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, rp, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, cp), jnp.float32),  # v̂
            pltpu.VMEM((2, r_blk, cp), jnp.dtype(k_dtype)),  # stripes
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_iters * rp * cp,
            bytes_accessed=batch * rp * cp * jnp.dtype(k_dtype).itemsize * num_iters,
            transcendentals=batch * (rp + cp) * num_iters,
        ),
    )(K, la, lb)

    # u_T from the last row matvec, then the final column-stabilized
    # half-iteration + log_P assembly in one fused XLA pass over M
    u = (la - rmax - jnp.log(jnp.maximum(y, _TINY)))[:, :rows, :]
    x = M_pad[:, :rows, :cols] + u
    cmax = jnp.max(x, axis=1, keepdims=True)
    v = lb[:, :, :cols] - (
        cmax + jnp.log(jnp.sum(jnp.exp(x - cmax), axis=1, keepdims=True))
    )
    return x + v


def build_padded_otp_matrix(
    scores: jnp.ndarray,
    dustbin_score,
    reg: float,
    mask0: Optional[jnp.ndarray],
    mask1: Optional[jnp.ndarray],
    rp: int,
    cp: int,
) -> jnp.ndarray:
    """The dustbin-augmented, mask-invalidated, tile-padded, regularized OT
    cost [B, rp, cp] built in ONE fused XLA pass from the raw scores.

    Semantically identical to ops.sinkhorn.augment_scores + the pair_valid
    masking + /reg + the -1e9 tile padding, but as a single iota-select
    expression so XLA emits one read of S and one write of M_pad — the
    separate augmented and masked-augmented intermediates (two more full
    read+write passes over a [B, N+1, M+1] f32 matrix) never materialize.
    (Masked/padded entries are exactly -1e9 here, where the old chain gave
    -1e9/reg; both are "effectively -inf" to the row-stabilized kernels.)
    """
    batch, m, n = scores.shape
    S_pad = jnp.pad(scores.astype(jnp.float32), ((0, 0), (0, rp - m), (0, cp - n)))
    row_ids = jnp.arange(rp)[None, :, None]
    col_ids = jnp.arange(cp)[None, None, :]
    dust = jnp.asarray(dustbin_score, jnp.float32)
    vals = jnp.where((row_ids == m) | (col_ids == n), dust, S_pad) / reg

    valid_row = row_ids <= m  # real rows + the dustbin row; padding invalid
    if mask0 is not None:
        mask0_pad = jnp.pad(mask0, ((0, 0), (0, rp - m)))[:, :, None]
        valid_row = valid_row & (mask0_pad | (row_ids == m))
    valid_col = col_ids <= n
    if mask1 is not None:
        mask1_pad = jnp.pad(mask1, ((0, 0), (0, cp - n)))[:, None, :]
        valid_col = valid_col & (mask1_pad | (col_ids == n))
    return jnp.where(valid_row & valid_col, vals, _NEG_INF)


def _sinkhorn_adjoint_factors_kernel(
    s_hbm, log_a_ref, log_b_ref, rmax_ref, g_rowsum_ref, g_colsum_ref,
    p_ref, q_ref,
    m_vmem, u_hist, v_hist, lr_hist, lc_hist, sems,
    *, num_iters: int,
):
    """Adjoint of the unrolled Sinkhorn iteration as a rank-2T factorization.

    The adjoint accumulates, over iterations t = T..1,

        dM -= A_t ∘ (1 gv_tᵀ)   with A_t = exp(M + u_t − lse_rows_t)
        gu_t = −A_t · gv_t      (+ rowsum(g) at t = T)
        dM -= B_t ∘ (gu_t 1ᵀ)   with B_t = exp(M + v_{t−1} − lse_cols_t)
        gv_{t−1} = −B_tᵀ · gu_t

    Every accumulated term is exp(M) scaled by a rank-1 outer product:
        A_t ∘ (1 gv_tᵀ) = exp(M − rmax) ∘ (exp(u_t + rmax) · (gv_t ⊙ e^{−lr_t})ᵀ)
        B_t ∘ (gu_t 1ᵀ) = exp(M − rmax) ∘ ((gu_t ⊙ e^{rmax − lc_t}) · e^{v_{t−1}}ᵀ)
    (rmax = per-row max of M stabilizes the split exponentials), so instead of
    accumulating a [Rp, Cp] dM in VMEM the kernel emits the 2T rank-1 factors
    P [2T, Rp] / Q [2T, Cp] and the caller combines them in ONE fused XLA pass

        dM = g − exp(M − rmax) ∘ (Pᵀ Q).

    This removes the dM scratch and the g DMA that pushed the previous
    monolithic adjoint kernel past VMEM at N = 1024 (commit 79f136f): the
    footprint is one single-buffered M block (DMA'd from ANY) plus one
    transient for the per-step masked reductions.

    Grid step = one batch element. s_hbm: [B, Rp, Cp] in ANY (M, already
    /reg, -1e9 padding); log_a [1, Rp, 1]; log_b [1, 1, Cp]; rmax [1, Rp, 1];
    g_rowsum [1, Rp, 1]; g_colsum [1, 1, Cp]. Outputs p [1, F, Rp] /
    q [1, F, Cp] with F = round_up(2T, 8); padding rows are zeroed.
    """
    b = pl.program_id(0)
    m_in = pltpu.make_async_copy(s_hbm.at[b], m_vmem, sems.at[0])
    m_in.start()

    log_a = log_a_ref[0]
    log_b = log_b_ref[0]
    rmax = rmax_ref[0]  # [Rp, 1]
    a = jnp.exp(log_a)  # dead rows: exp(-1e9) = 0 exactly
    bb = jnp.exp(log_b)

    p_ref[0] = jnp.zeros_like(p_ref[0])
    q_ref[0] = jnp.zeros_like(q_ref[0])

    m_in.wait()
    # K = exp(M − rmax) IN PLACE: the adjoint recursion only ever consumes M
    # through exp(M + potentials − lse) terms, all of which factor through K
    # (see below), so the raw M is never needed again.
    m_vmem[...] = jnp.exp(m_vmem[...] - rmax)
    K = m_vmem

    # Forward replay in the SCALE domain (û ≡ e^{u+rmax}, v̂ ≡ e^{v}; same
    # reformulation as the forward kernel — the loop is multiply-accumulate
    # only, 2 transcendental-free passes per iteration instead of two
    # logsumexps). Histories stored lane-major as [T, 1, ·]:
    #   u_hist[t] = û_t = a ⊘ y_t          y_t = K v̂_{t−1}
    #   v_hist[t] = v̂_t = b ⊘ r_t          r_t = Kᵀ û_t
    #   lc_hist[t] = y_t   (≡ e^{lse_cols_t − rmax}),  lr_hist[t] = r_t (≡ e^{lse_rows_t})
    def fwd(t, v_hat):
        y = jnp.maximum(jnp.sum(K[...] * v_hat, axis=1, keepdims=True), _TINY)
        u_hat = a / y
        r = jnp.maximum(jnp.sum(K[...] * u_hat, axis=0, keepdims=True), _TINY)
        v_hat = bb / r
        u_hist[t] = jnp.transpose(u_hat)
        v_hist[t] = v_hat
        lr_hist[t] = r
        lc_hist[t] = jnp.transpose(y)
        return v_hat

    jax.lax.fori_loop(0, num_iters, fwd, jnp.ones_like(log_b))

    gu_direct = g_rowsum_ref[0]  # [Rp, 1]
    gv_T = g_colsum_ref[0]  # [1, Cp]

    def adjoint_step(t_rev, gv):
        """One t of the reverse recursion; t = num_iters - t_rev.

        With A_t = exp(M + u_t − lr_t) = K ∘ (û_t ⊗ (1 ⊘ r_t)) and
        B_t = exp(M + v_{t−1} − lc_t) = K ∘ ((1 ⊘ y_t) ⊗ v̂_{t−1}), both
        matrix contractions are plain FMA passes over K, and the rank-1
        factor rows are exactly the stored scale iterates:
        exp(u_t + rmax) = û_t, exp(v_{t−1}) = v̂_{t−1},
        exp(−lr_t) = 1 ⊘ r_t, exp(rmax − lc_t) = 1 ⊘ y_t."""
        slot = num_iters - 1 - t_rev
        u_hat_t = jnp.transpose(u_hist[slot])  # [Rp, 1]
        r_t = lr_hist[slot]  # [1, Cp]
        y_t = jnp.transpose(lc_hist[slot])  # [Rp, 1]

        gv_over_r = gv / r_t
        p_ref[0, pl.ds(slot, 1)] = jnp.transpose(u_hat_t)
        q_ref[0, pl.ds(slot, 1)] = gv_over_r
        direct = jnp.where(t_rev == 0, gu_direct, jnp.zeros_like(gu_direct))
        gu = direct - u_hat_t * jnp.sum(
            K[...] * gv_over_r, axis=1, keepdims=True
        )

        v_hat_prev = jnp.where(
            slot > 0, v_hist[jnp.maximum(slot - 1, 0)], jnp.ones_like(gv)
        )
        gu_over_y = gu / y_t
        p_ref[0, pl.ds(num_iters + slot, 1)] = jnp.transpose(gu_over_y)
        q_ref[0, pl.ds(num_iters + slot, 1)] = v_hat_prev
        return -v_hat_prev * jnp.sum(
            K[...] * gu_over_y, axis=0, keepdims=True
        )

    jax.lax.fori_loop(0, num_iters, adjoint_step, gv_T)


def _bwd_fits_vmem(num_rows: int, num_cols: int) -> bool:
    rp = _round_up(num_rows, 8)
    cp = _round_up(num_cols, 128)
    # One single-buffered M block + one transient for the masked reductions +
    # histories/factors (~10.5 MB nominal at N=1024, T=20). The rank-2T
    # factorization removed the dM scratch and g DMA that pushed the previous
    # monolithic adjoint past VMEM at the flagship shape.
    return 2 * rp * cp * 4 + 200 * (rp + cp) * 4 < 13 * 1024 * 1024


def _sinkhorn_vjp_kernel_path(
    scores, dustbin_score, g, num_iters, reg, mask0, mask1, interpret
):
    """dL/d(scores, dustbin) via the adjoint kernel. g: [B, m+1, n+1] upstream
    cotangent of the FINAL log_P (the -norm rescale adds nothing)."""
    batch, m, n = scores.shape
    rp, cp = _round_up(m + 1, 8), _round_up(n + 1, 128)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    # rebuild M exactly as the forward did — in ONE fused pass (the
    # augmented/masked intermediates never materialize; see
    # build_padded_otp_matrix)
    M_pad = build_padded_otp_matrix(scores, dustbin_score, reg, mask0, mask1, rp, cp)
    if mask0 is None and mask1 is None:
        norm = -jnp.log(jnp.asarray(n + m, dtype=scores.dtype))
        log_a = jnp.full((m + 1,), norm).at[-1].add(jnp.log(jnp.asarray(n, scores.dtype)))
        log_b = jnp.full((n + 1,), norm).at[-1].add(jnp.log(jnp.asarray(m, scores.dtype)))
        log_a = jnp.broadcast_to(log_a, (batch, m + 1))
        log_b = jnp.broadcast_to(log_b, (batch, n + 1))
        pair_valid = jnp.ones((batch, m + 1, n + 1), dtype=bool)
    else:
        mask0_ = mask0 if mask0 is not None else jnp.ones((batch, m), dtype=bool)
        mask1_ = mask1 if mask1 is not None else jnp.ones((batch, n), dtype=bool)
        _, _, log_a_inner, log_a_dust, log_b, _ = (
            sinkhorn_ref.build_masked_otp_inputs(scores, dustbin_score, reg, mask0_, mask1_)
        )
        log_a = jnp.concatenate([log_a_inner, log_a_dust[:, None]], axis=1)
        valid_row = jnp.concatenate([mask0_, jnp.ones((batch, 1), bool)], axis=1)
        valid_col = jnp.concatenate([mask1_, jnp.ones((batch, 1), bool)], axis=1)
        pair_valid = valid_row[:, :, None] & valid_col[:, None, :]

    la, lb = _padded_marginals(log_a, log_b, m + 1, n + 1, rp, cp)
    # Cotangents on masked entries are zeroed: every loss in this framework
    # reads only valid entries (the NLL touches matched + dustbin cells), and
    # the reference's gradient through masked -1e9 logits is garbage-magnitude
    # (~1e9 upstream values) that would otherwise amplify through the adjoint.
    g_pad = jnp.zeros((batch, rp, cp), jnp.float32)
    g_pad = g_pad.at[:, : m + 1, : n + 1].set(
        jnp.where(pair_valid, g.astype(jnp.float32), 0.0)
    )

    # per-row max of M stabilizes the split exponentials of the rank-2T
    # factorization; the seeds are the only pieces of g the kernel needs
    rmax = jnp.max(M_pad, axis=2, keepdims=True)  # [B, Rp, 1]
    g_rowsum = jnp.sum(g_pad, axis=2, keepdims=True)  # [B, Rp, 1]
    g_colsum = jnp.sum(g_pad, axis=1, keepdims=True)  # [B, 1, Cp]

    f = _round_up(2 * num_iters, 8)
    kernel = functools.partial(_sinkhorn_adjoint_factors_kernel, num_iters=num_iters)
    P, Q = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # M, DMA'd manually
            pl.BlockSpec((1, rp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, f, rp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, f, rp), jnp.float32),
            jax.ShapeDtypeStruct((batch, f, cp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rp, cp), jnp.float32),  # M, single-buffered
            pltpu.VMEM((num_iters, 1, rp), jnp.float32),  # u (transposed)
            pltpu.VMEM((num_iters, 1, cp), jnp.float32),  # v
            pltpu.VMEM((num_iters, 1, cp), jnp.float32),  # lse_rows
            pltpu.VMEM((num_iters, 1, rp), jnp.float32),  # lse_cols (transposed)
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(M_pad, la, lb, rmax, g_rowsum, g_colsum)

    # one fused XLA pass: dM = g − exp(M − rmax) ∘ (Pᵀ Q)
    dm = g_pad - jnp.exp(M_pad - rmax) * jnp.einsum("bfr,bfc->brc", P, Q)

    dS_aug = dm[:, : m + 1, : n + 1] / reg
    dS_aug = jnp.where(pair_valid, dS_aug, 0.0)  # masked entries get no grad
    dscores = dS_aug[:, :m, :n].astype(scores.dtype)
    ddustbin = (
        jnp.sum(dS_aug[:, m, :]) + jnp.sum(dS_aug[:, :m, n])
    ).astype(jnp.asarray(dustbin_score).dtype)
    return dscores, ddustbin


def log_optimal_transport(
    scores: jnp.ndarray,
    dustbin_score: jnp.ndarray,
    num_iters: int = 20,
    reg: float = 1.0,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in for ops.sinkhorn.log_optimal_transport with the Sinkhorn loop
    fused on-chip. Matrices beyond VMEM stream through the blocked kernel.

    Differentiable: jax.custom_vjp replaying the XLA implementation backward.
    """
    # custom_vjp over (scores, dustbin) only; masks and statics are closed
    # over (bool arrays cannot carry cotangents). Created per call — traced
    # once per enclosing jit compilation, so no runtime overhead.
    @jax.custom_vjp
    def f(s, d):
        return _log_ot_forward_impl(s, d, num_iters, reg, mask0, mask1, interpret)

    def f_fwd(s, d):
        return f(s, d), (s, d)

    def f_bwd(residuals, g):
        s, d = residuals
        b, m, n = s.shape
        if _bwd_fits_vmem(m + 1, n + 1):
            return _sinkhorn_vjp_kernel_path(
                s, d, g, num_iters, reg, mask0, mask1, interpret
            )
        _, vjp = jax.vjp(
            lambda s_, d_: sinkhorn_ref.log_optimal_transport(
                s_, d_, num_iters, reg, mask0, mask1
            ),
            s,
            d,
        )
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f(scores, dustbin_score)


def _log_ot_forward_impl(scores, dustbin_score, num_iters, reg, mask0, mask1, interpret):
    """Model-facing forward: builds the padded cost in ONE fused pass
    (build_padded_otp_matrix) and runs the dispatch-selected kernel on it —
    the augmented [B, N+1, M+1] matrix never materializes unpadded."""
    batch, m, n = scores.shape
    rows, cols = m + 1, n + 1
    rp, cp, blocked = _pad_granularity(rows, cols)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    M_pad = build_padded_otp_matrix(scores, dustbin_score, reg, mask0, mask1, rp, cp)

    if mask0 is None and mask1 is None:
        norm = -jnp.log(jnp.asarray(n + m, jnp.float32))
        log_a = jnp.full((rows,), norm, jnp.float32)
        log_a = log_a.at[-1].add(jnp.log(jnp.asarray(n, jnp.float32)))
        log_b = jnp.full((cols,), norm, jnp.float32)
        log_b = log_b.at[-1].add(jnp.log(jnp.asarray(m, jnp.float32)))
        log_a = jnp.broadcast_to(log_a, (batch, rows))
        log_b = jnp.broadcast_to(log_b, (batch, cols))
        norm_bc = norm
    else:
        mask0_ = mask0 if mask0 is not None else jnp.ones((batch, m), dtype=bool)
        mask1_ = mask1 if mask1 is not None else jnp.ones((batch, n), dtype=bool)
        count0 = jnp.sum(mask0_, axis=1).astype(jnp.float32)
        count1 = jnp.sum(mask1_, axis=1).astype(jnp.float32)
        norm = -jnp.log(jnp.maximum(count0 + count1, 1.0))

        valid_row = jnp.concatenate([mask0_, jnp.ones((batch, 1), dtype=bool)], axis=1)
        valid_col = jnp.concatenate([mask1_, jnp.ones((batch, 1), dtype=bool)], axis=1)
        log_a = jnp.where(valid_row, norm[:, None], _NEG_INF)
        log_a = log_a.at[:, -1].set(norm + jnp.log(jnp.maximum(count1, 1.0)))
        log_b = jnp.where(valid_col, norm[:, None], _NEG_INF)
        log_b = log_b.at[:, -1].set(norm + jnp.log(jnp.maximum(count0, 1.0)))
        norm_bc = norm[:, None, None]

    la, lb = _padded_marginals(log_a, log_b, rows, cols, rp, cp)
    log_P = _sinkhorn_from_padded(
        la, lb, M_pad, rows, cols, num_iters, interpret, blocked
    )
    return (log_P - norm_bc).astype(scores.dtype)
