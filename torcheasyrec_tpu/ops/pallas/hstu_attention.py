"""Pallas TPU kernel for HSTU pointwise-nonlinear attention.

Replaces the reference's Triton/CUTLASS jagged HSTU attention
(/root/reference/tzrec/ops/_triton/triton_hstu_attention.py,
_cuda/cutlass_hstu_attention.py). Because HSTU attention is
softmax-free (attn = SiLU(q.k^T * alpha) / scaling_seqlen), the
blockwise kernel is a pure accumulation — no flash rescaling — and the
backward splits into three independent accumulations (dv, dq, dk), each
its own kernel. Masking (causal + local window + contextual prefix +
target isolation) is computed in-register from broadcasted iotas +
scalar-prefetched per-sample lengths/num_targets, reproducing
pt_hstu_attention.py:23-75.

Layout: padded dense [B, N, H, D]; internally folded to [B, N, H*D]
(a free reshape) with a (batch, head, row-block) grid — each head is a
128-lane-aligned column slice, so NO transpose copies are materialized
on either side of the kernels. Falls back (NotImplementedError) for
tiny N so the caller uses the XLA path.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block sizes: larger blocks amortize the fori_loop's per-iteration
# overhead and fill the MXU pipeline; shapes not divisible fall back.
# TZREC_HSTU_BLOCK overrides for tuning sweeps.
import os as _os

_BLK = int(_os.environ.get("TZREC_HSTU_BLOCK", "512"))


def _block(n: int) -> int:
    for b in (_BLK, 512, 256, 128):
        if n % b == 0 and b <= n:
            return b
    return 128

BQ = 512  # default; per-call block size comes from _block(n)
BK = 512


def _mask_block(
    rows, cols, seq_len, n_targets, causal, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, sla_k1=0, sla_k2=0,
):
    """[bq, bk] bool mask for true row/col position blocks.

    Rows AND cols beyond ``seq_len`` are masked (matching
    ops/hstu.valid_attn_mask): padded rows produce zeros, never
    garbage, and contribute nothing to any gradient — which is what
    makes the seq-len loop bounds below safe regardless of what the
    upstream gradient carries in padded rows.
    """
    if sla_k1 > 0 or sla_k2 > 0:
        # Semi-Local Attention REPLACES the standard causal mask
        # (reference hstu_attention_utils.py build_sla_func_tensor):
        # history rows attend the global prefix + local causal window;
        # target rows attend all history only. Contextual rows are
        # plain history rows here (prefix attendance via eff_k2).
        eff_k2 = max(sla_k2, contextual_seq_len)
        h_bound = seq_len - (n_targets if n_targets is not None else 0)
        hist = (cols < jnp.minimum(eff_k2, rows + 1)) | (
            (cols >= jnp.maximum(eff_k2, rows - sla_k1 + 1))
            & (cols <= rows)
        )
        tgt = cols < h_bound
        is_hist = rows < h_bound
        # boolean algebra, not where(): mosaic can't truncate i8->i1
        # vectors for select_n on booleans
        mask = (is_hist & hist) | (~is_hist & tgt)
        return mask & (cols < seq_len) & (rows < seq_len)
    ids_r, ids_c = rows, cols
    max_ids = seq_len
    if contextual_seq_len > 0:
        ids_r = jnp.maximum(ids_r - contextual_seq_len + 1, 0)
        ids_c = jnp.maximum(ids_c - contextual_seq_len + 1, 0)
        max_ids = max_ids - contextual_seq_len + 1
    if n_targets is not None:
        max_ids = max_ids - n_targets
        ids_r = jnp.minimum(ids_r, max_ids)
        ids_c = jnp.minimum(ids_c, max_ids)
    dist = ids_r - ids_c
    if not causal:
        dist = jnp.abs(dist)
    mask = (rows == cols) | (dist > 0)
    if max_attn_len > 0:
        if min_full_attn_seq_len > 0:
            mask = mask & (
                (dist <= max_attn_len)
                | (ids_r >= max_ids - min_full_attn_seq_len)
            )
        else:
            mask = mask & (dist <= max_attn_len)
    if contextual_seq_len > 0:
        mask = mask | ((ids_r == 0) & (ids_c < max_ids))
    mask = mask & (cols < seq_len) & (rows < seq_len)
    return mask


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _fwd_kernel(
    lengths_ref, targets_ref, q_ref, k_ref, v_ref, o_ref,
    *, h, n, alpha, scale, causal, has_targets, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, bq, bk,
    sla_k1=0, sla_k2=0, folded=True,
):
    BQ, BK = bq, bk
    b = pl.program_id(0) if folded else pl.program_id(0) // h
    qi = pl.program_id(2)
    seq_len = lengths_ref[b]
    n_t = targets_ref[b] if has_targets else None
    q = q_ref[0]  # [BQ, D]
    rows = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)

    num_kb = n // BK
    sla = sla_k1 > 0 or sla_k2 > 0
    # contextual prefix rows attend ALL valid columns (reference
    # triton_hstu_attention.py:464-467 widens the loop for them), so the
    # causal block-bound only applies when there is no contextual
    # prefix. Under SLA contextual rows are plain history rows, so the
    # causal bound always holds.
    if causal and (contextual_seq_len == 0 or sla):
        num_kb_eff = qi + 1
    else:
        num_kb_eff = num_kb
    # jagged-equivalent bound: columns >= seq_len are masked in every
    # mask family, so kv blocks past ceil(seq_len/BK) contribute
    # nothing — each sample pays only its ACTUAL tokens (the
    # reference's Triton kernel gets this from jagged seq_offsets,
    # triton_hstu_attention.py seq_start/seq_end loop bounds)
    len_kb = (seq_len + BK - 1) // BK
    num_kb_eff = jnp.minimum(num_kb_eff, len_kb)
    h_bound = seq_len - (n_t if n_t is not None else 0)

    def compute_masked(kb, acc):
        kblk = k_ref[0, pl.ds(kb * BK, BK), :]
        vblk = v_ref[0, pl.ds(kb * BK, BK), :]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * alpha
        s = _silu(s) * (1.0 / scale)
        cols = kb * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        mask = _mask_block(
            rows, cols, seq_len, n_t, causal, max_attn_len,
            contextual_seq_len, min_full_attn_seq_len, sla_k1, sla_k2,
        )
        s = jnp.where(mask, s, 0.0)
        return acc + jax.lax.dot_general(
            s.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # measured: the mask's iota/compare work vanishes into the silu
    # pass's VPU time (A/B: dots 6.96 ms, +silu 9.20, +mask 9.18 at
    # BQ=BK=512), so there is no separate unmasked fast path
    compute = compute_masked

    # q blocks entirely past this sample's length output zeros without
    # touching kv (the row mask would zero them anyway)
    live = qi * BQ < seq_len

    @pl.when(jnp.logical_not(live))
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(live)
    def _():
        if sla:
            # two-phase iteration instead of scanning every causal
            # block: prefix blocks [0, n_pref) always; then window
            # blocks from max(n_pref, window_start) — unless this q
            # block holds target rows (they attend ALL history, so
            # fall back to a full scan)
            eff_k2 = max(sla_k2, contextual_seq_len)
            n_pref = jnp.minimum((eff_k2 + BK - 1) // BK, num_kb_eff)
            win_start = jnp.maximum(
                (qi * BQ - sla_k1 + 1) // BK, n_pref
            )
            has_tgt = (qi * BQ + BQ) > h_bound
            start2 = jnp.where(has_tgt, n_pref, win_start)
            acc = jnp.zeros((BQ, v_ref.shape[-1]), jnp.float32)
            acc = jax.lax.fori_loop(0, n_pref, compute, acc)
            acc = jax.lax.fori_loop(start2, num_kb_eff, compute, acc)
            o_ref[0] = acc.astype(o_ref.dtype)
        else:
            acc = jax.lax.fori_loop(
                0, num_kb_eff, compute,
                jnp.zeros((BQ, v_ref.shape[-1]), jnp.float32),
            )
            o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_dv_dk_kernel(
    lengths_ref, targets_ref, q_ref, k_ref, v_ref, do_ref,
    dv_ref, dk_ref, dq_ref,
    *, h, n, alpha, scale, causal, has_targets, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, bq, bk,
    sla_k1=0, sla_k2=0, folded=True,
):
    BQ, BK = bq, bk
    """grid (B, H, num_k_blocks): dv_j = sum_i s_ij^T do_i;
    dk_j = sum_i (ds_ij)^T q_i. FUSED dq: dq_i += ds_ij k_j accumulates
    into the full-[N, D] f32 output block, which Mosaic keeps resident
    in VMEM across the sequential ki steps of one (b, h) and writes
    back once — the separate dq kernel re-ran the z and dattn dots
    (2 of backward's 7), ~18 ms of a 194 ms DLRM-HSTU step."""
    b = pl.program_id(0) if folded else pl.program_id(0) // h
    ki = pl.program_id(2)
    seq_len = lengths_ref[b]
    n_t = targets_ref[b] if has_targets else None
    kblk = k_ref[0]  # [BK, D]
    vblk = v_ref[0]  # [BK, V]
    cols = ki * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)

    num_qb = n // BQ
    sla = sla_k1 > 0 or sla_k2 > 0
    # causal: only q blocks at or after this k block contribute — except
    # contextual rows (block 0..) which attend every column (under SLA
    # contextual rows are plain history rows, so causal always holds)
    start_qb = ki if (causal and (contextual_seq_len == 0 or sla)) else 0
    # rows >= seq_len are masked, so q blocks past ceil(seq_len/BQ)
    # contribute nothing (jagged-equivalent bound)
    len_qb = (seq_len + BQ - 1) // BQ
    end_qb = jnp.minimum(num_qb, len_qb)
    h_bound = seq_len - (n_t if n_t is not None else 0)

    # the dq block covers the whole sequence for this (b, h); zero it
    # once at the first ki step (dead samples stay zero throughout)
    @pl.when(ki == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def _qb_body(qi, carry, masked):
        dv, dk = carry
        qblk = q_ref[0, pl.ds(qi * BQ, BQ), :]
        doblk = do_ref[0, pl.ds(qi * BQ, BQ), :]
        z = jax.lax.dot_general(
            qblk, kblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * alpha
        if masked:
            rows = qi * BQ + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, BK), 0
            )
            mask = _mask_block(
                rows, cols, seq_len, n_t, causal, max_attn_len,
                contextual_seq_len, min_full_attn_seq_len, sla_k1, sla_k2,
            )
            s = jnp.where(mask, _silu(z) * (1.0 / scale), 0.0)
        else:
            s = _silu(z) * (1.0 / scale)
        dv = dv + jax.lax.dot_general(
            s.astype(doblk.dtype), doblk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dattn = jax.lax.dot_general(
            doblk, vblk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        dz = dattn * _dsilu(z) * (alpha / scale)
        if masked:
            dz = jnp.where(mask, dz, 0.0)
        dk = dk + jax.lax.dot_general(
            dz.astype(qblk.dtype), qblk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # fused dq accumulation (f32 read-modify-write in VMEM)
        dqi = jax.lax.dot_general(
            dz.astype(kblk.dtype), kblk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, pl.ds(qi * BQ, BQ), :] += dqi
        return dv, dk

    def compute_qb(qi, carry):
        return _qb_body(qi, carry, True)

    dv0 = jnp.zeros((BK, vblk.shape[-1]), jnp.float32)
    dk0 = jnp.zeros((BK, kblk.shape[-1]), jnp.float32)
    # k blocks entirely past this sample's length get zero grads
    # without touching q/do (their columns are masked everywhere)
    live = ki * BK < seq_len

    @pl.when(jnp.logical_not(live))
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
        dk_ref[0] = jnp.zeros_like(dk_ref[0])

    @pl.when(live)
    def _():
        if sla:
            eff_k2 = max(sla_k2, contextual_seq_len)
            # window: q rows within k1 of these columns, i.e. q blocks
            # [ki, ceil((ki*BK + BK - 1 + k1) / BQ)); prefix k blocks
            # are read by EVERY causal q block; then the trailing
            # target blocks (targets attend all history columns)
            win_end = jnp.minimum(
                (ki * BK + BK - 1 + sla_k1) // BQ + 1, end_qb
            )
            win_end = jnp.where(ki * BK < eff_k2, end_qb, win_end)
            tgt_start = jnp.maximum(h_bound // BQ, win_end)
            carry = jax.lax.fori_loop(
                start_qb, win_end, compute_qb, (dv0, dk0)
            )
            dv, dk = jax.lax.fori_loop(
                tgt_start, end_qb, compute_qb, carry
            )
        else:
            dv, dk = jax.lax.fori_loop(
                start_qb, end_qb, compute_qb, (dv0, dk0)
            )
        dv_ref[0] = dv.astype(dv_ref.dtype)
        dk_ref[0] = dk.astype(dk_ref.dtype)


def _prep(q, k, v, lengths, num_targets):
    # arrays stay [B, N, H, D]; the impls fold heads into the LANE dim
    # ([B, N, H*D], a free reshape) and the kernels block each head as
    # a 128-lane-aligned column slice — no [B, H, N, D] transpose
    # copies are ever materialized (they cost ~1.2 ms per 128 MB tensor
    # and dominated the old step trace)
    b = q.shape[0]
    lengths = lengths.astype(jnp.int32)
    targets = (
        num_targets.astype(jnp.int32)
        if num_targets is not None
        else jnp.zeros((b,), jnp.int32)
    )
    return q, k, v, lengths, targets


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12)
)
def _pallas_hstu_mha_core(
    q, k, v, length_targets, alpha, causal, has_targets, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, scaling_seqlen,
    sla_k1, sla_k2,
):
    return _fwd_impl(
        q, k, v, length_targets, alpha, causal, has_targets, max_attn_len,
        contextual_seq_len, min_full_attn_seq_len, scaling_seqlen,
        sla_k1, sla_k2,
    )


def _grid_spec(b, h, n, grid_axis1, out_shapes, n_inputs):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * h, grid_axis1),
        in_specs=[
            pl.BlockSpec(
                (1, None, None), lambda i, j, *_: (i, 0, 0),
                memory_space=pltpu.ANY,
            )
        ] * n_inputs,
        out_specs=out_shapes,
    )


def _fwd_impl(
    q, k, v, length_targets, alpha, causal, has_targets, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, scaling_seqlen,
    sla_k1=0, sla_k2=0,
):
    lengths, targets = length_targets
    b, n, h, d = q.shape
    vd = v.shape[-1]
    folded = d % 128 == 0 and vd % 128 == 0
    bq = bk = _block(n)
    kernel = functools.partial(
        _fwd_kernel, h=h, n=n, alpha=alpha, scale=float(scaling_seqlen),
        causal=causal, has_targets=has_targets, max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len, bq=bq, bk=bk,
        sla_k1=sla_k1, sla_k2=sla_k2, folded=folded,
    )
    if folded:
        # no-transpose path: heads fold into the lane dim (free
        # reshape); each head is a 128-lane-aligned column block
        qf = q.reshape(b, n, h * d)
        kf = k.reshape(b, n, h * d)
        vf = v.reshape(b, n, h * vd)
        grid = (b, h, n // bq)
        q_ix = lambda i, hh, j, *_: (i, j, hh)
        kv_ix = lambda i, hh, j, *_: (i, 0, hh)
    else:
        # head dim < 128 lanes cannot be column-blocked; fall back to
        # the transposed [B*H, N, D] layout (block dim == array dim)
        qf = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * h, n, vd)
        grid = (b * h, 1, n // bq)
        q_ix = lambda i, hh, j, *_: (i, j, 0)
        kv_ix = lambda i, hh, j, *_: (i, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), q_ix),
            pl.BlockSpec((1, n, d), kv_ix),
            pl.BlockSpec((1, n, vd), kv_ix),
        ],
        out_specs=pl.BlockSpec((1, bq, vd), q_ix),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qf.shape[:2] + (vf.shape[-1],),
                                       v.dtype),
    )(lengths, targets, qf, kf, vf)
    if folded:
        return out.reshape(b, n, h, vd)
    return out.reshape(b, h, n, vd).transpose(0, 2, 1, 3)


def _fwd_rule(
    q, k, v, length_targets, alpha, causal, has_targets, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, scaling_seqlen,
    sla_k1, sla_k2,
):
    out = _fwd_impl(
        q, k, v, length_targets, alpha, causal, has_targets, max_attn_len,
        contextual_seq_len, min_full_attn_seq_len, scaling_seqlen,
        sla_k1, sla_k2,
    )
    return out, (q, k, v, length_targets)


def _bwd_rule(
    alpha, causal, has_targets, max_attn_len, contextual_seq_len,
    min_full_attn_seq_len, scaling_seqlen, sla_k1, sla_k2, res, do,
):
    q, k, v, length_targets = res
    lengths, targets = length_targets
    b, n, h, d = q.shape
    vd = v.shape[-1]
    folded = d % 128 == 0 and vd % 128 == 0
    bq = bk = _block(n)
    common = dict(
        h=h, n=n, alpha=alpha, scale=float(scaling_seqlen), causal=causal,
        has_targets=has_targets, max_attn_len=max_attn_len,
        contextual_seq_len=contextual_seq_len,
        min_full_attn_seq_len=min_full_attn_seq_len, bq=bq, bk=bk,
        sla_k1=sla_k1, sla_k2=sla_k2, folded=folded,
    )
    if folded:
        qf = q.reshape(b, n, h * d)
        kf = k.reshape(b, n, h * d)
        vf = v.reshape(b, n, h * vd)
        dof = do.reshape(b, n, h * vd)
        grid_k = (b, h, n // bk)
        blk_ix = lambda i, hh, j, *_: (i, j, hh)
        full_ix = lambda i, hh, j, *_: (i, 0, hh)
    else:
        qf = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * h, n, vd)
        dof = do.transpose(0, 2, 1, 3).reshape(b * h, n, vd)
        grid_k = (b * h, 1, n // bk)
        blk_ix = lambda i, hh, j, *_: (i, j, 0)
        full_ix = lambda i, hh, j, *_: (i, 0, 0)
    # ONE fused pass: dv/dk per k-block + dq accumulated into a
    # VMEM-resident full-[N, D] f32 output block (zeroed at ki == 0,
    # flushed when (b, h) advances). The separate dq kernel re-ran the
    # z and dattn dots — 2 of backward's 7 matmuls.
    dv, dk, dq = pl.pallas_call(
        functools.partial(_bwd_dv_dk_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid_k,
            in_specs=[
                pl.BlockSpec((1, n, d), full_ix),
                pl.BlockSpec((1, bk, d), blk_ix),
                pl.BlockSpec((1, bk, vd), blk_ix),
                pl.BlockSpec((1, n, vd), full_ix),
            ],
            out_specs=[
                pl.BlockSpec((1, bk, vd), blk_ix),
                pl.BlockSpec((1, bk, d), blk_ix),
                pl.BlockSpec((1, n, d), full_ix),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(vf.shape, v.dtype),
            jax.ShapeDtypeStruct(kf.shape, k.dtype),
            jax.ShapeDtypeStruct(qf.shape, jnp.float32),
        ],
    )(lengths, targets, qf, kf, vf, dof)
    dq = dq.astype(q.dtype)
    if folded:
        return (
            dq.reshape(b, n, h, d),
            dk.reshape(b, n, h, d),
            dv.reshape(b, n, h, vd),
            None,
        )
    return (
        dq.reshape(b, h, n, d).transpose(0, 2, 1, 3),
        dk.reshape(b, h, n, d).transpose(0, 2, 1, 3),
        dv.reshape(b, h, n, vd).transpose(0, 2, 1, 3),
        None,
    )


_pallas_hstu_mha_core.defvjp(_fwd_rule, _bwd_rule)


def pallas_hstu_mha(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,  # [B, N, H, V]
    lengths: jnp.ndarray,  # [B]
    alpha: float,
    causal: bool = True,
    num_targets: Optional[jnp.ndarray] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
    scaling_seqlen: int = -1,
    sla_k1: int = 0,
    sla_k2: int = 0,
) -> jnp.ndarray:
    b, n, h, d = q.shape
    if n % 128 != 0 or n < 128:
        raise NotImplementedError(
            f"pallas path needs N % 128 == 0, got {n}"
        )
    if scaling_seqlen == -1:
        scaling_seqlen = n
    qf, kf, vf, lengths_i, targets = _prep(q, k, v, lengths, num_targets)
    # output is already [B, N, H, V] — no layout change on either side
    return _pallas_hstu_mha_core(
        qf, kf, vf, (lengths_i, targets), float(alpha), bool(causal),
        num_targets is not None, int(max_attn_len),
        int(contextual_seq_len), int(min_full_attn_seq_len),
        int(scaling_seqlen), int(sla_k1), int(sla_k2),
    )
