"""Memory-efficient attention dispatch.

The reference relies on torch SDPA (flash) per attention window
(reference: ttt/models/cogvideo/dit.py:196-198). A 3-second window is 18,048
tokens — naive XLA attention would materialize an O(S^2) score tensor
(~20 GB at bf16x16 heads), so beyond a threshold we switch to a q-block
chunked attention with rematerialization: each block computes
softmax(q_b k^T) v with only O(block * S) live memory, and the backward pass
recomputes block scores instead of storing them.

A Pallas splash-attention path (jax.experimental.pallas splash kernel) is used
on TPU for long windows when shapes allow.
"""

from __future__ import annotations

import functools
import math
import re
import warnings

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ttt_video_dit_tpu.parallel.mesh import FSDP, REPLICA, TENSOR, current_mesh, target_platform

# Above this key length, avoid materializing the full score matrix.
_CHUNK_THRESHOLD = 4096
_BLOCK_Q = 512


def _direct(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


@functools.partial(jax.jit, static_argnames=("block_q",))
def _chunked(q, k, v, block_q: int = _BLOCK_Q):
    """q/k/v: [B, S, H, F] (BTNH). Sequential over q blocks, full KV per block."""
    B, S, H, F = q.shape
    pad = (-S) % block_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nq = q.shape[1] // block_q
    q_blocks = jnp.moveaxis(q.reshape(B, nq, block_q, H, F), 1, 0)

    @jax.checkpoint
    def one_block(qb):
        return jax.nn.dot_product_attention(qb, k, v)

    out = jax.lax.map(one_block, q_blocks)  # [nq, B, block_q, H, F]
    out = jnp.moveaxis(out, 0, 1).reshape(B, nq * block_q, H, F)
    return out[:, :S]


from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_mask as _mask_lib


class _KVPadMask(_mask_lib._ComputableMask):
    """Lazy mask that hides the last ``S - valid`` *KV columns* (sequence
    padding). Rows are NOT masked: padded q rows attend to the real tokens,
    producing finite garbage that the caller slices away — fully-masked rows
    would yield l=0 and NaNs that poison dKV in the backward. Only the edge
    block-column is partial, so interior blocks keep the maskless fast path.

    Computable (``kv_ids < valid`` from in-kernel iota) rather than
    materialized: a materialized partial-mask tile lives in the kernel's
    scoped VMEM and grows with block_kv — at the round-3 fwd kv9216 block it
    pushed the kernel stack to 84.5 MB (vs ~64 MB with the mask computed
    in-register)."""

    def __init__(self, S: int, valid: int):
        self.valid = valid

        def kv_pad_mask_function(q_ids, kv_ids):
            return kv_ids < valid

        super().__init__(shape=(S, S), mask_function=kv_pad_mask_function)

    def __eq__(self, other):
        return isinstance(other, _KVPadMask) and (self.shape, self.valid) == (other.shape, other.valid)

    def __hash__(self):
        return hash((type(self), self.shape, self.valid))


def _fwd_kv_blocks(S: int, conservative: bool) -> tuple[int, int]:
    """Forward (block_kv, block_kv_compute) for a padded sequence length.

    Tuned on v5e at S=18432 / 48 heads / head_dim 64 at the framework's
    64 MB scoped-vmem limit (scripts/tune_splash_bwd.py, round 3): large KV
    blocks amortize the per-block softmax rescale bookkeeping that dominates
    at head_dim 64 — fwd q1024/kv9216/c1024 51.4 ms vs 56.9 ms for the old
    kv2048/c512 profile (81.2 vs 73.4 TF/s; full-block kv18432 regresses to
    57.9 ms, and c512/c2048 compute tiles lose ~2-4 ms to c1024). Splash
    requires block_kv to divide S: callers pad S to a multiple of
    _SPLASH_BLOCK=2048, and 9216/6144 divide such an S only when S/2048 is
    divisible by 9/3 — true at every curriculum stage (the per-window
    sequence is text+17550 video tokens, padded to 18432) — with kv2048 as
    the general fallback."""
    if conservative:
        return min(S, 1024), min(S, 256)
    for kv in (9216, 6144):
        if S % kv == 0:
            return kv, 1024
    return min(S, 2048), min(S, 512)


@functools.lru_cache(maxsize=16)
def _splash_spec(S: int, H: int, valid: int, fused_bwd: bool, bwd_block: int, fwd_lean: bool, bwd_lean: bool):
    """Cache only the (hashable) mask + block config; the kernel itself is
    built fresh per trace — caching the kernel object leaks traced mask-info
    arrays across jit traces.

    Forward blocks come from _fwd_kv_blocks (tuned round 3 at the 64 MB
    scoped-vmem limit). Fused backward tuned at S=18432/H=48
    (scripts/tune_splash_bwd.py): q_dkv 1024 / kv_dkv 6144 / compute 1024
    measures 115.8 ms vs 119.2 ms for the old q2048/kv2048/c512 — and the
    3x-larger kv_dkv shrinks the fused dQ-partials stack
    [S/block_kv_dkv, H, S, F] by 3x (see _fused_bwd_ok), which is what lets
    deep-remat configs keep the fused path. kv_dkv 6144 applies only when it
    divides S (always true at the curriculum stages); otherwise the proven
    ``bwd_block`` square profile.

    ``bwd_block`` is 2048 when the kernel is called once per data-batch
    element (the head grid absorbs attention windows, see _splash); a vmapped
    batch dimension > 1 blew a 16 MB scoped-vmem stack at 2048x2048 dkv
    (measured 45 MB) and keeps the proven 1024 blocks.

    ``conservative`` caps every block at 1024 (fwd compute at 256): under
    scan-over-layers the kernel shares the scoped-vmem stack with the
    surrounding while-loop remat fusions, and the tuned fwd config overflows
    it (seen at 42 layers with --scan-layers; at 6 windows even the lean
    1024/512 stack measured 268 KB over a 16 MB limit)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as splash
    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_mask as mask_lib

    base = mask_lib.FullMask(_shape=(S, S)) if valid == S else _KVPadMask(S, valid)
    mask = mask_lib.MultiHeadMask([base for _ in range(H)])
    cap = lambda b, lean: min(b, S if not lean else min(S, 1024))
    fwd_kv, fwd_compute = _fwd_kv_blocks(S, fwd_lean)
    q_dkv, kv_dkv, dkv_compute = _bwd_blocks(S, bwd_block, bwd_lean, fused_bwd)
    bs = splash.BlockSizes(
        block_q=cap(1024, fwd_lean), block_kv=fwd_kv, block_kv_compute=fwd_compute,
        block_q_dkv=q_dkv, block_kv_dkv=kv_dkv, block_kv_dkv_compute=dkv_compute,
        block_q_dq=None if fused_bwd else cap(1024, bwd_lean),
        block_kv_dq=None if fused_bwd else cap(512 if not bwd_lean else 256, bwd_lean),
        use_fused_bwd_kernel=fused_bwd,
    )
    return mask, bs


def _bwd_block(batch: int) -> int:
    return 2048 if batch == 1 else 1024


def _bwd_blocks(S: int, bwd_block: int, conservative: bool, fused_bwd: bool = True):
    """(block_q_dkv, block_kv_dkv, block_kv_dkv_compute) the kernel runs.

    The tuned fused profile is q_dkv 1024 / kv_dkv 6144 / compute 1024
    (115.8 ms vs 119.2 for the square 2048/c512 profile at S=18432/H=48, and
    a 3x smaller dQ-partials stack). It applies only on the fused path
    (the separate-dq dkv kernel was not measured with a rectangular profile)
    at the full ``bwd_block`` budget (B==1) when 6144 divides S; everything
    else keeps the proven square ``bwd_block`` profile. The conservative
    profile caps at 1024/compute 256 (see _splash_spec)."""
    if conservative:
        b = min(S, 1024)
        return b, b, min(S, 256)
    if fused_bwd and bwd_block == 2048 and S % 6144 == 0:
        return min(S, 1024), 6144, 1024
    b = min(S, bwd_block)
    return b, b, min(S, 512)


def _eff_kv_dkv(batch: int, S: int, conservative: bool) -> int:
    """The block_kv_dkv the *fused* kernel would use — sizes the fused
    dQ-partials stack in _fused_bwd_ok (partials shrink as kv_dkv grows)."""
    return _bwd_blocks(S, _bwd_block(batch), conservative, fused_bwd=True)[1]


# v5e usable HBM (15.75 GB after system reserve, from compiler OOM reports).
_HBM_BYTES = int(15.75 * 1024**3)


def _fused_bwd_ok(batch: int, S: int, H: int, F: int, bwd_block: int,
                  param_count: int = 0, reserved_bytes: int = 0) -> bool:
    """The fused splash backward materializes per-kv-block dQ partials
    [batch, S/block_kv_dkv, H, S, F]; decide whether that stack fits next to
    the training state. ``bwd_block`` must be the block_kv_dkv the kernel will
    actually run (_eff_kv_dkv): 6144 on the tuned fused profile, 1024 on the
    conservative profile (a 6x larger partials stack). The separate-dq backward is ~25-34 % slower
    on the attention bwd (scripts/tune_splash_bwd.py) but O(batch * S * F)
    in memory.

    Sizing is in PADDED bytes: the lane dim pads to 128, so head_dim-64
    partials occupy 2x their logical size (seen as "2.0x expansion" in
    compiler OOM dumps — an unpadded 1.9 GB stack at d3072 x 4L scan-layers
    was really 3.8 GB and OOMed).

    The budget subtracts the training state (~12 B/param: fp32 params + Adam
    m/v) from HBM with a 5 GB margin for non-partials HLO temps (the d3072 x
    4L scan-layers OOM dump shows ~6.3 GB of temps besides the partials;
    unrolled remat=block fit with ~5 GB), clamped to [2.25 GB, 4 GB]. The
    floor keeps the tuned fused path at flagship width where remat frees
    activation headroom (d3072 x 4L remat=block measured fitting with a
    2.03 GB padded stack); the ceiling reflects the largest measured-fitting
    stack (63 s d256, 3.56 GB padded, 1.30x step-time win over
    separate-dq).

    ``reserved_bytes`` is HBM the save_seq remat policy keeps live across all
    rematted layers (splash out+lse, TTT outputs + state checkpoints —
    models/dit/dit.py:_policy_reserved_bytes). The 2.25 GB floor does not
    apply then: the floor models remat-freed activation headroom, which the
    policy spends on the saved residuals instead (d3072 x 4L with save_seq
    measured OOM by only ~130-160 MB with the fused stack — separate-dq
    fits)."""
    F_padded = -(-F // 128) * 128
    partials = batch * (S // bwd_block) * H * S * F_padded * 2  # bf16, padded
    free = _HBM_BYTES - 12 * param_count - 5 * 1024**3 - reserved_bytes
    floor = int(2.25 * 1024**3) if reserved_bytes == 0 else 0
    budget = min(4 * 1024**3, max(free, floor))
    return partials <= budget


# Tests monkeypatch this to True to run the splash kernels on CPU in pallas
# interpret mode (tiny shapes) — e.g. folded-window parity vs naive softmax.
_INTERPRET = False


@functools.lru_cache(maxsize=1)
def _check_splash_abi() -> None:
    """Fail loudly at first use if the splash library's private residual ABI
    moved. ``call_bwd`` below hand-builds the positional residual 9-tuple
    (q, k, v, segment_ids, sinks, out, logsumexp, dq_mi, dkv_mi) and reads
    grads from positions 3-5 of the backward's 8-tuple return; that tuple
    recently grew a 'sinks' field, so a JAX upgrade could silently reorder or
    extend it and corrupt gradients instead of erroring. Checked once per
    process against the library's own type aliases/annotations."""
    import inspect
    import typing

    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as splash

    res_fields = typing.get_args(splash.SplashResidualsType)
    if len(res_fields) != 9:
        raise RuntimeError(
            "splash ABI drift: SplashResidualsType has "
            f"{len(res_fields)} fields, expected 9 (q, k, v, segment_ids, "
            "sinks, out, logsumexp, dq_mask_info, dkv_mask_info). Re-derive "
            "ops/attention.py:call_bwd against this JAX version."
        )
    src = inspect.getsource(splash._splash_attention_bwd)
    unpack = re.sub(r"\s+", " ", src)
    expected = "( q, k, v, segment_ids, sinks, o, logsumexp, dq_mask_info, dkv_mask_info, ) = res"
    if expected not in unpack:
        raise RuntimeError(
            "splash ABI drift: _splash_attention_bwd no longer unpacks the "
            "residual tuple in the (q, k, v, segment_ids, sinks, o, "
            "logsumexp, dq_mask_info, dkv_mask_info) order that "
            "ops/attention.py:call_bwd builds. Re-derive call_bwd."
        )


def _splash_kernel(S: int, H: int, valid: int, fused_bwd: bool, bwd_block: int, fwd_lean: bool = False, bwd_lean: bool = False):
    """Splash call with TOKEN-MAJOR saved residuals: (q, k, v) [H, S, F] ->
    out [S, H*F].

    The library's own residual_checkpoint_name tags the kernel-layout out
    [H, S, F]; saved across a remat boundary that buffer HBM-tiles at
    T(8,128) with the head_dim-64 lane dim padded to 128 — pure 2x padding
    (the 63 s/3 s pod-scale AOT memory analysis showed an 8.86 GB stacked
    save that is 4.43 GB of padding at 42 layers). Instead this wrapper owns
    the custom VJP: it tags a [S, H*F] reshape of out (lanes full for every
    real config) plus the [H, S] logsumexp under "splash_residuals", stashes
    exactly (q, k, v, out_tm, lse), and hands the rebuilt kernel-layout
    residuals to the library backward (same Pallas dq/dkv kernels, same
    block config). Under the save_seq policy (models/dit/dit.py:_ckpt_policy)
    the splash forward is then DCE'd from a rematted layer's backward —
    q/k/v rebuild from the cheap dense projections — and the saved buffer is
    unpadded. Inert without a policy naming it.

    Reference parity note: the reference re-runs flash-attention fwd inside
    its checkpointed blocks (ttt/models/cogvideo/dit.py:196-198 under
    torch.utils.checkpoint); this is the TPU-shaped improvement on that."""
    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as splash

    _check_splash_abi()
    mask, bs = _splash_spec(S, H, valid, fused_bwd, bwd_block, fwd_lean, bwd_lean)
    res_kernel = splash.make_splash_mha(
        mask=mask, head_shards=1, q_seq_shards=1, block_sizes=bs, interpret=_INTERPRET,
        save_residuals=True,
    )
    kw = res_kernel.kwargs  # statics only: block sizes / mask fn / flags

    def to_tm(out):  # [H, S, F] -> [S, H*F]
        h, s, f = out.shape
        return jnp.transpose(out, (1, 0, 2)).reshape(s, h * f)

    def to_hm(out_tm, H):  # [S, H*F] -> [H, S, F]
        s, hf = out_tm.shape
        return jnp.transpose(out_tm.reshape(s, H, hf // H), (1, 0, 2))

    # The mask infos are ARGUMENTS of the custom_vjp, never closure: their
    # jnp arrays are created at trace time, and a closed-over copy replayed
    # by a remat backward escapes the dead checkpoint trace
    # (UnexpectedTracerError on any `--remat layer` run) — the library
    # threads them through its own custom_vjp positions for the same reason
    # (splash_attention_kernel.py:_splash_attention_custom's comment).
    @jax.custom_vjp
    def call(fwd_mi, dq_mi, dkv_mi, q, k, v):
        # Primal twin without the logsumexp output: pure-forward callers
        # (sampling) skip the [H, S, lanes] f32 lse write the residual
        # kernel does.
        primal = splash.SplashAttentionKernel(fwd_mi, dq_mi, dkv_mi,
                                              **{**kw, "save_residuals": False})
        return to_tm(primal(q, k, v))

    def call_fwd(fwd_mi, dq_mi, dkv_mi, q, k, v):
        k_res = splash.SplashAttentionKernel(fwd_mi, dq_mi, dkv_mi, **kw)
        out, (lse,) = k_res(q, k, v)
        out_tm = jax.ad_checkpoint.checkpoint_name(to_tm(out), "splash_residuals")
        lse = jax.ad_checkpoint.checkpoint_name(lse, "splash_residuals")
        return out_tm, (q, k, v, out_tm, lse, dq_mi, dkv_mi)

    def call_bwd(res, do_tm):
        q, k, v, out_tm, lse, dq_mi, dkv_mi = res
        H = q.shape[0]
        # Library backward, called with the residual tuple its own custom_vjp
        # stashes (jax/experimental/pallas/ops/tpu/splash_attention/
        # splash_attention_kernel.py:_splash_attention_fwd) — grads land at
        # the q/k/v positions of its 8-tuple return.
        grads = splash._splash_attention_bwd(
            False, kw["mask_value"], kw["is_mqa"], kw["block_sizes"], None,
            kw["mask_function"], kw["attn_logits_soft_cap"], kw["interpret"],
            (q, k, v, None, None, to_hm(out_tm, H), lse, dq_mi, dkv_mi),
            to_hm(do_tm, H),
        )
        return None, None, None, grads[3], grads[4], grads[5]

    call.defvjp(call_fwd, call_bwd)
    return functools.partial(
        call, res_kernel.fwd_mask_info, res_kernel.dq_mask_info, res_kernel.dkv_mask_info
    )


# Padding granularity: the lcm of the tuned q/kv block sizes in _splash_spec
# (sequences are padded up to a multiple of this; at the 3 s geometry
# 18048 -> 18432, a 2.1% overhead the KV-column mask hides exactly).
_SPLASH_BLOCK = 2048


def _splash(q, k, v, conservative: bool = False, windows: int = 1, param_count: int = 0,
            reserved_bytes: int = 0):
    """Pallas splash (flash) attention: q/k/v [B*windows, S, H, F] (bf16), S
    already a multiple of the tuned block sizes (callers pad via
    _splash_padded).

    ``windows`` folds a leading batch-of-attention-windows dimension into the
    kernel's native head grid: [B*C, S, H, F] -> one call per data-batch
    element with C*H pseudo-heads, every pseudo-head carrying the same lazy
    mask (mask_info dedupes identical head masks, so trace cost is flat).
    This replaces the old jax.vmap-over-windows dispatch, which forced the
    vmem-lean block profile (vmapped kernels measured 22-45 MB scoped-vmem
    stacks at the tuned 2048 blocks) — the head grid is the dimension the
    kernel already iterates, so the per-program footprint is identical to the
    single-window flagship case and the tuned blocks apply at every
    curriculum stage. (The alternative — flattening windows into one C*S
    sequence under a block-diagonal mask — grows the fused backward's dense
    dQ-partials scratch [kv_blocks, H, S, F] quadratically in C; the head
    fold keeps it linear.)"""
    BC, S, H, F = q.shape
    assert BC % windows == 0, f"batch {BC} not divisible by windows {windows}"
    B = BC // windows
    Ht = windows * H
    # Backward leanness also triggers at B > 1 (the vmapped dkv stack);
    # forward blocks have no dkv stack, so only scan-layers (conservative)
    # makes the forward lean — CFG sampling (B=2, forward-only) keeps the
    # tuned forward profile.
    bwd_lean = conservative or B > 1
    fused = _fused_bwd_ok(B, S, Ht, F, _eff_kv_dkv(B, S, bwd_lean), param_count, reserved_bytes)
    kernel = _splash_kernel(S, Ht, S, fused, _bwd_block(B), conservative, bwd_lean)
    scale = 1.0 / (F**0.5)
    # [B*C, S, H, F] -> [B*C, H, S, F] -> [B, C*H, S, F] (the reshape is
    # free: C and H are adjacent after the transpose).
    to_hsd = lambda t: jnp.transpose(t, (0, 2, 1, 3)).reshape(B, Ht, S, F)
    out_tm = jax.vmap(kernel)((to_hsd(q) * scale).astype(q.dtype), to_hsd(k), to_hsd(v))
    # token-major [B, S, (C H F)] -> [B*C, S, H, F]
    out = jnp.transpose(out_tm.reshape(B, S, windows, H * F), (0, 2, 1, 3))
    return out.reshape(BC, S, H, F)


def _splash_padded(q, k, v, block: int, conservative: bool = False, windows: int = 1,
                   param_count: int = 0, reserved_bytes: int = 0):
    """Splash attention at an arbitrary S: pad the sequence up to a multiple
    of ``block`` and mask the padded KV columns (exact — real rows never see
    pad tokens). Larger blocks amortize per-block softmax bookkeeping, which
    dominates at head_dim 64 where the matmuls are small."""
    BC, S, H, F = q.shape
    Sp = -(-S // block) * block
    if Sp == S:
        return _splash(q, k, v, conservative, windows, param_count, reserved_bytes)
    pad = ((0, 0), (0, Sp - S), (0, 0), (0, 0))
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    B = BC // windows
    Ht = windows * H
    bwd_lean = conservative or B > 1  # see _splash on the fwd/bwd split
    fused = _fused_bwd_ok(B, Sp, Ht, F, _eff_kv_dkv(B, Sp, bwd_lean), param_count, reserved_bytes)
    kernel = _splash_kernel(Sp, Ht, S, fused, _bwd_block(B), conservative, bwd_lean)
    scale = 1.0 / (F**0.5)
    to_hsd = lambda t: jnp.transpose(t, (0, 2, 1, 3)).reshape(B, Ht, Sp, F)
    out_tm = jax.vmap(kernel)((to_hsd(qp) * scale).astype(q.dtype), to_hsd(kp), to_hsd(vp))
    out = jnp.transpose(out_tm.reshape(B, Sp, windows, H * F), (0, 2, 1, 3))
    return out.reshape(BC, Sp, H, F)[:, :S]


def attention(q, k, v, conservative: bool = False, windows: int = 1, param_count: int = 0,
              reserved_bytes: int = 0):
    """Dispatching attention: q/k/v [B, S, H, F] -> [B, S, H, F].

    Long windows on TPU take the splash (flash) kernel, padded up to a
    multiple of the tuned block size with the pad KV columns masked — large
    blocks amortize the per-block softmax bookkeeping that dominates at
    head_dim 64 (1.55x over the divisor-constrained block choice on v5e).
    ``conservative`` selects vmem-lean 1024 blocks (scan-over-layers).
    ``windows`` marks a leading batch-of-windows factor (batch = B*windows):
    on the splash path the windows fold into the kernel's head grid (one
    call, tuned blocks) instead of a vmap; the non-splash paths batch over
    them natively. ``param_count`` (model total, see
    ModelConfig.approx_param_count) sizes the fused-backward scratch budget
    against the HBM the training state occupies; ``reserved_bytes`` further
    reserves HBM the save_seq remat policy keeps live (_fused_bwd_ok)."""
    S = k.shape[1]
    if S <= _CHUNK_THRESHOLD:
        return _direct(q, k, v)
    if target_platform() == "tpu" and q.dtype == jnp.bfloat16:
        return _splash_dispatch(q, k, v, block=_SPLASH_BLOCK, conservative=conservative,
                                windows=windows, param_count=param_count,
                                reserved_bytes=reserved_bytes)
    return _chunked(q, k, v)


def _splash_dispatch(q, k, v, *, block, conservative, windows, param_count, reserved_bytes):
    """GSPMD has no partitioning rule for ``pallas_call``: under an ambient
    mesh the splash kernel must run inside shard_map over the batch
    (replica/fsdp) and head (tensor) axes — the attention analog of
    ops/pallas/sharded.py for the TTT kernels. Each shard keeps WHOLE samples
    (the windows fold needs its local batch divisible by ``windows``), so the
    data axes must divide the sample batch B = batch/windows; heads split when
    tensor divides H. Per-window attention needs no collectives."""
    call = functools.partial(_splash_padded, block=block, conservative=conservative,
                             windows=windows, param_count=param_count,
                             reserved_bytes=reserved_bytes)
    mesh = current_mesh()
    if mesh is None or all(mesh.shape[a] <= 1 for a in mesh.axis_names):
        return call(q, k, v)
    BC, _, H, _ = q.shape
    B = BC // windows
    data = tuple(a for a in (REPLICA, FSDP) if a in mesh.axis_names and mesh.shape[a] > 1)
    if data and B % math.prod(mesh.shape[a] for a in data) != 0:
        data = ()
    tp = TENSOR if (TENSOR in mesh.axis_names and mesh.shape[TENSOR] > 1
                    and H % mesh.shape[TENSOR] == 0) else None
    if not data and tp is None:
        # No legal shard_map spec: GSPMD cannot partition pallas_call, so
        # this compiles via replicate-and-reslice (every chip runs the full
        # attention) or fails outright. Loud, like the involuntary-remat
        # check in scripts/aot_scale_check.py.
        warnings.warn(
            f"splash attention cannot be shard_mapped on mesh {dict(mesh.shape)}: "
            f"data axes do not divide the sample batch {B} and tensor does not "
            f"divide {H} heads — the kernel will run fully replicated per chip",
            RuntimeWarning,
            stacklevel=3,
        )
        return call(q, k, v)
    spec = P(data or None, None, tp, None)
    fn = jax.shard_map(call, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False)
    return fn(q, k, v)
