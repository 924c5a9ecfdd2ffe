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

import jax
import jax.numpy as jnp

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


class _KVPadMask(_mask_lib.Mask):
    """Lazy mask that hides the last ``S - valid`` *KV columns* (sequence
    padding). Rows are NOT masked: padded q rows attend to the real tokens,
    producing finite garbage that the caller slices away — fully-masked rows
    would yield l=0 and NaNs that poison dKV in the backward. Only the edge
    block-column is partial, so interior blocks keep the maskless fast path.
    """

    def __init__(self, S: int, valid: int):
        self._shape = (S, S)
        self.valid = valid

    @property
    def shape(self):
        return self._shape

    def __getitem__(self, idx):
        import numpy as np

        i, j = idx
        cols = np.arange(self._shape[1])[j]
        block = np.broadcast_to(cols[None, :] < self.valid, (len(np.arange(self._shape[0])[i]), len(cols)))
        return np.ascontiguousarray(block)

    def __eq__(self, other):
        return isinstance(other, _KVPadMask) and (self._shape, self.valid) == (other._shape, other.valid)

    def __hash__(self):
        return hash((type(self), self._shape, self.valid))


@functools.lru_cache(maxsize=16)
def _splash_spec(S: int, H: int, valid: int, fused_bwd: bool, bwd_block: int, conservative: bool):
    """Cache only the (hashable) mask + block config; the kernel itself is
    built fresh per trace — caching the kernel object leaks traced mask-info
    arrays across jit traces.

    Block sizes tuned on v5e at S=18432 / 48 heads / head_dim 64
    (scripts/tune_splash_bwd.py): fwd q1024/kv2048/compute512 56.7 ms (vs
    62.5 at kv1024); fused bwd q2048/kv2048/compute512 119.2 ms (vs 127.2 at
    1024/1024) — fwd+bwd 175.9 ms vs 189.7. Each size is capped at S; callers
    pad S to a multiple of _SPLASH_BLOCK so every block divides S.
    kv_compute at 512 keeps the scores tile inside splash's fixed 16 MB
    scoped-vmem stack, which full-block compute can exceed when surrounding
    remat fusions share the budget (seen at 42 layers).

    ``bwd_block`` is 2048 when the kernel is called once per data-batch
    element (the head grid absorbs attention windows, see _splash); a vmapped
    batch dimension > 1 blew the 16 MB scoped-vmem stack at 2048x2048 dkv
    (measured 45 MB) and keeps the proven 1024 blocks.

    ``conservative`` caps every block at 1024: under scan-over-layers the
    kernel shares the scoped-vmem stack with the surrounding while-loop remat
    fusions, and the tuned fwd kv2048 config overflows it (20 MB > 16 MB,
    seen at 42 layers with --scan-layers)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as splash
    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_mask as mask_lib

    base = mask_lib.FullMask(_shape=(S, S)) if valid == S else _KVPadMask(S, valid)
    mask = mask_lib.MultiHeadMask([base for _ in range(H)])
    cap = lambda b: min(b, S if not conservative else min(S, 1024))
    # The conservative profile also halves the compute tile: at 6 windows the
    # lean 1024/512 stack still measured 16.26 MB (268 KB over the 16 MB
    # scoped limit, seen at the 18 s stage); 256 puts every windowed stage
    # comfortably under.
    kv_compute = cap(512 if not conservative else 256)
    bs = splash.BlockSizes(
        block_q=cap(1024), block_kv=cap(2048), block_kv_compute=kv_compute,
        block_q_dkv=cap(bwd_block), block_kv_dkv=cap(bwd_block), block_kv_dkv_compute=kv_compute,
        block_q_dq=None if fused_bwd else cap(1024),
        block_kv_dq=None if fused_bwd else kv_compute,
        use_fused_bwd_kernel=fused_bwd,
    )
    return mask, bs


def _bwd_block(batch: int) -> int:
    return 2048 if batch == 1 else 1024


def _eff_bwd_block(batch: int, S: int, conservative: bool) -> int:
    """The block_kv_dkv the kernel will actually use: _bwd_block capped by S
    and by the conservative profile's 1024 ceiling (mirrors _splash_spec's
    cap())."""
    b = min(_bwd_block(batch), S)
    return min(b, 1024) if conservative else b


# v5e usable HBM (15.75 GB after system reserve, from compiler OOM reports).
_HBM_BYTES = int(15.75 * 1024**3)


def _fused_bwd_ok(batch: int, S: int, H: int, F: int, bwd_block: int,
                  param_count: int = 0, reserved_bytes: int = 0) -> bool:
    """The fused splash backward materializes per-kv-block dQ partials
    [batch, S/block_kv_dkv, H, S, F]; decide whether that stack fits next to
    the training state. ``bwd_block`` must be the block size the kernel will
    actually run (_eff_bwd_block) — the conservative profile halves it,
    doubling the partials stack. The separate-dq backward is ~25-34 % slower
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


def _splash_kernel(S: int, H: int, valid: int, fused_bwd: bool, bwd_block: int, conservative: bool = False):
    from jax.experimental.pallas.ops.tpu.splash_attention import splash_attention_kernel as splash

    mask, bs = _splash_spec(S, H, valid, fused_bwd, bwd_block, conservative)
    # residual_checkpoint_name tags the kernel's residuals (out + logsumexp)
    # so the save_seq remat policy (models/dit/dit.py:_ckpt_policy) can keep
    # them: the splash forward is then never recomputed in the backward pass
    # of a rematted layer (q/k/v residuals are rebuilt from the cheap dense
    # projections instead). Inert without a policy naming it.
    return splash.make_splash_mha(
        mask=mask, head_shards=1, q_seq_shards=1, block_sizes=bs, interpret=_INTERPRET,
        residual_checkpoint_name="splash_residuals",
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
    lean = conservative or B > 1
    fused = _fused_bwd_ok(B, S, Ht, F, _eff_bwd_block(B, S, lean), param_count, reserved_bytes)
    kernel = _splash_kernel(S, Ht, S, fused, _bwd_block(B), lean)
    scale = 1.0 / (F**0.5)
    # [B*C, S, H, F] -> [B*C, H, S, F] -> [B, C*H, S, F] (the reshape is
    # free: C and H are adjacent after the transpose).
    to_hsd = lambda t: jnp.transpose(t, (0, 2, 1, 3)).reshape(B, Ht, S, F)
    out = jax.vmap(kernel)((to_hsd(q) * scale).astype(q.dtype), to_hsd(k), to_hsd(v))
    return jnp.transpose(out.reshape(BC, H, S, F), (0, 2, 1, 3))


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
    lean = conservative or B > 1
    fused = _fused_bwd_ok(B, Sp, Ht, F, _eff_bwd_block(B, Sp, lean), param_count, reserved_bytes)
    kernel = _splash_kernel(Sp, Ht, S, fused, _bwd_block(B), lean)
    scale = 1.0 / (F**0.5)
    to_hsd = lambda t: jnp.transpose(t, (0, 2, 1, 3)).reshape(B, Ht, Sp, F)
    out = jax.vmap(kernel)((to_hsd(qp) * scale).astype(q.dtype), to_hsd(kp), to_hsd(vp))
    return jnp.transpose(out.reshape(BC, H, Sp, F), (0, 2, 1, 3))[:, :S]


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
    if jax.default_backend() == "tpu" and q.dtype == jnp.bfloat16:
        return _splash_padded(q, k, v, block=_SPLASH_BLOCK, conservative=conservative,
                              windows=windows, param_count=param_count,
                              reserved_bytes=reserved_bytes)
    return _chunked(q, k, v)
