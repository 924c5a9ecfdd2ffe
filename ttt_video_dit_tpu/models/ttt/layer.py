"""TTT (test-time-training) fast-weight layers as flax modules.

TPU-first re-design of the reference's ``TTTBase``/``TTTLinear``/``TTTMLP``
(reference: ttt/models/ssm/ttt_layer.py:53-473). The projection/eta/target
preprocessing is plain jnp (XLA fuses it); the inner loop dispatches either to
the pure ``lax.scan`` oracle (ops/ttt_scan.py) or the Pallas TPU kernels
(ops/pallas/*), which replace the reference's Triton / ThunderKittens kernels.

Tensor-parallel head sharding is expressed as sharding constraints on the
``heads`` axis (mesh axis "tensor") instead of DTensor parameter wrapping
(reference: ttt/models/ssm/ttt_layer.py:114-132).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttt_video_dit_tpu.config.model_config import ModelConfig
from ttt_video_dit_tpu.models.sequence import SequenceMetadata
from ttt_video_dit_tpu.models.ttt.interleave import interleave, undo_interleave
from ttt_video_dit_tpu.ops import ttt_scan
from ttt_video_dit_tpu.ops.rope import (
    apply_rope,
    interleaved_tables_prefixed,
    precompute_rope_3d,
)
from ttt_video_dit_tpu.parallel.mesh import DATA, TENSOR, maybe_shard, shard_boundary

_init_normal = nn.initializers.normal(stddev=0.02)


class TTTLayer(nn.Module):
    """Bidirectional-capable TTT layer (one direction per call; the caller
    reverses the sequence for the second direction and shares these params,
    reference: ttt/models/cogvideo/dit.py:224-266)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        D, H, F = cfg.model_dim, cfg.num_heads, cfg.head_dim

        dense = lambda name: nn.Dense(
            D, use_bias=True, dtype=jnp.dtype(cfg.dtype), param_dtype=jnp.float32,
            kernel_init=_init_normal, bias_init=nn.initializers.zeros, name=name,
        )
        self.wq, self.wk, self.wv, self.wo = dense("wq"), dense("wk"), dense("wv"), dense("wo")

        # Per-head learned inner-loop LR gate: sigma(x . w + b) * base_lr / F
        # (reference: ttt/models/ssm/ttt_layer.py:91-106,143-155).
        self.learnable_ttt_lr_weight = self.param("learnable_ttt_lr_weight", _init_normal, (H, 1, D), jnp.float32)
        self.learnable_ttt_lr_bias = self.param("learnable_ttt_lr_bias", nn.initializers.zeros, (H, 1), jnp.float32)

        # Per-head layer-norm applied to the fast-weight net's output and used
        # in the LN-reconstruction target.
        self.ttt_norm_weight = self.param("ttt_norm_weight", nn.initializers.ones, (H, F), jnp.float32)
        self.ttt_norm_bias = self.param("ttt_norm_bias", nn.initializers.zeros, (H, F), jnp.float32)

        # Model-dtype LayerNorm: flax computes the mean/var in f32 regardless
        # of ``dtype``, so this only changes the dtype of the *materialized*
        # tensors (bf16 in production instead of an f32 round-trip of the
        # full [B, L, D] output — ~220 MB/layer at the 3 s d3072 geometry).
        self.post_norm = nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.dtype(cfg.dtype), param_dtype=jnp.float32, name="post_norm"
        )

        # Fast-weight initial states (learned, shared across the batch).
        if cfg.ssm_layer == "ttt_linear":
            self.W1 = self.param("W1", _init_normal, (H, F, F), jnp.float32)
            self.b1 = self.param("b1", nn.initializers.zeros, (H, 1, F), jnp.float32)
        elif cfg.ssm_layer == "ttt_mlp":
            self.W1 = self.param("W1", _init_normal, (H, F, 4 * F), jnp.float32)
            self.b1 = self.param("b1", nn.initializers.zeros, (H, 1, 4 * F), jnp.float32)
            self.W2 = self.param("W2", _init_normal, (H, 4 * F, F), jnp.float32)
            self.b2 = self.param("b2", nn.initializers.zeros, (H, 1, F), jnp.float32)
        else:
            raise ValueError(f"No ttt layer of type {cfg.ssm_layer}")

    def _ln_reconstruction_target(self, XV, XK):
        """LN-normalized reconstruction target XV := LN(XV - XK) + XK using the
        per-head ttt_norm affine. Uses the *unbiased* std with eps added to std
        (not var), matching reference: ttt/models/ssm/ttt_layer.py:219-235."""
        x = (XV - XK).astype(jnp.float32)
        n = x.shape[-1]
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True) * (n / max(n - 1, 1))
        x = (x - mean) / (jnp.sqrt(var) + 1e-8)
        x = self.ttt_norm_weight[None, None] * x + self.ttt_norm_bias[None, None]
        return (x + XK.astype(jnp.float32)).astype(XV.dtype)

    def _token_gate(self, hidden_states):
        """Pre-sigmoid LR-gate logits [B, H, NC, CS]: x . lr_weight + bias.

        The matmul runs at the input dtype with f32 accumulation (bf16 in
        production — matching the reference, whose autocast runs this matmul
        in bf16, ttt/models/ssm/ttt_layer.py:143-155) instead of materializing
        an f32 copy of the full [B, L, D] hidden states."""
        cfg = self.config
        B, L, D = hidden_states.shape
        w = self.learnable_ttt_lr_weight.astype(hidden_states.dtype)
        lr = jnp.einsum("bld,hod->bhlo", hidden_states, w, preferred_element_type=jnp.float32)[..., 0]
        lr = lr + self.learnable_ttt_lr_bias.reshape(1, -1, 1)
        return lr.reshape(B, cfg.num_heads, L // cfg.mini_batch_size, cfg.mini_batch_size)

    @property
    def _eta_scale(self) -> float:
        """sigmoid(gate) * eta_scale = the reference's eta = lr / CS with
        lr = sigma(gate) * base_lr / head_dim (ttt_layer.py:285-288)."""
        cfg = self.config
        return cfg.ttt_base_lr / cfg.head_dim / cfg.mini_batch_size

    def _token_eta(self, hidden_states):
        """Per-token inner-loop LR: sigma(x.w+b) * base_lr / head_dim / CS.

        hidden_states: [B, L, D] -> eta [B, H, NC, CS]. Equivalent to the
        reference's rank-1 eta matrix (see ops/ttt_scan.py docstring). The
        kernel path fuses the sigmoid/scale in-kernel instead
        (_token_gate + eta_scale)."""
        return jax.nn.sigmoid(self._token_gate(hidden_states)) * self._eta_scale

    def __call__(self, hidden_states, meta: SequenceMetadata, reverse: bool = False):
        """One TTT direction. ``reverse=True`` runs the reverse-direction scan
        directly from the ORIGINAL sequence layout: the reverse prep (text
        scenes reversed, video flipped — reference:
        ttt/models/cogvideo/dit.py:230-242) is composed into the interleave
        permutation, and the output is un-composed back to the original
        layout.

        The permutation is applied ONCE to ``hidden_states`` at layer entry
        (projections, eta, and the per-slot rope/LN preprocessing are all
        per-token, so they commute with any token permutation): one [B, L, D]
        gather pass per direction instead of permuting XQ/XK/XV separately
        (3x the traffic) or the old flip+concat+interleave chain. Rope is
        applied by SLOT of the pre-interleave layout exactly as the reference
        does on its already-reversed sequence
        (ttt/models/ssm/ttt_layer.py:271-276): the slot tables (identity rows
        for text, video slot j -> angle j, forward-interleaved when
        multiscene) are the same for both directions — flipping tokens moves
        tokens between slots, never the slots' angles."""
        cfg = self.config
        B, L, D = hidden_states.shape
        H, F, CS = cfg.num_heads, cfg.head_dim, cfg.mini_batch_size
        assert L % CS == 0, "Sequence len must be multiple of mini batch size."
        NC = L // CS
        stl = meta.seq_text_length

        permuted = meta.is_multiscene or reverse
        if permuted:
            hidden_states = interleave(hidden_states, meta, reverse)
        # Pin the [B, L, D] stream at the QKVO/gate fan-out. The constraint is
        # a no-op forward (the stream arrives with this sharding from the
        # layer boundary) but its TRANSPOSE pins the summed cotangent: without
        # it, the gate einsum's backward d(hidden_states) = d(eta)·lr_weight
        # contracts over the tensor-sharded head axis and GSPMD materializes
        # the cotangent REPLICATED in f32 — 4.03 GiB/chip at 63 s, the OOM
        # culprit on the v5e-256 tp8 row (docs/aot_scale_r5.json).
        hidden_states = shard_boundary(hidden_states)

        XQ = self.wq(hidden_states)  # [B, L, D]
        XK = self.wk(hidden_states)
        XV = self.wv(hidden_states)

        cos, sin = precompute_rope_3d(F, meta.grid_height, meta.grid_width, meta.num_frames, cfg.rope_theta)

        # Fused in-kernel preprocessing: the Pallas kernels apply L2-norm +
        # rope + LN-reconstruction-target (and their backward) on the raw
        # projections; outside-XLA preprocessing costs ~100 ms/step in
        # elementwise passes + layout copies at the 3 s d3072 geometry.
        # The fused backward (and with it the fused preproc) requires a
        # tiling-legal head group <= 8 at the PER-SHARD head count. 12 local
        # heads (48 under tp=4 — the reference's 63 s shape) qualifies via
        # the head-major eta layout (G=6) whenever the checkpoint group is a
        # multiple of 8 (default 16) or covers all of NC
        # (ops/pallas/ttt_backward.py:fused_bwd_supported).
        from ttt_video_dit_tpu.ops.pallas.sharded import local_head_count
        from ttt_video_dit_tpu.ops.pallas.ttt_backward import fused_bwd_supported

        _K = min(max(cfg.scan_checkpoint_group_size, 1), NC)
        fused_ok = fused_bwd_supported(local_head_count(H), _K, NC)
        fuse_pre = (cfg.use_kernel and cfg.use_fused_backward and cfg.fuse_ttt_preproc
                    and fused_ok)
        if fuse_pre:
            from ttt_video_dit_tpu.ops.pallas import ttt_linear_kernel, ttt_mlp_kernel

            mod = ttt_linear_kernel if cfg.ssm_layer == "ttt_linear" else ttt_mlp_kernel
            fuse_pre = mod.is_supported((B, H, NC, CS, F))

        if fuse_pre:
            # TOKEN-MAJOR kernel IO: [B, L, D] -> [B, NC, CS, H*F] is a pure
            # reshape (no moveaxis relayout, no T(8,128) lane padding on the
            # kernel's HBM traffic — measured 31% faster forward at the
            # flagship geometry, scripts/microbench.py --which tm).
            to_tm = lambda x: x.reshape(B, NC, CS, H * F)
            XQ, XK, XV = to_tm(XQ), to_tm(XK), to_tm(XV)
        else:
            XQ = XQ.reshape(B, L, H, F)
            XK = XK.reshape(B, L, H, F)
            XV = XV.reshape(B, L, H, F)
            # L2-normalize queries/keys over the head dim (torch F.normalize
            # parity: x / max(||x||_2, 1e-12), reference:
            # ttt/models/ssm/ttt_layer.py:265-266); rope by slot (identity
            # rows on text slots, see docstring).
            norm = lambda x: (x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True), 1e-12)).astype(x.dtype)
            XQ, XK = norm(XQ), norm(XK)
            Dh = F // 2
            cos_s = jnp.concatenate([jnp.ones((stl, Dh), jnp.float32), jnp.asarray(cos[: L - stl], jnp.float32)], axis=0)
            sin_s = jnp.concatenate([jnp.zeros((stl, Dh), jnp.float32), jnp.asarray(sin[: L - stl], jnp.float32)], axis=0)
            if meta.is_multiscene:
                cos_s, sin_s = interleave(cos_s, meta), interleave(sin_s, meta)
            rope = lambda x: apply_rope(x, cos_s, sin_s, seq_axis=1)
            XQ, XK = rope(XQ), rope(XK)
            XV = self._ln_reconstruction_target(XV, XK)
            # [B, L, H, F] -> [B, H, NC, CS, F]
            to_mb = lambda x: jnp.moveaxis(x, 2, 1).reshape(B, H, NC, CS, F)
            XQ, XK, XV = to_mb(XQ), to_mb(XK), to_mb(XV)
        # Fused-preproc kernels take the raw gate LOGITS and apply
        # sigmoid * eta_scale in-kernel (forward and backward) — the
        # elementwise eta pass and its VJP leave the XLA step program.
        eta_scale = self._eta_scale if fuse_pre else None
        eta = self._token_gate(hidden_states) if fuse_pre else self._token_eta(hidden_states)

        rope_cos = rope_sin = None
        if fuse_pre:
            cos_il, sin_il = interleaved_tables_prefixed(cos, sin, stl, L)
            tabs = (jnp.asarray(cos_il), jnp.asarray(sin_il))
            if meta.is_multiscene:
                tabs = tuple(interleave(t, meta) for t in tabs)
            rope_cos = tabs[0].reshape(NC, CS, F)
            rope_sin = tabs[1].reshape(NC, CS, F)

        # Head sharding over the tensor axis (TP); batch over data axes.
        # Token-major tensors carry heads in the LAST axis.
        if fuse_pre:
            XQ, XK, XV = (maybe_shard(x, DATA, None, None, TENSOR) for x in (XQ, XK, XV))
        else:
            XQ, XK, XV = (maybe_shard(x, DATA, TENSOR, None, None, None) for x in (XQ, XK, XV))
        eta = maybe_shard(eta, DATA, TENSOR, None, None)

        group = min(max(cfg.scan_checkpoint_group_size, 1), NC)
        tile = lambda p: jnp.broadcast_to(p[None], (B,) + p.shape)

        if cfg.ssm_layer == "ttt_linear":
            XQW = self._ttt_linear(XQ, XK, XV, eta, tile, group, rope_cos, rope_sin, eta_scale,
                                   fused_ok, token_major=fuse_pre)
        else:
            XQW = self._ttt_mlp(XQ, XK, XV, eta, tile, group, rope_cos, rope_sin, eta_scale,
                                fused_ok, token_major=fuse_pre)

        if fuse_pre:
            out = XQW.reshape(B, L, H * F)  # pure reshape of the token-major output
        else:
            # [B, H, NC, CS, F] -> [B, L, H*F]
            out = jnp.moveaxis(XQW.reshape(B, H, L, F), 1, 2).reshape(B, L, H * F)

        # Saveable under the save_seq remat policy: with this output AND the
        # state checkpoints ("ttt_residuals", ops/pallas/ttt_vjp.py) kept, the
        # sequential forward scan is DCE'd from a rematted layer's recompute
        # pass entirely (the kernel's custom-vjp backward consumes only the
        # residuals, never the scan output). Named on the TOKEN-major [B, L,
        # H*F] tensor, not the kernel-layout [B, H, NC, CS, F]: the latter's
        # minor dim F=64 pads 2x under the bf16 (8, 128) HBM tiling, which at
        # 42 stacked layers wasted 4.3 GB/direction (AOT memory analysis,
        # scripts/aot_scale_check.py). Inert without a policy naming it.
        out = jax.ad_checkpoint.checkpoint_name(out, "ttt_out")

        # Barrier keeps the head->token transpose in bf16: without it XLA
        # hoists post_norm's f32 upcast above the transpose and materializes
        # f32 [B, L, H, F] layout copies (~28 ms/step at the 3 s d3072
        # geometry, seen as flax normalization convert_element_type copies).
        out = jax.lax.optimization_barrier(out)

        out = self.wo(self.post_norm(out))

        if permuted:
            out = undo_interleave(out, meta, reverse)
        return out

    def _ttt_linear(self, XQ, XK, XV, eta, tile, group, rope_cos=None, rope_sin=None,
                    eta_scale=None, fused_ok=True, token_major=False):
        if self.config.use_kernel:
            from ttt_video_dit_tpu.ops.pallas import ttt_linear_kernel

            if token_major or ttt_linear_kernel.is_supported(XQ.shape):
                return ttt_linear_kernel.ttt_linear(
                    XQ, XK, XV, eta, self.ttt_norm_weight, self.ttt_norm_bias,
                    tile(self.W1), tile(self.b1), group,
                    use_fused_bwd=self.config.use_fused_backward and fused_ok,
                    rope_cos=rope_cos, rope_sin=rope_sin, eta_scale=eta_scale,
                    token_major=token_major,
                )
        assert rope_cos is None, "fused preproc requires the Pallas kernel path"
        return ttt_scan.ttt_linear(
            XQ, XK, XV, eta, self.ttt_norm_weight, self.ttt_norm_bias, tile(self.W1), tile(self.b1), group
        )

    def _ttt_mlp(self, XQ, XK, XV, eta, tile, group, rope_cos=None, rope_sin=None,
                 eta_scale=None, fused_ok=True, token_major=False):
        if self.config.use_kernel:
            from ttt_video_dit_tpu.ops.pallas import ttt_mlp_kernel

            if token_major or ttt_mlp_kernel.is_supported(XQ.shape):
                return ttt_mlp_kernel.ttt_mlp(
                    XQ, XK, XV, eta, self.ttt_norm_weight, self.ttt_norm_bias,
                    tile(self.W1), tile(self.b1), tile(self.W2), tile(self.b2), group,
                    use_fused_bwd=self.config.use_fused_backward and fused_ok,
                    rope_cos=rope_cos, rope_sin=rope_sin, eta_scale=eta_scale,
                    token_major=token_major,
                )
        assert rope_cos is None, "fused preproc requires the Pallas kernel path"
        return ttt_scan.ttt_mlp(
            XQ, XK, XV, eta, self.ttt_norm_weight, self.ttt_norm_bias,
            tile(self.W1), tile(self.b1), tile(self.W2), tile(self.b2), group,
        )
