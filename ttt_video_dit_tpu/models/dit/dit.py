"""CogVideoX-style diffusion transformer with segment-local attention and
bidirectional gated TTT layers — TPU-first flax implementation.

Re-design of the reference's DiT (reference: ttt/models/cogvideo/dit.py):

- The per-chunk Python attention loop (reference: dit.py:163-211) becomes one
  *batched* attention over statically-gathered overlapping windows, with the
  overlap-averaged stitch expressed as a static scatter-add — no dynamic
  shapes, everything tiles onto the MXU.
- Remat flags map to ``flax.linen.remat`` (XLA rematerialization) instead of
  ``torch.utils.checkpoint`` wrappers (reference: dit.py:269-276, 321-327,
  487-502).
- Tensor/sequence parallelism is expressed with sharding constraints
  (mesh axes in parallel/mesh.py) instead of DTensor module wrapping.

Layout conventions: video latents enter as [B, T, C, H, W] (matching the
reference's data format); internally patches are embedded NHWC (TPU-native
conv layout).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ttt_video_dit_tpu.config.model_config import ModelConfig
from ttt_video_dit_tpu.models.dit.schedule import timestep_embedding
from ttt_video_dit_tpu.models.sequence import SequenceMetadata
from ttt_video_dit_tpu.models.ttt.layer import TTTLayer
from ttt_video_dit_tpu.ops.attention import attention
from ttt_video_dit_tpu.ops.ln import gelu_tanh
from ttt_video_dit_tpu.ops.rope import apply_rope_prefixed, precompute_rope_3d
from ttt_video_dit_tpu.parallel.mesh import DATA, TENSOR, maybe_shard, shard_boundary

_init_normal = nn.initializers.normal(stddev=0.02)


def modulate(x, shift, scale):
    """adaLN modulation: x * (1 + scale) + shift, broadcast over tokens."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _ckpt_policy(cfg: ModelConfig):
    """Checkpoint policy for every remat region (config: remat.policy).

    "save_seq" keeps the sequential kernels' residuals across the remat
    boundary — splash attention's out+logsumexp (tagged by the library via
    residual_checkpoint_name, ops/attention.py) and the TTT scan output +
    fast-weight state checkpoints (models/ttt/layer.py, ops/pallas/ttt_vjp.py)
    — so a rematted layer's backward recomputes only dense matmuls and
    elementwise ops; the splash/TTT forwards are DCE'd from the recompute.
    Cost: ~0.5 GB/layer saved residuals at the 3 s d3072 geometry vs ~36 %
    step-time remat tax without it (docs/performance.md depth rows)."""
    if cfg.remat_policy == "save_seq":
        return jax.checkpoint_policies.save_only_these_names(
            "splash_residuals", "ttt_residuals", "ttt_out"
        )
    if cfg.remat_policy not in ("none", ""):
        raise ValueError(f"Unknown remat policy: {cfg.remat_policy!r}")
    return None


def _remat(target, cfg: ModelConfig, **kw):
    return nn.remat(target, policy=_ckpt_policy(cfg), **kw)


def _policy_reserved_bytes(cfg: ModelConfig, meta: SequenceMetadata, B: int,
                           S_win: int, C: int) -> int:
    """HBM the save_seq policy keeps live across ALL rematted layers: splash
    out (bf16) + logsumexp (f32) per window, plus per TTT direction the scan
    output (bf16) and the fp32 fast-weight state checkpoints (b-checkpoints
    ride 8-row-compressed). Feeds the splash fused-backward budget
    (ops/attention.py:_fused_bwd_ok) so the backward degrades to the
    separate-dq path instead of OOMing when the saved residuals spend the
    headroom remat used to free (d3072 x 4L + save_seq measured ~130-160 MB
    over HBM with the fused dQ-partials stack)."""
    if cfg.remat_policy != "save_seq":
        return 0
    H, F = cfg.num_heads, cfg.head_dim
    splash = B * C * S_win * H * (F * 2 + 4)
    L = meta.seq_text_length + meta.num_video_tokens
    NG = -(-(L // cfg.mini_batch_size) // max(cfg.scan_checkpoint_group_size, 1))
    if cfg.ssm_layer == "ttt_mlp":
        state = H * (8 * F * F + 40 * F) * 4  # W1+W2 + 8-row b1+b2
    else:
        state = H * (F * F + 8 * F) * 4
    ttt = 2 * (B * L * H * F * 2 + B * NG * state)
    return cfg.num_layers * (splash + ttt)


class PatchEmbedding(nn.Module):
    """2x2 conv patchify of video latents + linear text projection
    (reference: dit.py:17-40)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, video, text_encoding):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, T, C, H, W = video.shape

        vid = jnp.transpose(video.reshape(B * T, C, H, W), (0, 2, 3, 1))  # NHWC
        # Pin the frame-major patchify stream to the mesh: without these
        # constraints GSPMD materialized the conv output (and its cotangent)
        # fully replicated at 63 s scale — bf16[8096, 30, 45, 3072] = 62.5 GiB
        # per chip on the v5e-256 tp8 row (docs/aot_scale_r5.json). The fused
        # B*T axis is batch-major, so sharding it over DATA is exact batch
        # sharding; the feature axis divides every practical tp width.
        vid = maybe_shard(vid, DATA, None, None, None)
        vid = nn.Conv(
            cfg.model_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=dtype,
            param_dtype=jnp.float32,
            name="vid_proj",
        )(vid.astype(dtype))
        vid = maybe_shard(vid, DATA, None, None, TENSOR)
        vid = vid.reshape(B, T * (H // cfg.patch_size) * (W // cfg.patch_size), cfg.model_dim)
        vid = shard_boundary(vid)

        text = nn.Dense(cfg.model_dim, dtype=dtype, param_dtype=jnp.float32, name="text_proj")(
            text_encoding.astype(dtype)
        )
        return text, vid


class MLP(nn.Module):
    """4x GELU-tanh MLP (reference: dit.py:43-87)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = nn.Dense(4 * cfg.model_dim, dtype=dtype, param_dtype=jnp.float32, name="layer1")(x)
        x = gelu_tanh(x)
        return nn.Dense(cfg.model_dim, dtype=dtype, param_dtype=jnp.float32, name="layer2")(x)


class SSMGating(nn.Module):
    """Per-channel learned tanh gate on the TTT residual branch
    (reference: dit.py:90-103)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "gating_alpha",
            lambda key, shape: jnp.full(shape, self.config.gating_alpha_init, jnp.float32),
            (self.config.model_dim,),
        )
        # tanh in f32 on the [D] param, multiply at the stream dtype: an
        # x.astype(f32) here materializes a full f32 copy of the token stream
        # (4 gate sites x 2 layers at 63 s = ~2.8 GB of traffic/step). The
        # reference's autocast also runs this multiply in bf16
        # (reference: dit.py:90-103 under torch.autocast).
        return jnp.tanh(alpha).astype(x.dtype) * x


class SegmentLocalAttention(nn.Module):
    """Attention over overlapping (prefix + attn_length)-frame windows, each
    window seeing its own scene's text (reference: dit.py:163-211).

    The reference loops windows in Python; here all windows are gathered with
    a static index map and attended in one batched call, and the overlapping
    prefix rows are stitched back with a static scatter-add + count divide.
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, vid_emb, text_emb, meta: SequenceMetadata):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B = vid_emb.shape[0]
        D, H, F = cfg.model_dim, cfg.num_heads, cfg.head_dim
        C, TL, TPF = meta.num_chunks, meta.text_length, meta.tokens_per_frame
        WF = cfg.prefix_temporal_length + cfg.attn_length  # frames per window
        assert meta.num_frames == cfg.prefix_temporal_length + C * cfg.attn_length, (
            f"num_frames {meta.num_frames} != prefix {cfg.prefix_temporal_length} + "
            f"{C} chunks * {cfg.attn_length} frames"
        )

        # Static window gather map: window c covers frames [c*AL, c*AL + WF).
        window_idx = (np.arange(C)[:, None] * cfg.attn_length + np.arange(WF)[None, :]).astype(np.int32)
        frame_counts = np.zeros((meta.num_frames,), np.float32)
        np.add.at(frame_counts, window_idx.reshape(-1), 1.0)

        frames = vid_emb.reshape(B, meta.num_frames, TPF, D)
        AL = cfg.attn_length
        if cfg.prefix_temporal_length == 1:
            # Scatter-free window build, mirroring the stitch below: frames
            # 1.. tile the windows' interiors exactly (a pure reshape) and
            # window c's 1-frame prefix is the previous interior's last frame.
            # A jnp.take here lowers its backward to a ~C-way pad+add of the
            # full video stream (measured ~30 ms/step at the 21-window 63 s
            # geometry); slices/reshapes transpose to slices.
            interior = frames[:, 1:].reshape(B, C, AL, TPF, D)
            lead = jnp.concatenate([frames[:, :1], interior[:, :-1, -1]], axis=1)
            win_vid = jnp.concatenate([lead[:, :, None], interior], axis=2)
            win_vid = win_vid.reshape(B, C, WF * TPF, D)
        else:
            win_vid = jnp.take(frames, jnp.asarray(window_idx.reshape(-1)), axis=1)
            win_vid = win_vid.reshape(B, C, WF * TPF, D)
        win_text = text_emb.reshape(B, C, TL, D)

        S = TL + WF * TPF
        x = jnp.concatenate([win_text, win_vid], axis=2).reshape(B * C, S, D)
        # Megatron-SP for the window stream: run the q/k/v projections with
        # the window-token axis sharded over the tensor axis (weights are
        # head-column-sharded, so each chip computes a token-slice x its
        # head-slice). The [B*C, S, D] window tensors are the largest
        # per-layer workspace at long context — 2.11 GB each at the 63 s
        # geometry (AOT-measured, docs/performance.md) — and without this
        # constraint they stay token-replicated across the tp group. Dim 0
        # is batch-major (B*C), so DATA sharding matches the incoming batch
        # sharding with no data movement. No-op without an ambient mesh.
        x = maybe_shard(x, DATA, TENSOR, None)

        dense = lambda name: nn.Dense(D, dtype=dtype, param_dtype=jnp.float32, name=name)
        q = dense("q")(x).reshape(B * C, S, H, F)
        k = dense("k")(x).reshape(B * C, S, H, F)
        v = dense("v")(x).reshape(B * C, S, H, F)

        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name)
        q = ln("q_norm")(q.astype(jnp.float32)).astype(dtype)
        k = ln("k_norm")(k.astype(jnp.float32)).astype(dtype)

        # Rope over *local* window positions (every window uses positions
        # 0..WF*TPF, matching reference Rotary3DPositionEmbedding.forward).
        cos, sin = precompute_rope_3d(F, meta.grid_height, meta.grid_width, meta.num_frames, cfg.theta)
        rope = lambda t: apply_rope_prefixed(t, cos, sin, TL, seq_axis=1)
        q, k = rope(q), rope(k)

        q = maybe_shard(q, DATA, None, TENSOR, None)
        k = maybe_shard(k, DATA, None, TENSOR, None)
        v = maybe_shard(v, DATA, None, TENSOR, None)

        # All C windows go through ONE splash call (folded into the kernel's
        # head grid, ops/attention.py:_splash) so every curriculum stage gets
        # the tuned block profile — including under scan-over-layers: at the
        # 100 MB scoped-vmem limit the tuned blocks fit beside the scan
        # loop's remat fusions and measure faster everywhere tried (d3072x4L
        # 36.06 vs 31.43 % MFU, d512x42L 25.2 vs 17.7 % — docs/performance.md),
        # so lean blocks are opt-in (cfg.splash_lean_blocks=True; a Mosaic
        # scoped-vmem compile error is the loud signal to set it).
        attn = attention(q, k, v,
                         conservative=bool(cfg.splash_lean_blocks),
                         windows=C,
                         param_count=cfg.approx_param_count(),
                         reserved_bytes=_policy_reserved_bytes(cfg, meta, B, S, C))  # [B*C, S, H, F]
        attn = attn.reshape(B * C, S, D)
        out = dense("o")(attn).reshape(B, C, S, D)

        out_text = out[:, :, :TL].reshape(B, C * TL, D)

        # Scatter-free overlap-add: window c covers frames [c*AL, c*AL+WF)
        # with a 1-frame prefix overlap, so frames 1..AL of each window tile
        # the timeline exactly and only each window's frame 0 adds onto the
        # previous window's last frame. Pure slice/concat ops — the scatter
        # form lowered to C*WF dynamic-update-slices per call (~90 ms/step at
        # the 21-window 63 s geometry).
        w = out[:, :, TL:].reshape(B, C, WF, TPF, D)
        if cfg.prefix_temporal_length == 1:
            nxt = jnp.concatenate([w[:, 1:, 0], jnp.zeros_like(w[:, :1, 0])], axis=1)  # [B, C, TPF, D]
            last = w[:, :, AL] + nxt
            body = jnp.concatenate([w[:, :, 1:AL], last[:, :, None]], axis=2)  # [B, C, AL, TPF, D]
            stitched = jnp.concatenate([w[:, :1, 0], body.reshape(B, C * AL, TPF, D)], axis=1)
        else:  # general prefix length: static scatter-add
            stitched = jnp.zeros((B, meta.num_frames, TPF, D), out.dtype)
            stitched = stitched.at[:, jnp.asarray(window_idx.reshape(-1))].add(
                w.reshape(B, C * WF, TPF, D)
            )
        stitched = stitched / jnp.asarray(frame_counts, out.dtype)[None, :, None, None]
        out_vid = stitched.reshape(B, meta.num_video_tokens, D)

        return jnp.concatenate([out_text, out_vid], axis=1)


class SeqModelingBlock(nn.Module):
    """Segment-local attention followed by bidirectional gated TTT
    (reference: dit.py:106-278)."""

    config: ModelConfig

    def setup(self):
        self.attention = SegmentLocalAttention(self.config, name="attention")
        self.ssm = TTTLayer(self.config, name="ssm")
        self.forward_ssm_gating_text = SSMGating(self.config)
        self.forward_ssm_gating_video = SSMGating(self.config)
        self.backward_ssm_gating_text = SSMGating(self.config)
        self.backward_ssm_gating_video = SSMGating(self.config)

    def _gate(self, text_gate, video_gate, residual, ssm_out, stl: int):
        return residual + jnp.concatenate(
            [text_gate(ssm_out[:, :stl]), video_gate(ssm_out[:, stl:])], axis=1
        )

    def _ssm_forward(self, emb, meta: SequenceMetadata):
        cfg = self.config
        stl = meta.seq_text_length

        def run_ssm_fwd(mdl, x):
            return mdl.ssm(x, meta)

        def run_ssm_rev(mdl, x):
            # The reverse prep (reversed text-scene order + token-flipped
            # video, reference: ttt/models/cogvideo/dit.py:230-242) is
            # composed into the TTT layer's interleave permutation — one
            # gather pass each way instead of flip+concat+interleave; the
            # layer returns the original layout.
            return mdl.ssm(x, meta, reverse=True)

        fwd = _remat(run_ssm_fwd, cfg) if cfg.remat_forward_ssm else run_ssm_fwd
        rev = _remat(run_ssm_rev, cfg) if cfg.remat_reverse_ssm else run_ssm_rev

        residual = emb
        out = fwd(self, emb)
        emb = self._gate(self.forward_ssm_gating_text, self.forward_ssm_gating_video, residual, out, stl)

        residual = emb
        out = rev(self, emb)
        return self._gate(self.backward_ssm_gating_text, self.backward_ssm_gating_video, residual, out, stl)

    def __call__(self, vid_emb, text_emb, meta: SequenceMetadata):
        cfg = self.config

        def run_attn(mdl, v, t):
            return mdl.attention(v, t, meta)

        attn = _remat(run_attn, cfg) if cfg.remat_attention else run_attn
        out = attn(self, vid_emb, text_emb)
        out = self._ssm_forward(out, meta)

        stl = meta.seq_text_length
        return out[:, stl:], out[:, :stl]  # (video, text)


class TransformerLayer(nn.Module):
    """adaLN-modulated sequence-modeling block + MLP (reference: dit.py:281-382)."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        ada = lambda: nn.Dense(6 * cfg.model_dim, dtype=dtype, param_dtype=jnp.float32)
        ln = lambda: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32)

        self.pre_seq_adaLN_modulation = ada()
        self.pre_seq_layernorm = ln()
        self.seq_modeling_block = SeqModelingBlock(cfg)
        self.pre_mlp_adaLN_modulation = ada()
        self.pre_mlp_layernorm = ln()
        self.mlp = MLP(cfg)

    def __call__(self, vid_emb, text_emb, t_emb, meta: SequenceMetadata):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        stl = meta.seq_text_length

        seq_mod = jnp.split(self.pre_seq_adaLN_modulation(nn.silu(t_emb)), 6, axis=-1)
        shift, scale, gate, t_shift, t_scale, t_gate = seq_mod

        vid_in = modulate(self.pre_seq_layernorm(vid_emb.astype(jnp.float32)).astype(dtype), shift, scale)
        text_in = modulate(self.pre_seq_layernorm(text_emb.astype(jnp.float32)).astype(dtype), t_shift, t_scale)

        def run_block(mdl, v, t):
            return mdl.seq_modeling_block(v, t, meta)

        block_fn = _remat(run_block, cfg) if cfg.remat_seq_modeling_block else run_block
        vid_out, text_out = block_fn(self, vid_in, text_in)

        vid_emb = vid_emb + gate[:, None, :] * vid_out
        text_emb = text_emb + t_gate[:, None, :] * text_out

        mlp_mod = jnp.split(self.pre_mlp_adaLN_modulation(nn.silu(t_emb)), 6, axis=-1)
        shift, scale, gate, t_shift, t_scale, t_gate = mlp_mod

        vid_in = modulate(self.pre_mlp_layernorm(vid_emb.astype(jnp.float32)).astype(dtype), shift, scale)
        text_in = modulate(self.pre_mlp_layernorm(text_emb.astype(jnp.float32)).astype(dtype), t_shift, t_scale)

        mlp_input = jnp.concatenate([text_in, vid_in], axis=1)
        # Sequence-parallel MLP: tokens sharded over the tensor axis with
        # replicated weights (reference: dit.py:368-374).
        mlp_input = maybe_shard(mlp_input, DATA, TENSOR, None)

        def run_mlp(mdl, x):
            return mdl.mlp(x)

        mlp_fn = _remat(run_mlp, cfg) if cfg.remat_mlp else run_mlp
        mlp_output = mlp_fn(self, mlp_input)

        vid_emb = vid_emb + gate[:, None, :] * mlp_output[:, stl:]
        text_emb = text_emb + t_gate[:, None, :] * mlp_output[:, :stl]
        return vid_emb, text_emb


class _ScanLayerBody(nn.Module):
    """One scanned transformer layer: carries (vid, text, t_emb); the static
    sequence metadata rides as a module field (hashable frozen dataclass)."""

    config: ModelConfig
    meta: SequenceMetadata

    @nn.compact
    def __call__(self, carry, _):
        vid, text, t_emb = carry
        if self.config.shard_transformer_inputs:
            # Pin the scan carry (= the tensors a rematted body saves per
            # layer) to batch x token-or-feature sharding. At 63 s the
            # per-layer boundary save is [B, 342k, D] bf16 = 138.6 GB
            # global: its per-chip floor is B*L*D*2 / n_chips no matter the
            # mesh shape, and leaving BOTH token and feature axes unsharded
            # multiplies that by tp (the 82 GiB row-A slab,
            # docs/aot_scale_r5.json). shard_boundary picks the token axis
            # when tp divides it, else the feature axis (341,550 tokens
            # divide 2 but not 4). Mirrors the unrolled path's
            # between-group constraint below.
            vid = shard_boundary(vid)
            text = shard_boundary(text)
        vid, text = TransformerLayer(self.config, name="layer")(vid, text, t_emb, self.meta)
        return (vid, text, t_emb), None


def _make_scan_param_pin(cfg: ModelConfig):
    """trans_in_fn for the scanned layer body's params: pre-convert the 2-D
    Dense kernels to the compute dtype through a Pallas kernel
    (ops/pallas/convert.py) so XLA cannot rewrite the per-iteration
    ``convert(dynamic-slice(stacked_param))`` into a hoisted whole-stack
    convert — which materialized a full bf16 copy of every stacked fp32
    param as an HLO temp (measured on v5e at d3072×4L: a dozen 72 MB
    ``bf16[4,3072,3072]`` convert/copy temps, 921 MB over HBM; a plain
    ``lax.optimization_barrier`` does NOT stop the rewrite — measured). The
    flax modules then see an already-bf16 kernel and their own promote_dtype
    is a no-op; numerics are bit-identical (same single fp32→bf16 rounding).
    Non-kernel leaves (LayerNorm affines, TTT fast-weight inits, biases) pass
    through untouched — they are used in fp32 or are too small to matter."""
    from ttt_video_dit_tpu.ops.pallas.convert import opaque_convert

    dtype = jnp.dtype(cfg.dtype)

    def pin(col):
        def leaf(path, x):
            if path and getattr(path[-1], "key", None) == "kernel" and x.ndim == 2:
                return opaque_convert(x, dtype)
            return x

        return jax.tree_util.tree_map_with_path(leaf, col)

    return pin


class LayerStack(nn.Module):
    """scan-over-layers: one ``lax.scan`` over stacked per-layer params, so
    HLO size and compile time stop scaling with depth (an unrolled 42-layer
    stack compiles in ~15 min on v5e; the scanned stack is one layer's HLO).
    Per-layer remat composes as nn.remat *inside* the scan, where
    prevent_cse=False is the documented-safe staging case."""

    config: ModelConfig

    @nn.compact
    def __call__(self, vid_emb, text_emb, t_emb, meta: SequenceMetadata):
        cfg = self.config
        body = nn.map_variables(
            _ScanLayerBody, "params", trans_in_fn=_make_scan_param_pin(cfg), init=True
        )
        body = _remat(body, cfg, prevent_cse=False) if cfg.remat_transformer_layers else body
        stack = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
        )(cfg, meta, name="scan")
        (vid_emb, text_emb, _), _ = stack((vid_emb, text_emb, t_emb), None)
        return vid_emb, text_emb


def stack_layer_params(dit_params: dict, num_layers: int) -> dict:
    """Convert an unrolled DiT param subtree ({layers_i/...}) to the
    scan_layers layout ({scan_layers/scan/layer/...} stacked on dim 0) —
    for loading unrolled checkpoints / HF conversions into a scan model."""
    out = {k: v for k, v in dit_params.items() if not k.startswith("layers_")}
    per_layer = [dit_params[f"layers_{i}"] for i in range(num_layers)]
    out["scan_layers"] = {"scan": {"layer": jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)}}
    return out


class FinalLayer(nn.Module):
    """adaLN + linear + unpatchify back to latent video (reference: dit.py:385-418)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, vid_emb, t_emb, meta: SequenceMetadata):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        p, c = cfg.patch_size, cfg.out_channels

        mod = nn.Dense(2 * cfg.model_dim, dtype=dtype, param_dtype=jnp.float32, name="adaLN_modulation")(
            nn.silu(t_emb)
        )
        shift, scale = jnp.split(mod, 2, axis=-1)
        vid_emb = shard_boundary(vid_emb)
        vid_emb = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32, name="norm"
        )(vid_emb.astype(jnp.float32)).astype(dtype)
        vid_emb = modulate(vid_emb, shift, scale)
        x = nn.Dense(p * p * c, dtype=dtype, param_dtype=jnp.float32, name="linear")(vid_emb)

        # Unpatchify: [B, (t h w), (c p q)] -> [B, t, c, h*p, w*q]
        # (feature ordered (c, p, q), reference: cogvideo/utils.py:155-171).
        # Keep the stream batch-sharded through the reshape soup so the
        # cotangent entering the backward pass is born sharded.
        x = maybe_shard(x, DATA, None, None)
        B = x.shape[0]
        h = meta.latent_height // p
        w = meta.latent_width // p
        t = meta.num_frames
        x = x.reshape(B, t, h, w, c, p, p)
        x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6))  # B t c h p w q
        return x.reshape(B, t, c, h * p, w * p)


class DiffusionTransformer(nn.Module):
    """The full DiT (reference: dit.py:421-505).

    __call__(video [B,T,C,H,W], text [B,num_scenes,S,text_dim], timesteps [B])
    -> latent v-prediction [B,T,C,H,W].
    """

    config: ModelConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        self.time_embed_0 = nn.Dense(cfg.time_embed_dim, dtype=dtype, param_dtype=jnp.float32)
        self.time_embed_2 = nn.Dense(cfg.time_embed_dim, dtype=dtype, param_dtype=jnp.float32)
        self.patch_embedding = PatchEmbedding(cfg)
        if cfg.scan_layers:
            self.layer_stack = LayerStack(cfg, name="scan_layers")
        else:
            self.layers = [TransformerLayer(cfg, name=f"layers_{i}") for i in range(cfg.num_layers)]
        self.transformer_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32
        )
        self.final_layer = FinalLayer(cfg)

    def __call__(self, video, text, timesteps):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, T, C_lat, H_lat, W_lat = video.shape
        num_scenes, text_length = text.shape[1], text.shape[2]

        t_emb = timestep_embedding(timesteps, cfg.model_dim, dtype=dtype)
        t_emb = self.time_embed_2(nn.silu(self.time_embed_0(t_emb)))

        text_emb, vid_emb = self.patch_embedding(video, text)

        meta = SequenceMetadata(
            text_length=text_length,
            num_frames=T,
            num_chunks=num_scenes,
            tokens_per_frame=vid_emb.shape[1] // T,
            latent_height=H_lat,
            latent_width=W_lat,
            patch_size=cfg.patch_size,
        )

        text_emb = text_emb.reshape(B, num_scenes * text_length, cfg.model_dim)

        if cfg.scan_layers:
            vid_emb, text_emb = self.layer_stack(vid_emb, text_emb, t_emb, meta)
        else:
            group = max(cfg.remat_transformer_layer_group_size, 1)

            for i in range(0, cfg.num_layers, group):

                def group_forward(mdl, v, t, te, _start=i):
                    for layer in mdl.layers[_start : _start + group]:
                        v, t = layer(v, t, te, meta)
                    return v, t

                if cfg.shard_transformer_inputs:
                    vid_emb = shard_boundary(vid_emb)
                    text_emb = shard_boundary(text_emb)
                group_fn = (
                    _remat(group_forward, cfg) if cfg.remat_transformer_layers else group_forward
                )
                vid_emb, text_emb = group_fn(self, vid_emb, text_emb, t_emb)

        vid_emb = self.transformer_norm(vid_emb.astype(jnp.float32)).astype(dtype)
        return self.final_layer(vid_emb, t_emb, meta)
