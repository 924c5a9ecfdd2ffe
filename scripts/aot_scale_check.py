"""Device-less AOT compilation of the pod-scale stage configs.

Proves — with the compiler, not a slope extrapolation — that the REAL
curriculum configs fit per chip and shard cleanly at their intended cluster
shapes (reference runs 63 s at 16 nodes x 4 shard x tp4 = 256 H100s:
/root/reference/configs/train/ttt-mlp/63s.toml:43-46, train_submitit.py:17-18).

``jax.experimental.topologies.get_topology_desc`` builds a detached TPU
topology (no hardware attached); the full jitted train step is lowered against
a Mesh of those devices and compiled locally, then ``memory_analysis()``
reports per-chip HBM (arguments/outputs/temporaries) and the optimized HLO is
scanned for collective ops and GSPMD's replicate-and-reslice fallback
("Involuntary full rematerialization" warnings on stderr).

Usage:
    python scripts/aot_scale_check.py --config configs/train/ttt-mlp/63s.toml
    python scripts/aot_scale_check.py --all --json docs/aot_scale.json
    # override the cluster shape (e.g. 63 s on a v5p-64 instead of v5e-256):
    python scripts/aot_scale_check.py --config configs/train/ttt-mlp/63s.toml \
        --chip v5p --parallelism 4,4,4

The per-chip batch/sequence geometry is exactly train.py's: global batch from
[training], synthetic text length chosen the same way, shardings from the same
partition rules.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

# The tuned splash blocks need the raised Mosaic scoped-vmem limit (100 MB;
# default 16) — for the detached-topology compiler this must be in the env
# BEFORE backend/compiler init, and is ALSO passed per-compile via
# compiler_options below (belt and braces: env snapshots vary by client).
ensure_tpu_flags()

import jax

# Host-only work: never touch an ambient TPU tunnel for a device-less compile.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

HBM_BYTES = {"v5e": 16 * 1024**3, "v5p": 95 * 1024**3}

# Valid single-slice v5e grids by chip count (x, y); v5p grids are 3-D.
_V5E_GRIDS = {1: (1, 1), 4: (2, 2), 8: (2, 4), 16: (4, 4), 32: (4, 8), 64: (8, 8), 256: (16, 16)}


def _v5p_grid(n: int) -> str:
    """A balanced XxYxZ factorization of n (each factor even or 1, v5p style)."""
    best = None
    for x in range(1, n + 1):
        if n % x:
            continue
        for y in range(x, n // x + 1):
            if (n // x) % y:
                continue
            z = n // x // y
            if z < y:
                continue
            dims = (x, y, z)
            if any(d not in (1,) and d % 2 for d in dims):
                continue
            spread = z - x
            if best is None or spread < best[0]:
                best = (spread, dims)
    assert best, f"no v5p grid for {n} chips"
    return "x".join(str(d) for d in best[1])


def build_topology_mesh(chip: str, rep: int, fsdp: int, tp: int):
    """Detached topology + Mesh(replica, fsdp, tensor).

    v5e: the fsdp*tp chips of one slice ride ICI; ``rep`` maps to slices
    (DCN) — the TPU analog of the reference's HSDP node/shard split
    (reference: ttt/infra/parallelisms.py:57-89, docs/training.md:66-70).
    v5p: one big ICI domain carries all three axes.
    """
    from jax.experimental import topologies

    if chip == "v5e":
        per_slice = fsdp * tp
        assert per_slice in _V5E_GRIDS, f"v5e slice of {per_slice} chips has no valid grid"
        x, y = _V5E_GRIDS[per_slice]
        topo = topologies.get_topology_desc(
            f"v5e:{x}x{y}", platform="tpu",
            chips_per_host_bounds=(min(x, 2), min(y, 4), 1), num_slices=rep,
        )
        devs = list(topo.devices)
        assert len(devs) == rep * fsdp * tp
        # Devices arrive slice-major; keep replica = slices so its gradient
        # all-reduce is the only DCN traffic.
        arr = np.asarray(devs).reshape(rep, fsdp, tp)
        mesh = jax.sharding.Mesh(arr, ("replica", "fsdp", "tensor"))
        return topo, mesh, f"v5e {rep} slice(s) x {x}x{y}"
    elif chip == "v5p":
        n = rep * fsdp * tp
        grid = _v5p_grid(n)
        topo = topologies.get_topology_desc(f"v5p:{grid}", platform="tpu", num_slices=1)
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(
            (rep, fsdp, tp), list(topo.devices), allow_split_physical_axes=True
        )
        mesh = jax.sharding.Mesh(arr, ("replica", "fsdp", "tensor"))
        return topo, mesh, f"v5p {grid}"
    raise ValueError(f"unknown chip {chip}")


def _synthetic_text_length(cfg) -> int:
    """train.py's synthetic text length: near the reference default 498,
    keeping the sequence divisible by the TTT mini-batch size."""
    CS = cfg.mini_batch_size
    vid_tokens = cfg.compressed_num_frames * cfg.tokens_per_frame
    tl = 498
    while (cfg.num_chunks * tl + vid_tokens) % CS != 0:
        tl += 1
    return tl


def count_collectives(hlo: str) -> dict:
    ops = ("all-gather", "all-reduce", "reduce-scatter", "collective-permute", "all-to-all")
    out = {}
    for op in ops:
        # match both sync and -start forms, as instruction calls
        out[op] = len(re.findall(rf" {op}(?:-start)?\(", hlo))
    return out


def aot_check(config_file: str, chip: str, parallelism: tuple | None = None,
              overrides: list[str] | None = None, layers: int | None = None,
              lower_only: bool = False) -> dict:
    """``layers`` overrides the preset depth AFTER config resolution (the CI
    test compiles the real 63 s stage config at 2 layers so the topology
    compile stays minutes, not tens of minutes — every sharding rule, kernel
    and collective is depth-independent)."""
    from ttt_video_dit_tpu.config.job_config import JobConfig
    from ttt_video_dit_tpu.config.model_config import ModelConfig
    from ttt_video_dit_tpu.models.dit.diffusion import CogVideoX
    from ttt_video_dit_tpu.parallel.mesh import use_mesh
    from ttt_video_dit_tpu.parallel.sharding import param_shardings
    from ttt_video_dit_tpu.training import optimizer as opt_mod
    from ttt_video_dit_tpu.training.setup import batch_shardings, create_train_state, example_batch_shapes
    from ttt_video_dit_tpu.training.train_step import make_train_step

    job = JobConfig().parse_args(["--job.config_file", config_file] + (overrides or []))
    par = job.parallelism
    rep, fsdp, tp = parallelism or (par.dp_replicate, par.dp_sharding, par.tp_sharding)
    topo, mesh, topo_desc = build_topology_mesh(chip, rep, fsdp, tp)

    cfg = ModelConfig.get_preset(job.model.size, job.model.video_length, job)
    if layers is not None:
        cfg.num_layers = layers
    model = CogVideoX(cfg)
    tl = _synthetic_text_length(cfg)
    global_bs = job.training.global_batch_size
    seq = cfg.num_chunks * tl + cfg.compressed_num_frames * cfg.tokens_per_frame

    shapes = example_batch_shapes(cfg, global_bs, text_length=tl)
    vid0 = jnp.zeros((1, *shapes["vid"][1:]), jnp.float32)
    text0 = jnp.zeros((1, *shapes["text"][1:]), jnp.float32)
    bounds0 = (jnp.zeros((1,), jnp.int32), jnp.full((1,), cfg.sigma_interval, jnp.int32))

    adapter = cfg.adapter_method

    def make_state(rng):
        params = model.init(rng, vid0, text0, jax.random.PRNGKey(0), bounds0)
        trainable, _ = opt_mod.partition_params(params, adapter)
        tx, _, _ = opt_mod.build_optimizer_from_config(trainable, job)
        return create_train_state(params, tx, adapter)

    t0 = time.time()
    abstract_state = jax.eval_shape(make_state, jax.random.PRNGKey(0))
    # The partition rules key on trailing param paths, which optimizer-moment
    # paths share ('.../mu/dit/.../kernel'), so one pass shards the whole
    # TrainState; scalars/counters fall through to replicated.
    state_shardings = param_shardings(abstract_state, mesh)
    state_abs = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), abstract_state, state_shardings
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(jax.eval_shape(
        lambda r: model.init(r, vid0, text0, jax.random.PRNGKey(0), bounds0), jax.random.PRNGKey(0))))

    b_shd = batch_shardings(mesh)
    batch_abs = dict(
        vid=jax.ShapeDtypeStruct(shapes["vid"], jnp.float32, sharding=b_shd["vid"]),
        text=jax.ShapeDtypeStruct(shapes["text"], jnp.float32, sharding=b_shd["text"]),
        sigma_lo=jax.ShapeDtypeStruct((global_bs,), jnp.int32, sharding=b_shd["sigma_lo"]),
        sigma_hi=jax.ShapeDtypeStruct((global_bs,), jnp.int32, sharding=b_shd["sigma_hi"]),
    )
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=jax.NamedSharding(mesh, jax.sharding.PartitionSpec()))

    trainable, _ = opt_mod.partition_params(
        jax.eval_shape(lambda r: model.init(r, vid0, text0, jax.random.PRNGKey(0), bounds0), jax.random.PRNGKey(0)),
        adapter,
    )
    tx, _, _ = opt_mod.build_optimizer_from_config(trainable, job)
    step = make_train_step(model, tx, grad_accum_steps=job.training.grad_accum_steps,
                           text_dropout_prob=job.training.text_dropout_prob)

    oom = None
    with use_mesh(mesh):
        lowered = jax.jit(step, donate_argnums=0).lower(state_abs, batch_abs, rng_abs)
        t_lower = time.time() - t0
        if lower_only:
            # Probe mode: skip the (hour-scale) compile and report the
            # sharding annotations attached to the transformer-stream
            # activations — the tensors a rematted scan boundary will save.
            # A "[1,1,tp]..." (or token-axis) device assignment here is what
            # keeps the 42-layer boundary-save slab tp-sharded; "replicated"
            # reproduces the row-A 82 GiB OOM.
            import collections

            vid_tokens = cfg.compressed_num_frames * cfg.tokens_per_frame
            ir_text = lowered.as_text()

            # Match both sharding-annotation dialects: Shardy
            # (sdy.sharding_constraint <@mesh, [...]>) and GSPMD
            # (custom_call @Sharding {mhlo.sharding = "..."}).
            def count_stream(tokens):
                pat = re.compile(
                    r'(?:sdy\.sharding_constraint [^<]*<@mesh, (\[[^\]]*\]\]?)>'
                    r'|mhlo\.sharding = "([^"]+)")[^\n]*tensor<\d+x%dx%dx'
                    % (tokens, cfg.model_dim)
                )
                counts = collections.Counter(
                    m.group(1) or m.group(2) for m in pat.finditer(ir_text)
                )
                return {k: v for k, v in counts.most_common(8)}

            return dict(
                config=config_file, chip=chip, mesh=dict(mesh.shape),
                model=f"{job.model.size} {cfg.num_layers}L d{cfg.model_dim} {cfg.ssm_layer}",
                seq_tokens=seq, lower_s=round(t_lower, 1), lower_only=True,
                # The video-only stream (what the scan boundary saves) and the
                # full text+video stream (the TTT-layer-entry fan-out whose
                # cotangent OOM'd the v5e-256 tp8 row when left replicated).
                stream_shardings=count_stream(vid_tokens),
                full_stream_shardings=count_stream(seq),
            )
        t1 = time.time()
        # GSPMD prints partitioning-quality warnings to the C++ stderr stream;
        # capture the fd, not sys.stderr.
        import tempfile

        with tempfile.TemporaryFile(mode="w+") as tf:
            old_fd = os.dup(2)
            try:
                os.dup2(tf.fileno(), 2)
                try:
                    compiled = lowered.compile(
                        compiler_options={"xla_tpu_scoped_vmem_limit_kib": 100 * 1024}
                    )
                except Exception as e:  # HBM OOM is a *finding*, not a crash
                    if "RESOURCE_EXHAUSTED" not in str(e):
                        raise
                    oom = str(e)
            finally:
                os.dup2(old_fd, 2)
                os.close(old_fd)
            tf.seek(0)
            spmd_err = tf.read()
        t_compile = time.time() - t1

    hbm = HBM_BYTES[chip]
    base = dict(
        config=config_file, chip=chip, topology=topo_desc, mesh=dict(mesh.shape),
        chips=rep * fsdp * tp,
        model=f"{job.model.size} {cfg.num_layers}L d{cfg.model_dim} {cfg.ssm_layer}",
        params=n_params, global_batch=global_bs, seq_tokens=seq,
        hbm_gib=round(hbm / 1024**3, 1),
        lower_s=round(t_lower, 1), compile_s=round(t_compile, 1),
    )
    if oom is not None:
        m = re.search(r"Used ([\d.]+)([MG]) of ([\d.]+)G hbm", oom)
        used = float(m.group(1)) * (1 if m.group(2) == "G" else 1 / 1024) if m else None
        # Unpadded HLO-temp figure, when present, separates real demand from
        # HBM tiling padding.
        mu = re.search(r"Unpadded \(([\d.]+)G\)", oom)
        alloc = oom.find("Largest program allocations")
        return dict(
            base, fits=False, oom=True, used_gib=used,
            temp_unpadded_gib=float(mu.group(1)) if mu else None,
            # Keep the exception head too: OOM formats vary (hbm vs vmem,
            # allocator reports without an allocations table), and a
            # 74-minute compile whose finding reduces to "." is a rerun.
            oom_head=oom[:600],
            oom_top=oom[alloc:][:600] if alloc >= 0 else "",
        )

    ma = compiled.memory_analysis()
    hlo = compiled.as_text()
    coll = count_collectives(hlo)
    involuntary = spmd_err.count("Involuntary full rematerialization")

    arg_b = int(ma.argument_size_in_bytes)
    out_b = int(ma.output_size_in_bytes)
    tmp_b = int(ma.temp_size_in_bytes)
    alias_b = int(getattr(ma, "alias_size_in_bytes", 0))
    # Donated state aliases outputs; live peak = args + temps + (outputs not
    # aliased into arguments).
    peak_b = arg_b + tmp_b + max(out_b - alias_b, 0)

    return dict(
        base,
        argument_gib=round(arg_b / 1024**3, 3),
        output_gib=round(out_b / 1024**3, 3),
        temp_gib=round(tmp_b / 1024**3, 3),
        alias_gib=round(alias_b / 1024**3, 3),
        peak_gib=round(peak_b / 1024**3, 3),
        fits=bool(peak_b <= hbm),
        headroom_gib=round((hbm - peak_b) / 1024**3, 2),
        collectives=coll,
        involuntary_remat_warnings=involuntary,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--chip", default="v5e", choices=["v5e", "v5p"])
    ap.add_argument("--parallelism", default=None, help="rep,fsdp,tp override")
    ap.add_argument("--all", action="store_true", help="run the standard stage matrix")
    ap.add_argument("--json", default=None, help="append JSON rows to this file")
    ap.add_argument("-o", "--override", action="append", default=[], help="extra --section.field args")
    ap.add_argument("--layers", type=int, default=None,
                    help="override preset depth (CI-speed compiles of the real configs)")
    ap.add_argument("--lower-only", action="store_true",
                    help="stop after lowering; report the sharding annotations on the "
                         "transformer-stream (boundary-save) activations instead of compiling")
    args = ap.parse_args()

    jobs = []
    if args.all:
        jobs = [
            ("configs/train/ttt-mlp/3s.toml", "v5e", None),  # rep8 x fsdp8 = v5e-64
            ("configs/train/ttt-mlp/3s.toml", "v5p", None),  # same shape on v5p-64
            # 63 s 5B 42L from the shipped TOML — v5p-128 as
            # rep4 x fsdp8 x tp4 + grad-accum 2 (tp=4 is fused-backward-
            # legal at 12 local heads since the G=6 head-major eta layout;
            # accumulation halves the live micro-batch and with it the
            # boundary-save floor of B_micro*L*D*bf16/n_chips). The round-4
            # tp2/accum1 shape OOMed: a 41 GiB un-accumulated boundary slab
            # + 48% allocator fragmentation (docs/aot_scale_r5.json,
            # docs/performance.md "Pod-scale AOT evidence").
            ("configs/train/ttt-mlp/63s.toml", "v5p", None),
        ]
    else:
        assert args.config, "--config or --all required"
        par = tuple(int(x) for x in args.parallelism.split(",")) if args.parallelism else None
        jobs = [(args.config, args.chip, par)]

    rows = []
    for config_file, chip, par in jobs:
        print(f"== AOT {config_file} on {chip} par={par or 'from-config'} ...", flush=True)
        row = aot_check(config_file, chip, par, overrides=list(args.override), layers=args.layers,
                        lower_only=args.lower_only)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
