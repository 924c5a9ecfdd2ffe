"""Device-less AOT compilation of the 63 s pod config against a TPU topology.

scripts/aot_scale_check.py proves — with the compiler, not a slope
extrapolation — that the real curriculum configs fit per chip and shard
cleanly at their intended cluster shapes (the reference trains 63 s at
16 nodes x 4 shard x tp4 = 256 H100s: /root/reference/configs/train/
ttt-mlp/63s.toml:43-46, train_submitit.py:17-18). This test runs the same
harness against a detached 8-chip v5p topology (1 replica x fsdp2 x tp4)
with the REAL 63 s stage config — its real 352k-token sequence geometry,
remat recipe, kernels and sharding rules — reduced in the two axes that are
provably independent of them: depth (2 layers; the per-layer program is
identical) and global batch (2; per-chip batch is 1 either way after data
sharding). v5p, not v5e: the 63 s per-layer recompute workspace alone is
~28 GB at per-chip batch 1 (AOT-measured — the [B*C, S, D] window tensors
are 2.11 GB each), which no 16 GB chip holds; that is the same arithmetic
that sizes the real stage to v5p-128 (docs/performance.md "Pod-scale AOT
evidence", where the full-scale 42-layer rows live).

GATED: a 352k-token topology compile takes ~45-60 min of XLA time, far past
the suite budget, so the test skips unless TTT_RUN_AOT_TEST=1 — run it
manually (or from a nightly lane) after touching sharding rules, remat
policies, or the Pallas kernel shard_map wrappers:

    TTT_RUN_AOT_TEST=1 python -m pytest tests/test_aot_scale.py -q

Runs in a subprocess: libtpu topology initialization is process-global and
must not leak into the CPU-forced test process. jax.experimental.topologies
also holds /tmp/libtpu_lockfile — only one topology-using process at a time.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("TTT_RUN_AOT_TEST") != "1",
    reason="~45-60 min topology compile; set TTT_RUN_AOT_TEST=1 to run",
)
def test_63s_pod_config_aot_compiles(tmp_path):
    # TTT_AOT_ARTIFACT redirects the JSON row to a stable path so a manual /
    # nightly run leaves a committable artifact (tests/artifacts/aot_63s_ci.jsonl).
    artifact = os.environ.get("TTT_AOT_ARTIFACT")
    out_json = __import__("pathlib").Path(artifact) if artifact else tmp_path / "aot.jsonl"
    if artifact and out_json.exists():
        out_json.unlink()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "scripts/aot_scale_check.py",
         "--config", "configs/train/ttt-mlp/63s.toml",
         "--chip", "v5p", "--parallelism", "1,2,4", "--layers", "2",
         "--override=--training.global_batch_size", "--override=2",
         "--json", str(out_json)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=5400,
    )
    if proc.returncode != 0 and ("libtpu" in proc.stderr or "PJRT" in proc.stderr
                                 or "plugin" in proc.stderr.lower()):
        pytest.skip(f"TPU topology plugin unavailable: {proc.stderr[-300:]}")
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"

    rows = [json.loads(l) for l in out_json.read_text().splitlines()]
    assert len(rows) == 1
    row = rows[0]
    assert row["chips"] == 8 and row["mesh"] == {"replica": 1, "fsdp": 2, "tensor": 4}
    # The real 63 s sequence geometry: 21 scenes x 512 text tokens + 341,760
    # video tokens (the synthetic text length resolves to 512 — the first
    # value >= 498 that keeps the sequence divisible by the TTT mini-batch).
    assert row["seq_tokens"] == 352512
    # 2L d3072 at per-chip batch 1 under fsdp2 x tp4 must FIT a 95 GB v5p,
    # with sane magnitude (measured ~31 GB; 64 GB would mean a memory
    # regression in the layer workspace or the boundary-save sharding).
    assert row.get("fits"), row
    assert row["peak_gib"] < 64.0, row
    # TP is real: the step must carry cross-chip collectives, and GSPMD must
    # not fall back to replicate-and-reslice anywhere.
    coll = row["collectives"]
    assert sum(coll.values()) > 0, coll
    assert row["involuntary_remat_warnings"] == 0, row
