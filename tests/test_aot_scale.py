"""Device-less AOT compilation of the 63 s pod config against a TPU topology.

scripts/aot_scale_check.py proves — with the compiler, not a slope
extrapolation — that the real curriculum configs fit per chip and shard
cleanly at their intended cluster shapes (the reference trains 63 s at
16 nodes x 4 shard x tp4 = 256 H100s: /root/reference/configs/train/
ttt-mlp/63s.toml:43-46, train_submitit.py:17-18). This test runs the same
harness against a detached 8-chip v5e topology (1 replica x fsdp2 x tp4)
with the REAL 63 s stage config at CI depth (2 layers — sharding rules,
Pallas kernels and collectives are depth-independent), and asserts the
compiled memory analysis and collective/remat findings come back sane.

Runs in a subprocess: libtpu topology initialization is process-global and
must not leak into the CPU-forced test process.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_63s_pod_config_aot_compiles(tmp_path):
    out_json = tmp_path / "aot.jsonl"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "scripts/aot_scale_check.py",
         "--config", "configs/train/ttt-mlp/63s.toml",
         "--chip", "v5e", "--parallelism", "1,2,4", "--layers", "2",
         "--json", str(out_json)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0 and ("libtpu" in proc.stderr or "PJRT" in proc.stderr
                                 or "plugin" in proc.stderr.lower()):
        pytest.skip(f"TPU topology plugin unavailable: {proc.stderr[-300:]}")
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"

    rows = [json.loads(l) for l in out_json.read_text().splitlines()]
    assert len(rows) == 1
    row = rows[0]
    assert row["chips"] == 8 and row["mesh"] == {"replica": 1, "fsdp": 2, "tensor": 4}
    assert row["seq_tokens"] == 351168  # the real 63 s sequence geometry
    # 2L d3072 under fsdp2 x tp4 must FIT a 16 GB v5e with real headroom.
    assert row.get("fits"), row
    assert row["peak_gib"] < 16.0
    # TP is real: the step must carry cross-chip collectives, and GSPMD must
    # not fall back to replicate-and-reslice anywhere.
    coll = row["collectives"]
    assert sum(coll.values()) > 0, coll
    assert row["involuntary_remat_warnings"] == 0, row
