"""Multi-process batch feeding: per-process shards -> globally-sharded arrays.

Covers the process-sharding path of DataModule / SyntheticDataModule and the
``make_global_batch`` assembly (reference equivalent: effective-rank batch
partitioning, reference train.py:126 + ttt/infra/parallelisms.py:46-54).
True multi-process JAX cannot run in one pytest process, so the sharding
logic is validated by (a) checking that per-process DataModule shards tile
the global index order exactly, and (b) checking make_global_batch's
device-side layout on the 8-device mesh in the single-process case.
"""

import json

import jax
import numpy as np
import pytest

from ttt_video_dit_tpu.data.dataset import DataModule, SyntheticDataModule
from ttt_video_dit_tpu.parallel.mesh import build_mesh
from ttt_video_dit_tpu.training.setup import batch_shardings, make_global_batch


@pytest.fixture
def jsonl_dataset(tmp_path):
    """Tiny on-disk dataset: 8 samples of [2, 2C, 4, 4] posteriors + text."""
    meta_path = tmp_path / "meta.jsonl"
    with open(meta_path, "w") as f:
        for i in range(8):
            vid = np.full((2, 4, 4, 4), float(i), np.float32)  # mean=i, logvar=i
            np.save(tmp_path / f"vid_{i}.npy", vid)
            txt = np.full((3, 8), float(i), np.float32)
            np.save(tmp_path / f"txt_{i}.npy", txt)
            f.write(json.dumps({"vid_emb": f"vid_{i}.npy", "text_chunk_emb": [f"txt_{i}.npy"]}) + "\n")
    return str(tmp_path), str(meta_path)


def test_process_shards_tile_global_batch(jsonl_dataset):
    root, meta = jsonl_dataset
    global_bs, pc = 4, 2

    # One module per simulated process, identical seeds -> identical sampler
    # permutations; shards must be contiguous slices of the same global batch.
    mods = [
        DataModule(root, scale_factor=1.0, jsonl_paths=meta, seed=0, process_index=pi, process_count=pc)
        for pi in range(pc)
    ]
    iters = [m.batches(global_bs) for m in mods]
    shards = [next(it) for it in iters]

    for s in shards:
        assert s["vid"].shape[0] == global_bs // pc

    # The underlying sample identity is recoverable from the constant fill
    # value (mean=i, noise scales with exp(i/2) — identify via text, which is
    # loaded verbatim).
    ids = [s["text"][:, 0, 0].astype(int).tolist() for s in shards]
    global_ids = [i for shard in ids for i in shard]
    # Same global permutation as a single-process module sees.
    ref = DataModule(root, scale_factor=1.0, jsonl_paths=meta, seed=0)
    ref_ids = next(ref.batches(global_bs))["text"][:, 0, 0].astype(int).tolist()
    assert global_ids == ref_ids
    # Samplers advance by the *global* batch on every process.
    assert all(m.sampler.counter == global_bs for m in mods)


def test_synthetic_module_yields_local_shards():
    m = SyntheticDataModule(vid_shape=(2, 4, 4, 4), text_shape=(1, 8, 16), seed=0, process_count=4)
    b = next(m.batches(8))
    assert b["vid"].shape[0] == 2 and b["text"].shape[0] == 2
    assert m.sampler.counter == 8


def test_make_global_batch_sharded_layout():
    mesh = build_mesh(dp_replicate=2, dp_sharding=2, tp_sharding=2)
    shardings = batch_shardings(mesh)
    host = {
        "vid": np.arange(4 * 3, dtype=np.float32).reshape(4, 3),
        "sigma_lo": np.arange(4, dtype=np.int32),
    }
    batch = make_global_batch(host, shardings, process_count=1)
    assert batch["vid"].shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(batch["vid"]), host["vid"])
    np.testing.assert_array_equal(np.asarray(batch["sigma_lo"]), host["sigma_lo"])
    # Batch dim is sharded over the data axes (replica x fsdp = 4-way).
    assert batch["vid"].sharding.is_equivalent_to(shardings["vid"], ndim=2)
    shard_rows = {int(s.index[0].start or 0) for s in batch["vid"].addressable_shards}
    assert shard_rows == {0, 1, 2, 3}


def test_sampler_resume_exact_data_order(jsonl_dataset):
    """Checkpointed sampler state resumes at the first *unconsumed* batch even
    with prefetching (counter commits at consumption, not production)."""
    root, meta = jsonl_dataset

    m1 = DataModule(root, scale_factor=1.0, jsonl_paths=meta, seed=0)
    it1 = m1.batches(2)
    next(it1)  # consume batch 0 (prefetch worker races ahead internally)
    state = m1.sampler.state_dict()
    b1 = next(it1)["text"][:, 0, 0].astype(int).tolist()  # batch 1

    m2 = DataModule(root, scale_factor=1.0, jsonl_paths=meta, seed=0)
    m2.sampler.load_state_dict(state)
    b1_resumed = next(m2.batches(2))["text"][:, 0, 0].astype(int).tolist()
    assert b1_resumed == b1
