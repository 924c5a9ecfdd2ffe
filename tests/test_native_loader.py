"""Native C++ .npy loader: byte-parity with numpy and prefetch-pool behavior.

The loader is optional (built lazily with the system g++); these tests skip
cleanly where no toolchain exists. Replaces nothing — the Python path remains
the default fallback, matching the reference's Python loader
(reference: ttt/datasets/preembedding_dataset.py).
"""

import numpy as np
import pytest

from ttt_video_dit_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


@pytest.mark.parametrize(
    "dtype,shape",
    [
        (np.float32, (3, 4, 5)),
        (np.float16, (7,)),
        (np.float64, (2, 2)),
        (np.int64, (4, 1)),
        (np.uint8, (16, 3)),
        (np.float32, ()),  # 0-d
    ],
)
def test_native_matches_numpy(tmp_path, dtype, shape):
    rng = np.random.default_rng(0)
    arr = (rng.standard_normal(shape) * 100).astype(dtype)
    p = str(tmp_path / "x.npy")
    np.save(p, arr)
    out = native.load_npy(p)
    assert out.dtype == arr.dtype and out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("compressed", [False, True])
def test_native_npz_matches_numpy(tmp_path, compressed):
    """.npz containers: the native loader returns the first member —
    exactly what load_tensor's numpy path (np.load(...)[first key]) returns —
    for both stored (np.savez) and deflate (np.savez_compressed) members."""
    rng = np.random.default_rng(4)
    first = rng.standard_normal((6, 5)).astype(np.float32)
    second = rng.standard_normal((3,)).astype(np.float64)
    p = str(tmp_path / "c.npz")
    (np.savez_compressed if compressed else np.savez)(p, vid=first, aux=second)
    out = native.load_npy(p)
    np.testing.assert_array_equal(out, first)
    ref = np.load(p)
    np.testing.assert_array_equal(out, ref[list(ref.keys())[0]])


def test_load_tensor_npz_roundtrip(tmp_path):
    from ttt_video_dit_tpu.data.dataset import load_tensor

    arr = np.random.default_rng(5).standard_normal((4, 7)).astype(np.float32)
    p = str(tmp_path / "z.npz")
    np.savez_compressed(p, x=arr)
    np.testing.assert_array_equal(load_tensor(p), arr)


def test_npz_in_prefetch_pool(tmp_path):
    arr = np.random.default_rng(6).standard_normal((8, 8)).astype(np.float16)
    p = str(tmp_path / "p.npz")
    np.savez(p, a=arr)
    pool = native.PrefetchPool(num_threads=1)
    try:
        jid = pool.fetch(p)
        np.testing.assert_array_equal(pool.wait(jid), arr)
    finally:
        pool.close()


def test_native_npz_rejects_non_npy_zip(tmp_path):
    """A zip with no .npy member raises (load_tensor then falls back)."""
    import zipfile

    p = str(tmp_path / "bad.npz")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("readme.txt", "not an array")
    with pytest.raises(IOError):
        native.load_npy(p)


def test_native_rejects_fortran_order(tmp_path):
    arr = np.asfortranarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    p = str(tmp_path / "f.npy")
    np.save(p, arr)
    with pytest.raises(IOError):
        native.load_npy(p)


def test_prefetch_pool_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arrays = {i: rng.standard_normal((32, 16)).astype(np.float32) for i in range(8)}
    paths = {}
    for i, a in arrays.items():
        paths[i] = str(tmp_path / f"a{i}.npy")
        np.save(paths[i], a)

    pool = native.PrefetchPool(num_threads=3)
    try:
        for i, p in paths.items():
            pool.submit(i, p)
        # wait out of submission order
        for i in reversed(sorted(arrays)):
            np.testing.assert_array_equal(pool.wait(i), arrays[i])
    finally:
        pool.close()


def test_pool_reports_missing_file(tmp_path):
    pool = native.PrefetchPool(num_threads=1)
    try:
        pool.submit(99, str(tmp_path / "nope.npy"))
        with pytest.raises(IOError):
            pool.wait(99)
    finally:
        pool.close()


def test_load_tensor_uses_native_path(tmp_path):
    from ttt_video_dit_tpu.data.dataset import load_tensor

    arr = np.random.default_rng(2).standard_normal((5, 6)).astype(np.float32)
    p = str(tmp_path / "t.npy")
    np.save(p, arr)
    np.testing.assert_array_equal(load_tensor(p), arr)


@pytest.mark.parametrize(
    "dtype,shape",
    [
        ("float32", (3, 4, 5)),
        ("float16", (7, 2)),
        ("bfloat16", (30, 20)),
        ("float64", (2, 3)),
        ("int64", (4, 6)),
        ("uint8", (5, 5)),
        ("float32", ()),  # 0-d
    ],
)
def test_native_pt_matches_torch(tmp_path, dtype, shape):
    """torch .pt zip containers (the reference's precomputed-latent format,
    reference: data/precomp_video.py) read natively; bf16 widens to f4
    exactly like torch.load(...).float()."""
    torch = pytest.importorskip("torch")
    t = (torch.rand(shape, dtype=torch.float64) * 100).to(getattr(torch, dtype))
    p = str(tmp_path / "t.pt")
    torch.save(t, p)
    got = native.load_npy(p)
    if dtype == "bfloat16":
        want = t.to(torch.float32).numpy()
    else:
        want = t.numpy()
    assert got.shape == tuple(t.shape) and got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_native_pt_strided_views(tmp_path):
    """Non-contiguous / storage-offset tensors gather to C-order, matching
    torch.load's materialized view."""
    torch = pytest.importorskip("torch")
    base = torch.randn(10, 12)
    for name, view in [
        ("transposed", base.t()),
        ("sliced", base[2:7, 1:9]),
        ("strided", base[::2, ::3]),
        ("empty", torch.zeros(0, 4)),
    ]:
        p = str(tmp_path / f"{name}.pt")
        torch.save(view, p)
        np.testing.assert_array_equal(native.load_npy(p), view.numpy(), err_msg=name)


def test_native_pt_rejects_non_tensor(tmp_path):
    """dict/list pickles raise (-42) so load_tensor falls back to torch."""
    torch = pytest.importorskip("torch")
    p = str(tmp_path / "d.pt")
    torch.save({"a": torch.randn(2)}, p)
    with pytest.raises(IOError):
        native.load_npy(p)
    # the fallback path still honors the single-tensor contract by raising
    from ttt_video_dit_tpu.data.dataset import load_tensor

    with pytest.raises(Exception):
        load_tensor(p)


def test_load_tensor_pt_contract(tmp_path):
    """load_tensor('.pt') returns float32 regardless of stored dtype — the
    torch path's .to(torch.float32) contract — via the native reader."""
    torch = pytest.importorskip("torch")
    from ttt_video_dit_tpu.data.dataset import load_tensor

    for dt in (torch.float16, torch.bfloat16, torch.float32):
        t = torch.randn(6, 7).to(dt)
        p = str(tmp_path / "x.pt")
        torch.save(t, p)
        out = load_tensor(p)
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, t.to(torch.float32).numpy())


def test_pt_in_prefetch_pool(tmp_path):
    torch = pytest.importorskip("torch")
    t = torch.randn(8, 8, dtype=torch.float16)
    p = str(tmp_path / "p.pt")
    torch.save(t, p)
    pool = native.PrefetchPool(num_threads=1)
    try:
        np.testing.assert_array_equal(pool.wait(pool.fetch(p)), t.numpy())
    finally:
        pool.close()


def test_load_batch_pool_pt_matches_sequential(tmp_path):
    """A pooled batch whose files are torch .pt posteriors equals the
    sequential path (which exercises _finish's float32 conversion)."""
    import json

    torch = pytest.importorskip("torch")
    from ttt_video_dit_tpu.data.dataset import PreembeddingDataset

    g = torch.Generator().manual_seed(0)
    jsonl = tmp_path / "meta.jsonl"
    with open(jsonl, "w") as f:
        for i in range(4):
            vid_p = tmp_path / f"vid{i}.pt"
            torch.save(torch.randn(3, 4, 2, 2, generator=g, dtype=torch.float32).to(torch.bfloat16), vid_p)
            txt_ps = []
            for s in range(2):
                tp = tmp_path / f"txt{i}_{s}.pt"
                torch.save(torch.randn(5, 8, generator=g), tp)
                txt_ps.append(str(tp))
            f.write(json.dumps({"vid_emb": str(vid_p), "text_chunk_emb": txt_ps}) + "\n")
    make = lambda: PreembeddingDataset(None, 0.7, str(jsonl), seed=11)
    seq = make().load_batch([2, 0, 3])
    pool = native.PrefetchPool(num_threads=2)
    try:
        par = make().load_batch([2, 0, 3], pool)
    finally:
        pool.close()
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a["vid"], b["vid"])
        np.testing.assert_array_equal(a["text"], b["text"])


def _make_dataset(tmp_path, n=6, scenes=2, broken=()):
    """Tiny on-disk preembedding dataset; indices in ``broken`` get a
    corrupt vid file so the per-sample retry fallback is exercised."""
    import json

    from ttt_video_dit_tpu.data.dataset import PreembeddingDataset

    rng = np.random.default_rng(3)
    jsonl = tmp_path / "meta.jsonl"
    with open(jsonl, "w") as f:
        for i in range(n):
            vid_p = tmp_path / f"vid{i}.npy"
            if i in broken:
                vid_p.write_bytes(b"not an npy file")
            else:
                np.save(vid_p, rng.standard_normal((3, 4, 2, 2)).astype(np.float32))
            txt_ps = []
            for s in range(scenes):
                tp = tmp_path / f"txt{i}_{s}.npy"
                np.save(tp, rng.standard_normal((5, 8)).astype(np.float32))
                txt_ps.append(str(tp))
            f.write(json.dumps({"vid_emb": str(vid_p), "text_chunk_emb": txt_ps}) + "\n")
    return lambda: PreembeddingDataset(None, 0.7, str(jsonl), seed=11)


def test_load_batch_pool_matches_sequential(tmp_path):
    """Pooled batch loading is bit-identical to sequential __getitem__,
    including the posterior-sampling RNG stream."""
    make = _make_dataset(tmp_path)
    seq = make().load_batch([4, 0, 2, 5])
    pool = native.PrefetchPool(num_threads=3)
    try:
        par = make().load_batch([4, 0, 2, 5], pool)
    finally:
        pool.close()
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a["vid"], b["vid"])
        np.testing.assert_array_equal(a["text"], b["text"])


def test_load_batch_falls_back_per_sample(tmp_path):
    """A corrupt file inside a pooled batch raises the same 10-retry error
    as the sequential path, after the preceding samples loaded fine; a batch
    avoiding the corrupt index is unaffected."""
    import pytest as _pytest

    make = _make_dataset(tmp_path, broken={1})
    pool = native.PrefetchPool(num_threads=2)
    try:
        ok = make().load_batch([0, 2, 3], pool)
        assert len(ok) == 3
        with _pytest.raises(RuntimeError, match="after 10 retries"):
            make().load_batch([0, 1, 2], pool)
    finally:
        pool.close()


def test_datamodule_batches_use_pool(tmp_path):
    """End-to-end DataModule stream parity: with the native pool active in
    the worker, batches equal the ones a no-pool module produces."""
    import json

    from ttt_video_dit_tpu.data.dataset import DataModule

    _make_dataset(tmp_path, n=8)()  # writes the files + jsonl
    jsonl = str(tmp_path / "meta.jsonl")

    def take(n, monkey_off):
        import ttt_video_dit_tpu.data.native as native_mod

        orig = native_mod.available
        if monkey_off:
            native_mod.available = lambda: False
        try:
            dm = DataModule(None, 0.7, jsonl, seed=11)
            it = dm.batches(4, prefetch=1)
            out = [next(it) for _ in range(n)]
            it.close()
            return out
        finally:
            native_mod.available = orig

    with_pool = take(3, monkey_off=False)
    without = take(3, monkey_off=True)
    for a, b in zip(with_pool, without):
        np.testing.assert_array_equal(a["vid"], b["vid"])
        np.testing.assert_array_equal(a["text"], b["text"])

def test_pt_dict_matches_torch(tmp_path):
    """State-dict .pt checkpoints (the reference's VAE checkpoint format,
    reference: ttt/models/vae/model.py torch.load) read natively: nested
    dicts flatten with dotted names, non-tensor values drop, every tensor is
    bit-identical to torch.load, bf16 widens like .float()."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    m = nn.Sequential(nn.Conv3d(2, 3, (1, 3, 3)), nn.GroupNorm(1, 3), nn.Linear(4, 5))
    sd = m.state_dict()  # OrderedDict with a _metadata attribute -> BUILD op
    sd["halfw"] = torch.randn(3, 4).to(torch.bfloat16)
    p = str(tmp_path / "ckpt.pt")
    torch.save({"state_dict": sd, "global_step": 1234, "note": "hello"}, p)

    got = native.load_pt_dict(p)
    want = torch.load(p, map_location="cpu", weights_only=False)["state_dict"]
    assert set(got) == {f"state_dict.{k}" for k in want}
    for k, t in want.items():
        ref = t.to(torch.float32).numpy() if t.dtype == torch.bfloat16 else t.numpy()
        np.testing.assert_array_equal(got[f"state_dict.{k}"], ref, err_msg=k)


def test_pt_dict_flat_and_views(tmp_path):
    """A flat (no wrapper) dict with shared-storage views: each entry
    materializes independently to C-order."""
    torch = pytest.importorskip("torch")
    base = torch.randn(6, 8)
    p = str(tmp_path / "flat.pt")
    torch.save({"base": base, "t": base.t(), "slice": base[1:5, 2:7]}, p)
    got = native.load_pt_dict(p)
    np.testing.assert_array_equal(got["base"], base.numpy())
    np.testing.assert_array_equal(got["t"], base.t().numpy())
    np.testing.assert_array_equal(got["slice"], base[1:5, 2:7].numpy())


def test_pt_dict_rejects_single_tensor(tmp_path):
    """A single-tensor .pt is not a dict checkpoint: open fails (IOError)
    and the caller falls back to torch.load."""
    torch = pytest.importorskip("torch")
    p = str(tmp_path / "single.pt")
    torch.save(torch.randn(3), p)
    with pytest.raises(IOError):
        native.load_pt_dict(p)


def test_vae_checkpoint_native_equals_torch_path(tmp_path):
    """load_torch_vae_checkpoint yields the identical param trees whether the
    state dict came through the native reader or torch.load."""
    torch = pytest.importorskip("torch")
    import jax

    from ttt_video_dit_tpu.models.vae import autoencoder as ae

    sd = {
        "encoder.conv_in.conv.weight": torch.randn(4, 3, 3, 3, 3),
        "encoder.conv_in.conv.bias": torch.randn(4),
        "decoder.up.0.block.1.conv1.conv.weight": torch.randn(4, 4, 3, 3, 3),
        "decoder.up.0.block.1.norm1.weight": torch.randn(4),
        "loss.disc.weight": torch.randn(2, 2),  # ignored prefix
    }
    p = str(tmp_path / "vae.pt")
    torch.save({"state_dict": sd}, p)

    enc_n, dec_n = ae.load_torch_vae_checkpoint(p)

    import ttt_video_dit_tpu.data.native as native_mod

    orig = native_mod.available
    native_mod.available = lambda: False
    try:
        enc_t, dec_t = ae.load_torch_vae_checkpoint(p)
    finally:
        native_mod.available = orig

    for a, b in ((enc_n, enc_t), (dec_n, dec_t)):
        la, lb = jax.tree_util.tree_leaves_with_path(a), jax.tree_util.tree_leaves_with_path(b)
        assert [k for k, _ in la] == [k for k, _ in lb] and la
        for (ka, va), (_, vb) in zip(la, lb):
            np.testing.assert_array_equal(va, vb, err_msg=str(ka))
            assert va.dtype == np.float32
