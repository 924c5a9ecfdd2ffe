"""Precomputed-embedding dataset and fault-tolerant deterministic sampling.

Host-side (numpy) counterpart of the reference's data pipeline
(reference: ttt/datasets/preembedding_dataset.py, data_sampler.py): JSONL
metadata pointing at precomputed VAE latent posteriors (mean+logvar) and
per-scene T5 text embeddings; the posterior is sampled at load time and
scaled. The sampler draws one shared seed-0 permutation, tracks an exact-resume
``counter``, and is checkpointable.

Differences from the reference, by design:
- The SPMD train step consumes the *global* batch from one controller
  process, so the sampler yields contiguous global batches instead of
  rank-strided indices (multi-host feeding shards by jax.process_index()).
- Tensor files may be torch ``.pt`` (loaded via torch-cpu and converted) or
  ``.npy``/``.npz``.
"""

from __future__ import annotations

import json
import os.path as osp
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


_NATIVE_SUFFIXES = (".npy", ".npz", ".pt")


def _finish(path: str, arr: np.ndarray) -> np.ndarray:
    """Match the torch-loader contract for ``.pt`` payloads (float32 out,
    like ``torch.load(...).to(torch.float32)``); array formats pass through
    byte-identical to ``np.load``."""
    return arr.astype(np.float32) if path.endswith(".pt") and arr.dtype != np.float32 else arr


def load_tensor(path: str) -> np.ndarray:
    # Native C++ reader when the toolchain allows (ttt_video_dit_tpu/
    # data/_native): .npy byte-identical to np.load; .npz the first member
    # (stored or deflate); torch .pt single-tensor zips (the reference's
    # precomputed-latent format). Parses+reads+inflates off the GIL.
    if path.endswith(_NATIVE_SUFFIXES):
        from ttt_video_dit_tpu.data import native

        if native.available():
            try:
                return _finish(path, native.load_npy(path))
            except (IOError, RuntimeError):
                pass  # dict .pt/unusual dtype/layout/zip64 -> Python fallback
    if path.endswith(".npz"):
        data = np.load(path)
        return data[list(data.keys())[0]]
    if path.endswith(".npy"):
        return np.load(path)
    # torch .pt — torch-cpu is a baked-in dependency used only as a file loader.
    import torch

    t = torch.load(path, map_location="cpu", weights_only=True)
    return t.to(torch.float32).numpy()


def sample_diagonal_gaussian(parameters: np.ndarray, rng: np.random.Generator, channel_axis: int = 1) -> np.ndarray:
    """Sample from a diagonal Gaussian stored as concat(mean, logvar) on
    ``channel_axis`` (reference: ttt/models/vae/regularizers.py:10-23)."""
    mean, logvar = np.split(parameters, 2, axis=channel_axis)
    logvar = np.clip(logvar, -30.0, 20.0)
    std = np.exp(0.5 * logvar)
    return (mean + std * rng.standard_normal(mean.shape)).astype(np.float32)


class PreembeddingDataset:
    """JSONL-described dataset of precomputed latents + text embeddings."""

    def __init__(self, dataset_path: Optional[str], scale_factor: float, jsonl_paths, seed: int = 0):
        self.dataset_path = dataset_path or ""
        self.scale_factor = scale_factor
        self.metadata_list: List[dict] = []
        self._rng = np.random.default_rng(seed)

        if isinstance(jsonl_paths, str):
            jsonl_paths = jsonl_paths.split(",")
        for jsonl_path in jsonl_paths:
            with open(jsonl_path, "r") as f:
                for line in f:
                    if line.strip():
                        self.metadata_list.append(json.loads(line))

    def __len__(self) -> int:
        return len(self.metadata_list)

    def abs_path(self, path: str) -> str:
        return path if osp.isabs(path) else osp.join(self.dataset_path, path)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        err: Optional[Exception] = None
        for _ in range(10):  # data-level fault tolerance (reference: :36-41)
            try:
                return self._load(index)
            except Exception as e:  # noqa: BLE001 — deliberately broad, like the reference
                err = e
        raise RuntimeError(f"Failed to load sample {index} after 10 retries") from err

    def _load(self, index: int) -> Dict[str, np.ndarray]:
        metadata = self.metadata_list[index]
        posterior = load_tensor(self.abs_path(metadata["vid_emb"]))  # [T, 2C, H, W]
        vae_emb = self.scale_factor * sample_diagonal_gaussian(posterior, self._rng, channel_axis=1)
        txt = np.stack([load_tensor(self.abs_path(p)) for p in metadata["text_chunk_emb"]], axis=0)
        return {"vid": vae_emb, "text": txt.astype(np.float32)}

    def load_batch(self, indices, pool=None) -> List[Dict[str, np.ndarray]]:
        """Load a list of samples; with a native PrefetchPool every ``.npy``
        read across the whole batch is submitted to the C++ thread pool up
        front, so file IO + header parsing for all samples overlap (off the
        GIL) instead of running one file at a time. Results — including the
        posterior-sampling RNG stream, which is consumed in sample order
        *after* a sample's reads complete — are identical to the sequential
        ``self[i]`` path; any per-sample failure falls back to the 10-retry
        sequential load (reference: ttt/datasets/preembedding_dataset.py:36-41)."""
        if pool is None:
            return [self[i] for i in indices]
        fetch = lambda p: pool.fetch(p) if p.endswith(_NATIVE_SUFFIXES) else None
        plan = []
        for i in indices:
            md = self.metadata_list[i]
            vid_p = self.abs_path(md["vid_emb"])
            txt_ps = [self.abs_path(p) for p in md["text_chunk_emb"]]
            plan.append((i, vid_p, fetch(vid_p), txt_ps, [fetch(p) for p in txt_ps]))
        out = []
        for i, vid_p, vid_j, txt_ps, txt_js in plan:
            try:
                posterior = _finish(vid_p, pool.wait(vid_j)) if vid_j is not None else load_tensor(vid_p)
                texts = [
                    _finish(p, pool.wait(j)) if j is not None else load_tensor(p)
                    for p, j in zip(txt_ps, txt_js)
                ]
            except Exception:
                # Drain this sample's outstanding payloads, then take the
                # retrying sequential path. The RNG has not been touched yet,
                # so the posterior draw happens exactly once either way.
                for j in [vid_j, *txt_js]:
                    if j is not None:
                        pool.discard(j)
                out.append(self[i])
                continue
            vae_emb = self.scale_factor * sample_diagonal_gaussian(posterior, self._rng, channel_axis=1)
            out.append({"vid": vae_emb, "text": np.stack(texts, axis=0).astype(np.float32)})
        return out


class FaultTolerantSampler:
    """Deterministic shuffled index stream with exact-resume state
    (reference: RandomFaultTolerantSampler, data_sampler.py:7-48).

    One shared permutation (seed 0 by default) across all processes; the
    ``counter`` records consumed samples for exact data-order resume.
    """

    def __init__(self, num_samples: int, seed: int = 0):
        self.num_samples = num_samples
        self._seed = seed
        self._epoch_seed = seed
        self.counter = 0

    def state_dict(self) -> dict:
        return {"epoch_seed": int(self._epoch_seed), "counter": int(self.counter)}

    def load_state_dict(self, state: dict) -> None:
        self._epoch_seed = int(state["epoch_seed"])
        self.counter = int(state.get("counter", 0))

    def commit(self, epoch_seed: int, counter: int) -> None:
        """Record consumed position (called by the consumer at yield time, so
        checkpointed state never runs ahead of training)."""
        self._epoch_seed = int(epoch_seed)
        self.counter = int(counter)

    @staticmethod
    def epoch_permutation(epoch_seed: int, num_samples: int) -> np.ndarray:
        """Pure permutation for one epoch — shared (same seed) across all
        processes, like the reference's seed-0 permutation
        (reference: ttt/datasets/data_sampler.py:7-48)."""
        return np.random.default_rng(epoch_seed).permutation(num_samples)

    def __iter__(self) -> Iterator[int]:
        """Resume-aware infinite index stream (single-threaded convenience;
        DataModule's prefetch worker drives epoch_permutation directly and
        commits positions at consumption time instead)."""
        epoch_seed, counter = self._epoch_seed, self.counter
        while True:
            indices = self.epoch_permutation(epoch_seed, self.num_samples)[counter:]
            yield from indices.tolist()
            epoch_seed += 1
            counter = 0


class DataModule:
    """Assembles global batches with background prefetch.

    For multi-host feeding, pass process_index/process_count: each host loads
    its contiguous shard of every global batch (GSPMD stitches them into the
    globally-sharded array via jax.make_array_from_process_local_data).
    """

    def __init__(
        self,
        dataset_path: Optional[str],
        scale_factor: float,
        jsonl_paths,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = PreembeddingDataset(dataset_path, scale_factor, jsonl_paths, seed=seed)
        self.sampler = FaultTolerantSampler(len(self.dataset), seed=0)
        self.process_index = process_index
        self.process_count = process_count

    def batches(self, global_batch_size: int, prefetch: int = 2) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite stream of per-process batch shards (size global/process_count)."""
        assert global_batch_size % self.process_count == 0
        local = global_batch_size // self.process_count
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def worker():
            # Batch-internal IO parallelism: every .npy in a batch is read by
            # the native C++ pool concurrently (dataset.load_batch). Optional
            # — without a toolchain the sequential Python path is identical.
            pool = None
            try:
                from ttt_video_dit_tpu.data import native

                if native.available():
                    pool = native.PrefetchPool(num_threads=4)
            except Exception:
                pool = None
            # Worker-local epoch bookkeeping: the shared sampler object is
            # only *read* here (its committed state is written by the
            # consumer), so prefetching never races checkpointed state.
            epoch_seed, counter = self.sampler._epoch_seed, self.sampler.counter
            remaining = FaultTolerantSampler.epoch_permutation(epoch_seed, len(self.dataset))[counter:].tolist()
            try:
                while not stop.is_set():
                    if len(remaining) < global_batch_size:
                        # Dataloader reset (reference: train.py:28-33): the partial
                        # tail is dropped and a fresh epoch permutation begins, so
                        # every batch maps to exactly one (epoch_seed, counter).
                        epoch_seed += 1
                        counter = 0
                        remaining = FaultTolerantSampler.epoch_permutation(epoch_seed, len(self.dataset)).tolist()
                    idxs, remaining = remaining[:global_batch_size], remaining[global_batch_size:]
                    counter += global_batch_size
                    shard = idxs[self.process_index * local : (self.process_index + 1) * local]
                    samples = self.dataset.load_batch(shard, pool)
                    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
                    # Position is committed by the *consumer* at yield time — if it
                    # advanced at production time, prefetched-but-unconsumed batches
                    # would be skipped after a checkpoint resume (reference commits
                    # per consumed batch, reference: train.py:43).
                    while not stop.is_set():
                        try:
                            q.put((batch, (epoch_seed, counter)), timeout=0.2)
                            break
                        except queue.Full:
                            continue
            finally:
                if pool is not None:
                    pool.close()

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        try:
            while True:
                batch, (epoch_seed, counter) = q.get()
                self.sampler.commit(epoch_seed, counter)
                yield batch
        finally:
            stop.set()


class SyntheticDataModule:
    """Drop-in synthetic-data module for smoke tests/benchmarks — generates
    random latents/text embeddings with the right geometry."""

    def __init__(self, vid_shape, text_shape, seed: int = 0, process_count: int = 1):
        self.vid_shape = vid_shape
        self.text_shape = text_shape
        self.sampler = FaultTolerantSampler(1 << 30, seed=seed)
        self._rng = np.random.default_rng(seed)
        self.process_count = process_count

    def batches(self, global_batch_size: int, prefetch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yields this process's shard (global/process_count), like DataModule."""
        assert global_batch_size % self.process_count == 0
        local = global_batch_size // self.process_count
        while True:
            self.sampler.counter += global_batch_size
            yield {
                "vid": self._rng.standard_normal((local, *self.vid_shape)).astype(np.float32),
                "text": self._rng.standard_normal((local, *self.text_shape)).astype(np.float32),
            }
