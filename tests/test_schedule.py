"""Diffusion schedule parity tests against the reference implementation
(imported from /root/reference as a numeric oracle; see reference_oracle.py)."""

import numpy as np
import pytest

from ttt_video_dit_tpu.models.dit import schedule

from tests.reference_oracle import load_reference, reference_available

needs_reference = pytest.mark.skipif(not reference_available(), reason="reference checkout not available")


@needs_reference
def test_zero_snr_table_matches_reference():
    ref_cog, _ = load_reference()
    ref = ref_cog.ZeroSNRDDPMDiscretization()
    ours = schedule.ZeroSNRDDPMDiscretization()

    ref_table = np.asarray(ref(1000, device="cpu", flip=True))
    our_table = np.asarray(ours(1000, flip=True))
    np.testing.assert_allclose(our_table, ref_table, rtol=1e-6, atol=1e-7)

    ref50, ref_idx = ref(50, device="cpu", return_idx=True)
    our50, our_idx = ours(50, return_idx=True)
    np.testing.assert_allclose(np.asarray(our50), np.asarray(ref50), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(our_idx), np.asarray(ref_idx))


def test_zero_snr_terminal():
    table = np.asarray(schedule.training_sigma_table(1000))
    assert table[0] > 0.999  # nearly clean at index 0
    assert table[-1] == 0.0  # zero terminal SNR (pure noise) at index 999
    assert np.all(np.diff(table) < 0)  # strictly decreasing


@needs_reference
def test_timestep_embedding_matches_reference():
    import torch

    ref_cog, _ = load_reference()
    t = np.array([0.0, 1.0, 17.0, 999.0], np.float32)
    ref = ref_cog.timestep_embedding(torch.tensor(t), 512).numpy()
    ours = np.asarray(schedule.timestep_embedding(np.asarray(t), 512))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-5)  # fp32 trig of large args


def test_video_scaling():
    import jax.numpy as jnp

    a = jnp.asarray([0.1, 0.5, 0.9])
    idx = jnp.asarray([3, 4, 5])
    c_skip, c_out, c_in, c_noise = schedule.video_scaling(a, idx)
    np.testing.assert_allclose(np.asarray(c_skip), np.asarray(a))
    np.testing.assert_allclose(np.asarray(c_out), -np.sqrt(1 - np.asarray(a) ** 2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_in), 1.0)
    np.testing.assert_array_equal(np.asarray(c_noise), np.asarray(idx))


def test_stratified_sigma_buckets():
    # 64-way world, 1000 indices: reference finds group_num=8, width=8
    # (reference: DiscreteSampler.__init__, utils.py:273-284).
    b = schedule.StratifiedSigmaBuckets.create(1000, 64)
    assert b.group_num == 8 and b.group_width == 8

    lo, hi = b.sample_bounds(global_batch_size=64, effective_world_size=64)
    assert lo.shape == (64,)
    # Rank r -> group r//8 -> bucket of width 125.
    assert lo[0] == 0 and hi[0] == 125
    assert lo[63] == 875 and hi[63] == 1000
    # All buckets valid
    assert np.all(hi - lo == 125)

    # Degenerate single-device case covers the whole range.
    b1 = schedule.StratifiedSigmaBuckets.create(1000, 1)
    lo, hi = b1.sample_bounds(4, 1)
    assert np.all(lo == 0) and np.all(hi == 1000)
