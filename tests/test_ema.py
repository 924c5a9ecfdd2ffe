"""EMA utility vs the reference's LitEma semantics (reference: ttt/models/vae/ema.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ttt_video_dit_tpu.utils import ema


def test_ema_matches_manual_recurrence():
    params = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(3.0)}
    state = ema.init(params)

    expect = {k: np.asarray(v, np.float64) for k, v in params.items()}
    for n in range(5):
        params = {k: v + 1.0 for k, v in params.items()}
        state = ema.update(state, params, decay=0.9999)
        d = min(0.9999, (1 + n) / (10 + n))
        expect = {k: d * expect[k] + (1 - d) * np.asarray(params[k]) for k in expect}

    for k in expect:
        np.testing.assert_allclose(np.asarray(state.ema_params[k]), expect[k], rtol=1e-6)
    assert int(state.num_updates) == 5


def test_ema_without_warmup_and_under_jit():
    params = {"w": jnp.ones((4,))}
    state = ema.init(params, use_num_updates=False)
    step = jax.jit(lambda s, p: ema.update(s, p, decay=0.5))
    state = step(state, {"w": jnp.full((4,), 3.0)})
    np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 2.0)  # 0.5*1 + 0.5*3
    assert int(state.num_updates) == -1

    eval_params, stash = ema.swap(state, params)
    assert eval_params is state.ema_params and stash is params
