"""Compiled-mode TPU kernel smoke: value/grad parity at shapes the CPU test
suite can only cover in pallas interpret mode.

The discriminators live in ttt_video_dit_tpu/utils/selftest.py and also run
automatically inside ``bench.py`` (the ``selftest`` field of the bench JSON),
so every driver bench doubles as a hardware parity artifact; this script is
the verbose manual entry point.

Run: python scripts/tpu_smoke.py   (takes a few minutes of compiles)
Exit 0 + "TPU_SMOKE_OK" on success. Intended for hardware CI; results for
this repo are recorded in docs/performance.md.
"""

import os.path as osp
import sys

# Self-contained path setup: appending (not prepending via PYTHONPATH=.)
# keeps /root-style site hooks intact — overriding PYTHONPATH clobbers the
# axon plugin's sitecustomize dir and kills the TPU backend registration.
sys.path.append(osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    # The tuned splash blocks need the raised Mosaic scoped-vmem limit every
    # entry point sets; must happen before first device use (utils/tpu_flags).
    from ttt_video_dit_tpu.utils.tpu_flags import ensure_tpu_flags

    ensure_tpu_flags()

    import jax

    from ttt_video_dit_tpu.utils.selftest import kernel_selftest

    assert jax.devices()[0].platform == "tpu", "needs a TPU device"
    result = kernel_selftest(log=print)
    print("TPU_SMOKE_OK" if result["ok"] else "TPU_SMOKE_FAIL")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
