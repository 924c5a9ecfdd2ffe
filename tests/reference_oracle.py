"""Helper to import pure-numeric functions from the reference repo
(/root/reference, PyTorch) as *test oracles*.

Only used in tests, and only when the reference checkout is present; the
framework itself never imports from here. Heavy/unavailable deps (wandb, tqdm)
are stubbed before import.
"""

import importlib.machinery
import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "ttt"))


def load_reference():
    """Insert stubs + path and return the reference's cogvideo.utils and
    ssm.utils modules. Raises ImportError if unavailable."""
    for name in ("wandb", "tqdm"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            if name == "tqdm":
                m.tqdm = lambda x, **k: x
            else:
                m.run = None
            sys.modules[name] = m
    # GPU-only kernel wrapper modules (Triton DSL / ThunderKittens CUDA ext):
    # stub the reference's *wrapper modules* rather than `triton` itself — a
    # fake `triton` in sys.modules breaks torch._inductor's triton probing.
    # The kernels are never called on CPU (use_kernel=False in tests).
    for name, attr in (("ttt.models.ssm.linear_triton", "TritonLinear"),
                       ("ttt.models.ssm.mlp_tk", "TkMLP")):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            setattr(m, attr, type(attr, (), {"apply": staticmethod(lambda *a, **k: None), "sharded_mode": False}))
            sys.modules[name] = m
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import ttt.models.cogvideo.utils as ref_cog_utils
    import ttt.models.ssm.utils as ref_ssm_utils

    return ref_cog_utils, ref_ssm_utils
