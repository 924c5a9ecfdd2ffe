"""TPU runtime flags the framework depends on.

The default Mosaic scoped-vmem limit is 16 MB — a conservative fraction of
the 128 MB VMEM on v5e. The round-3 tuned splash-attention block profile
(fwd q1024/kv9216/c1024, bwd q1024/kv6144/c1024) needs an ~85 MB kernel
stack when the padded-KV edge block carries a partial mask (the lazy
_KVPadMask tile grows with block_kv), so every entry point raises the limit
to 100 MB before backend init — v5e has 128 MB of VMEM. The TTT kernels set
their own explicit per-kernel budget (CompilerParams vmem_limit_bytes) and
are unaffected by this global default.

Must be called BEFORE the first jax device use (libtpu snapshots the env at
plugin init; through the axon tunnel the remote compiler receives the same
snapshot).
"""

import os

SCOPED_VMEM_KIB = 100 * 1024


def ensure_tpu_flags(scoped_vmem_kib: int = SCOPED_VMEM_KIB) -> None:
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "--xla_tpu_scoped_vmem_limit_kib" not in cur:
        os.environ["LIBTPU_INIT_ARGS"] = (
            f"{cur} --xla_tpu_scoped_vmem_limit_kib={scoped_vmem_kib}".strip()
        )
