"""TPU runtime flags the framework depends on.

The default Mosaic scoped-vmem limit is 16 MB — a conservative fraction of
the 128 MB VMEM on v5e. The tuned splash-attention block profile
(q1024/kv2048/c512 with a masked edge block) needs a ~20 MB kernel stack, so
every entry point raises the limit before backend init. The TTT kernels set
their own explicit per-kernel budget (CompilerParams vmem_limit_bytes) and
are unaffected by this global default.

Must be called BEFORE the first jax device use (libtpu snapshots the env at
plugin init; through the axon tunnel the remote compiler receives the same
snapshot).
"""

import os

SCOPED_VMEM_KIB = 64 * 1024


def ensure_tpu_flags(scoped_vmem_kib: int = SCOPED_VMEM_KIB) -> None:
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "--xla_tpu_scoped_vmem_limit_kib" not in cur:
        os.environ["LIBTPU_INIT_ARGS"] = (
            f"{cur} --xla_tpu_scoped_vmem_limit_kib={scoped_vmem_kib}".strip()
        )
