"""Multi-host runtime initialization.

The reference brings up multi-process training with hand-rolled
NCCL/env-var plumbing (``init_distributed_mode``,
editor/vllms_for_edit/minigpt4/modules/dist_utils.py:56-81: RANK /
WORLD_SIZE parsing, ``torch.distributed.init_process_group`` with a TCP
store). The TPU-native replacement is one guarded call to
``jax.distributed.initialize``: after it, every host sees the global
device set through ``jax.devices()``, ``make_mesh`` /
``make_multislice_mesh`` lay those devices out, and GSPMD handles all
cross-host collectives — no rank bookkeeping anywhere downstream.

Call :func:`init_distributed` ONCE, before any other jax API touches a
backend (the distributed runtime must exist before backend init).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

_initialized = False


def is_distributed_env() -> bool:
    """True when the environment carries multi-host coordinates — either
    this package's explicit vars or a Cloud-TPU/SLURM/OpenMPI launcher
    environment jax's cluster autodetection understands."""
    if os.environ.get("DEVQA_COORDINATOR_ADDRESS"):
        return True
    if os.environ.get("DEVQA_DISTRIBUTED") == "1":
        return True
    # jax.distributed's own autodetected launchers
    return any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE"))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize jax's multi-host runtime when (and only when) this is a
    multi-host launch; single-host runs are a silent no-op.

    Coordinates come from the arguments, else from the environment:
    ``DEVQA_COORDINATOR_ADDRESS`` / ``DEVQA_NUM_PROCESSES`` /
    ``DEVQA_PROCESS_ID`` (explicit, the moral equivalent of the
    reference's MASTER_ADDR/RANK/WORLD_SIZE, dist_utils.py:58-66), else
    jax's own cluster autodetection (Cloud TPU metadata, SLURM, OpenMPI)
    when ``DEVQA_DISTRIBUTED=1`` opts in.

    Returns True iff the distributed runtime is (now) initialized.
    Idempotent: a second call returns True without re-initializing.
    Raises if called after a jax backend already initialized in a
    genuinely-distributed environment (too late to coordinate).
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = (coordinator_address
                           or os.environ.get("DEVQA_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("DEVQA_NUM_PROCESSES"):
        num_processes = int(os.environ["DEVQA_NUM_PROCESSES"])
    if process_id is None and os.environ.get("DEVQA_PROCESS_ID"):
        process_id = int(os.environ["DEVQA_PROCESS_ID"])

    explicit = coordinator_address is not None or num_processes is not None
    if not explicit and not is_distributed_env():
        return False  # single host — jax works uninitialized

    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def shutdown_distributed() -> None:
    """Tear down the distributed client (tests / clean exits)."""
    global _initialized
    if not _initialized:
        return
    import jax

    jax.distributed.shutdown()
    _initialized = False
