"""Device-mesh construction and distributed runtime init."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "init_distributed"]


def make_mesh(
    n_time: int | None = None,
    n_channel: int = 1,
    devices=None,
    time_axis_name: str = "time",
    channel_axis_name: str = "channel",
) -> Mesh:
    """A (time x channel) mesh over the given (default: all) devices.

    ``n_time=None`` uses all remaining devices on the time axis.  On a pod
    slice the time axis should map to the slower/outer devices and the
    channel axis to ICI neighbors — the channel peak reduction is the
    latency-sensitive collective.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_time is None:
        if len(devices) % n_channel:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_channel={n_channel}"
            )
        n_time = len(devices) // n_channel
    n = n_time * n_channel
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(n_time, n_channel)
    return Mesh(grid, (time_axis_name, channel_axis_name))


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host runtime init (`jax.distributed`).

    The reference's inter-host story is NTP-cron + scp of records
    (``acquisition/crontab:1-3``, ``processing/Shell/go.sh``); here hosts
    join one JAX runtime and DCN only carries capture ingest.  No-op when
    single-host (the common test path).
    """
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
