"""Multi-host ingest: assemble a globally-sharded capture from per-host data.

In a multi-host deployment each host ingests its own slice of the capture
(its own radio heads / file shards) over DCN; the device array spanning the
whole {channel, time} mesh is assembled with
``jax.make_array_from_process_local_data`` so no host ever materializes the
global capture.  The reference's counterpart is the single-process SDR
double-buffer feed (`rx.cpp:55-66`); this is its green-field scale-out form
(SURVEY §5.8).

Single-process (CI / one host) this degrades to a plain ``device_put`` with
the requested sharding, so the same code path runs everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import CHANNEL_AXIS, TIME_AXIS


def capture_sharding(mesh: Mesh) -> NamedSharding:
    """The canonical sharding of a [n_channels, total_len] capture batch:
    rows over the channel axis, contiguous time blocks over the time axis."""
    return NamedSharding(mesh, P(CHANNEL_AXIS, TIME_AXIS))


def make_global_capture(mesh: Mesh, local_capture, global_shape=None):
    """Build the mesh-wide sharded capture array from this process's data.

    ``local_capture`` is the [local_channels, local_len] complex block this
    host ingested; ``global_shape`` is the full [n_channels, total_len] shape
    (defaults to the local shape scaled by the mesh's per-axis process
    counts, which is exact for the canonical equal-split layout).
    """
    sharding = capture_sharding(mesh)
    local_capture = jnp.asarray(local_capture)
    if jax.process_count() == 1:
        return jax.device_put(local_capture, sharding)
    if global_shape is None:
        raise ValueError("global_shape is required with multiple processes")
    return jax.make_array_from_process_local_data(
        sharding, local_capture, global_shape)


def channel_sharding(mesh: Mesh) -> NamedSharding:
    """[C, ...] arrays sharded over the channel axis only (replicated over
    time) — the layout of the continuous sharded-streaming path's blocks and
    carry state (`parallel.sharded.make_sharded_streaming`)."""
    return NamedSharding(mesh, P(CHANNEL_AXIS))


def make_global_channel_array(mesh: Mesh, local, global_channels: int = 0):
    """Distribute this process's [C_local, ...] block over the mesh channel
    axis (per-buffer ingest of the sharded CONTINUOUS streaming path).
    ``global_channels`` is the mesh-wide channel count (required with
    multiple processes)."""
    sharding = channel_sharding(mesh)
    local = jnp.asarray(local)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    if not global_channels:
        raise ValueError("global_channels is required with multiple processes")
    return jax.make_array_from_process_local_data(
        sharding, local, (global_channels, *local.shape[1:]))


def make_global_stream_state(mesh: Mesh, local_state, global_channels: int = 0):
    """Distribute a process-local ``StreamState`` slice (fields with a
    leading [C_local] axis, from ``streaming.init_state(spec,
    channels=C_local)``) into the mesh-wide channel-sharded state consumed
    by ``make_sharded_streaming``.  After the first step the state stays
    device-resident with the same sharding — only buffers move per step."""
    return jax.tree.map(
        lambda x: make_global_channel_array(mesh, x, global_channels),
        local_state)
