"""Device mesh construction + jax.distributed multi-host init.

Axis conventions across the framework:
  "limb"  RNS residue channels (DP analog; CUDA batch axis in the reference)
  "fft"   the four-step t1 axis (SP analog; all_to_all transposes ride ICI)
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis: str = "fft"):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_2d(limb: int, fft: int, axes=("limb", "fft")):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    assert limb * fft <= len(devs), f"need {limb * fft} devices"
    return Mesh(np.array(devs[:limb * fft]).reshape(limb, fft), axes)


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed over DCN for multi-host pods.  With no
    arguments, relies on the TPU environment's auto-detection."""
    import jax
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
