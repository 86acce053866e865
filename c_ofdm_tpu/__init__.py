"""c_ofdm_tpu — a TPU-native OFDM modem framework (JAX/XLA/Pallas).

Brand-new implementation of the C-OFDM reference modem's capabilities
(see SURVEY.md at the repo root), designed batch-first and statically shaped
for TPU: XLA/MXU kernels for the hot DSP, shard_map over {channel, time}
meshes for scale-out.
"""

from .config import ModemConfig, load_config, REFERENCE_CONFIG  # noqa: F401
from .models.frame import FrameSpec, make_frame_spec            # noqa: F401

__version__ = "0.1.0"
