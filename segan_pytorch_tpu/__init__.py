"""segan_pytorch_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-enhancement GAN framework.

Brand-new implementation of the full capability surface of the SEGAN/SEGAN+/WSEGAN/AEWSEGAN
reference (santi-pdp/segan_pytorch), re-designed TPU-first:

- statically-shaped, fused, jitted G/D train steps (LSGAN + decaying L1),
- data-parallel scaling via ``jax.sharding.Mesh`` + jit sharding constraints,
- channels-last (B, T, C) layout so channel dims land on TPU lanes,
- first-order IIR de-emphasis as an O(log T) associative scan,
- host-side threaded data pipeline producing fixed-shape batches,
- torch-checkpoint converter able to load the released ``segan+_generator.ckpt``.

Reference parity citations appear as ``ref: <file>:<line>`` in docstrings and point into
the upstream repo (mounted read-only at /root/reference).
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml

from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import data  # noqa: F401
from . import utils  # noqa: F401
