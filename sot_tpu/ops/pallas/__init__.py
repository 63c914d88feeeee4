"""Pallas TPU kernels for the hot ops (SOT, framing, scans).

Each kernel ships with an XLA fallback of identical semantics used on
non-TPU backends (CPU tests, the multichip CPU dryrun) and for
finite-difference/grad parity checks.
"""

from sot_tpu.ops.pallas.conv import conv1d_same  # noqa: F401
from sot_tpu.ops.pallas.merge import sot_w2_merge  # noqa: F401
from sot_tpu.ops.pallas.sot import sot_bilinear, wasserstein_same_grid  # noqa: F401
from sot_tpu.ops.pallas.stft import stft_frontend_projection  # noqa: F401
