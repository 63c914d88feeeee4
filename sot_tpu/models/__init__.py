from sot_tpu.models.synths import Sinusoidal  # noqa: F401
from sot_tpu.models.encoder import PESTOEncoder, predict_pitch  # noqa: F401
