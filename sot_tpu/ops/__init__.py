"""DSP + numeric kernels (L0/L1). All pure jnp functions, jit-safe, static shapes."""

from sot_tpu.ops.numerics import (  # noqa: F401
    safe_divide,
    safe_log,
    safe_log10,
    exp_sigmoid,
    logb,
    hz_to_midi,
    midi_to_hz,
    unit_to_midi,
    midi_to_unit,
    unit_to_hz,
    hz_to_unit,
    power_to_db,
    get_cqt_n_bins,
    get_fn_by_name,
    pad_for_stft_length,
)
from sot_tpu.ops.windows import get_window, hann_window, flattop_window  # noqa: F401
from sot_tpu.ops.stft import stft_magnitude, frame_signal, rfft_frequencies  # noqa: F401
from sot_tpu.ops.wasserstein import (  # noqa: F401
    quantile_function,
    wasserstein_1d,
    wasserstein_1d_same_grid,
)
from sot_tpu.ops.scan import prefix_sum  # noqa: F401
from sot_tpu.ops.oscillator import (  # noqa: F401
    oscillator_bank,
    angular_cumsum,
    get_harmonic_frequencies,
    remove_above_nyquist,
)
from sot_tpu.ops.resample import resample, upsample_with_windows  # noqa: F401
