"""Differentiable sinusoidal/harmonic synthesizer (L3).

The decoder is *frozen by architecture*: it has no parameters at all
(reference synths.py:46-128 registers none), so it is a pure function here —
no module machinery needed. Controls -> signal:

  get_controls: optional amp/freq scaling, harmonic expansion f0*[1..K],
                Nyquist masking                     (reference synths.py:71-93)
  get_signal:   window-OLA upsample amps, bilinear upsample freqs,
                oscillator bank, optional -6 dB/oct rolloff FIR
                                                    (reference synths.py:95-128)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from sot_tpu.ops.fir import frequency_filter, slope_frequency_response
from sot_tpu.ops.numerics import get_fn_by_name
from sot_tpu.ops.oscillator import (
    get_harmonic_frequencies,
    oscillator_bank,
    remove_above_nyquist,
)
from sot_tpu.ops.resample import resample

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Sinusoidal:
    """Bank-of-sinusoids synth; `harmonic=True` expands f0 to integer multiples.

    Paper configs use amp_scale_fn=None, freq_scale_fn=None, harmonic=True,
    n_samples=4096 (SOT-2048 config decoder block).
    """

    n_samples: int = 64000
    sample_rate: int = 16000
    amp_scale_fn: Optional[Union[str, Callable]] = "exp_sigmoid"
    amp_resample_method: str = "window"
    freq_scale_fn: Optional[Union[str, Callable]] = "frequencies_softmax"
    harmonic: bool = False
    apply_roll_off: bool = False
    use_angular_cumsum: bool = False

    def get_controls(self, amplitudes: Array, frequencies: Array) -> Dict[str, Array]:
        """[batch, time, n_sinusoids] network outputs -> synth controls."""
        amp_fn = get_fn_by_name(self.amp_scale_fn)
        freq_fn = get_fn_by_name(self.freq_scale_fn)
        if amp_fn is not None:
            amplitudes = amp_fn(amplitudes)
        if freq_fn is not None:
            frequencies = freq_fn(frequencies)
        if self.harmonic:
            frequencies = get_harmonic_frequencies(frequencies, amplitudes.shape[-1])
        amplitudes = remove_above_nyquist(frequencies, amplitudes, self.sample_rate)
        return {"amplitudes": amplitudes, "frequencies": frequencies}

    def get_signal(self, amplitudes: Array, frequencies: Array) -> Array:
        """Frame-rate controls -> [batch, n_samples] audio."""
        if self._use_fused_synth(amplitudes):
            # Fused Pallas kernel: envelopes + phase prefix + sin + weighting
            # in VMEM — the XLA path materializes five [B, T, K] tensors in
            # HBM for ~90 KB of actual inputs (ops/pallas/synth.py; gated
            # on its on-chip A/B like the other kernels)
            from sot_tpu.ops.pallas.synth import synth_render

            signal = synth_render(amplitudes, frequencies, self.n_samples,
                                  self.sample_rate,
                                  self.amp_resample_method)
        else:
            amplitude_envelopes = resample(
                amplitudes, self.n_samples, method=self.amp_resample_method,
                add_endpoint=True,
            )
            frequency_envelopes = resample(frequencies, self.n_samples)

            signal = oscillator_bank(
                frequency_envelopes=frequency_envelopes,
                amplitude_envelopes=amplitude_envelopes,
                sample_rate=self.sample_rate,
                use_angular_cumsum=self.use_angular_cumsum,
            )

        if self.apply_roll_off:
            # -6 dB/octave above 500 Hz (MSS-LogLin experiment,
            # reference synths.py:121-126)
            filter_mag = slope_frequency_response(
                jnp.asarray(6.0), n_freqs=65, f_ref=500.0
            )[0]
            filter_mag = jnp.broadcast_to(filter_mag, (signal.shape[0],) + filter_mag.shape[1:])
            signal = frequency_filter(signal, filter_mag)
        return signal

    def _use_fused_synth(self, amplitudes: Array) -> bool:
        from sot_tpu.ops.numerics import env_flag

        if not env_flag("SOT_TPU_SYNTH_PALLAS") or self.use_angular_cumsum:
            return False
        from sot_tpu.ops.pallas.sot import _interpret
        from sot_tpu.ops.pallas.synth import supported

        b, n_frames, k = amplitudes.shape
        if not supported(self.n_samples, k * b, n_frames,
                         self.amp_resample_method):
            return False
        if _interpret():
            return True
        try:
            return jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            return False

    def __call__(self, amplitudes: Array, frequencies: Array) -> Array:
        controls = self.get_controls(amplitudes, frequencies)
        return self.get_signal(**controls)
