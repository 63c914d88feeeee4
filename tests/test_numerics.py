"""L0 numeric utilities vs hand values / torch reference semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from sot_tpu.ops import numerics as N


def test_safe_divide_eps():
    out = N.safe_divide(jnp.array([1.0, 1.0]), jnp.array([0.0, 2.0]))
    np.testing.assert_allclose(out, [1.0 / 1e-7, 0.5], rtol=1e-6)
    # denominator exactly at eps is replaced too (<=)
    out = N.safe_divide(jnp.array(1.0), jnp.array(1e-7))
    np.testing.assert_allclose(out, 1e7, rtol=1e-4)


def test_safe_log_eps():
    out = N.safe_log(jnp.array([0.0, -1.0, 1.0, 2e-5]))
    np.testing.assert_allclose(
        out, [np.log(1e-5), np.log(1e-5), 0.0, np.log(2e-5)], rtol=1e-6
    )


def test_midi_hz_roundtrip():
    np.testing.assert_allclose(N.midi_to_hz(69.0), 440.0, rtol=1e-6)
    np.testing.assert_allclose(N.hz_to_midi(440.0), 69.0, rtol=1e-6)
    np.testing.assert_allclose(N.hz_to_midi(880.0), 81.0, rtol=1e-6)
    np.testing.assert_allclose(N.hz_to_midi(0.0), 0.0, atol=1e-6)
    f = np.array([32.7, 100.0, 1950.0, 7750.0], dtype=np.float32)
    np.testing.assert_allclose(N.midi_to_hz(N.hz_to_midi(f)), f, rtol=1e-5)


def test_unit_hz_roundtrip_log_scaling():
    hz_min, hz_max = 32.7, 7750.0
    u = np.linspace(0, 1, 11).astype(np.float32)
    hz = N.unit_to_hz(u, hz_min, hz_max)
    np.testing.assert_allclose(hz[0], hz_min, rtol=1e-5)
    np.testing.assert_allclose(hz[-1], hz_max, rtol=1e-5)
    # log scaling: equal unit steps are equal frequency *ratios*
    ratios = np.asarray(hz)[1:] / np.asarray(hz)[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)
    np.testing.assert_allclose(N.hz_to_unit(hz, hz_min, hz_max), u, rtol=1e-4, atol=1e-5)


def test_exp_sigmoid_limits():
    # at x -> +inf: max_value + threshold; at x -> -inf: ~threshold; at 0: 2*0.5^ln(10)
    out = N.exp_sigmoid(jnp.array([-50.0, 0.0, 50.0]))
    np.testing.assert_allclose(out[2], 2.0 + 1e-7, rtol=1e-5)
    assert out[0] < 1e-6
    np.testing.assert_allclose(out[1], 2.0 * 0.5 ** np.log(10.0) + 1e-7, rtol=1e-5)


def test_power_to_db():
    np.testing.assert_allclose(N.power_to_db(jnp.array(1.0)), 0.0, atol=1e-5)
    np.testing.assert_allclose(N.power_to_db(jnp.array(0.1)), -10.0, rtol=1e-5)
    # tiny power: clamped at pmin=1e-8 then safe_log10 clamps at 1e-5 -> -50 dB
    # (reference parity: utils.py:328-340 routes through safe logb eps=1e-5)
    np.testing.assert_allclose(N.power_to_db(jnp.array(1e-30)), -50.0, atol=1e-4)


def test_get_cqt_n_bins():
    # 3 bins/semitone from 32.7 Hz to 8 kHz Nyquist -> 285 (SOT config encoder n_bins_in)
    assert N.get_cqt_n_bins(16000, 32.7, 3) == 285


def test_pad_for_stft_length():
    # 4096 samples, frame 2048, hop 256: 16 frames -> padded len 2048+15*256=5888
    assert N.pad_for_stft_length(4096, 2048, 256) == 5888 - 4096
    assert N.pad_for_stft_length(4096, 512, 128) == 512 + 31 * 128 - 4096
    # no padding needed when frames tile exactly
    assert N.pad_for_stft_length(8, 4, 4) == 0


def test_get_fn_by_name():
    assert N.get_fn_by_name(None) is None
    assert N.get_fn_by_name("identity")(3.0) == 3.0
    fn = N.get_fn_by_name("exp_sigmoid")
    np.testing.assert_allclose(fn(jnp.array(50.0)), 2.0 + 1e-7, rtol=1e-5)
    with pytest.raises(ValueError):
        N.get_fn_by_name("nope")


def test_frequencies_softmax_shape():
    x = jnp.zeros((2, 3, 4, 8))
    out = N.frequencies_softmax(x, hz_min=20.0, hz_max=8000.0)
    assert out.shape == (2, 3, 4)
    # uniform softmax -> expectation at unit 0.5 -> geometric mean of range
    np.testing.assert_allclose(out[0, 0, 0], N.unit_to_hz(0.5, 20.0, 8000.0), rtol=1e-5)
