"""Explicit jitted train loop (L5) — no Lightning, a functional core.

Replaces the reference's pl.LightningModule wiring (trainer.py:21-306) with:
  * ``Modules`` — a static bundle of encoder/decoder/transforms/losses
  * pure ``forward`` / ``compute_loss`` functions (reference shared_step
    semantics: encode -> soft-argmax pitch -> unit_to_hz -> frozen synth ->
    loss routing: raw audio to MSS terms, transformed spectra to Wasserstein
    terms, trainer.py:153-257)
  * one jitted ``train_step`` (Adam + torch-style coupled weight decay)
  * one jitted ``eval_step`` computing the reference metric suite on-device

TPU notes: the dataset lives on device; batches are gathered by index inside
jit. The loop is stateless Python around pure functions — the same
``train_step`` is reused by the sharded multi-chip path in sot_tpu.parallel.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sot_tpu import data as data_lib
from sot_tpu import losses as losses_lib
from sot_tpu import metrics as metrics_lib
from sot_tpu.configs import ExperimentConfig
from sot_tpu.features import CQT, Identity, STFT
from sot_tpu.models.encoder import PESTOEncoder, predict_pitch
from sot_tpu.models.synths import Sinusoidal
from sot_tpu.ops.numerics import get_cqt_n_bins, hz_to_unit, unit_to_hz

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Modules:
    """Static (trace-time) bundle of everything the pure functions need."""

    config: ExperimentConfig
    encoder: PESTOEncoder
    decoder: Sinusoidal
    feature_extractor: CQT
    transform: Any  # STFT | Identity
    loss_fns: Tuple[Tuple[str, Any, float], ...]  # (kind, fn, weight)
    x_pos: Optional[np.ndarray]  # loss-domain positions in [0,1] (static)
    freq_hz_min: float
    freq_hz_max: float
    evaluation_metrics: Dict[str, bool]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array


def build_modules(cfg: ExperimentConfig) -> Modules:
    n_bins = get_cqt_n_bins(cfg.sample_rate, cfg.cqt_fmin, cfg.cqt_bins_per_semitone)
    feature_extractor = CQT(
        sample_rate=cfg.sample_rate, fmin=cfg.cqt_fmin,
        bins_per_semitone=cfg.cqt_bins_per_semitone, n_bins=n_bins,
        hop_length=cfg.cqt_hop_length,
    )
    encoder = PESTOEncoder(
        n_bins_in=n_bins, output_size=n_bins, n_modes=cfg.n_modes,
        output_splits=("frequency", "weights"), harmonic=True,
    )
    decoder = Sinusoidal(
        n_samples=cfg.n_samples, sample_rate=cfg.sample_rate,
        amp_scale_fn=None, freq_scale_fn=None, harmonic=True,
        apply_roll_off=cfg.apply_roll_off,
    )
    if cfg.transform == "identity":
        transform = Identity()
    else:
        transform = STFT(n_fft=cfg.transform_n_fft, hop_length=cfg.transform_hop,
                         sample_rate=cfg.sample_rate, window=cfg.transform_window)

    # freq range 'auto': from the feature extractor's bin frequencies
    feats = feature_extractor.get_frequencies()
    freq_hz_min, freq_hz_max = float(feats[0]), float(feats[-1])

    # loss-domain positions (reference trainer.py:183-197)
    log_scaled = any(l.log_scaled_x for l in cfg.losses)
    x_pos: Optional[np.ndarray] = None
    if not isinstance(transform, Identity):
        freqs = transform.get_frequencies()
        if log_scaled:
            x_pos = np.asarray(hz_to_unit(freqs, freq_hz_min, freq_hz_max))
        else:
            x_pos = (freqs / freqs.max()).astype(np.float32)

    loss_fns = []
    for lc in cfg.losses:
        if lc.kind == "mss":
            fn = losses_lib.MSSLoss(fft_sizes=lc.fft_sizes, loss_type=lc.loss_type,
                                    mag_weight=lc.mag_weight,
                                    logmag_weight=lc.logmag_weight)
        elif lc.kind == "wasserstein":
            fn = losses_lib.Wasserstein1D(
                p=lc.p, square_dist=lc.square_dist,
                dont_normalize=lc.dont_normalize,
                limit_quantile_range=lc.limit_quantile_range,
                log_scaled_x=lc.log_scaled_x,
                target_constant=True)
        else:
            raise ValueError(f"Unknown loss kind {lc.kind}")
        loss_fns.append((lc.kind, fn, lc.weight))

    eval_metrics = {name: True for name in cfg.evaluation_metrics}
    return Modules(
        config=cfg, encoder=encoder, decoder=decoder,
        feature_extractor=feature_extractor, transform=transform,
        loss_fns=tuple(loss_fns), x_pos=x_pos,
        freq_hz_min=freq_hz_min, freq_hz_max=freq_hz_max,
        evaluation_metrics=eval_metrics,
    )


# ---------------------------------------------------------------------------
# Pure model functions
# ---------------------------------------------------------------------------


def temperature_at(cfg: ExperimentConfig, step: Array):
    """Soft-argmax temperature for a training step.

    With ``cfg.temperature_schedule = (T0, T1, n)``: log-space cosine anneal
    T0 -> T1 over the first n steps, constant T1 after. Otherwise the fixed
    ``cfg.temperature`` (reference behaviour, encoder.py:323-332 + config
    temperature: 0.1)."""
    if cfg.temperature_schedule is None:
        return cfg.temperature
    t0, t1, n = cfg.temperature_schedule
    frac = jnp.clip(step.astype(jnp.float32) / float(n), 0.0, 1.0)
    log_t = (jnp.log(t1)
             + 0.5 * (jnp.log(t0) - jnp.log(t1)) * (1.0 + jnp.cos(jnp.pi * frac)))
    return jnp.exp(log_t)


def prior_scale_at(cfg: ExperimentConfig, step: Array) -> Optional[Array]:
    """0/1 gate for the odd-ratio prior: off before
    ``cfg.odd_ratio_prior_start`` (late tie-breaking), on after."""
    if cfg.odd_ratio_prior_weight <= 0.0 or cfg.odd_ratio_prior_start <= 0:
        return None
    return (step >= cfg.odd_ratio_prior_start).astype(jnp.float32)


def forward(mod: Modules, params: Any, x: Array, train: bool = False,
            dropout_rng: Optional[Array] = None,
            temperature: Optional[Array] = None) -> Dict[str, Array]:
    """Autoencoder forward (reference trainer.py:77-143).

    x: [batch, n_samples]. Returns dict with x_hat, pitch_hz, pitch_unit,
    weights, frequency logits. ``temperature`` overrides the config's
    soft-argmax temperature (used by the annealing schedule during
    training; may be a traced scalar).
    """
    features = mod.feature_extractor(x[:, :-1])  # drop last sample (ref parity)
    batch, n_frames, n_bins = features.shape
    feats = features.reshape(batch * n_frames, n_bins)

    rngs = {"dropout": dropout_rng} if (train and dropout_rng is not None) else None
    z = mod.encoder.apply(params, feats, train=train, rngs=rngs)

    pitch_outputs = predict_pitch(
        z["frequency"],
        estimation_type=mod.config.estimation_type,
        temperature=(mod.config.temperature if temperature is None
                     else temperature))
    pitch_unit = pitch_outputs["pitch_unit"]  # [batch*frames, 1]
    pitch_hz = unit_to_hz(pitch_unit, mod.freq_hz_min, mod.freq_hz_max)

    weights = z["weights"]  # [batch*frames, n_modes]

    pitch_unit = pitch_unit.reshape(batch, n_frames, -1)
    pitch_hz = pitch_hz.reshape(batch, n_frames, -1)
    weights = weights.reshape(batch, n_frames, -1)

    x_hat = mod.decoder(weights, pitch_hz)

    out = {
        "x_hat": x_hat,
        "pitch_unit": pitch_unit,
        "pitch_hz": pitch_hz,
        "weights": weights,
        "frequency_logits": z["frequency"].reshape(batch, n_frames, -1),
    }
    if mod.config.detach_weights:
        # ablation (not used in the paper): a SECOND render with the
        # amplitude head detached, fed only to the Wasserstein term — MSS
        # still trains the weights (reference trainer.py:136-141, 216-218)
        out["x_hat_weights_detached"] = mod.decoder(
            jax.lax.stop_gradient(weights), pitch_hz)
    return out


def compute_loss(mod: Modules, params: Any, x: Array, train: bool = False,
                 dropout_rng: Optional[Array] = None,
                 temperature: Optional[Array] = None,
                 prior_scale: Optional[Array] = None
                 ) -> Tuple[Array, Dict[str, Array]]:
    """Loss with the reference's routing: MSS on raw audio, W1D on spectra
    (reference trainer.py:199-245)."""
    out = forward(mod, params, x, train=train, dropout_rng=dropout_rng,
                  temperature=temperature)
    x_hat = out["x_hat"]

    spec_x = mod.transform(x)
    spec_x_hat = mod.transform(x_hat)
    # positions stay a NUMPY constant: the loss inspects them at trace time
    # (sortedness guard for the fused same-grid kernel dispatch)
    pos = mod.x_pos

    total = 0.0
    logs: Dict[str, Array] = {}
    spec_x_hat_w = spec_x_hat
    if mod.config.detach_weights:
        spec_x_hat_w = mod.transform(out["x_hat_weights_detached"])
    for kind, fn, weight in mod.loss_fns:
        if kind == "mss":
            value = fn(x, x_hat) * weight
        else:
            value = fn(spec_x, spec_x_hat_w, x_pos=pos, y_pos=pos) * weight
        logs[f"loss/{type(fn).__name__}"] = value
        total = total + value
    if mod.config.odd_ratio_prior_weight > 0.0:
        # octave-degeneracy breaker (no reference counterpart): the synth
        # explains any clip equally well at f0/2 with even-only harmonics
        # (harmonic k -> mode 2k, max true harmonic 8 <= 20 modes), so the
        # task is unidentifiable octave-DOWN for the unsupervised loss.
        # Penalise vanishing odd-mode (1,3,5,..) energy: the true f0 always
        # has an active fundamental, the f0/2 impostor has none. Modes the
        # synth will Nyquist-mask anyway are excluded — otherwise the
        # impostor could satisfy the ratio with inaudible above-Nyquist
        # odd modes at zero reconstruction cost.
        w = out["weights"]  # [batch, frames, n_modes]
        k = jnp.arange(1, w.shape[-1] + 1, dtype=jnp.float32)
        audible = (k[None, None, :] * out["pitch_hz"]
                   < mod.config.sample_rate / 2.0).astype(w.dtype)
        w = w * audible
        odd = w[..., 0::2].sum(axis=-1)
        tot_w = w.sum(axis=-1)
        ratio = odd / (tot_w + 1e-7)
        prior = -jnp.log(ratio + 1e-6).mean() * mod.config.odd_ratio_prior_weight
        if prior_scale is not None:
            prior = prior * prior_scale
        logs["loss/OddRatioPrior"] = prior
        total = total + prior
    logs["loss/total"] = total
    out.update({"spec_x": spec_x, "spec_x_hat": spec_x_hat})
    return total, (logs, out)


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) parity: coupled L2 added to the
    gradient *before* the Adam moments (not decoupled AdamW).

    With ``lr_warmup_steps``/``lr_decay`` set, the constant lr becomes a
    linear-warmup (+ optional cosine-decay-to-0-at-max_steps) schedule; the
    default config keeps the reference's constant lr exactly."""
    if cfg.lr_warmup_steps == 0 and cfg.lr_decay == "constant":
        scale = optax.scale(-cfg.learning_rate)
    else:
        schedules, bounds = [], []
        if cfg.lr_warmup_steps > 0:
            schedules.append(optax.linear_schedule(
                0.0, cfg.learning_rate, cfg.lr_warmup_steps))
            bounds.append(cfg.lr_warmup_steps)
        if cfg.lr_decay == "cosine":
            schedules.append(optax.cosine_decay_schedule(
                cfg.learning_rate,
                max(cfg.max_steps - cfg.lr_warmup_steps, 1)))
        elif cfg.lr_decay == "constant":
            schedules.append(optax.constant_schedule(cfg.learning_rate))
        else:
            raise ValueError(f"Unknown lr_decay {cfg.lr_decay!r}")
        sched = optax.join_schedules(schedules, bounds) if bounds else schedules[0]
        scale = optax.scale_by_schedule(lambda s: -sched(s))
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        scale,
    )


def init_state(mod: Modules, rng: Array) -> TrainState:
    params = mod.encoder.init(rng, jnp.zeros((2, mod.encoder.n_bins_in)))
    opt_state = make_optimizer(mod.config).init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def make_train_step(mod: Modules) -> Callable:
    opt = make_optimizer(mod.config)

    def train_step(state: TrainState, x: Array, rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        dropout_rng = jax.random.fold_in(rng, state.step)
        temp = temperature_at(mod.config, state.step)
        pscale = prior_scale_at(mod.config, state.step)

        def loss_fn(params):
            loss, (logs, _) = compute_loss(mod, params, x, train=True,
                                           dropout_rng=dropout_rng,
                                           temperature=temp,
                                           prior_scale=pscale)
            return loss, logs

        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_step_from_dataset(mod: Modules) -> Callable:
    """Like make_train_step but slices the batch from the device-resident
    dataset INSIDE jit: one dispatch per step instead of an eager slice +
    step (the eager slice halved real-loop throughput through the remote
    device tunnel)."""
    opt = make_optimizer(mod.config)
    bs = mod.config.batch_size

    def train_step(state: TrainState, x_all: Array, lo: Array, rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        x = jax.lax.dynamic_slice_in_dim(x_all, lo, bs, 0)
        dropout_rng = jax.random.fold_in(rng, state.step)
        temp = temperature_at(mod.config, state.step)
        pscale = prior_scale_at(mod.config, state.step)

        def loss_fn(params):
            loss, (logs, _) = compute_loss(mod, params, x, train=True,
                                           dropout_rng=dropout_rng,
                                           temperature=temp,
                                           prior_scale=pscale)
            return loss, logs

        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    return jax.jit(train_step, donate_argnums=(0,))


def make_train_steps_scan(mod: Modules) -> Callable:
    """A whole CHUNK of steps per dispatch: ``lax.scan`` over a vector of
    batch start-offsets into the device-resident dataset.

    On a remote-tunnelled TPU the per-step Python dispatch dominates the
    wall-clock of the real training loop (~2k samples/s dispatched step by
    step vs ~4.3k samples/s inside one XLA program); scanning an epoch per
    dispatch recovers the bench-loop rate. Returns the last step's logs."""
    opt = make_optimizer(mod.config)
    bs = mod.config.batch_size

    def train_steps(state: TrainState, x_all: Array, los: Array, rng: Array
                    ) -> Tuple[TrainState, Dict[str, Array]]:
        def body(st: TrainState, lo: Array):
            x = jax.lax.dynamic_slice_in_dim(x_all, lo, bs, 0)
            dropout_rng = jax.random.fold_in(rng, st.step)
            temp = temperature_at(mod.config, st.step)
            pscale = prior_scale_at(mod.config, st.step)

            def loss_fn(params):
                loss, (logs, _) = compute_loss(mod, params, x, train=True,
                                               dropout_rng=dropout_rng,
                                               temperature=temp,
                                               prior_scale=pscale)
                return loss, logs

            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
            updates, opt_state = opt.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            logs["grad_norm"] = optax.global_norm(grads)
            return TrainState(params, opt_state, st.step + 1), logs

        state, logs_seq = jax.lax.scan(body, state, los)
        return state, jax.tree.map(lambda a: a[-1], logs_seq)

    return jax.jit(train_steps, donate_argnums=(0,))


def make_viz_step(mod: Modules) -> Callable:
    """jitted forward returning the arrays the figure gallery needs
    (reference plot_and_log inputs, plot_log_utils.py:61-145)."""

    def viz_step(params: Any, x: Array) -> Dict[str, Array]:
        _, (logs, out) = compute_loss(mod, params, x, train=False)
        probs = jax.nn.softmax(
            out["frequency_logits"] / mod.config.temperature, axis=-1)
        return {
            "x": x,
            "x_hat": out["x_hat"],
            "spec_x": out["spec_x"],
            "spec_x_hat": out["spec_x_hat"],
            "probabilities": probs[:, 0],  # first frame of sample
            "pitch_hz": out["pitch_hz"],
        }

    return jax.jit(viz_step)


def apply_octave_correction(mod: Modules, x: Array, pitch_hz: Array
                            ) -> Tuple[Array, Array]:
    """Config-parameterised unsupervised octave correction; returns the
    corrected (pitch_hz, pitch_unit)."""
    pitch_hz = metrics_lib.octave_correct_pitch(
        x, pitch_hz, sample_rate=mod.config.sample_rate,
        rel_threshold=mod.config.octave_correction_rel_threshold,
        down_threshold=mod.config.octave_correction_down_threshold,
        min_frequency_hz=0.95 * mod.config.freq_gen_min)
    return pitch_hz, hz_to_unit(pitch_hz, mod.freq_hz_min, mod.freq_hz_max)


def apply_comb_correction(mod: Modules, x: Array, pitch_hz: Array
                          ) -> Tuple[Array, Array]:
    """Config-parameterised harmonic-comb correction (supersedes the octave
    rule when enabled); returns the corrected (pitch_hz, pitch_unit)."""
    pitch_hz = metrics_lib.comb_correct_pitch(
        x, pitch_hz, sample_rate=mod.config.sample_rate,
        rel_threshold=mod.config.octave_correction_rel_threshold,
        down_threshold=mod.config.octave_correction_down_threshold,
        margin=mod.config.comb_correction_margin,
        min_frequency_hz=0.95 * mod.config.freq_gen_min)
    return pitch_hz, hz_to_unit(pitch_hz, mod.freq_hz_min, mod.freq_hz_max)


def predict(mod: Modules, params: Any, x: Array,
            octave_correction: Optional[bool] = None) -> Dict[str, Array]:
    """Deployment inference entry: pitch + harmonic amplitudes for audio x.

    Unlike the eval path, the (fully unsupervised) octave correction here
    rewrites the *returned* prediction, so a served model benefits from the
    disambiguation, gated by ``cfg.inference_octave_correction`` (or the
    explicit argument). jit-able: ``jax.jit(partial(predict, mod))``.
    """
    out = forward(mod, params, x, train=False)
    if mod.config.inference_comb_correction:
        out["pitch_hz"], out["pitch_unit"] = apply_comb_correction(
            mod, x, out["pitch_hz"])
        return out
    if octave_correction is None:
        octave_correction = mod.config.inference_octave_correction
    if octave_correction:
        out["pitch_hz"], out["pitch_unit"] = apply_octave_correction(
            mod, x, out["pitch_hz"])
    return out


def _eval_metrics(mod: Modules, params: Any, x: Array, true_pitch: Array
                  ) -> Dict[str, Array]:
    # prior_scale=0: eval metrics stay reference-comparable — the training
    # prior never enters val/test loss/total regardless of its gate
    loss, (logs, out) = compute_loss(mod, params, x, train=False,
                                     prior_scale=jnp.float32(0.0))
    pitch_hz = out["pitch_hz"]  # [batch, frames, 1]
    pitch_unit = out["pitch_unit"]
    if mod.config.eval_comb_correction:
        pitch_hz, pitch_unit = apply_comb_correction(mod, x, pitch_hz)
    elif mod.config.eval_octave_correction:
        pitch_hz, pitch_unit = apply_octave_correction(mod, x, pitch_hz)
    true_pitch_hz = jnp.broadcast_to(true_pitch[:, None, :], pitch_hz.shape)
    m = metrics_lib.compute_metrics(
        mod.evaluation_metrics, x, out["x_hat"], pitch_hz, true_pitch_hz,
        frequency_unit=pitch_unit,
        true_frequency_unit=jnp.broadcast_to(
            hz_to_unit(true_pitch, mod.freq_hz_min, mod.freq_hz_max)[:, None, :],
            pitch_hz.shape),
    )
    m.update(logs)
    return m


def make_eval_step(mod: Modules) -> Callable:
    def eval_step(params: Any, x: Array, true_pitch: Array) -> Dict[str, Array]:
        return _eval_metrics(mod, params, x, true_pitch)

    return jax.jit(eval_step)


def make_eval_all(mod: Modules) -> Callable:
    """Whole-split evaluation in ONE dispatch: lax.scan of the eval step over
    stacked [n_batches, batch, ...] arrays, per-metric mean over batches
    (equal batch weights — the reference's epoch-mean semantics,
    trainer.py:283-306)."""

    def eval_all(params: Any, xs: Array, f0s: Array) -> Dict[str, Array]:
        def body(_, batch):
            x, f0 = batch
            return 0, _eval_metrics(mod, params, x, f0)

        _, ms = jax.lax.scan(body, 0, (xs, f0s))
        return jax.tree.map(jnp.mean, ms)

    return jax.jit(eval_all)


# ---------------------------------------------------------------------------
# The loop
# ---------------------------------------------------------------------------


def evaluate(mod: Modules, eval_step: Callable, params: Any,
             split: data_lib.SplitArrays, batch_size: int) -> Dict[str, float]:
    sums: Dict[str, float] = {}
    count = 0
    for batch in data_lib.iterate_batches(split, batch_size, drop_last=False):
        m = eval_step(params, jnp.asarray(batch["x"]),
                      jnp.asarray(batch["frequency"]))
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
    return {k: v / max(count, 1) for k, v in sums.items()}


def train(
    cfg: ExperimentConfig,
    max_steps: Optional[int] = None,
    log_every: int = 50,
    checkpoint_dir: Optional[str] = None,
    log_file: Optional[str] = None,
    splits: Optional[Dict[str, data_lib.SplitArrays]] = None,
    resume_from: Optional[str] = None,
    figure_dir: Optional[str] = None,
) -> Tuple[TrainState, Dict[str, float]]:
    """Full training run: returns final state + best-val metrics.

    Checkpointing mirrors the reference: track min val log_spectral_distance,
    keep the best params (save_top_k=1 'best-lsd' semantics).
    """
    from sot_tpu.training import checkpoint as ckpt_lib
    from sot_tpu.training.logging import JsonlLogger

    max_steps = max_steps or cfg.max_steps
    mod = build_modules(cfg)

    if splits is None:
        splits = data_lib.dataset_from_config(cfg)

    rng = jax.random.key(cfg.seed)
    state = init_state(mod, rng)
    start_step = 0
    if resume_from:
        state, start_step = ckpt_lib.restore(resume_from, state)

    train_steps = make_train_steps_scan(mod)
    eval_step = make_eval_step(mod)
    eval_all = make_eval_all(mod)
    logger = JsonlLogger(log_file)
    from sot_tpu.training.observability import FigureLogger

    fig_logger = FigureLogger(figure_dir)
    viz_step = make_viz_step(mod) if fig_logger.enabled else None
    feat_freqs = mod.feature_extractor.get_frequencies()
    trans_freqs = (None if isinstance(mod.transform, Identity)
                   else mod.transform.get_frequencies())

    # device-resident training set: gather batches on device
    train_split = splits["train"]
    x_train = jnp.asarray(data_lib.peak_normalize(train_split.x))
    n_train = x_train.shape[0]
    steps_per_epoch = n_train // cfg.batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"train split has {n_train} samples < batch_size "
            f"{cfg.batch_size}; reduce batch_size or enlarge the dataset")

    def run_chunk(st: TrainState, los_np: np.ndarray):
        return train_steps(st, x_train, jnp.asarray(los_np, jnp.int32), rng)

    # val split stacked on device once: full batches go through the
    # one-dispatch scanned eval, a trailing partial batch through the
    # single-batch eval step; batch means are equal-weighted like the
    # reference's epoch mean (trainer.py:283-306).
    val_batches = list(data_lib.iterate_batches(splits["val"], cfg.batch_size,
                                                drop_last=False))
    full = [b for b in val_batches if b["x"].shape[0] == cfg.batch_size]
    partial = [b for b in val_batches if b["x"].shape[0] != cfg.batch_size]
    val_xs = (jnp.asarray(np.stack([b["x"] for b in full]))
              if full else None)
    val_f0s = (jnp.asarray(np.stack([b["frequency"] for b in full]))
               if full else None)

    def run_eval(params: Any) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        count = 0
        if full:
            m = eval_all(params, val_xs, val_f0s)
            sums = {k: float(v) * len(full) for k, v in m.items()}
            count += len(full)
        for b in partial:
            m = eval_step(params, jnp.asarray(b["x"]),
                          jnp.asarray(b["frequency"]))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
        return {k: v / max(count, 1) for k, v in sums.items()}

    # init-probe restarts (no reference counterpart): train n_init_probes
    # fresh inits for probe_steps each and continue the one with the lowest
    # val LSD — an unsupervised selection signal (no ground-truth pitch) that
    # discards runs headed into the wrong-harmonic local minima early.
    if (cfg.n_init_probes > 1 and cfg.probe_steps > 0 and start_step == 0
            and not resume_from):
        probe_results = []
        for i in range(cfg.n_init_probes):
            st = init_state(mod, jax.random.fold_in(rng, 1000 + i))
            order_rng = np.random.default_rng(cfg.seed + i)
            remaining = cfg.probe_steps
            while remaining > 0:
                order = order_rng.permutation(steps_per_epoch)[
                    :min(steps_per_epoch, remaining)]
                st, _ = run_chunk(st, order * cfg.batch_size)
                remaining -= len(order)
            val = run_eval(st.params)
            lsd = val.get("log_spectral_distance", float("inf"))
            logger.write({"split": "probe", "probe": i,
                          "step": cfg.probe_steps, **val})
            probe_results.append((lsd, st))
        _, state = min(probe_results, key=lambda t: t[0])
        start_step = cfg.probe_steps

    best_lsd = float("inf")
    best_metrics: Dict[str, float] = {}
    # copy, not reference: the donated epoch scan deletes these buffers
    # (see the best-snapshot comment below)
    best_params = jax.tree_util.tree_map(jnp.copy, state.params)
    t0 = time.time()
    samples_done = 0

    shuffle_rng = np.random.default_rng(cfg.seed)
    step = start_step
    eval_bucket = step // cfg.eval_every_steps
    while step < max_steps:
        # reshuffle batch order every epoch (the reference's DataLoader
        # shuffles; order is host-side so batches stay static-shaped slices);
        # the whole epoch runs as ONE scanned dispatch, with evals at epoch
        # boundaries once an eval_every_steps multiple is crossed (the
        # reference validates on epoch boundaries too, every 5 epochs)
        epoch_order = shuffle_rng.permutation(steps_per_epoch)
        k = min(steps_per_epoch, max_steps - step)
        state, logs = run_chunk(state, epoch_order[:k] * cfg.batch_size)
        step += k
        samples_done += k * cfg.batch_size

        logs = {key: float(v) for key, v in logs.items()}
        elapsed = time.time() - t0
        logs.update({"step": step, "samples_per_sec": samples_done / elapsed})
        logger.write({"split": "train", **logs})

        if step // cfg.eval_every_steps > eval_bucket or step >= max_steps:
            eval_bucket = step // cfg.eval_every_steps
            val = run_eval(state.params)
            logger.write({"split": "val", "step": step, **val})
            if viz_step is not None:
                vb = next(data_lib.iterate_batches(
                    splits["val"], cfg.batch_size, drop_last=False))
                outs = viz_step(state.params, jnp.asarray(vb["x"]))
                outs = {k2: np.asarray(v) for k2, v in outs.items()}
                outs["true_frequency_unit"] = np.asarray(hz_to_unit(
                    vb["frequency"][:1, 0], mod.freq_hz_min,
                    mod.freq_hz_max))
                fig_logger.plot_and_log(
                    step, "val", outs,
                    transform_frequencies=trans_freqs,
                    feature_frequencies=feat_freqs)
                # quantile-function figure (host-side, figure path only —
                # return_quantiles takes the general sorting path, never
                # the fused training kernel)
                w1d = next((fn for kind, fn, _ in mod.loss_fns
                            if type(fn).__name__ == "Wasserstein1D"), None)
                if w1d is not None and mod.x_pos is not None:
                    q = w1d(jnp.asarray(outs["spec_x"][:1]),
                            jnp.asarray(outs["spec_x_hat"][:1]),
                            x_pos=mod.x_pos, y_pos=mod.x_pos,
                            return_quantiles=True)
                    fig_logger.log_quantiles(
                        step, "val", np.asarray(q[2]), np.asarray(q[0]),
                        np.asarray(q[1]))
            lsd = val.get("log_spectral_distance", float("inf"))
            if lsd < best_lsd:
                best_lsd = lsd
                best_metrics = val
                # deep-copy: the epoch scan DONATES its input state, so a
                # bare reference to these buffers is deleted as soon as the
                # next epoch dispatches.  A reference only survives when the
                # best val happens at the final epoch — which is why the
                # bug bit some seeds and not others (round-3 sweep: the
                # post-training final eval crashed with "Array has been
                # deleted" exactly on runs whose best LSD predated the last
                # epoch).  ~184 KB per snapshot; negligible.
                best_params = jax.tree_util.tree_map(jnp.copy, state.params)
                if checkpoint_dir:
                    ckpt_lib.save(checkpoint_dir, state, step, tag="best-lsd")

    if checkpoint_dir:
        ckpt_lib.save(checkpoint_dir, state, step, tag="last")
    logger.close()
    return TrainState(best_params, state.opt_state, state.step), best_metrics
