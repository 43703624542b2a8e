"""Flow-conditional texture gate: post-hoc per-channel high-pass rescaling.

Why this module exists.  The round-4/5 tail campaign
(docs/tail_campaign_r5.json) established that the generator equilibrium
cannot learn *multiplicative, flow-conditional* texture gating at
realism-preserving step sizes: on an axis-pinned day one velocity
component's truth is nearly texture-free, yet the generator paints its
isotropic learned texture on both channels, overshooting that channel's
per-day high-pass ratio 2.5-3x (and undershooting ~0.6x on other days).
~125k fine-tune steps across five strategies moved the floored two-seed
worst day only from 2.6 to 2.2 before trading pooled sharpness away.

So the gating the architecture cannot learn is built explicitly, with the
right inductive bias, *outside* the adversarial equilibrium:

* a tiny MLP (few hundred params) predicts the TRUTH's per-(sample,
  channel) high-pass energy from intensive statistics of the low-res
  input — a pure physics regression (truth fine-scale energy scales
  ~flow^2 and projects onto (cos, sin) of the flow direction; both are
  directly observable in the blurred input), independent of any
  generator;
* the generator output's *actual* high-pass energy is measured on device
  (no modeling of the generator at all); and
* the output's high-pass band is rescaled spectrally,
  y' = G*y + s * (1-G)*y (G = the metric's Gaussian), with s chosen in
  CLOSED FORM so that the gated field's measured high-pass energy equals
  the prediction exactly — see :func:`_solve_gain`.

The band split is the same spectral Gaussian (sigma = 7 px, the
reference's blurring: data_processing.py:153-211) that defines the
sharpness metric, so a correct energy prediction drives the gated
floored ratio (tools/train_shipped_ckpt.floored_ratio_stats) to ~1.0 by
construction.  All features are intensive (means over the sample), so a
gate calibrated on 96-px protocol crops transfers to arbitrary inference
domains.  The floor is the metric's own conditioning floor (FLOOR_EPS x
protocol-mean truth energy), baked into the calibration at fit time.

The gate runs inside jit (one fft2/ifft2 pair and a ~dozen fused
reductions per sample — microseconds next to the generator), is
generator-agnostic, and ships as a separate asset
(windtpu/assets/weights/texture-gate.npz) loaded alongside the generator
bundle.  Reference parity: the reference has no such component (its
shipped weights-55.ckpt carries the same isotropic-texture defect class;
no evaluation harness exists there to see it) — this is a windtpu
quality addition, gated by tests/test_texture_gate.py and the
bundled-weights band test.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

#: Band-split scale (px).  MUST match the metric's blur
#: (tools/train_shipped_ckpt.highpass_energy) and the reference's
#: low-res construction blur.
SIGMA = 7.0

#: Gain clip range.  Bounds the damage a mispredicted energy can do:
#: texture is never amplified beyond 3x / attenuated beyond 4x in
#: amplitude (16x in energy — covers the worst measured floored
#: overshoot, 2.56, with ~6x margin).
S_MIN, S_MAX = 0.25, 3.0


def _gauss_multiplier(ny: int, nx: int, sigma: float = SIGMA) -> jnp.ndarray:
    """Spectral Gaussian G(k) on the full fft2 grid, shape (ny, nx)."""
    ky = jnp.fft.fftfreq(ny)[:, None]
    kx = jnp.fft.fftfreq(nx)[None, :]
    return jnp.exp(-2.0 * (jnp.pi * sigma) ** 2 * (ky ** 2 + kx ** 2))


def _spectral_lowpass(field: jnp.ndarray, sigma: float = SIGMA) -> jnp.ndarray:
    """Periodic Gaussian blur over the last two axes (matches the
    metric's FFT blur, train_shipped_ckpt.gaussian_blur)."""
    ny, nx = field.shape[-2], field.shape[-1]
    g = _gauss_multiplier(ny, nx, sigma)
    spec = jnp.fft.fft2(field.astype(jnp.float32))
    return jnp.fft.ifft2(spec * g).real


def _hp_energy(field: jnp.ndarray) -> jnp.ndarray:
    """Mean squared high-pass content over (T, H, W) — the metric."""
    hp = field - _spectral_lowpass(field)
    return jnp.mean(hp * hp, axis=(-3, -2, -1))


def _features(low: jnp.ndarray) -> jnp.ndarray:
    """Per-sample intensive features, shape (..., 2, F).

    ``low`` is one sample (..., T, H, W, 3): blurred u, blurred v,
    elevation/1e3 — the generator's input contract (api.predict).
    Row c of the output describes output channel c; the two rows share
    the same network (the physics is symmetric under u<->v swap), so
    axis-pinned days are handled by construction rather than learned
    twice.
    """
    u, v, elev = low[..., 0], low[..., 1], low[..., 2]
    red = (-3, -2, -1)

    def chan_stats(x):
        return [jnp.mean(jnp.abs(x), axis=red), jnp.std(x, axis=red),
                jnp.log(_hp_energy(x) + 1e-8)]

    su, sv = chan_stats(u), chan_stats(v)
    speed = jnp.mean(jnp.sqrt(u * u + v * v), axis=red)
    # Terrain roughness: fine-scale truth energy is terrain-locked
    # (slope-modulated gusts), so the gradient magnitude of the
    # elevation channel carries the per-crop texture amplitude that
    # elevation std (a large-scale statistic) misses.
    gy = elev - jnp.roll(elev, 1, axis=-2)
    gx = elev - jnp.roll(elev, 1, axis=-1)
    grad2 = gy * gy + gx * gx
    rough = [jnp.mean(jnp.sqrt(grad2), axis=red),
             jnp.log(jnp.mean(grad2, axis=red) + 1e-10)]
    shared = [speed, jnp.std(elev, axis=red),
              jnp.log(_hp_energy(elev) + 1e-8)] + rough
    # Channel c's view: (own stats, other channel's stats, shared).
    fu = jnp.stack(su + sv + shared, axis=-1)
    fv = jnp.stack(sv + su + shared, axis=-1)
    return jnp.stack([fu, fv], axis=-2)  # (..., 2, F)


N_FEATURES = 11


def init_params(key: jax.Array, hidden: int = 32) -> Params:
    """Fresh gate parameters (MLP F -> hidden -> hidden -> 1).

    ``f_mu``/``f_sd`` (feature normalization) and ``floor`` (the
    metric's conditioning floor, in truth-energy units) are calibration
    constants filled in by the fitting tool (tools/train_texture_gate.py).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = 1.0 / np.sqrt(N_FEATURES)
    s2 = 1.0 / np.sqrt(hidden)
    return {
        "w1": jax.random.normal(k1, (N_FEATURES, hidden)) * s1,
        "b1": jnp.zeros((hidden,)),
        "w2": jax.random.normal(k2, (hidden, hidden)) * s2,
        "b2": jnp.zeros((hidden,)),
        "w3": jax.random.normal(k3, (hidden, 1)) * s2,
        "b3": jnp.zeros((1,)),
        "f_mu": jnp.zeros((N_FEATURES,)),
        "f_sd": jnp.ones((N_FEATURES,)),
        "floor": jnp.asarray(1e-3, jnp.float32),
    }


def predict_log_energy(params: Params, low: jnp.ndarray) -> jnp.ndarray:
    """Predicted log truth high-pass energy, shape (..., 2)."""
    f = (_features(low) - params["f_mu"]) / params["f_sd"]
    h = jnp.tanh(f @ params["w1"] + params["b1"])
    h = jnp.tanh(h @ params["w2"] + params["b2"])
    return (h @ params["w3"] + params["b3"])[..., 0]


def _band_moments(spec: jnp.ndarray,
                  g: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(m, a, b, c) per (..., channel): the exact-energy solve inputs.

    ``spec`` = fft2 of the field, (..., T, H, W); ``g`` = G(k).  With
    H = 1-G, the gated field is y' = (G + s H) y, so the METRIC's
    high-pass of y' is H y' = H G y + s H^2 y and its mean-square is the
    quadratic  E(s) = a + 2 b s + c s^2  with

        m = <|H Y|^2>      (ungated metric energy — diagnostics/floor),
        a = <|H G Y|^2>    (mid-band leakage that survives s = 0),
        b = <H G Y, H^2 Y> (>= 0: all multipliers are nonnegative),
        c = <|H^2 Y|^2>    (the controllable energy).

    <.> is the image-space mean-square over (T, H, W), computed in
    Fourier via Parseval (1/N^2 per frame).
    """
    h = 1.0 - g
    # Parseval: mean_x |z|^2 = (1/N^2) sum_k |z_hat|^2 per frame.
    n2 = float(spec.shape[-2] * spec.shape[-1]) ** 2
    p = (spec.real ** 2 + spec.imag ** 2) / n2

    def mom(w):  # sum over (H, W), mean over T
        return jnp.mean(jnp.sum(w * p, axis=(-2, -1)), axis=-1)

    return mom(h ** 2), mom((h * g) ** 2), mom(h ** 3 * g), mom(h ** 4)


def _solve_gain(target, m, a, b, c, floor):
    """Gain s with E(s) = a + 2bs + cs^2 = clip-feasible ``target``.

    Closed form: s = (-b + sqrt(b^2 + c (target - a))) / c.  Where the
    target is unreachable (target < a: mid-band leakage alone exceeds
    it) the sqrt clamps at 0 and s -> 0 -> clipped to S_MIN.  Channels
    where both the prediction and the measurement sit under the metric
    floor are truly texture-free on both sides — gain 1 (do nothing),
    never amplify noise up to the floor.
    """
    disc = jnp.maximum(b * b + c * (target - a), 0.0)
    s = (-b + jnp.sqrt(disc)) / jnp.maximum(c, 1e-12)
    return jnp.clip(s, S_MIN, S_MAX)


def gate_gains(params: Params, low: jnp.ndarray,
               fake: jnp.ndarray) -> jnp.ndarray:
    """Per-(sample, channel) high-pass gains, shape (..., 2)."""
    _, s = _gate(params, low, fake, want_field=False)
    return s


def apply_gate(params: Params, low: jnp.ndarray,
               fake: jnp.ndarray) -> jnp.ndarray:
    """Gate ``fake`` (..., T, H, W, 2) conditioned on ``low`` (..., T, H, W, 3).

    Returns the spectral blend G*fake + s*(1-G)*fake with the exact
    per-(sample, channel) gains.  Jit-friendly; leading batch/ensemble
    axes broadcast (each sample gets its own per-channel scalar).
    """
    out, _ = _gate(params, low, fake, want_field=True)
    return out


def _gate(params: Params, low: jnp.ndarray, fake: jnp.ndarray,
          want_field: bool):
    yc = jnp.moveaxis(fake, -1, -4).astype(jnp.float32)  # (..., 2, T, H, W)
    ny, nx = yc.shape[-2], yc.shape[-1]
    g = _gauss_multiplier(ny, nx)
    spec = jnp.fft.fft2(yc)
    m, a, b, c = _band_moments(spec, g)

    pred = jnp.exp(predict_log_energy(params, low))
    floor = params["floor"]
    target = jnp.maximum(pred, floor)
    s = _solve_gain(target, m, a, b, c, floor)
    s = jnp.where((pred <= floor) & (m <= floor), 1.0, s)

    if not want_field:
        return None, s
    mult = g + s[..., None, None, None] * (1.0 - g)
    out = jnp.fft.ifft2(spec * mult).real
    return jnp.moveaxis(out, -4, -1), s


def apply_gate_targeted(pred_energy: jnp.ndarray, floor: jnp.ndarray,
                        fake: jnp.ndarray) -> jnp.ndarray:
    """Gate ``fake`` (..., T, H, W, 2) toward precomputed target energies.

    The API inference path splits the gate: the energy PREDICTION runs
    on host from the input field's intensive statistics (so the field is
    never re-uploaded over the host<->device link just for a dozen
    scalars — see predict_log_energy_np), while the measurement + blend
    run here, on the stitched canvas that already lives in HBM.
    ``pred_energy`` broadcasts against the (..., 2) gain shape (a (2,)
    vector applies one target per channel across all ensemble members).
    """
    yc = jnp.moveaxis(fake, -1, -4).astype(jnp.float32)
    # Canvases can carry NaN holes (cells no patch covers at exotic
    # tilings); one NaN would poison the whole FFT.  Zero them for the
    # spectral ops and restore afterwards — zeros add no band energy.
    finite = jnp.isfinite(yc)
    yz = jnp.where(finite, yc, 0.0)
    ny, nx = yz.shape[-2], yz.shape[-1]
    g = _gauss_multiplier(ny, nx)
    spec = jnp.fft.fft2(yz)
    m, a, b, c = _band_moments(spec, g)
    target = jnp.maximum(pred_energy, floor)
    s = _solve_gain(target, m, a, b, c, floor)
    s = jnp.where((pred_energy <= floor) & (m <= floor), 1.0, s)
    mult = g + s[..., None, None, None] * (1.0 - g)
    out = jnp.fft.ifft2(spec * mult).real
    out = jnp.where(finite, out, yc)
    return jnp.moveaxis(out, -4, -1)


# ---------------------------------------------------------------------------
# Host (numpy) twin — used by the streaming engine, whose canvas lives in
# host RAM precisely because it does NOT fit on device, and by the API's
# host-side energy prediction.  Mirrors the jnp math exactly (float32).
# ---------------------------------------------------------------------------

def _np_gauss(ny, nx, sigma=SIGMA):
    ky = np.fft.fftfreq(ny)[:, None]
    kx = np.fft.fftfreq(nx)[None, :]
    return np.exp(-2.0 * (np.pi * sigma) ** 2
                  * (ky ** 2 + kx ** 2)).astype(np.float32)


def _np_hp_energy(field):
    """Metric high-pass energy over the last 3 axes (T, H, W), computed
    from the power spectrum (no inverse FFT): mean_x |Hy|^2 =
    sum_k H(k)^2 |Y_k|^2 / N^2 per frame."""
    field = np.asarray(field, np.float32)
    ny, nx = field.shape[-2], field.shape[-1]
    h = 1.0 - _np_gauss(ny, nx)
    w = h[:, :nx // 2 + 1].copy()
    # rfft2 drops conjugate-symmetric columns; double their weight
    # (first column and, for even nx, the Nyquist column are unique).
    w[:, 1:(nx + 1) // 2] *= np.sqrt(2.0)
    w2 = w ** 2
    n2 = float(ny * nx) ** 2
    flat = field.reshape(-1, ny, nx)
    e = np.empty(flat.shape[0], np.float64)
    for f in range(flat.shape[0]):  # frame-at-a-time: numpy fft promotes
        # to complex128, and streaming-scale frames are large
        spec = np.fft.rfft2(flat[f])
        e[f] = np.sum((spec.real ** 2 + spec.imag ** 2) * w2) / n2
    return e.reshape(field.shape[:-2]).mean(axis=-1)


def features_np(low) -> np.ndarray:
    """Numpy twin of :func:`_features` — (..., 2, F)."""
    low = np.asarray(low, np.float32)
    u, v, elev = low[..., 0], low[..., 1], low[..., 2]
    red = (-3, -2, -1)

    def chan_stats(x):
        return [np.mean(np.abs(x), axis=red), np.std(x, axis=red),
                np.log(_np_hp_energy(x) + 1e-8)]

    su, sv = chan_stats(u), chan_stats(v)
    speed = np.mean(np.sqrt(u * u + v * v), axis=red)
    gy = elev - np.roll(elev, 1, axis=-2)
    gx = elev - np.roll(elev, 1, axis=-1)
    grad2 = gy * gy + gx * gx
    rough = [np.mean(np.sqrt(grad2), axis=red),
             np.log(np.mean(grad2, axis=red) + 1e-10)]
    shared = [speed, np.std(elev, axis=red),
              np.log(_np_hp_energy(elev) + 1e-8)] + rough
    fu = np.stack(su + sv + shared, axis=-1)
    fv = np.stack(sv + su + shared, axis=-1)
    return np.stack([fu, fv], axis=-2)


def predict_log_energy_np(params: Params, low) -> np.ndarray:
    """Numpy twin of :func:`predict_log_energy` — (..., 2)."""
    p = {k: np.asarray(v) for k, v in params.items()}
    f = (features_np(low) - p["f_mu"]) / p["f_sd"]
    h = np.tanh(f @ p["w1"] + p["b1"])
    h = np.tanh(h @ p["w2"] + p["b2"])
    return (h @ p["w3"] + p["b3"])[..., 0]


def apply_gate_targeted_np(pred_energy, floor, fake) -> np.ndarray:
    """Numpy twin of :func:`apply_gate_targeted` for host (streaming)
    canvases.  Processes one (sample, channel) frame stack at a time —
    O(T * H * W) working memory, so a past-HBM-ceiling streamed field
    (the only caller at such sizes) never doubles its own footprint."""
    fake = np.asarray(fake, np.float32)
    lead = fake.shape[:-4]
    t, ny, nx = fake.shape[-4:-1]
    g = _np_gauss(ny, nx)
    h = 1.0 - g
    n2 = float(ny * nx) ** 2
    pred_energy = np.broadcast_to(np.asarray(pred_energy, np.float32),
                                  lead + (2,))
    floor = float(floor)

    out = np.empty_like(fake)
    flat = fake.reshape((-1,) + fake.shape[-4:])
    oflat = out.reshape((-1,) + fake.shape[-4:])
    pflat = pred_energy.reshape(-1, 2)
    wm, wa = h ** 2, (h * g) ** 2
    wb, wc = h ** 3 * g, h ** 4
    for i in range(flat.shape[0]):
        for ch in (0, 1):
            m = a = b = c = 0.0
            for f in range(t):  # numpy fft promotes to complex128 —
                # frame-at-a-time keeps working memory O(H * W)
                spec = np.fft.fft2(np.nan_to_num(flat[i, f, ..., ch]))
                p = (spec.real ** 2 + spec.imag ** 2) / n2
                m += float(np.sum(wm * p))
                a += float(np.sum(wa * p))
                b += float(np.sum(wb * p))
                c += float(np.sum(wc * p))
            m, a, b, c = m / t, a / t, b / t, c / t
            pe = float(pflat[i, ch])
            target = max(pe, floor)
            disc = max(b * b + c * (target - a), 0.0)
            s = (-b + np.sqrt(disc)) / max(c, 1e-12)
            s = float(np.clip(s, S_MIN, S_MAX))
            if pe <= floor and m <= floor:
                s = 1.0
            mult = g + s * h
            for f in range(t):
                frame = flat[i, f, ..., ch]
                finite = np.isfinite(frame)
                gated = np.fft.ifft2(
                    np.fft.fft2(np.nan_to_num(frame)) * mult
                ).real.astype(np.float32)
                oflat[i, f, ..., ch] = np.where(finite, gated, frame)
    return out


def save_gate_npz(path: str, params: Params) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_gate_npz(path) -> Params:
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}
