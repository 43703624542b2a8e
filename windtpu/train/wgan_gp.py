"""WGAN-GP optimization step — ONE jitted program per step.

The reference executes its train step op-by-op in TF eager-ish graph mode
(gan/ganbase.py:21-94): 3 critic updates (gradient penalty on
eps-interpolates + instance-noised real/fake scoring + Adam), then one
generator update, then a metric recompute pass.  Here the entire body —
including the grad-of-grad for the penalty and both optimizer updates —
compiles to a single XLA program.  Data parallelism is free: shard the
batch over the mesh's ``data`` axis and XLA inserts the grad psums.

Semantics preserved from the reference:

* critic trains ``n_critic`` times per generator update (ganbase.py:26);
* the GP norm reduces over axes (1, 2, 3), leaving per-channel norms
  (ganbase.py:36) — see losses.gradient_penalty_from_grads;
* instance noise (fresh IID noise, std = noise_std, out_channels wide) is
  added to BOTH discriminator inputs when scoring (ganbase.py:40-43);
* generator/discriminator batch-norm + spectral-norm state updates occur on
  every training=True forward, where Keras would update them — with one
  documented exception: the default ``fused_scoring=True`` scores real and
  fake in ONE doubled-batch critic call, so the spectral-norm power
  iteration advances once instead of twice per critic iter (README
  divergence 5; ``fused_scoring=False`` restores the exact call sequence);
* the returned scalar dict uses the reference's metric names
  (ganbase.py:75-94).

One deliberate fix (flagged): in the reference the gradient penalty is
computed OUTSIDE the parameter GradientTape (ganbase.py:32-45), so it
contributes ZERO gradient to the critic — the shipped training loop is
WGAN + instance noise only, with the GP merely logged.  ``detach_gp=True``
in TrainConfig replicates that; the default trains a real WGAN-GP.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from windtpu.core.config import GANConfig
from windtpu.metrics import metrics as M
from windtpu.models.discriminator import Discriminator
from windtpu.models.generator import Generator
from windtpu.train import optim
from windtpu.train.losses import (
    discriminator_loss,
    generator_adversarial_loss,
    gradient_penalty_from_grads,
    highpass_energy_ratio_loss,
    reconstruction_loss,
)
from windtpu.train.state import GANTrainState


def _tensor_mean_sq(grads) -> jax.Array:
    """mean over tensors of mean(g^2) — the reference's gradient diagnostic
    (ganbase.py:80-81)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.mean(jnp.stack([jnp.mean(g.astype(jnp.float32) ** 2)
                               for g in leaves]))


def make_train_step(
    cfg: GANConfig,
    feature_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    detach_gp: Optional[bool] = None,
    pmean_axis: Optional[str] = None,
    jit_wrap: bool = True,
):
    """Build the jitted (state, low_res, high_res, rng) -> (state, metrics)
    step.

    ``feature_fn`` maps a (B, T, H, W, 2) field to (B, T, latent) perceptual
    features for the optional reconstruction loss (gan/train.py:19-26).

    ``pmean_axis``: when the step runs inside ``shard_map`` with the batch
    sharded over that mesh axis, gradients and scalar metrics are pmean'ed
    across it before the optimizer updates (explicit-collective DP; the
    default sharded-jit path gets the same psums from XLA automatically).
    ``jit_wrap=False`` returns the raw function for shard_map to wrap.
    """
    mcfg, tcfg = cfg.model, cfg.train
    model_g = Generator(mcfg)
    model_d = Discriminator(mcfg)
    g_tx = optim.generator_optimizer(tcfg)
    d_tx = optim.discriminator_optimizer(tcfg)
    use_reco = feature_fn is not None and tcfg.reconstruction_coefficient > 0
    # Shared loss helper (losses.reconstruction_loss) — not re-derived
    # inline, so the formula can't drift between definitions.
    reco_fn = (reconstruction_loss(feature_fn, tcfg.reconstruction_coefficient)
               if use_reco else None)
    sharp_coeff = getattr(tcfg, "sharpness_coefficient", 0.0)
    sharp_sigma = getattr(tcfg, "sharpness_sigma", 7.0)
    adv_coeff = getattr(tcfg, "adversarial_coefficient", 1.0)
    _detach_gp = getattr(tcfg, "detach_gp", False) if detach_gp is None else detach_gp

    def g_fwd(g_params, g_state, lr, noise, train):
        variables = {"params": g_params, "batch_stats": g_state[0],
                     "spectral_stats": g_state[1]}
        if train:
            out, mut = model_g.apply(
                variables, lr, noise, train=True,
                mutable=["batch_stats", "spectral_stats"])
            return out, (mut["batch_stats"], mut["spectral_stats"])
        return model_g.apply(variables, lr, noise, train=False), g_state

    def d_fwd(d_params, d_sp, lr, hr, train):
        variables = {"params": d_params, "spectral_stats": d_sp}
        if train:
            out, mut = model_d.apply(variables, lr, hr, train=True,
                                     mutable=["spectral_stats"])
            return out, mut["spectral_stats"]
        return model_d.apply(variables, lr, hr, train=False), d_sp

    # Rematerialization: recompute forwards in the backward pass instead
    # of holding activations across the unrolled n_critic loop.  Since
    # fused_scoring and the critic scan unroll cut peak HBM, the bench
    # and flagship shapes fit with remat off (the fastest mode, the
    # default); "d_only" is the first fallback when a larger config OOMs
    # (the critic's LayerNorm temps dominate peak HBM).
    remat = getattr(tcfg, "remat", False)
    _g_train = lambda gp, gs, lr, n: g_fwd(gp, gs, lr, n, True)  # noqa: E731
    _d_train = lambda dp, sp, lr, hr: d_fwd(dp, sp, lr, hr, True)  # noqa: E731
    _d_raw = _d_train
    if remat is True:
        _g_train = jax.checkpoint(_g_train)
        _d_train = jax.checkpoint(_d_train)
    elif remat == "d_only":
        _d_train = jax.checkpoint(_d_train)
    elif remat == "save_scans":
        # Recompute the cheap folded convs in backward, but keep the
        # serial ConvLSTM scan outputs (models/layers.py names them).
        policy = jax.checkpoint_policies.save_only_these_names(
            "convlstm_out")
        _g_train = jax.checkpoint(_g_train, policy=policy)
        _d_train = jax.checkpoint(_d_train, policy=policy)
    # The GP critic call is differentiated TWICE (grad wrt image inside
    # grad wrt params), so remat there recomputes forwards quadratically;
    # remat_gp=False exempts it from the policy.
    _d_gp = _d_train if getattr(tcfg, "remat_gp", False) else _d_raw

    def train_step(state: GANTrainState, low_res, high_res, rng):
        # Shapes come from the actual batch (static under jit), not from
        # ModelConfig: the networks are fully convolutional, so a batch at
        # a different patch size / sequence length than ModelConfig's
        # nominal one must still get matching noise fields instead of an
        # opaque concat-shape error inside the generator.
        b, t, h, w = low_res.shape[:4]
        if low_res.shape[-1] != mcfg.in_channels:
            raise ValueError(
                f"batch has {low_res.shape[-1]} input channels but the "
                f"generator was built for ModelConfig.in_channels="
                f"{mcfg.in_channels}; align DataConfig.input_variables "
                f"with ModelConfig (e.g. via windtpu-train's wiring)")
        noise_shape = (b, t, h, w, mcfg.noise_channels)
        inst_shape = (b, t, h, w, high_res.shape[-1])
        rng = jax.random.fold_in(rng, state.step)
        if pmean_axis is not None:
            # Per-device noise streams under shard_map: distinct noise for
            # each batch shard (eps, instance noise, generator noise).
            rng = jax.random.fold_in(rng, jax.lax.axis_index(pmean_axis))

        g_params = state.g_params
        g_state = (state.g_batch_stats, state.g_spectral)
        g_opt = state.g_opt_state
        d_params, d_sp, d_opt = state.d_params, state.d_spectral, state.d_opt_state

        gp_mean_norm = jnp.zeros(())
        d_loss_val = jnp.zeros(())
        d_grad_diag = jnp.zeros(())

        # ---- critic updates (unrolled; n_critic is static) -------------------
        for critic_iter in range(tcfg.n_critic):
            k = jax.random.fold_in(rng, critic_iter)
            k_noise, k_eps, k_ir, k_if = jax.random.split(k, 4)
            noise = tcfg.noise_std * jax.random.normal(k_noise, noise_shape)
            fake, g_state = _g_train(g_params, g_state, low_res, noise)
            fake = jax.lax.stop_gradient(fake)
            eps = jax.random.uniform(k_eps, (b, 1, 1, 1, 1))
            mixed = eps * high_res + (1.0 - eps) * fake
            inst_r = tcfg.noise_std * jax.random.normal(k_ir, inst_shape)
            inst_f = tcfg.noise_std * jax.random.normal(k_if, inst_shape)

            def d_loss_fn(dp, d_sp):
                # Gradient penalty: differentiate the critic w.r.t. its
                # image input (grad-of-grad w.r.t. dp when this whole
                # function is differentiated).
                def critic_on_image(x):
                    scores, sp = _d_gp(dp, d_sp, low_res, x)
                    return jnp.sum(scores), sp

                grads_img, d_sp1 = jax.grad(
                    critic_on_image, has_aux=True)(mixed)
                penalty, mean_norm = gradient_penalty_from_grads(
                    grads_img, tcfg.gp_weight)
                if _detach_gp:
                    penalty = jax.lax.stop_gradient(penalty)
                if getattr(tcfg, "fused_scoring", True):
                    # One critic call on the doubled batch: identical math
                    # (no cross-sample ops in the critic) at half the
                    # kernel launches.
                    both, d_sp3 = _d_train(
                        dp, d_sp1,
                        jnp.concatenate([low_res, low_res], axis=0),
                        jnp.concatenate(
                            [high_res + inst_r, fake + inst_f], axis=0))
                    rs, fs = both[:b], both[b:]
                else:
                    rs, d_sp2 = _d_train(dp, d_sp1, low_res,
                                         high_res + inst_r)
                    fs, d_sp3 = _d_train(dp, d_sp2, low_res, fake + inst_f)
                loss = discriminator_loss(rs, fs) + penalty
                return loss, (d_sp3, mean_norm)

            (d_loss_val, (d_sp, gp_mean_norm)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params, d_sp)
            if pmean_axis is not None:
                d_grads = jax.lax.pmean(d_grads, pmean_axis)
                d_loss_val = jax.lax.pmean(d_loss_val, pmean_axis)
                gp_mean_norm = jax.lax.pmean(gp_mean_norm, pmean_axis)
            d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = jax.tree_util.tree_map(
                lambda p, u: p + u, d_params, d_updates)
            d_grad_diag = _tensor_mean_sq(d_grads)

        # ---- generator update -------------------------------------------------
        k_gen = jax.random.fold_in(rng, 1000)
        noise = tcfg.noise_std * jax.random.normal(k_gen, noise_shape)

        def g_loss_fn(gp, g_state, d_sp):
            fake, g_state_new = _g_train(gp, g_state, low_res, noise)
            adv = jnp.zeros(())
            d_sp_new = d_sp
            if adv_coeff > 0:   # static: 0 removes the critic fwd entirely
                scores, d_sp_new = _d_train(d_params, d_sp, low_res, fake)
                adv = adv_coeff * generator_adversarial_loss(scores)
            reco = jnp.zeros(())
            if use_reco:
                reco = reco_fn(low_res[..., :2], fake)
            sharp = jnp.zeros(())
            if sharp_coeff > 0:
                sharp = sharp_coeff * highpass_energy_ratio_loss(
                    fake, high_res, sigma=sharp_sigma)
            return adv + reco + sharp, (g_state_new, d_sp_new, adv, reco,
                                        sharp)

        (g_loss_val, (g_state, d_sp, g_adv, g_reco, g_sharp)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                g_params, g_state, d_sp))
        if pmean_axis is not None:
            g_grads = jax.lax.pmean(g_grads, pmean_axis)
            g_loss_val = jax.lax.pmean(g_loss_val, pmean_axis)
            g_adv = jax.lax.pmean(g_adv, pmean_axis)
            g_reco = jax.lax.pmean(g_reco, pmean_axis)
            g_sharp = jax.lax.pmean(g_sharp, pmean_axis)
            # BatchNorm running stats are data-dependent, so each shard
            # holds different values here; average them so the returned
            # state really is replicated (out_specs=P() in shard_step.py).
            # The EMA update is linear in the batch means, so one pmean at
            # the end equals updating with global-batch stats every
            # forward — the same semantics the sharded-jit path computes.
            # Spectral-norm u vectors depend only on the (replicated)
            # params, so they are already identical across shards.
            g_state = (jax.lax.pmean(g_state[0], pmean_axis), g_state[1])
        g_updates, g_opt = g_tx.update(g_grads, g_opt, g_params)
        g_params = jax.tree_util.tree_map(
            lambda p, u: p + u, g_params, g_updates)
        g_grad_diag = _tensor_mean_sq(g_grads)

        # ---- metric recompute, training=False (ganbase.py:63-72) -------------
        metrics = {
            "g_loss": g_loss_val,
            "g_disc_loss": g_adv,
            "g_reco_loss": g_reco,
            "g_sharp_loss": g_sharp,
            "d_gradient_pen": gp_mean_norm,
            "g_gradient_param": g_grad_diag,
            "d_gradient_param": d_grad_diag,
        }
        if tcfg.compute_metrics:
            k_eval = jax.random.fold_in(rng, 2000)
            noise_e = tcfg.noise_std * jax.random.normal(k_eval, noise_shape)
            hr_score, _ = d_fwd(d_params, d_sp, low_res, high_res, False)
            fake_e, _ = g_fwd(g_params, g_state, low_res, noise_e, False)
            fk_score, _ = d_fwd(d_params, d_sp, low_res, fake_e, False)
            eval_metrics = {
                "d_loss": discriminator_loss(hr_score, fk_score),
                "d_real": jnp.mean(hr_score),
                "d_fake": jnp.mean(fk_score),
                "g_acd": jnp.mean(M.angular_cosine_distance(high_res, fake_e)),
                "g_lsd": jnp.mean(M.log_spectral_distance(high_res, fake_e)),
                # axis_name: the extremeness weights normalize over the
                # GLOBAL batch sum; under shard_map each shard must psum
                # the denominator or the value depends on device count.
                "g_extreme_rmse": jnp.mean(
                    M.extreme_weighted_rmse(high_res, fake_e,
                                            axis_name=pmean_axis)),
                "g_ws_weighted_rmse": jnp.mean(
                    M.wind_speed_weighted_rmse(high_res, fake_e)),
                "g_ws_rmse": jnp.mean(M.wind_speed_rmse(high_res, fake_e)),
            }
            if tcfg.compute_spatial_ks:
                eval_metrics["g_spatial_ks"] = M.spatial_ks_scalar(
                    high_res, fake_e)
            if pmean_axis is not None:
                eval_metrics = jax.lax.pmean(eval_metrics, pmean_axis)
            metrics.update(eval_metrics)
        else:
            metrics["d_loss"] = d_loss_val

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params, g_batch_stats=g_state[0], g_spectral=g_state[1],
            g_opt_state=g_opt,
            d_params=d_params, d_spectral=d_sp, d_opt_state=d_opt,
        )
        return new_state, metrics

    if not jit_wrap:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_multi_train_step(
    cfg: GANConfig,
    steps_per_call: int,
    feature_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    detach_gp: Optional[bool] = None,
    unroll: bool = False,
):
    """K train steps per device call: ``(state, low_res_k, high_res_k, rng)
    -> (state, metrics)`` where the batch arguments carry a leading
    ``(steps_per_call,)`` axis and ``metrics`` are from the LAST step.

    The reference's Keras shim exposes the same concept as
    ``_steps_per_execution`` (ganbase.py:15).  The inner step folds the
    PRNG by ``state.step``, so the noise sequence is IDENTICAL to K
    single calls with the same ``rng``.

    Measured at the primary bench shape (batch 64/64px/T=6, v5e, K=4):
    the rolled scan is +1% over per-call dispatch (the async dispatch
    queue already hides most host overhead) at single-step compile cost;
    ``unroll=True`` lets XLA optimize ACROSS steps for +6% at ~2.8x the
    compile time.  Use unroll for long production runs, the rolled form
    when iterating.
    """
    inner = make_train_step(cfg, feature_fn=feature_fn, detach_gp=detach_gp,
                            jit_wrap=False)
    if steps_per_call <= 1:
        return jax.jit(inner, donate_argnums=(0,))

    def multi(state, low_res_k, high_res_k, rng):
        # The K batches arrive as length-K tuples and are stacked INSIDE
        # the jit: host batches upload as usual, and device-sharded
        # batches (the CLI's sharded infeed) keep their sharding — an
        # eager host-side np.stack would gather them (and crash on a
        # multi-host mesh where shards are non-addressable).
        xs = (jnp.stack(low_res_k), jnp.stack(high_res_k))

        def body(st, x):
            lr, hr = x
            return inner(st, lr, hr, rng)

        state, ms = jax.lax.scan(
            body, state, xs, unroll=steps_per_call if unroll else 1)
        return state, jax.tree_util.tree_map(lambda a: a[-1], ms)

    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(cfg: GANConfig):
    """Jitted test step (reference ganbase.py:96-113): critic loss on real
    vs generated + generator metric suite."""
    mcfg, tcfg = cfg.model, cfg.train
    model_g = Generator(mcfg)
    model_d = Discriminator(mcfg)

    def eval_step(state: GANTrainState, low_res, high_res, rng):
        b, t, h, w = low_res.shape[:4]
        noise = tcfg.noise_std * jax.random.normal(
            rng, (b, t, h, w, mcfg.noise_channels))
        g_vars = state.g_variables()
        d_vars = state.d_variables()
        true_scores = model_d.apply(d_vars, low_res, high_res, train=False)
        generated = model_g.apply(g_vars, low_res, noise, train=False)
        fake_scores = model_d.apply(d_vars, low_res, generated, train=False)
        return {
            "loss": discriminator_loss(true_scores, fake_scores),
            "d_real": jnp.mean(true_scores),
            "d_fake": jnp.mean(fake_scores),
            "g_acd": jnp.mean(M.angular_cosine_distance(high_res, generated)),
            "g_lsd": jnp.mean(M.log_spectral_distance(high_res, generated)),
            "g_extreme_rmse": jnp.mean(
                M.extreme_weighted_rmse(high_res, generated)),
            "g_ws_weighted_rmse": jnp.mean(
                M.wind_speed_weighted_rmse(high_res, generated)),
            "g_ws_rmse": jnp.mean(M.wind_speed_rmse(high_res, generated)),
        }

    return jax.jit(eval_step)
