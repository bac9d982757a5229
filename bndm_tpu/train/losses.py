"""Training objectives and batch tricks of the BNDM pipelines.

Exact math per SURVEY.md S2.9 / reference iadb_bn.py:859-995:

  forward blend   x_alpha = alpha * x0 + (1 - alpha) * x1   (x1 = data, x0 = noise;
                  the reference's "be careful" line iadb_bn.py:915)
  antithetic t    t ~ U{1..T} for bs/2, then concat(t, T - t + 1)   (:866-869)
  gaussian/GBN    sum (d - (x1 - x0))^2                              (:973-974)
  BN/RN, C out    target = x1 - x0 + alpha_{t-1} * (noise_bn - noise_wn)  (:948-950)
  BN/RN, 2C out   d1 <- x1 - x0;  d2 <- alpha_{t-1} * (noise_bn - noise_wn),
                  loss = sum|d1-tar1|^2 * 1 + sum|d2-tar2|^2 * (dgamma_t/dalpha_t)
                  (:952-968; latent variant splits channels at the midpoint)
  remap           greedy nearest-neighbour reassignment of data to noise
                  within the batch (batch-OT stratification, :884-893)

All losses are *sums* (not means), matching the reference's magnitudes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def antithetic_timesteps(key, batch_size, nb_steps, low=1):
    """t ~ U{low..T} for bs//2 then mirrored: concat(t, T - t + 1)[:bs].

    (iadb_bn.py:866-869; the DDIM pipeline uses low=0 with T - t - 1,
    ddim_diffusers.py:746-747 — pass low=0 and ddim=True for that.)
    """
    # ceil(bs/2): identical to the reference for even bs; for odd bs the
    # reference's bs//2 would yield bs-1 timesteps and crash on broadcast
    half = max((batch_size + 1) // 2, 1)
    t = jax.random.randint(key, (half,), low, nb_steps + 1)
    t = jnp.concatenate([t, nb_steps - t + 1])[:batch_size]
    return t


def antithetic_timesteps_ddim(key, batch_size, nb_steps):
    """DDIM variant: t ~ U{0..T-1}, mirror T - t - 1 (ddim_diffusers.py:746)."""
    half = max((batch_size + 1) // 2, 1)
    t = jax.random.randint(key, (half,), 0, nb_steps)
    t = jnp.concatenate([t, nb_steps - t - 1])[:batch_size]
    return t


def _bc(v):
    return jnp.reshape(v, (-1, 1, 1, 1))


def iadb_loss(d, x1, x0):
    """Plain IADB objective for gaussian/GBN (iadb_bn.py:973-974)."""
    return jnp.sum((d - (x1 - x0)) ** 2)


def bndm_loss(d, x1, x0, noise_bn, noise_wn, alpha, alpha_prev, gamma, gamma_prev, two_head):
    """BNDM objective for gaussianBN/RN (iadb_bn.py:944-971).

    ``two_head``: model predicts 2*C channels (the paper's setting,
    out_channel=6 pixel / 8 latent). Channel split at the midpoint
    (latent_...:623-625, equivalent to [:3]/[3:] for C=3).
    """
    if not two_head:
        tar = x1 - x0 + _bc(alpha_prev) * (noise_bn - noise_wn)
        return jnp.sum((d - tar) ** 2)
    c = d.shape[1] // 2
    d1, d2 = d[:, :c], d[:, c:]
    tar1 = x1 - x0
    tar2 = _bc(alpha_prev) * (noise_bn - noise_wn)
    delta_gamma = gamma - gamma_prev
    delta_alpha = alpha - alpha_prev
    loss1 = jnp.sum((d1 - tar1) ** 2, axis=(1, 2, 3))
    loss2 = jnp.sum((d2 - tar2) ** 2, axis=(1, 2, 3))
    # the reference literally multiplies loss1 by dalpha/dalpha ("weight is
    # simply 1") and loss2 by dgamma/dalpha
    return jnp.sum(loss1) + jnp.sum(loss2 * delta_gamma / delta_alpha)


def ddim_loss(model_output, noise, clean, timesteps, alphas_cumprod, prediction_type="epsilon"):
    """DDIM baseline losses (ddim_diffusers.py:758-769): epsilon MSE or
    SNR-weighted sample loss."""
    if prediction_type == "epsilon":
        return jnp.mean((model_output - noise) ** 2)
    if prediction_type == "sample":
        acp = _bc(alphas_cumprod[timesteps])
        snr = acp / (1.0 - acp)
        return jnp.mean(snr * (model_output - clean) ** 2)
    raise NotImplementedError(prediction_type)


def remap_batch(x0, x1, masked_value=10000.0):
    """Greedy nearest-neighbour batch-OT: returns the permutation ``mapping``
    such that x1[mapping] pairs each noise x0[i] with its (greedy) closest
    remaining data sample (iadb_bn.py:884-893).

    Sequential-greedy by construction; implemented as a fori_loop over the
    (static) batch — small B, negligible cost next to the UNet step.
    """
    b = x0.shape[0]
    dist = jnp.sqrt(
        jnp.maximum(
            jnp.sum(
                (x0.reshape(b, -1)[:, None, :] - x1.reshape(b, -1)[None, :, :]) ** 2, axis=-1
            ),
            0.0,
        )
    )

    def body(i, carry):
        dist, mapping = carry
        j = jnp.argmin(dist[i])
        mapping = mapping.at[i].set(j)
        dist = dist.at[:, j].set(masked_value)
        return dist, mapping

    _, mapping = jax.lax.fori_loop(0, b, body, (dist, jnp.zeros((b,), jnp.int32)))
    return mapping
