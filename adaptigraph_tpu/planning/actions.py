"""Push-action encoding and MPPI action-space operators (JAX).

Port of src/planning/plan_utils.py:11-101. A push action is
(x_start, z_start, theta, length): the pusher travels `length` repeats of
`push_length` in direction theta from the start point; `length` is the
integer repeat count fed to the model as successive pushes.

The MPPI update and resampling operate in ENDPOINT space: actions are
converted to (start, end) points, perturbed / softmax-averaged there, and
converted back to (theta, length) — plan_utils.py:42-101.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def decode_action(action, push_length: float = 0.10):
    """(..., 4) [x, z, theta, length] -> ((..., 4) [xs, zs, xe, ze], repeats).

    One decoded segment covers a single `push_length` step; `repeats` is the
    integer number of model steps (plan_utils.py:11-20)."""
    x, z, theta, length = (action[..., 0], action[..., 1], action[..., 2],
                           action[..., 3])
    repeats = length.astype(jnp.int32)
    xe = x - push_length * jnp.cos(theta)
    ze = z - push_length * jnp.sin(theta)
    return jnp.stack([x, z, xe, ze], axis=-1), repeats


def decode_action_single(action, push_length: float = 0.10):
    """Full-extent decode for execution (plan_utils.py:22-29)."""
    x, z, theta = float(action[0]), float(action[1]), float(action[2])
    rep = int(action[3])
    import math

    return x, z, x - push_length * rep * math.cos(theta), z - push_length * rep * math.sin(theta)


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def clip_actions(action, lower, upper):
    action = action.at[..., 2].set(angle_normalize(action[..., 2]))
    return jnp.clip(action, lower, upper)


def sample_action_seq(act_seq, lower, upper, n_sample: int, key, iter_index: int = 0,
                      noise_level: float = 0.3, push_length: float = 0.10):
    """MPPI proposal sampling (plan_utils.py:42-77): iteration 0 resamples
    uniformly over the action box; later iterations perturb the incumbent in
    endpoint space with per-horizon-step noise scale beta = 0.1 * 10**i,
    keeping sample 0 as the unperturbed incumbent."""
    n_look, adim = act_seq.shape
    if iter_index == 0:
        u = jax.random.uniform(key, (n_sample, n_look, adim))
        return u * (upper - lower) + lower

    seqs = jnp.tile(act_seq[None], (n_sample, 1, 1))
    xs, zs = seqs[..., 0], seqs[..., 1]
    thetas, lengths = seqs[..., 2], seqs[..., 3]
    xe = xs - lengths * push_length * jnp.cos(thetas)
    ze = zs - lengths * push_length * jnp.sin(thetas)

    out = seqs
    keys = jax.random.split(key, n_look)
    for i in range(n_look):
        noise = jax.random.normal(keys[i], (n_sample, 4)) * noise_level
        beta = 0.1 * (10.0**i)
        res = beta * noise
        xs_i = xs[:, i] + res[:, 0]
        zs_i = zs[:, i] + res[:, 1]
        xe_i = xe[:, i] + res[:, 2]
        ze_i = ze[:, i] + res[:, 3]
        th_i = jnp.arctan2(zs_i - ze_i, xs_i - xe_i)
        ln_i = jnp.sqrt((xe_i - xs_i) ** 2 + (ze_i - zs_i) ** 2) / push_length
        new_i = clip_actions(jnp.stack([xs_i, zs_i, th_i, ln_i], -1), lower, upper)
        # keep sample 0 as the incumbent (plan_utils.py:75)
        new_i = new_i.at[0].set(seqs[0, i])
        out = out.at[:, i].set(new_i)
    return out


def optimize_action_mppi(act_seqs, reward_seqs, reward_weight: float = 100.0,
                         lower=None, upper=None, push_length: float = 0.10):
    """Softmax-weighted MPPI update in endpoint space (plan_utils.py:80-101)."""
    w = jax.nn.softmax(reward_seqs * reward_weight, axis=0)[:, None]
    xs, zs = act_seqs[..., 0], act_seqs[..., 1]
    thetas, lengths = act_seqs[..., 2], act_seqs[..., 3]
    xe = xs - lengths * push_length * jnp.cos(thetas)
    ze = zs - lengths * push_length * jnp.sin(thetas)
    x = jnp.sum(w * xs, axis=0)
    z = jnp.sum(w * zs, axis=0)
    xew = jnp.sum(w * xe, axis=0)
    zew = jnp.sum(w * ze, axis=0)
    theta = jnp.arctan2(z - zew, x - xew)
    length = jnp.sqrt((xew - x) ** 2 + (zew - z) ** 2) / push_length
    out = jnp.stack([x, z, theta, length], axis=-1)
    return clip_actions(out, lower, upper)
