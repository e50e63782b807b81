"""Numeric trajectory derivatives (five-point stencil) and smoothness
diagnostics, as pure JAX functions.

Behavioral contract (reference /root/reference/paule/util.py:577-637):

* ``five_point_stencil(x)``: first derivative approximated by
  ``f'(x) ≈ (-f(x+2h) + 8 f(x+h) - 8 f(x-h) + f(x-2h)) / (12 h)`` without
  padding, i.e. the output is 4 time steps shorter than the input.
* ``vel_acc_jerk(x)``: velocity, acceleration and jerk by repeated stencil
  application (each 4 steps shorter than the previous).
* ``local_linear(x)``: second central difference
  ``(2 x_t - x_{t-1} - x_{t+1}) / (2 h)`` — zero for locally linear
  trajectories (2 steps shorter than the input).

All functions operate on the time axis of ``(..., seq, channels)`` arrays and
are jit/vmap friendly (static slicing only).
"""

import jax.numpy as jnp


def five_point_stencil(trajectory, *, delta_t=1.0):
    """First time-derivative via an unpadded five-point stencil.

    Input ``(..., T, C)`` -> output ``(..., T - 4, C)``.
    """
    xx = trajectory
    return (
        -xx[..., 4:, :]
        + 8.0 * xx[..., 3:-1, :]
        - 8.0 * xx[..., 1:-3, :]
        + xx[..., :-4, :]
    ) / (12.0 * delta_t)


def local_linear(trajectory, *, delta_t=1.0):
    """Second central difference; zero where the trajectory is locally linear.

    Input ``(..., T, C)`` -> output ``(..., T - 2, C)``.
    """
    tt = trajectory
    return (2.0 * tt[..., 1:-1, :] - tt[..., :-2, :] - tt[..., 2:, :]) / (
        2.0 * delta_t
    )


def vel_acc_jerk(trajectory, *, delta_t=1.0):
    """Velocity, acceleration, jerk by repeated stencil application."""
    velocity = five_point_stencil(trajectory, delta_t=delta_t)
    acc = five_point_stencil(velocity, delta_t=delta_t)
    jerk = five_point_stencil(acc, delta_t=delta_t)
    return velocity, acc, jerk


def add_vel_and_acc_info(x):
    """Append first and second forward differences as extra channels.

    ``(..., T, C) -> (..., T, 3C)``; the last velocity row and the first/last
    acceleration rows are zero (matches the feature layout the sequence
    models were trained with, reference /root/reference/paule/models.py:47-61).
    """
    zeros = jnp.zeros_like(x[..., :1, :])
    velocity = x[..., 1:, :] - x[..., :-1, :]
    acceleration = velocity[..., 1:, :] - velocity[..., :-1, :]
    velocity = jnp.concatenate([velocity, zeros], axis=-2)
    acceleration = jnp.concatenate([zeros, acceleration, zeros], axis=-2)
    return jnp.concatenate([x, velocity, acceleration], axis=-1)


def double_sequence(x):
    """Double the time resolution by midpoint interpolation.

    ``(..., T, C) -> (..., 2T, C)`` with ``out[2t] = x[t]`` and
    ``out[2t+1] = (x[t] + x[t+1]) / 2`` (last odd slot repeats ``x[T-1]``).
    """
    x1 = x
    mid = (x[..., :-1, :] + x[..., 1:, :]) / 2.0
    x2 = jnp.concatenate([mid, x[..., -1:, :]], axis=-2)
    stacked = jnp.stack([x1, x2], axis=-2)  # (..., T, 2, C)
    new_shape = x.shape[:-2] + (2 * x.shape[-2], x.shape[-1])
    return stacked.reshape(new_shape)


def half_sequence(x):
    """Halve the time resolution by average pooling pairs of steps.

    ``(..., 2T, C) -> (..., T, C)`` (time length must be even).
    """
    t = x.shape[-2]
    if t % 2 != 0:
        raise ValueError(f"sequence length must be even, got {t}")
    new_shape = x.shape[:-2] + (t // 2, 2, x.shape[-1])
    return x.reshape(new_shape).mean(axis=-2)
