"""Loss functions used by planning and continue-learning.

Behavioral contracts from the reference:

* ``rmse(yhat, y, eps)``: sqrt(MSE + eps) (reference
  /root/reference/paule/util.py:564-574, used with eps=0).
* ``velocity_jerk_loss``: RMSE (or MSE) of five-point-stencil velocity and
  jerk against zero, optionally against a ``guiding_factor``-scaled stopped
  copy of themselves (reference /root/reference/paule/paule.py:75-88).
* ``cp_trajectory_loss``: additive RMSE over position, velocity, acceleration
  and jerk; the reference evaluates each derivative term three times (its
  ``lag`` argument is deprecated and ignored, so the three calls are
  identical — the effective weighting is pos + 3*(vel + acc + jerk); see
  /root/reference/paule/util.py:640-671).  We compute each term once and
  scale by 3 for identical values without redundant compute.
"""

import jax
import jax.numpy as jnp

from .derivatives import vel_acc_jerk, local_linear


def mse(yhat, y):
    return jnp.mean((yhat - y) ** 2)


def rmse(yhat, y, *, eps=0.0):
    return jnp.sqrt(mse(yhat, y) + eps)


def l1(yhat, y):
    return jnp.mean(jnp.abs(yhat - y))


def bce_with_logits(logits, targets):
    """Binary cross entropy on logits, mean-reduced (numerically stable)."""
    # max(x,0) - x*z + log(1 + exp(-|x|))
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def velocity_jerk_loss(pred, *, loss=rmse, guiding_factor=None):
    """(velocity_loss, jerk_loss) of a trajectory against stillness."""
    vel, _acc, jerk = vel_acc_jerk(pred, delta_t=1.0)
    if guiding_factor is None:
        velocity_loss = loss(vel, jnp.zeros_like(vel))
        jerk_loss = loss(jerk, jnp.zeros_like(jerk))
    else:
        if not 0.0 < guiding_factor < 1.0:
            raise ValueError("guiding_factor must be in (0, 1)")
        velocity_loss = loss(vel, guiding_factor * jax.lax.stop_gradient(vel))
        jerk_loss = loss(jerk, guiding_factor * jax.lax.stop_gradient(jerk))
    return velocity_loss, jerk_loss


def local_linear_loss(cps):
    """MSE of the second central difference against zero."""
    ll = local_linear(cps)
    return mse(ll, jnp.zeros_like(ll))


def cp_trajectory_loss(y_hat, tgts):
    """Additive RMSE over position and (3x) velocity/acceleration/jerk.

    Returns ``(loss, pos_loss, vel_loss, acc_loss, jerk_loss)`` where the
    derivative sub-losses already include the factor 3 (the reference sums
    three identical evaluations).
    """
    vel_t, acc_t, jerk_t = vel_acc_jerk(tgts)
    vel_p, acc_p, jerk_p = vel_acc_jerk(y_hat)

    pos_loss = rmse(y_hat, tgts)
    vel_loss = 3.0 * rmse(vel_p, vel_t)
    acc_loss = 3.0 * rmse(acc_p, acc_t)
    jerk_loss = 3.0 * rmse(jerk_p, jerk_t)

    loss = pos_loss + vel_loss + acc_loss + jerk_loss
    return loss, pos_loss, vel_loss, acc_loss, jerk_loss
