"""
Newmark-beta time discretization.

Same closed-form update relations and hand derivatives as the reference
(reference: ``src/femvf/equations/newmark.py``), written as dtype-agnostic
arithmetic so they trace under jit/vmap/grad.  Defaults gamma=1/2, beta=1/4
(trapezoidal/average-acceleration rule).
"""


def newmark_predict_u(u0, v0, a0, dt):
    """Explicit Newmark predictor u0 + dt*v0 + dt^2/2 * a0.

    The canonical starting guess for the implicit displacement solve;
    shared by the per-step solver (``models/transient.py``) and the
    correction-memory seed in ``forward._advance`` so the two can never
    drift apart."""
    return u0 + dt * v0 + 0.5 * dt * dt * a0


def newmark_v(u, u0, v0, a0, dt, gamma=1 / 2, beta=1 / 4):
    """Velocity update (reference: ``newmark.py:8-29``)."""
    return (
        gamma / beta / dt * (u - u0)
        - (gamma / beta - 1.0) * v0
        - dt * (gamma / 2.0 / beta - 1.0) * a0
    )


def newmark_v_du1(dt, gamma=1 / 2, beta=1 / 4):
    return gamma / beta / dt


def newmark_v_du0(dt, gamma=1 / 2, beta=1 / 4):
    return -gamma / beta / dt


def newmark_v_dv0(dt, gamma=1 / 2, beta=1 / 4):
    return -(gamma / beta - 1.0)


def newmark_v_da0(dt, gamma=1 / 2, beta=1 / 4):
    return -dt * (gamma / 2.0 / beta - 1.0)


def newmark_v_dt(u, u0, v0, a0, dt, gamma=1 / 2, beta=1 / 4):
    return -gamma / beta / dt**2 * (u - u0) - (gamma / 2.0 / beta - 1.0) * a0


def newmark_a(u, u0, v0, a0, dt, gamma=1 / 2, beta=1 / 4):
    """Acceleration update (reference: ``newmark.py:57-73``)."""
    return 1 / beta / dt**2 * (u - u0 - dt * v0) - (1 / 2 / beta - 1) * a0


def newmark_a_du1(dt, gamma=1 / 2, beta=1 / 4):
    return 1.0 / beta / dt**2


def newmark_a_du0(dt, gamma=1 / 2, beta=1 / 4):
    return -1.0 / beta / dt**2


def newmark_a_dv0(dt, gamma=1 / 2, beta=1 / 4):
    return -1.0 / beta / dt


def newmark_a_da0(dt, gamma=1 / 2, beta=1 / 4):
    return -(1 / 2 / beta - 1)


def newmark_a_dt(u, u0, v0, a0, dt, gamma=1 / 2, beta=1 / 4):
    return -2 / beta / dt**3 * (u - u0 - dt * v0) + 1 / beta / dt**2 * (-v0)


def newmark_error_estimate(a1, a0, dt, beta=1 / 4):
    """Zienkiewicz–Xie local error estimate
    (reference: ``newmark.py:101-128``)."""
    return 0.5 * dt**2 * (2 * beta - 1 / 3) * (a1 - a0)
