"""Vectorised stellar evolution: the SeBa replacement.

The reference runs the SeBa C++ binary-evolution code out of process and
reads back `mass`, `wind_mass_loss_rate` and the implicit supernova signal
"wind rate dropped to exactly zero" (al26_nbody.py:60, 841, 892, 946-948).
It also spawns throwaway single-star SeBa instances at init to get each
massive star's lifetime-integrated mass loss (`calc_total_mass_loss`,
al26_nbody.py:467-493, evolved to 2x the estimated lifespan, i.e. past the
SN, so the returned loss is m0 - m_remnant).

Here the same capability is a set of pure, closed-form jax functions over an
anchor table, fully `vmap`-able and usable inside `jit`:

  * `t_sn(m0)`       — time of core collapse (Myr)
  * `m_presn(m0)`    — pre-supernova mass (Msun)
  * `m_remnant(m0)`  — remnant mass (Msun)
  * `wind_mdot(m0,t)`— wind mass-loss rate (Msun/Myr), EXACTLY zero past t_sn
  * `mass_at(m0,t)`  — current mass (Msun), dropping to m_remnant at t_sn
  * `total_wind_loss(m0)` — m0 - m_remnant, matching the reference's
    normalisation of wind_ratio (al26_nbody.py:1583-1594)

Model: massive-star LIFETIMES are closed-form Hurley, Pols & Tout (2000)
fits (models.stellar.hurley2000; t_sn = t_ms * 1.11, validated
against the Schaller et al. 1992 and Limongi & Chieffi 2018 grids in
tests/test_stellar_yields.py with the grid spread documented in
docs/stellar_model.md). Every public function takes a STATIC `z`
(metallicity) keyword, default 0.02 — the reference always runs SeBa at
Z = 0.02 (al26_nbody.py:467,483), so non-solar z is a superset: lifetimes
carry the full published Hurley zeta-dependence; the low-mass anchor
times are rescaled by the Hurley t_bgb(z)/t_bgb(0.02) ratio; pre-SN and
remnant MASSES keep the solar-calibrated anchor tables (no comparable
closed-form metallicity scaling is published — documented in
docs/stellar_model.md). Pre-SN and remnant masses are anchor tables
(NS remnants ~1.4 Msun for 13-25 Msun, direct BH collapse above ~25-30
Msun — consistent with the reference's own yield tables, which carry SN
yields only for 13-25 Msun and wind-only yields for 30-120 Msun,
limongi-chieffi-2018/fit-data.py:72-79). The wind history is
a two-phase piecewise-constant rate: a weak main-sequence wind for
t < f_ms_t * t_sn releasing a fraction f_ms_m of the lifetime wind loss,
then a strong post-MS (RSG/WR) wind releasing the rest. The phase split is
what sets the *timing* of SLR wind deposition; the lifetime-integrated SLR
release is pinned to the Limongi-Chieffi yield tables regardless (see
al26_tpu.models.yields).

Interpolation is linear in (log m, log y) between anchors, clamped at the
ends; everything is differentiable except the intended discontinuity at
t_sn.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# Anchor tables (solar metallicity Z = 0.02)
# --------------------------------------------------------------------------
# mass grid (Msun)
_M = np.array([0.8, 3.0, 8.0, 13.0, 15.0, 20.0, 25.0,
               30.0, 40.0, 60.0, 85.0, 120.0, 150.0])
# end-of-burning anchors (Myr) for stars BELOW the SN cut (AGB phase timing
# only; cross-checked against Hurley+2000 t_bgb: 380 Myr at 3 Msun, 37 Myr
# at 8). At and above 8 Msun `t_end` uses the closed-form Hurley fits
# (hurley2000.t_sn_solar) instead of this table.
_T_END = np.array([2.5e4, 4.0e2, 4.0e1, 14.8, 12.1, 8.6, 7.0,
                   6.0, 5.0, 3.9, 3.4, 3.0, 2.8])
# pre-supernova mass (Msun): weak RSG winds for 13-25, heavy WR stripping
# above 30.
_M_PRESN = np.array([0.53, 0.65, 7.0, 12.3, 13.6, 15.8, 16.2,
                     13.5, 14.0, 17.0, 22.5, 28.5, 33.0])
# remnant mass (Msun): WD below 8, NS 13-25, BH (direct collapse) >= 30.
_M_REM = np.array([0.53, 0.65, 1.25, 1.35, 1.40, 1.55, 1.70,
                   11.0, 12.5, 16.0, 21.5, 27.5, 32.0])
# fraction of the lifetime spent before the strong-wind phase begins
_F_MS_T = np.array([0.99, 0.99, 0.95, 0.90, 0.90, 0.89, 0.88,
                    0.82, 0.80, 0.78, 0.76, 0.75, 0.75])
# fraction of the lifetime wind loss shed during the MS phase
_F_MS_M = np.array([0.5, 0.5, 0.2, 0.10, 0.10, 0.12, 0.15,
                    0.30, 0.35, 0.40, 0.42, 0.45, 0.45])

_LOG_M = np.log(_M)

# minimum initial mass that undergoes core collapse (SN) — high-mass stars
# in this code are >= 13 Msun (al26_nbody.py:1211) so the precise cut only
# matters for completeness.
SN_MIN_MASS = 8.0


def _loglog_interp(m0: jax.Array, ytab: np.ndarray) -> jax.Array:
    x = jnp.log(jnp.clip(m0, _M[0], _M[-1]))
    return jnp.exp(jnp.interp(x, jnp.asarray(_LOG_M), jnp.log(jnp.asarray(ytab))))


def _loglin_interp(m0: jax.Array, ytab: np.ndarray) -> jax.Array:
    x = jnp.log(jnp.clip(m0, _M[0], _M[-1]))
    return jnp.interp(x, jnp.asarray(_LOG_M), jnp.asarray(ytab))


def t_end(m0: jax.Array, z: float = 0.02) -> jax.Array:
    """End of nuclear burning (Myr); equals the SN time for m0 >= 8 Msun.

    Massive stars use the published Hurley+2000 closed-form lifetime fits
    (hurley2000.t_sn, full zeta-dependence); below the SN cut the anchor
    table times the AGB phases, rescaled off-solar by the Hurley
    t_bgb(z)/t_bgb(0.02) ratio (z is static, so the solar path is
    bit-identical to round 1)."""
    from . import hurley2000

    lo = _loglog_interp(m0, _T_END)
    if z != hurley2000.Z_SOLAR:
        lo = lo * (hurley2000.t_bgb(m0, z)
                   / hurley2000.t_bgb(m0, hurley2000.Z_SOLAR))
    return jnp.where(m0 >= SN_MIN_MASS, hurley2000.t_sn(m0, z), lo)


def t_sn(m0: jax.Array, z: float = 0.02) -> jax.Array:
    """Core-collapse time (Myr); +inf for stars below SN_MIN_MASS."""
    return jnp.where(m0 >= SN_MIN_MASS, t_end(m0, z), jnp.inf)


def m_presn(m0: jax.Array) -> jax.Array:
    return jnp.minimum(_loglog_interp(m0, _M_PRESN), m0)


def m_remnant(m0: jax.Array) -> jax.Array:
    return jnp.minimum(_loglog_interp(m0, _M_REM), m0)


def total_wind_loss(m0: jax.Array) -> jax.Array:
    """m0 - m_remnant: the reference's calc_total_mass_loss evolves SeBa
    past the SN so the 'wind loss' it returns includes the SN ejecta
    (al26_nbody.py:467-493). We preserve that normalisation."""
    return m0 - m_remnant(m0)


def _phase_rates(m0, z: float = 0.02):
    """(t_ms, mdot_ms, mdot_post, t_cc) for the two-phase wind model."""
    t_cc = t_end(m0, z)
    dm_wind = jnp.maximum(m0 - m_presn(m0), 0.0)
    f_t = _loglin_interp(m0, _F_MS_T)
    f_m = _loglin_interp(m0, _F_MS_M)
    t_ms = f_t * t_cc
    mdot_ms = f_m * dm_wind / t_ms
    mdot_post = (1.0 - f_m) * dm_wind / jnp.maximum(t_cc - t_ms, 1e-12)
    return t_ms, mdot_ms, mdot_post, t_cc


def wind_mdot(m0: jax.Array, t: jax.Array, z: float = 0.02) -> jax.Array:
    """Wind mass-loss rate (Msun/Myr, >= 0) at age t.

    EXACTLY zero for t >= t_sn: the reference detects supernovae by
    `wind_mass_loss_rate == 0` (al26_nbody.py:946-948) and we keep that
    signal. Low-mass stars (m0 < 8) return ~0 within cluster lifetimes
    (their MS wind is negligible at the Myr scales simulated here)."""
    t_ms, mdot_ms, mdot_post, t_cc = _phase_rates(m0, z)
    sn_mass = m0 >= SN_MIN_MASS
    alive_rate = jnp.where(t < t_ms, mdot_ms, mdot_post)
    rate = jnp.where(t < t_cc, alive_rate, 0.0)
    # below the SN cut: negligible wind on sim timescales -> 0 by design
    return jnp.where(sn_mass, rate, 0.0)


def mass_at(m0: jax.Array, t: jax.Array, z: float = 0.02) -> jax.Array:
    """Current mass at age t: wind losses accumulate piecewise-linearly,
    then the star drops to its remnant mass at t_sn (for m0 >= 8)."""
    t_ms, mdot_ms, mdot_post, t_cc = _phase_rates(m0, z)
    lost = jnp.where(
        t < t_ms,
        mdot_ms * t,
        mdot_ms * t_ms + mdot_post * (jnp.minimum(t, t_cc) - t_ms),
    )
    m_alive = m0 - lost
    sn_mass = m0 >= SN_MIN_MASS
    m_dead = m_remnant(m0)
    out = jnp.where((t >= t_cc) & sn_mass, m_dead, m_alive)
    return jnp.where(sn_mass, out, m0)


# --------------------------------------------------------------------------
# AGB phase model (for the interloper table generator, replacing the
# reference's SeBa stellar_type>=5 / >=7 phase detection,
# agb_wind/agb-wind-calc.py:28-64)
# --------------------------------------------------------------------------
# intermediate-mass anchors: AGB phase duration (Myr) and white-dwarf mass
_M_AGB = np.array([1.0, 3.0, 5.0, 6.0, 7.0, 8.0])
_AGB_DURATION = np.array([10.0, 2.0, 0.6, 0.45, 0.3, 0.2])
# Kalirai et al. 2008 initial-final mass relation: m_wd = 0.394 + 0.109 m
_AGB_SUPERWIND_STEEPNESS = 5.0


def m_wd(m0: jax.Array) -> jax.Array:
    """White-dwarf remnant mass for intermediate-mass stars (IFMR)."""
    return 0.394 + 0.109 * m0


def agb_t_end(m0: jax.Array, z: float = 0.02) -> jax.Array:
    """End of the AGB phase = end of nuclear burning for m0 < 8."""
    return t_end(m0, z)


def agb_t_start(m0: jax.Array, z: float = 0.02) -> jax.Array:
    x = jnp.log(jnp.clip(m0, _M_AGB[0], _M_AGB[-1]))
    dur = jnp.exp(jnp.interp(x, jnp.asarray(np.log(_M_AGB)),
                             jnp.log(jnp.asarray(_AGB_DURATION))))
    return agb_t_end(m0, z) - dur


def agb_mdot(m0: jax.Array, t: jax.Array, z: float = 0.02) -> jax.Array:
    """AGB wind mass-loss rate (Msun/Myr): an exponentially ramping
    superwind through the phase, normalised so its integral equals the
    envelope loss m0 - m_wd. Zero outside [agb_t_start, agb_t_end]."""
    t0 = agb_t_start(m0, z)
    t1 = agb_t_end(m0, z)
    dur = t1 - t0
    s = (t - t0) / dur
    k = _AGB_SUPERWIND_STEEPNESS
    dm = jnp.maximum(m0 - m_wd(m0), 0.0)
    norm = dm * k / (jnp.exp(k) - 1.0) / dur
    rate = norm * jnp.exp(k * s)
    return jnp.where((s >= 0.0) & (s <= 1.0), rate, 0.0)


def evolve(m0: jax.Array, t: jax.Array, z: float = 0.02):
    """One-call stellar-evolution step: (mass, wind_mdot) at age t.
    This is the per-step replacement for `stellar.evolve_model(t)` +
    channel copies (al26_nbody.py:841, 871-876); z is the SeBa
    `parameters.metallicity` analogue (al26_nbody.py:483), static because
    it comes from the frozen SimConfig."""
    return mass_at(m0, t, z), wind_mdot(m0, t, z)
