"""Time-lapse (4D) FWI: double-difference data for monitor inversion.

Capability family of the reference (research FWI framework; reference
mount empty — no file:line citations possible, see SURVEY.md §0).
Technique [GENRE: Waters et al.; Denli & Huang 2009; Zheng, Barton &
Singh 2011 "double-difference" time-lapse FWI]: instead of inverting the
monitor survey d_mon from scratch (whose model error is dominated by the
same acquisition/physics limits as the baseline), invert the effective
data

    d_eff = F(m_base) + (d_mon - d_base)

starting FROM the inverted baseline model m_base. At m = m_base the
residual is exactly the observed 4D difference d_mon - d_base, so the
gradient is driven only by the time-lapse signal: acquisition footprint
and common model error cancel in the difference, and the recovered
update m* - m_base localizes on the true 4D change
(tests/test_timelapse.py measures this against the parallel-inversion
alternative on a synthetic depletion patch).

Everything is plain data algebra on an existing ``FwiProblem`` (or any
of the multiparameter problems — anything with ``forward_all`` and a
``d_obs`` field), so it composes with every engine, misfit, mesh, and
driver unchanged.
"""

from __future__ import annotations

import dataclasses

import jax


def double_difference_data(problem, m_base, d_mon: jax.Array) -> jax.Array:
    """Effective observed data ``F(m_base) + (d_mon - d_base)``.

    ``problem.d_obs`` must hold the BASELINE field data d_base;
    ``m_base`` is the inverted baseline model (a tuple for the
    multiparameter problems, matching ``problem.forward_all``).
    """
    syn = problem.forward_all(m_base, problem.wavelet)
    return syn + (d_mon - problem.d_obs)


def double_difference_problem(problem, m_base, d_mon: jax.Array):
    """Copy of ``problem`` ready for the monitor inversion: its observed
    data replaced by the double-difference effective data. Start the
    inversion at ``m_base``; the recovered change is ``m* - m_base``."""
    d_eff = double_difference_data(problem, m_base, d_mon)
    return dataclasses.replace(problem, d_obs=d_eff)
