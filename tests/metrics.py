"""Centralized test tolerances (pattern from reference tests/metrics.py).

The TPU build targets tighter numerics than the reference's CPU CI
(BASELINE.md: 1e-6 states, 1e-5 gradients), so the core parity bars here
are stricter than the reference's 1e-2/1e-3 where the fixed-step f64
solvers allow it.
"""

ATOL_WF = 1e-6  # wavefunction parity vs scipy golden model
ATOL_EXPV_DP = 1e-6  # expectation parity (DP5)
ATOL_EXPV_KRYLOV = 1e-5  # expectation parity (Krylov)
ATOL_DERIV_TIME = 5e-2  # time derivative vs quintic spline
ATOL_DERIV_PARAM = 1e-5  # param gradients vs finite differences
ATOL_DERIV_COORD = 1e-4  # coordinate gradients vs finite differences
ATOL_OPTIM = 5e-2  # optimization convergence
ATOL_OPTIM_COORD = 1e-3
EPS_PARAM = 1e-4  # finite-difference step
RTOL_NOISE = 5e-3
ATOL_NOISE = 5e-3
ATOL_ENV = 5e-2
