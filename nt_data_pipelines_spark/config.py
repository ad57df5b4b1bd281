"""Engine-wide constants mirroring the reference's semantics.

Reference citations (read-only copy at /root/reference):
- FACTORS / WINDOW / HALF_LIFE / IC / TARGET_ACTIVE_RISK:
  pipelines/variables.py:3-8
- annualization sqrt(252): pipelines/utils/portfolio.py:87
- lambda line-search start=100, tol=0.005, max 5 iterations:
  pipelines/utils/portfolio.py:90-121
"""

from __future__ import annotations

# The five-factor ETF model, sorted (reference sorts before pivoting).
FACTORS: list[str] = sorted(["MTUM", "QUAL", "SPY", "USMV", "VLUE"])

# Rolling window: one trading year of daily bars.
WINDOW: int = 252

# EWMA half-life in rows (Polars ewm_mean(half_life=60, adjust=True)).
HALF_LIFE: int = 60

# Information coefficient scaling signal scores into alphas.
IC: float = 0.05

# Portfolio optimization target (annualized active risk).
TARGET_ACTIVE_RISK: float = 0.05
LAMBDA_START: float = 100.0
LAMBDA_TOL: float = 0.005
LAMBDA_MAX_ITER: int = 5

TRADING_DAYS_PER_YEAR: int = 252
