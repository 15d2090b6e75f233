"""Pure-NumPy float64 oracle implementation of the FASST GEM engine.

Stands in for the reference implementation while /root/reference is empty
(SURVEY.md §4): written straight from the published FASST equations
(SURVEY.md §A), deliberately simple, float64, host-only. The parity tests
compare the JAX engine against this oracle; if the reference mount is ever
populated, swap the oracle for the real pyfasst in the parity harness.
"""

from tests.oracle.fasst_oracle import (  # noqa: F401
    OracleParams, oracle_gem_run, oracle_separate, params_from_pytree,
)
