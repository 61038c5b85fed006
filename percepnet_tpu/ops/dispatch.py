"""Explicit implementation dispatch for backend-specialized ops.

Several hot ops ship two implementations with identical semantics but
different reduction orders / kernels:

  cpu  the configuration the strict 1e-4 parity goldens were validated
       against (cumsum window energies, grouped-conv correlations,
       gather comb) — also the safe default on any non-TPU backend.
  tpu  the MXU/Pallas tier (banded-matmul window energies, DFT-domain
       correlations, Pallas rotate-extract comb) — decision parity is
       audited on-chip by tools/check_tpu.py.

The choice is threaded EXPLICITLY (pipeline.enhance_chunk(impl=...) ->
features.frontend.analyze_batch(impl=...) -> ops), so traced code never
branches on hidden global state.  `resolve_impl(None)` is the
convenience fallback for direct op calls: it reads the default backend
ONCE at the resolution point — call it at setup time, outside jit, when
the choice must be pinned (the CLI/serve/bench entry points do).
"""

from __future__ import annotations

import jax

VALID_IMPLS = ("cpu", "tpu")


def resolve_impl(impl: str | None = None) -> str:
    """Return the op implementation tier, 'cpu' or 'tpu'.

    impl=None auto-selects from jax.default_backend() at call time;
    pass an explicit value anywhere the caller's backend intent must
    survive tracing (e.g. a CPU-forced session that later compiles for
    TPU, or jit(backend=...)).
    """
    if impl is None:
        return "tpu" if jax.default_backend() == "tpu" else "cpu"
    if impl not in VALID_IMPLS:
        raise ValueError(
            f"impl must be one of {VALID_IMPLS} or None, got {impl!r}")
    return impl
