"""Host-side result wrapper.

Plays the role of the reference's MOI result getters
(``/root/reference/src/MOI_wrapper.jl:1232-1453``): termination status,
objective value with max-sense un-scaling, primal/dual values, solve time.

Multiplier conventions of the reported values (Ipopt-style, matching the
reference's write-back sign flips at ``sqp_trust_region.jl:215-222``):
``mult_g[i] > 0`` when row i's upper side is active, ``mult_x_L/U >= 0``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from .status import Status, is_success, status_name


@dataclasses.dataclass
class Results:
    """Solution of one NLP solve."""

    x: np.ndarray
    obj_val: float
    status: Status
    g: np.ndarray
    mult_g: np.ndarray
    mult_x_L: np.ndarray
    mult_x_U: np.ndarray
    iterations: int
    prim_infeas: float
    dual_infeas: float
    solve_time: float
    qp_iters_total: int
    n_accept: int
    n_reject: int
    n_soc_accept: int
    n_fr_iters: int
    statistics: Any = None

    @property
    def status_name(self) -> str:
        return status_name(self.status)

    @property
    def success(self) -> bool:
        return is_success(self.status)

    def __repr__(self) -> str:
        return (
            f"Results(status={self.status_name}, obj={self.obj_val:.8e}, "
            f"iter={self.iterations}, inf_pr={self.prim_infeas:.2e}, "
            f"inf_du={self.dual_infeas:.2e}, time={self.solve_time:.3f}s)"
        )


def from_raw(raw, solve_time: float) -> Results:
    """Convert a device-side SqpResult to host-side Results."""
    stats = raw.stats
    if stats is not None:
        n_it = int(raw.iterations)
        stats = {k: np.asarray(v)[: n_it + 1] for k, v in stats.items()}
    try:
        status = Status(int(raw.status))
    except ValueError:
        status = Status.INTERNAL_ERROR
    return Results(
        x=np.asarray(raw.x),
        obj_val=float(raw.obj_val),
        status=status,
        g=np.asarray(raw.g),
        mult_g=np.asarray(raw.mult_g),
        mult_x_L=np.asarray(raw.mult_x_L),
        mult_x_U=np.asarray(raw.mult_x_U),
        iterations=int(raw.iterations),
        prim_infeas=float(raw.prim_infeas),
        dual_infeas=float(raw.dual_infeas),
        solve_time=solve_time,
        qp_iters_total=int(raw.qp_iters_total),
        n_accept=int(raw.n_accept),
        n_reject=int(raw.n_reject),
        n_soc_accept=int(raw.n_soc_accept),
        n_fr_iters=int(raw.n_fr_iters),
        statistics=stats,
    )
