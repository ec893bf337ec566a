"""Hock–Schittkowski test problems as pure-JAX NLPs.

The reference's correctness battery is the upstream MOI conformance suite
(``/root/reference/test/MOI_wrapper.jl:36-63``) — meaningless without MOI.
Per SURVEY §4 (implications item b) the replacement battery is this classic
NLP test set: each problem is stated exactly as in Hock & Schittkowski,
"Test Examples for Nonlinear Programming Codes" (1981), with the published
optimal objective value ``f_star`` (and ``x_star`` where unique) as the golden
target, and the book's standard starting points.

Constraint rows are ordered *linear first* with ``num_linear`` set, matching
the framework's canonical ordering (reference MOI_wrapper.jl:750-766).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..nlp import NLP

INF = np.inf


@dataclasses.dataclass(frozen=True)
class HSProblem:
    nlp: NLP
    f_star: float
    x_star: Optional[np.ndarray] = None


_REGISTRY: dict[str, HSProblem] = {}


def _register(name, f_star, x_star=None, **nlp_kw):
    nlp = NLP(name=name, **nlp_kw)
    _REGISTRY[name] = HSProblem(
        nlp=nlp,
        f_star=f_star,
        x_star=None if x_star is None else np.asarray(x_star, float),
    )


def hs_problem(name: str) -> HSProblem:
    return _REGISTRY[name]


def hs_names() -> list[str]:
    return sorted(_REGISTRY)


def _bounds(n, lo=-INF, hi=INF):
    return np.full(n, lo, float), np.full(n, hi, float)


# --- bound-constrained -----------------------------------------------------

_register(
    "hs001",
    f_star=0.0,
    x_star=[1.0, 1.0],
    f=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
    g=None,
    n=2,
    m=0,
    x_l=np.array([-INF, -1.5]),
    x_u=np.array([INF, INF]),
    g_l=np.zeros(0),
    g_u=np.zeros(0),
    x0=np.array([-2.0, 1.0]),
)

_register(
    "hs003",
    f_star=0.0,
    x_star=[0.0, 0.0],
    f=lambda x: x[1] + 1.0e-5 * (x[1] - x[0]) ** 2,
    g=None,
    n=2,
    m=0,
    x_l=np.array([-INF, 0.0]),
    x_u=np.array([INF, INF]),
    g_l=np.zeros(0),
    g_u=np.zeros(0),
    x0=np.array([10.0, 1.0]),
)

_register(
    "hs004",
    f_star=8.0 / 3.0,
    x_star=[1.0, 0.0],
    f=lambda x: (x[0] + 1.0) ** 3 / 3.0 + x[1],
    g=None,
    n=2,
    m=0,
    x_l=np.array([1.0, 0.0]),
    x_u=np.array([INF, INF]),
    g_l=np.zeros(0),
    g_u=np.zeros(0),
    x0=np.array([1.125, 0.125]),
)

_register(
    "hs005",
    f_star=-(np.sqrt(3.0) / 2.0 + np.pi / 3.0),
    f=lambda x: (
        jnp.sin(x[0] + x[1])
        + (x[0] - x[1]) ** 2
        - 1.5 * x[0]
        + 2.5 * x[1]
        + 1.0
    ),
    g=None,
    n=2,
    m=0,
    x_l=np.array([-1.5, -3.0]),
    x_u=np.array([4.0, 3.0]),
    g_l=np.zeros(0),
    g_u=np.zeros(0),
    x0=np.array([0.0, 0.0]),
)

# --- nonlinear equality ----------------------------------------------------

_register(
    "hs006",
    f_star=0.0,
    x_star=[1.0, 1.0],
    f=lambda x: (1.0 - x[0]) ** 2,
    g=lambda x: jnp.stack([10.0 * (x[1] - x[0] ** 2)]),
    n=2,
    m=1,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.array([0.0]),
    g_u=np.array([0.0]),
    x0=np.array([-1.2, 1.0]),
)

_register(
    "hs007",
    f_star=-np.sqrt(3.0),
    x_star=[0.0, np.sqrt(3.0)],
    f=lambda x: jnp.log(1.0 + x[0] ** 2) - x[1],
    g=lambda x: jnp.stack([(1.0 + x[0] ** 2) ** 2 + x[1] ** 2 - 4.0]),
    n=2,
    m=1,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.array([0.0]),
    g_u=np.array([0.0]),
    x0=np.array([2.0, 2.0]),
)

_register(
    "hs008",
    f_star=-1.0,
    f=lambda x: jnp.asarray(-1.0),
    g=lambda x: jnp.stack([x[0] ** 2 + x[1] ** 2 - 25.0, x[0] * x[1] - 9.0]),
    n=2,
    m=2,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.zeros(2),
    g_u=np.zeros(2),
    x0=np.array([2.0, 1.0]),
)

_register(
    "hs009",
    f_star=-0.5,
    f=lambda x: jnp.sin(np.pi * x[0] / 12.0) * jnp.cos(np.pi * x[1] / 16.0),
    g=lambda x: jnp.stack([4.0 * x[0] - 3.0 * x[1]]),  # linear
    n=2,
    m=1,
    num_linear=1,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.array([0.0]),
    g_u=np.array([0.0]),
    x0=np.array([0.0, 0.0]),
)

# --- nonlinear inequality --------------------------------------------------

_register(
    "hs010",
    f_star=-1.0,
    x_star=[0.0, 1.0],
    f=lambda x: x[0] - x[1],
    g=lambda x: jnp.stack(
        [-3.0 * x[0] ** 2 + 2.0 * x[0] * x[1] - x[1] ** 2 + 1.0]
    ),
    n=2,
    m=1,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.array([0.0]),
    g_u=np.array([INF]),
    x0=np.array([-10.0, 10.0]),
)

_register(
    "hs011",
    f_star=-8.498464223,
    f=lambda x: (x[0] - 5.0) ** 2 + x[1] ** 2 - 25.0,
    g=lambda x: jnp.stack([-(x[0] ** 2) + x[1]]),
    n=2,
    m=1,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.array([0.0]),
    g_u=np.array([INF]),
    x0=np.array([4.9, 0.1]),
)

_register(
    "hs012",
    f_star=-30.0,
    x_star=[2.0, 3.0],
    f=lambda x: 0.5 * x[0] ** 2 + x[1] ** 2 - x[0] * x[1] - 7.0 * x[0] - 7.0 * x[1],
    g=lambda x: jnp.stack([25.0 - 4.0 * x[0] ** 2 - x[1] ** 2]),
    n=2,
    m=1,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.array([0.0]),
    g_u=np.array([INF]),
    x0=np.array([0.0, 0.0]),
)

_register(
    "hs014",
    f_star=9.0 - 2.875 * np.sqrt(7.0),
    f=lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2,
    # linear equality first, then the nonlinear inequality
    g=lambda x: jnp.stack(
        [
            x[0] - 2.0 * x[1] + 1.0,
            -0.25 * x[0] ** 2 - x[1] ** 2 + 1.0,
        ]
    ),
    n=2,
    m=2,
    num_linear=1,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.array([0.0, 0.0]),
    g_u=np.array([0.0, INF]),
    x0=np.array([2.0, 2.0]),
)

_register(
    "hs015",
    f_star=306.5,
    x_star=[0.5, 2.0],
    f=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
    g=lambda x: jnp.stack([x[0] * x[1] - 1.0, x[0] + x[1] ** 2]),
    n=2,
    m=2,
    x_l=np.array([-INF, -INF]),
    x_u=np.array([0.5, INF]),
    g_l=np.array([0.0, 0.0]),
    g_u=np.array([INF, INF]),
    x0=np.array([-2.0, 1.0]),
)

_register(
    "hs016",
    f_star=0.25,
    x_star=[0.5, 0.25],
    f=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
    g=lambda x: jnp.stack([x[0] + x[1] ** 2, x[0] ** 2 + x[1]]),
    n=2,
    m=2,
    x_l=np.array([-0.5, -INF]),
    x_u=np.array([0.5, 1.0]),
    g_l=np.array([0.0, 0.0]),
    g_u=np.array([INF, INF]),
    x0=np.array([-2.0, 1.0]),
)

_register(
    "hs018",
    f_star=5.0,
    f=lambda x: 0.01 * x[0] ** 2 + x[1] ** 2,
    g=lambda x: jnp.stack(
        [x[0] * x[1] - 25.0, x[0] ** 2 + x[1] ** 2 - 25.0]
    ),
    n=2,
    m=2,
    x_l=np.array([2.0, 0.0]),
    x_u=np.array([50.0, 50.0]),
    g_l=np.array([0.0, 0.0]),
    g_u=np.array([INF, INF]),
    x0=np.array([2.0, 2.0]),
)

_register(
    "hs021",
    f_star=-99.96,
    x_star=[2.0, 0.0],
    f=lambda x: 0.01 * x[0] ** 2 + x[1] ** 2 - 100.0,
    g=lambda x: jnp.stack([10.0 * x[0] - x[1]]),  # linear
    n=2,
    m=1,
    num_linear=1,
    x_l=np.array([2.0, -50.0]),
    x_u=np.array([50.0, 50.0]),
    g_l=np.array([10.0]),
    g_u=np.array([INF]),
    x0=np.array([-1.0, -1.0]),
)

_register(
    "hs028",
    f_star=0.0,
    x_star=[0.5, -0.5, 0.5],
    f=lambda x: (x[0] + x[1]) ** 2 + (x[1] + x[2]) ** 2,
    g=lambda x: jnp.stack([x[0] + 2.0 * x[1] + 3.0 * x[2] - 1.0]),  # linear
    n=3,
    m=1,
    num_linear=1,
    x_l=_bounds(3)[0],
    x_u=_bounds(3)[1],
    g_l=np.array([0.0]),
    g_u=np.array([0.0]),
    x0=np.array([-4.0, 1.0, 1.0]),
)

_register(
    "hs033",
    f_star=np.sqrt(2.0) - 6.0,
    f=lambda x: (x[0] - 1.0) * (x[0] - 2.0) * (x[0] - 3.0) + x[2],
    g=lambda x: jnp.stack(
        [
            x[2] ** 2 - x[1] ** 2 - x[0] ** 2,
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 - 4.0,
        ]
    ),
    n=3,
    m=2,
    x_l=np.array([0.0, 0.0, 0.0]),
    x_u=np.array([INF, INF, 5.0]),
    g_l=np.array([0.0, 0.0]),
    g_u=np.array([INF, INF]),
    x0=np.array([0.0, 0.0, 3.0]),
)

_register(
    "hs035",
    f_star=1.0 / 9.0,
    x_star=[4.0 / 3.0, 7.0 / 9.0, 4.0 / 9.0],
    f=lambda x: (
        9.0
        - 8.0 * x[0]
        - 6.0 * x[1]
        - 4.0 * x[2]
        + 2.0 * x[0] ** 2
        + 2.0 * x[1] ** 2
        + x[2] ** 2
        + 2.0 * x[0] * x[1]
        + 2.0 * x[0] * x[2]
    ),
    g=lambda x: jnp.stack([3.0 - x[0] - x[1] - 2.0 * x[2]]),  # linear
    n=3,
    m=1,
    num_linear=1,
    x_l=np.zeros(3),
    x_u=_bounds(3)[1],
    g_l=np.array([0.0]),
    g_u=np.array([INF]),
    x0=np.array([0.5, 0.5, 0.5]),
)

_register(
    "hs048",
    f_star=0.0,
    x_star=[1.0, 1.0, 1.0, 1.0, 1.0],
    f=lambda x: (x[0] - 1.0) ** 2 + (x[1] - x[2]) ** 2 + (x[3] - x[4]) ** 2,
    g=lambda x: jnp.stack(
        [
            x[0] + x[1] + x[2] + x[3] + x[4] - 5.0,
            x[2] - 2.0 * (x[3] + x[4]) + 3.0,
        ]
    ),  # both linear
    n=5,
    m=2,
    num_linear=2,
    x_l=_bounds(5)[0],
    x_u=_bounds(5)[1],
    g_l=np.zeros(2),
    g_u=np.zeros(2),
    x0=np.array([3.0, 5.0, -3.0, 2.0, -2.0]),
)


def _hs51_obj(x):
    return (
        (x[0] - x[1]) ** 2
        + (x[1] + x[2] - 2.0) ** 2
        + (x[3] - 1.0) ** 2
        + (x[4] - 1.0) ** 2
    )


_register(
    "hs051",
    f_star=0.0,
    x_star=[1.0, 1.0, 1.0, 1.0, 1.0],
    f=_hs51_obj,
    g=lambda x: jnp.stack(
        [
            x[0] + 3.0 * x[1] - 4.0,
            x[2] + x[3] - 2.0 * x[4],
            x[1] - x[4],
        ]
    ),  # all linear
    n=5,
    m=3,
    num_linear=3,
    x_l=_bounds(5)[0],
    x_u=_bounds(5)[1],
    g_l=np.zeros(3),
    g_u=np.zeros(3),
    x0=np.array([2.5, 0.5, 2.0, -1.0, 0.5]),
)

def _hs52_obj(x):
    return (
        (4.0 * x[0] - x[1]) ** 2
        + (x[1] + x[2] - 2.0) ** 2
        + (x[3] - 1.0) ** 2
        + (x[4] - 1.0) ** 2
    )


_register(
    "hs052",
    f_star=1859.0 / 349.0,
    f=_hs52_obj,
    g=lambda x: jnp.stack(
        [
            x[0] + 3.0 * x[1],
            x[2] + x[3] - 2.0 * x[4],
            x[1] - x[4],
        ]
    ),
    n=5,
    m=3,
    num_linear=3,
    x_l=_bounds(5)[0],
    x_u=_bounds(5)[1],
    g_l=np.zeros(3),
    g_u=np.zeros(3),
    x0=np.array([2.0, 2.0, 2.0, 2.0, 2.0]),
)

_register(
    "hs053",
    f_star=176.0 / 43.0,
    f=_hs51_obj,
    g=lambda x: jnp.stack(
        [
            x[0] + 3.0 * x[1],
            x[2] + x[3] - 2.0 * x[4],
            x[1] - x[4],
        ]
    ),
    n=5,
    m=3,
    num_linear=3,
    x_l=np.full(5, -10.0),
    x_u=np.full(5, 10.0),
    g_l=np.zeros(3),
    g_u=np.zeros(3),
    x0=np.array([2.0, 2.0, 2.0, 2.0, 2.0]),
)

_register(
    "hs071",
    f_star=17.0140173,
    x_star=[1.0, 4.74299963, 3.82114998, 1.37940829],
    f=lambda x: x[0] * x[3] * (x[0] + x[1] + x[2]) + x[2],
    g=lambda x: jnp.stack(
        [
            x[0] * x[1] * x[2] * x[3],
            x[0] ** 2 + x[1] ** 2 + x[2] ** 2 + x[3] ** 2,
        ]
    ),
    n=4,
    m=2,
    x_l=np.ones(4),
    x_u=np.full(4, 5.0),
    g_l=np.array([25.0, 40.0]),
    g_u=np.array([INF, 40.0]),
    x0=np.array([1.0, 5.0, 5.0, 1.0]),
)

_register(
    "hs100",
    f_star=680.6300573,
    f=lambda x: (
        (x[0] - 10.0) ** 2
        + 5.0 * (x[1] - 12.0) ** 2
        + x[2] ** 4
        + 3.0 * (x[3] - 11.0) ** 2
        + 10.0 * x[4] ** 6
        + 7.0 * x[5] ** 2
        + x[6] ** 4
        - 4.0 * x[5] * x[6]
        - 10.0 * x[5]
        - 8.0 * x[6]
    ),
    g=lambda x: jnp.stack(
        [
            127.0 - 2.0 * x[0] ** 2 - 3.0 * x[1] ** 4 - x[2] - 4.0 * x[3] ** 2 - 5.0 * x[4],
            282.0 - 7.0 * x[0] - 3.0 * x[1] - 10.0 * x[2] ** 2 - x[3] + x[4],
            196.0 - 23.0 * x[0] - x[1] ** 2 - 6.0 * x[5] ** 2 + 8.0 * x[6],
            -4.0 * x[0] ** 2
            - x[1] ** 2
            + 3.0 * x[0] * x[1]
            - 2.0 * x[2] ** 2
            - 5.0 * x[5]
            + 11.0 * x[6],
        ]
    ),
    n=7,
    m=4,
    x_l=_bounds(7)[0],
    x_u=_bounds(7)[1],
    g_l=np.zeros(4),
    g_u=np.full(4, INF),
    x0=np.array([1.0, 2.0, 0.0, 4.0, 0.0, 1.0, 1.0]),
)


# --- pathological cases (status-code coverage) -----------------------------


def infeasible_nlp() -> NLP:
    """x^2 <= -1: no feasible point -> Infeasible_Problem_Detected (status 2),
    exercising the FR failure path (sqp_trust_region.jl:152-159)."""
    return NLP(
        f=lambda x: x[0] ** 2,
        g=lambda x: jnp.stack([x[0] ** 2]),
        n=1,
        m=1,
        x_l=np.array([-10.0]),
        x_u=np.array([10.0]),
        g_l=np.array([-INF]),
        g_u=np.array([-1.0]),
        x0=np.array([1.0]),
        name="infeasible",
    )


def unbounded_nlp() -> NLP:
    """min x, unconstrained -> Diverging_Iterates (status 4), exercising the
    unbounded heuristic (sqp_trust_region.jl:146-150)."""
    return NLP(
        f=lambda x: x[0],
        g=None,
        n=1,
        m=0,
        x_l=np.array([-INF]),
        x_u=np.array([INF]),
        g_l=np.zeros(0),
        g_u=np.zeros(0),
        x0=np.array([0.0]),
        name="unbounded",
    )


# --- additional battery problems ------------------------------------------

_register(
    "hs002",
    f_star=0.0504261879,
    f=lambda x: 100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2,
    g=None,
    n=2,
    m=0,
    x_l=np.array([-INF, 1.5]),
    x_u=np.array([INF, INF]),
    g_l=np.zeros(0),
    g_u=np.zeros(0),
    x0=np.array([-2.0, 1.0]),
)

_register(
    "hs022",
    f_star=1.0,
    x_star=[1.0, 1.0],
    f=lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2,
    g=lambda x: jnp.stack(
        [-x[0] - x[1] + 2.0, -(x[0] ** 2) + x[1]]
    ),  # linear first
    n=2,
    m=2,
    num_linear=1,
    x_l=_bounds(2)[0],
    x_u=_bounds(2)[1],
    g_l=np.zeros(2),
    g_u=np.full(2, INF),
    x0=np.array([2.0, 2.0]),
)

_register(
    "hs023",
    f_star=2.0,
    x_star=[1.0, 1.0],
    f=lambda x: x[0] ** 2 + x[1] ** 2,
    g=lambda x: jnp.stack(
        [
            x[0] + x[1] - 1.0,  # linear
            x[0] ** 2 + x[1] ** 2 - 1.0,
            9.0 * x[0] ** 2 + x[1] ** 2 - 9.0,
            x[0] ** 2 - x[1],
            x[1] ** 2 - x[0],
        ]
    ),
    n=2,
    m=5,
    num_linear=1,
    x_l=np.full(2, -50.0),
    x_u=np.full(2, 50.0),
    g_l=np.zeros(5),
    g_u=np.full(5, INF),
    x0=np.array([3.0, 1.0]),
)

_register(
    "hs030",
    f_star=1.0,
    x_star=[1.0, 0.0, 0.0],
    f=lambda x: x[0] ** 2 + x[1] ** 2 + x[2] ** 2,
    g=lambda x: jnp.stack([x[0] ** 2 + x[1] ** 2 - 1.0]),
    n=3,
    m=1,
    x_l=np.array([1.0, -10.0, -10.0]),
    x_u=np.array([10.0, 10.0, 10.0]),
    g_l=np.array([0.0]),
    g_u=np.array([INF]),
    x0=np.array([1.0, 1.0, 1.0]),
)

_register(
    "hs043",  # Rosen-Suzuki
    f_star=-44.0,
    x_star=[0.0, 1.0, 2.0, -1.0],
    f=lambda x: (
        x[0] ** 2
        + x[1] ** 2
        + 2.0 * x[2] ** 2
        + x[3] ** 2
        - 5.0 * x[0]
        - 5.0 * x[1]
        - 21.0 * x[2]
        + 7.0 * x[3]
    ),
    g=lambda x: jnp.stack(
        [
            8.0
            - x[0] ** 2
            - x[1] ** 2
            - x[2] ** 2
            - x[3] ** 2
            - x[0]
            + x[1]
            - x[2]
            + x[3],
            10.0
            - x[0] ** 2
            - 2.0 * x[1] ** 2
            - x[2] ** 2
            - 2.0 * x[3] ** 2
            + x[0]
            + x[3],
            5.0
            - 2.0 * x[0] ** 2
            - x[1] ** 2
            - x[2] ** 2
            - 2.0 * x[0]
            + x[1]
            + x[3],
        ]
    ),
    n=4,
    m=3,
    x_l=_bounds(4)[0],
    x_u=_bounds(4)[1],
    g_l=np.zeros(3),
    g_u=np.full(3, INF),
    x0=np.zeros(4),
)

_register(
    "hs065",
    f_star=0.9535288567,
    f=lambda x: (x[0] - x[1]) ** 2 + (x[0] + x[1] - 10.0) ** 2 / 9.0 + (x[2] - 5.0) ** 2,
    g=lambda x: jnp.stack([48.0 - x[0] ** 2 - x[1] ** 2 - x[2] ** 2]),
    n=3,
    m=1,
    x_l=np.array([-4.5, -4.5, -5.0]),
    x_u=np.array([4.5, 4.5, 5.0]),
    g_l=np.array([0.0]),
    g_u=np.array([INF]),
    x0=np.array([-5.0, 5.0, 0.0]),
)

_register(
    "hs076",
    f_star=-4.681818181,
    f=lambda x: (
        x[0] ** 2
        + 0.5 * x[1] ** 2
        + x[2] ** 2
        + 0.5 * x[3] ** 2
        - x[0] * x[2]
        + x[2] * x[3]
        - x[0]
        - 3.0 * x[1]
        + x[2]
        - x[3]
    ),
    g=lambda x: jnp.stack(
        [
            5.0 - x[0] - 2.0 * x[1] - x[2] - x[3],
            4.0 - 3.0 * x[0] - x[1] - 2.0 * x[2] + x[3],
            x[1] + 4.0 * x[2] - 1.5,
        ]
    ),  # all linear
    n=4,
    m=3,
    num_linear=3,
    x_l=np.zeros(4),
    x_u=_bounds(4)[1],
    g_l=np.zeros(3),
    g_u=np.full(3, INF),
    x0=np.full(4, 0.5),
)
