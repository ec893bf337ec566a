"""Problem specification and AD derivative bundle.

Replaces the reference's L3/L4 layers — the MOI ``Optimizer`` wrapper
(``/root/reference/src/MOI_wrapper.jl``) plus the core callback-holding
``Model`` struct (``/root/reference/src/model.jl:3-68``) — with the JAX-native
equivalent: the user supplies *pure functions* ``f(x)`` and ``g(x)`` and every
derivative (gradient, Jacobian, Lagrangian Hessian) comes from ``jax`` AD,
replacing the five sparse MOI callbacks (``src/model.jl:21-25``).

Semantics preserved from the reference:

* constraint ordering — linear rows first, nonlinear rows after; only
  ``num_linear`` matters algorithmically (slack placement
  ``subproblem_JuMP.jl:59`` and the initial projection
  ``sqp_trust_region.jl:245``).  The reference's six-bucket MOI ordering
  (``MOI_wrapper.jl:759-766``) collapses to this single split.
* max→min handling via an objective scale of -1
  (``MOI_wrapper.jl:1106-1114``): ``NLP.maximize=True`` scales ``f`` by -1
  internally and results un-scale the reported objective
  (``MOI_wrapper.jl:1340-1344``).
* the Hessian is the Lagrangian Hessian with objective factor sigma=1 and the
  *current* multiplier estimate (``sqp.jl:93``), here
  ``hessian(f + lambda @ g)`` — the COO scatter + symmetrization of
  ``sqp.jl:94-103`` disappears (jax Hessians are dense and exact).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NLP:
    """A continuous nonlinear program

        min  f(x)   s.t.  g_L <= g(x) <= g_U,   x_L <= x <= x_U

    (reference problem class: README.md:7-16, src/model.jl:3-68).

    ``f`` and ``g`` must be pure, jax-traceable functions of a single
    ``(n,)`` argument; ``g`` returns an ``(m,)`` array with the ``num_linear``
    *linear* rows first.  Equality constraints are expressed as
    ``g_L[i] == g_U[i]``; one-sided rows use ``-inf`` / ``+inf``.
    """

    f: Callable[[Array], Array]
    g: Optional[Callable[[Array], Array]]  # None <=> unconstrained (m == 0)
    n: int
    m: int
    x_l: Array
    x_u: Array
    g_l: Array
    g_u: Array
    x0: Array
    #: number of leading rows of g that are linear in x (reference
    #: num_linear_constraints, model.jl:48; load-bearing for slack placement
    #: and the initial projection).
    num_linear: int = 0
    maximize: bool = False
    name: str = "nlp"
    #: optional example scenario-parameter pytree.  When set, ``f`` and ``g``
    #: take a second argument ``theta`` with this structure; batched solves
    #: vmap over a leading axis of theta (this is how 1024 ACOPF scenarios
    #: share one compiled solver — no reference counterpart, the reference is
    #: strictly single-instance, SURVEY §2.4).
    theta: Optional[object] = None
    #: optional static sparsity pattern (structure.NLPStructure) enabling the
    #: block-structured (BBD) KKT path for large instances — the TPU-native
    #: stand-in for the reference's sparse COO callbacks + ma57 factorization
    #: (model.jl:21-47, examples/acopf/opf.jl:59-64).  None = dense path.
    structure: Optional[object] = None

    # NLP instances are static pytree-wise: functions + python ints.  Arrays
    # (bounds, x0) are data; jitted solvers take them as explicit args via
    # ``data()``.

    def __post_init__(self):
        if self.n == 0:
            # the reference rejects variable-free models as invalid
            # (MOI_wrapper.jl:1160-1163, MOI.InvalidModel); we fail loudly
            # at construction time
            raise ValueError(
                "NLP with zero variables is invalid (reference "
                "MOI_wrapper.jl:1160-1163 rejects variable-free models)"
            )
        if self.m == 0 and self.g is not None:
            raise ValueError("m == 0 requires g=None")
        if self.m > 0 and self.g is None:
            raise ValueError("m > 0 requires a constraint function g")
        if not (0 <= self.num_linear <= self.m):
            raise ValueError("num_linear must be in [0, m]")

    # ------------------------------------------------------------------ AD --
    def obj(self, x: Array, theta=None) -> Array:
        """Objective in internal (minimization) convention."""
        fx = self.f(x) if self.theta is None else self.f(x, theta)
        return -fx if self.maximize else fx

    def cons(self, x: Array, theta=None) -> Array:
        """Constraint values g(x); shape (m,)."""
        if self.g is None:
            return jnp.zeros((0,), dtype=x.dtype)
        gx = self.g(x) if self.theta is None else self.g(x, theta)
        return jnp.asarray(gx)

    def obj_grad(self, x: Array, theta=None) -> tuple[Array, Array]:
        """(f, grad f) — replaces eval_f + eval_grad_f callbacks
        (MOI_wrapper.jl:1115-1124)."""
        return jax.value_and_grad(lambda z: self.obj(z, theta))(x)

    def cons_jac(self, x: Array, theta=None) -> Array:
        """Dense constraint Jacobian (m, n) — replaces the COO eval_jac_g
        callback + CSC scatter (sqp.jl:111-117)."""
        if self.g is None:
            return jnp.zeros((0, self.n), dtype=x.dtype)
        # forward mode: constraints are typically "wide" (m comparable to n)
        # and each row touches few inputs; jacfwd maps well onto one fused XLA
        # program with n tangent columns.
        return jax.jacfwd(lambda z: self.cons(z, theta))(x)

    def lag_hess(self, x: Array, lam: Array, theta=None) -> Array:
        """Dense Lagrangian Hessian  H = hess(f + lam @ g)  with sigma=1 and
        the current multiplier estimate (reference eval_h semantics,
        sqp.jl:93-103)."""

        def lagrangian(z):
            val = self.obj(z, theta)
            if self.g is not None:
                val = val + jnp.dot(lam, self.cons(z, theta))
            return val

        return jax.hessian(lagrangian)(x)

    # ---------------------------------------------------------------- data --
    def data(self, dtype=jnp.float64, theta=None) -> "NLPData":
        """Bundle the numeric problem data as arrays of a given dtype."""
        conv = lambda a, shape: jnp.broadcast_to(
            jnp.asarray(a, dtype=dtype), shape
        ).astype(dtype)
        if theta is None:
            theta = self.theta
        if theta is not None:
            theta = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), theta)
        return NLPData(
            x_l=conv(self.x_l, (self.n,)),
            x_u=conv(self.x_u, (self.n,)),
            g_l=conv(self.g_l, (self.m,)),
            g_u=conv(self.g_u, (self.m,)),
            x0=conv(self.x0, (self.n,)),
            theta=theta,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NLPData:
    """Numeric problem data (bounds + start point + scenario parameters) as a
    pytree of arrays; the unit every batched/sharded solve vmaps over.

    ``lam0`` is an optional warm start for the constraint multipliers
    (reference ConstraintDualStart / NLPBlockDualStart plumbing,
    MOI_wrapper.jl:1200-1222), in this framework's sign convention
    (see algorithms.common).
    """

    x_l: Array
    x_u: Array
    g_l: Array
    g_u: Array
    x0: Array
    theta: object = None
    lam0: object = None

    def tree_flatten(self):
        return (
            self.x_l, self.x_u, self.g_l, self.g_u, self.x0, self.theta,
            self.lam0,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def initial_point(data: NLPData) -> Array:
    """Initial iterate: user start clamped to the variable bounds
    (reference: MOI_wrapper.jl:1192-1199 — start values else clamp(0, bounds))."""
    return jnp.clip(data.x0, data.x_l, data.x_u)


# --------------------------------------------------------------------------
# Convenience constructors (the "modeling layer": replaces JuMP at L5 — users
# write jax functions instead of algebraic macros, README.md:24-46)
# --------------------------------------------------------------------------


def build_nlp(
    f: Callable,
    x0,
    *,
    x_l=None,
    x_u=None,
    eq: Optional[Callable] = None,
    ineq: Optional[Callable] = None,
    ineq_l=None,
    ineq_u=None,
    linear: Optional[Callable] = None,
    linear_l=None,
    linear_u=None,
    maximize: bool = False,
    name: str = "nlp",
) -> NLP:
    """Assemble an :class:`NLP` from separate constraint groups.

    * ``linear(x)`` — rows that are linear in ``x`` (placed first, per the
      reference's canonical ordering, MOI_wrapper.jl:750-766), with bounds
      ``linear_l <= linear(x) <= linear_u``.
    * ``eq(x)`` — nonlinear equality rows, ``eq(x) == 0``.
    * ``ineq(x)`` — nonlinear inequality rows, ``ineq_l <= ineq(x) <= ineq_u``
      (defaults: ``-inf`` / ``0``).
    """
    x0 = np.asarray(x0, dtype=np.float64)
    n = x0.shape[0]
    inf = np.inf

    probe = x0
    sizes = {}
    for key, fn in (("linear", linear), ("eq", eq), ("ineq", ineq)):
        sizes[key] = 0 if fn is None else int(np.asarray(jax.eval_shape(fn, probe).shape)[0])

    m_lin, m_eq, m_in = sizes["linear"], sizes["eq"], sizes["ineq"]
    m = m_lin + m_eq + m_in

    def full_g(x):
        parts = []
        if linear is not None:
            parts.append(jnp.atleast_1d(linear(x)))
        if eq is not None:
            parts.append(jnp.atleast_1d(eq(x)))
        if ineq is not None:
            parts.append(jnp.atleast_1d(ineq(x)))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), x.dtype)

    def bound(val, default, size):
        if val is None:
            val = default
        return np.broadcast_to(np.asarray(val, dtype=np.float64), (size,))

    g_l = np.concatenate(
        [
            bound(linear_l, -inf, m_lin),
            np.zeros(m_eq),
            bound(ineq_l, -inf, m_in),
        ]
    )
    g_u = np.concatenate(
        [
            bound(linear_u, +inf, m_lin),
            np.zeros(m_eq),
            bound(ineq_u, 0.0, m_in),
        ]
    )

    return NLP(
        f=f,
        g=full_g if m > 0 else None,
        n=n,
        m=m,
        x_l=bound(x_l, -inf, n),
        x_u=bound(x_u, +inf, n),
        g_l=g_l,
        g_u=g_u,
        x0=x0,
        num_linear=m_lin,
        maximize=maximize,
        name=name,
    )
