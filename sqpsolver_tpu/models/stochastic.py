"""Cross-scenario coupled (two-stage stochastic) NLPs.

SURVEY §7 step 6 / the BASELINE.json north star call for *Schur-complement
coupling of batched scenarios* — solving K parameter scenarios that SHARE a
subset of their variables (first-stage / here-and-now decisions), instead of
K independent lanes.  The reference has no counterpart (it is strictly
single-instance, ``/root/reference/src/algorithms/sqp_trust_region.jl:124``);
the capability exists in the stochastic-OPF literature the reference's ACOPF
workload points at (shared generator dispatch across load scenarios).

:func:`couple_scenarios` lifts a theta-parameterized base :class:`~sqpsolver_tpu.nlp.NLP`
into ONE structured NLP over the stacked variable vector::

    z = [ s (shared) | y_0 | y_1 | ... | y_{K-1} ]      (ns + K*nl variables)

with objective ``sum_k w_k f(x_k, theta_k)`` and the K scenario constraint
blocks stacked (all linear rows first, preserving the canonical ordering of
``nlp.py``).  Scenario k sees ``x_k = scatter(s, y_k)``.

The coupled problem is exactly a bordered-block-diagonal NLP: per-scenario
interiors + the shared variables as the separator.  With
``Parameters(kkt_structured=True)`` the QP KKT systems factor as K batched
dense Cholesky blocks + one dense separator Schur complement
(:mod:`sqpsolver_tpu.ops.kkt_bbd`) — the cross-scenario coupling never forms
a dense ``(ns + K*nl)^2`` matrix, and the per-scenario block work is batched
MXU work.  This is the TPU-native realization of the "Schur-complement for
cross-scenario coupling constraints" blueprint item.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..nlp import NLP
from ..structure import NLPStructure, detect_structure


def _leading_dim(tree) -> int:
    leaves = jax.tree.leaves(tree)
    if not leaves:
        raise ValueError("thetas pytree has no leaves")
    K = int(np.asarray(leaves[0]).shape[0])
    for leaf in leaves:
        if int(np.asarray(leaf).shape[0]) != K:
            raise ValueError("all theta leaves need the same leading dim K")
    return K


def couple_scenarios(
    nlp: NLP,
    thetas,
    shared_mask,
    weights=None,
    name: str | None = None,
) -> NLP:
    """Couple K scenarios of ``nlp`` through shared first-stage variables.

    * ``nlp`` — theta-parameterized base problem (``nlp.theta is not None``).
    * ``thetas`` — scenario parameters stacked on a leading axis of size K
      (the output of e.g. ``acopf.load_scenarios``).  They become the coupled
      problem's ``theta``, so scenario sets can be swapped without recompiling.
    * ``shared_mask (n,) bool`` — True for variables shared across scenarios
      (identical in every scenario); False for per-scenario locals.
    * ``weights (K,)`` — objective weights (default uniform ``1/K``, i.e. the
      expected cost over equiprobable scenarios).

    Returns an :class:`NLP` with ``n = ns + K*nl`` variables,
    ``m = K * nlp.m`` rows (all scenarios' linear rows first), and a
    block-structure whose interiors are the per-scenario locals and whose
    separator is the shared block — ready for ``kkt_structured=True``.
    """
    if nlp.theta is None:
        raise ValueError(
            "couple_scenarios needs a theta-parameterized base NLP "
            "(nlp.theta example pytree set)"
        )
    shared_mask = np.asarray(shared_mask, bool)
    if shared_mask.shape != (nlp.n,):
        raise ValueError(f"shared_mask must have shape ({nlp.n},)")
    K = _leading_dim(thetas)
    sh_idx = np.nonzero(shared_mask)[0]
    loc_idx = np.nonzero(~shared_mask)[0]
    ns, nl = len(sh_idx), len(loc_idx)
    if ns == 0:
        raise ValueError(
            "no shared variables: solve the scenarios as an ordinary batch "
            "(parallel.batch) instead"
        )
    n_base, m_base, ml = nlp.n, nlp.m, nlp.num_linear
    mnl = m_base - ml
    n_new = ns + K * nl
    m_new = K * m_base

    sh_idx_j = jnp.asarray(sh_idx)
    loc_idx_j = jnp.asarray(loc_idx)
    if weights is None:
        w_np = np.full((K,), 1.0 / K)
    else:
        w_np = np.asarray(weights, np.float64)
        if w_np.shape != (K,):
            raise ValueError(f"weights must have shape ({K},)")

    def scenario_points(z):
        """(K, n_base) matrix of per-scenario full variable vectors."""
        s = z[:ns]
        Y = z[ns:].reshape(K, nl)
        X = jnp.zeros((K, n_base), z.dtype)
        X = X.at[:, loc_idx_j].set(Y)
        X = X.at[:, sh_idx_j].set(jnp.broadcast_to(s, (K, ns)))
        return X

    base_f, base_g = nlp.f, nlp.g

    def f_new(z, TH):
        X = scenario_points(z)
        fvals = jax.vmap(base_f)(X, TH)
        return jnp.asarray(w_np, z.dtype) @ fvals

    def g_new(z, TH):
        X = scenario_points(z)
        G = jax.vmap(base_g)(X, TH)  # (K, m_base)
        # canonical ordering: every scenario's linear rows first
        return jnp.concatenate(
            [G[:, :ml].reshape(-1), G[:, ml:].reshape(-1)]
        )

    def stack_vars(a):
        a = np.asarray(a, np.float64)
        return np.concatenate([a[sh_idx], np.tile(a[loc_idx], K)])

    def stack_rows(a):
        a = np.asarray(a, np.float64)
        return np.concatenate([np.tile(a[:ml], K), np.tile(a[ml:], K)])

    # ---- block structure: scenario locals = interiors, shared = separator --
    base_struct = nlp.structure or detect_structure(nlp)
    loc_slot = np.full(n_base, -1, np.int64)
    loc_slot[loc_idx] = np.arange(nl)
    sh_slot = np.full(n_base, -1, np.int64)
    sh_slot[sh_idx] = np.arange(ns)

    def map_col(c, k):
        c = int(c)
        return sh_slot[c] if shared_mask[c] else ns + k * nl + loc_slot[c]

    row_cols = [None] * m_new
    for k in range(K):
        for i in range(m_base):
            cols = np.asarray(
                [map_col(c, k) for c in base_struct.row_cols[i]], np.int64
            )
            new_row = k * ml + i if i < ml else K * ml + k * mnl + (i - ml)
            row_cols[new_row] = np.sort(cols)
    obj_pairs = []
    for k in range(K):
        for a, b in np.asarray(base_struct.obj_pairs).reshape(-1, 2):
            obj_pairs.append((map_col(a, k), map_col(b, k)))
    structure = NLPStructure(
        row_cols=tuple(row_cols),
        obj_pairs=np.asarray(obj_pairs, np.int64).reshape(-1, 2),
    )

    return NLP(
        f=f_new,
        g=g_new if m_new > 0 else None,
        n=n_new,
        m=m_new,
        x_l=stack_vars(nlp.x_l),
        x_u=stack_vars(nlp.x_u),
        g_l=stack_rows(nlp.g_l),
        g_u=stack_rows(nlp.g_u),
        x0=stack_vars(nlp.x0),
        num_linear=K * ml,
        maximize=nlp.maximize,
        name=name or f"{nlp.name}_coupled{K}",
        theta=jax.tree.map(np.asarray, thetas),
        structure=structure,
    )


def pg_shared_mask(case, nlp: NLP) -> np.ndarray:
    """Shared-variable mask for stochastic ACOPF with here-and-now active
    dispatch: generator ``pg`` set before the scenario realizes (the classic
    two-stage OPF first stage); voltages and reactive power adjust per
    scenario.  Matches the [va, vm, pg, qg, ...] layout of
    :func:`sqpsolver_tpu.models.acopf.acopf_polar`.

    Generators at the reference (slack) bus stay PER-SCENARIO: with every
    ``pg`` fixed before the load realizes, the system-wide active balance can
    only close through losses, and a few-percent load spread makes the whole
    problem infeasible — the standard formulation keeps a regulating unit
    (the slack generator) as recourse."""
    nb, ng = case.nb, case.ng
    mask = np.zeros(nlp.n, bool)
    mask[2 * nb : 2 * nb + ng] = True
    slack_gens = 2 * nb + np.nonzero(
        np.asarray(case.gen_bus) == case.ref_bus
    )[0]
    mask[slack_gens] = False
    return mask
