"""Bordered-block-diagonal (BBD) KKT factorization and structured operator.

TPU-native replacement for the reference's sparse ma57 KKT factorization
(``/root/reference/examples/acopf/opf.jl:59-64``) at case300+ scale, where a
dense n x n condensed KKT matrix is no longer affordable.  A vertex-separator
partition of the variable-interaction graph (:mod:`sqpsolver_tpu.structure`)
permutes the condensed matrix

    K = H + diag(ridge + Dp) + A' diag(invE) A

into arrow form::

    [ K_11          K_1s ]     P independent interior blocks (nd x nd)
    [      ...      ...  ]
    [          K_PP K_Ps ]
    [ K_s1 ... K_sP K_ss ]     dense separator block (ns x ns)

Factorization = batched dense Cholesky of the interiors + dense Cholesky of
the separator Schur complement — every O(n^3) term is a *batched dense*
matmul on the MXU with static shapes; no pivoting, no pointer chasing.
Stability follows the same regularized-ladder strategy as the dense path
(:mod:`sqpsolver_tpu.ops.linsolve`): escalate a diagonal shift until the
factorization is NaN-free, and recover accuracy with float64 block-level
iterative refinement in the IPM (mixed-precision plane).

All factorization work runs in float32 (MXU); the operator's matvecs run in
the compute dtype (float64 state) for the refinement residuals.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .linsolve import tri_inv

Array = jax.Array

_REG_GROWTH = 100.0
_REG_MAX_TRIES = 10


class BbdFactor(NamedTuple):
    Li_pp: Array  # (P, nd, nd) explicit inverse of interior Cholesky factors
    W: Array  # (P, nd, ns)  L_pp^-1 K_ps
    Li_ss: Array  # (ns, ns) explicit inverse of the *equilibrated* Schur factor
    dS: Array  # (ns,) Jacobi scale of the separator Schur complement
    delta: Array  # scalar regularization applied
    ok: Array


def bbd_factorize(K_pp: Array, K_ps: Array, K_ss: Array, delta0) -> BbdFactor:
    """Factor the BBD matrix with the escalating-regularization ladder.

    Inputs are float32 blocks; padded interior slots must carry an identity
    diagonal and zero couplings (the assembly in :class:`BbdOperator` does
    this via the structural masks).
    """
    P, nd, _ = K_pp.shape
    ns = K_ss.shape[0]
    f32 = K_pp.dtype
    eye_d = jnp.eye(nd, dtype=f32)
    eye_s = jnp.eye(ns, dtype=f32)
    diag_scale = jnp.maximum(
        jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(K_pp, axis1=-2, axis2=-1)), initial=0.0),
            jnp.max(jnp.abs(jnp.diagonal(K_ss)), initial=0.0),
        ),
        1.0,
    )
    delta_floor = diag_scale * jnp.asarray(1e-7, f32)
    delta0 = jnp.asarray(delta0, f32)

    def attempt(delta):
        L_pp = jnp.linalg.cholesky(K_pp + delta * eye_d)
        W = lax.linalg.triangular_solve(
            L_pp, K_ps, left_side=True, lower=True
        )
        S = K_ss + delta * eye_s - jnp.einsum(
            "pki,pkj->ij", W, W, precision=lax.Precision.HIGHEST
        )
        # the Schur complement loses the caller's unit diagonal; its own
        # Jacobi scale keeps the f32 factor and the pivot probe meaningful
        dS = lax.rsqrt(jnp.maximum(jnp.abs(jnp.diagonal(S)), 1e-30))
        L_ss = jnp.linalg.cholesky(S * dS[:, None] * dS[None, :])
        ok = jnp.logical_and(
            jnp.all(jnp.isfinite(L_pp)), jnp.all(jnp.isfinite(L_ss))
        )
        # pivot probe (see linsolve.factorize_spd): both factors are of
        # unit-diagonal matrices, so a tiny pivot = numerically singular at
        # f32 — the refinement would diverge; escalate delta instead
        piv = jnp.minimum(
            jnp.min(jnp.diagonal(L_pp, axis1=-2, axis2=-1), initial=jnp.inf),
            jnp.min(jnp.diagonal(L_ss), initial=jnp.inf),
        )
        ok = jnp.logical_and(ok, piv > 1e-3)
        return L_pp, W, L_ss, dS, ok

    L_pp0, W0, L_ss0, dS0, ok0 = attempt(delta0)

    def cond(carry):
        _, _, _, _, _, ok, tries = carry
        return jnp.logical_and(~ok, tries < _REG_MAX_TRIES)

    def body(carry):
        delta, *_, tries = carry
        new_delta = jnp.where(delta == 0.0, delta_floor, delta * _REG_GROWTH)
        L_pp, W, L_ss, dS, ok = attempt(new_delta)
        return (new_delta, L_pp, W, L_ss, dS, ok, tries + 1)

    delta, L_pp, W, L_ss, dS, ok, _ = lax.while_loop(
        cond, body, (delta0, L_pp0, W0, L_ss0, dS0, ok0, jnp.array(0))
    )
    return BbdFactor(
        Li_pp=tri_inv(L_pp), W=W, Li_ss=tri_inv(L_ss), dS=dS, delta=delta,
        ok=ok,
    )


def bbd_solve(fact: BbdFactor, r_pp: Array, r_ss: Array):
    """Solve K x = r for block right-hand sides.

    ``r_pp (P, nd[, k])``, ``r_ss (ns[, k])`` -> same shapes.  Uses explicit
    inverse factors (matvec/matmul only — no latency-bound triangular
    solves)."""
    vec = r_pp.ndim == 2
    if vec:
        r_pp = r_pp[..., None]
        r_ss = r_ss[..., None]
    # forward: y_p = L_pp^-1 r_p;  y_s = Ls^-1 dS (r_s - sum_p W_p' y_p)
    y_p = fact.Li_pp @ r_pp
    t = r_ss - jnp.einsum(
        "pki,pkr->ir", fact.W, y_p, precision=lax.Precision.HIGHEST
    )
    y_s = fact.Li_ss @ (fact.dS[:, None] * t)
    # back: x_s = dS Ls^-T y_s;  x_p = L_pp^-T (y_p - W x_s)
    x_s = fact.dS[:, None] * (fact.Li_ss.T @ y_s)
    x_p = jnp.swapaxes(fact.Li_pp, -1, -2) @ (y_p - fact.W @ x_s)
    if vec:
        return x_p[..., 0], x_s[..., 0]
    return x_p, x_s


# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# block layout maps + structured matvecs
# --------------------------------------------------------------------------


class BlockMaps:
    """Device-side index/mask constants of a BlockStructure plus the
    layout/matvec primitives shared by the SQP driver and the IPM operator.
    Build once per solver (static structure -> baked into the jitted
    program).

    ``shard=(mesh, axis)`` (optional) shards the leading part axis P of every
    block tensor over a ``jax.sharding.Mesh`` via GSPMD sharding constraints:
    the batched interior factorizations and panel matmuls run device-local,
    and the separator/Schur reductions (``einsum pk...->...``) lower to
    all-reduces over the mesh axis — cross-block coupling rides ICI while
    the O(P) block work scales out.  This is the multi-device layout for ONE
    large structured instance (e.g. a cross-scenario coupled NLP,
    models/stochastic); batches of independent instances should shard the
    instance axis instead (parallel.sharding.make_sharded_solver)."""

    def __init__(self, bs, shard=None):
        self.bs = bs
        self._shard = None
        if shard is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            mesh, axis = shard
            self._shard = (mesh, axis, NamedSharding, PartitionSpec)

        self.int_idx = jnp.asarray(bs.int_idx)  # (P, nd), pad = n
        self.int_mask = jnp.asarray(bs.int_mask)
        self.sep_idx = jnp.asarray(bs.sep_idx)  # (ns,)
        self.rows = jnp.asarray(bs.rows)  # (P, mr), pad = m
        self.rows_mask = jnp.asarray(bs.rows_mask)
        self.Aint_mask = jnp.asarray(bs.Aint_mask)
        self.Asep_mask = jnp.asarray(bs.Asep_mask)
        self.Hpp_mask = jnp.asarray(bs.Hpp_mask)
        self.Hps_mask = jnp.asarray(bs.Hps_mask)
        self.Hss_mask = jnp.asarray(bs.Hss_mask)
        colorJ_p = np.append(bs.colorJ, 0)
        colorH_p = np.append(bs.colorH, 0)
        self.colJ_int = jnp.asarray(colorJ_p[bs.int_idx])  # (P, nd)
        self.colJ_sep = jnp.asarray(bs.colorJ[bs.sep_idx])  # (ns,)
        self.colH_int = jnp.asarray(colorH_p[bs.int_idx])
        self.colH_sep = jnp.asarray(bs.colorH[bs.sep_idx])
        self.eq_local = jnp.asarray(bs.eq_local)  # (P, mre), pad = mr
        self.eq_gidx = jnp.asarray(bs.eq_gidx)  # (P, mre), pad = m_eq
        self.eq_order = jnp.asarray(bs.eq_order)  # (m_eq,)
        self.is_eq = jnp.asarray(bs.is_eq)  # (m,)

    def shard_p(self, x):
        """Constrain a (P, ...) block tensor to be sharded over the part
        axis (no-op when block sharding is off)."""
        if self._shard is None:
            return x
        mesh, axis, NamedSharding, PartitionSpec = self._shard
        spec = PartitionSpec(axis, *(None,) * (x.ndim - 1))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec)
        )

    # ------------------------------------------------------------ layout --
    def to_blocks(self, x):
        """(n,[k]) -> interior (P, nd[,k]), separator (ns[,k])."""
        xp = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
        return xp[self.int_idx], x[self.sep_idx]

    def from_blocks(self, x_p, x_s):
        """Scatter interior/separator blocks to global (n,[k])."""
        n = self.bs.n
        shape = (n + 1,) + x_p.shape[2:]
        out = jnp.zeros(shape, x_p.dtype)
        out = out.at[self.int_idx].set(x_p)
        out = out.at[self.sep_idx].set(x_s)
        return out[:n]

    def rows_gather(self, y):
        yp = jnp.concatenate([y, jnp.zeros_like(y[:1])], axis=0)
        return yp[self.rows]

    def rows_scatter(self, y_p):
        m = self.bs.m
        shape = (m + 1,) + y_p.shape[2:]
        out = jnp.zeros(shape, y_p.dtype)
        out = out.at[self.rows].set(y_p)
        return out[:m]

    # -------------------------------------------- compressed-AD gathers ---
    def jac_blocks(self, JcT):
        """Compressed Jacobian (m, nJ) -> local blocks
        ``A_int (P, mr, nd)``, ``A_sep (P, mr, ns)``."""
        JcP = jnp.concatenate(
            [JcT, jnp.zeros((1, JcT.shape[1]), JcT.dtype)], axis=0
        )
        A_int = jnp.where(
            self.Aint_mask,
            JcP[self.rows[:, :, None], self.colJ_int[:, None, :]],
            0.0,
        )
        A_sep = jnp.where(
            self.Asep_mask,
            JcP[self.rows[:, :, None], self.colJ_sep[None, None, :]],
            0.0,
        )
        return self.shard_p(A_int), self.shard_p(A_sep)

    def hess_blocks(self, HcT):
        """Compressed Hessian (n, nH) -> ``H_pp, H_ps, H_ss`` blocks."""
        HcP = jnp.concatenate(
            [HcT, jnp.zeros((1, HcT.shape[1]), HcT.dtype)], axis=0
        )
        H_pp = jnp.where(
            self.Hpp_mask,
            HcP[self.int_idx[:, :, None], self.colH_int[:, None, :]],
            0.0,
        )
        H_ps = jnp.where(
            self.Hps_mask,
            HcP[self.int_idx[:, :, None], self.colH_sep[None, None, :]],
            0.0,
        )
        H_ss = jnp.where(
            self.Hss_mask,
            HcP[self.sep_idx[:, None], self.colH_sep[None, :]],
            0.0,
        )
        return self.shard_p(H_pp), self.shard_p(H_ps), H_ss

    # ----------------------------------------------------------- matvecs --
    def h_mv(self, H, x):
        H_pp, H_ps, H_ss = H
        x_p, x_s = self.to_blocks(x)
        y_p = jnp.einsum("pij,pj->pi", H_pp, x_p) + jnp.einsum(
            "pis,s->pi", H_ps, x_s
        )
        y_s = jnp.einsum("pis,pi->s", H_ps, x_p) + H_ss @ x_s
        return self.from_blocks(y_p, y_s)

    def h_add_diag(self, H, shift):
        """H + shift * I in block form (padded slots untouched)."""
        H_pp, H_ps, H_ss = H
        nd, ns = self.bs.nd, self.bs.ns
        d = jnp.where(self.int_mask, shift, 0.0)
        H_pp = H_pp.at[:, jnp.arange(nd), jnp.arange(nd)].add(d)
        H_ss = H_ss.at[jnp.arange(ns), jnp.arange(ns)].add(shift)
        return (H_pp, H_ps, H_ss)

    def h_diag_rowabs(self, H):
        """(diag(H), row sums of |H|) as global vectors — Gershgorin data."""
        H_pp, H_ps, H_ss = H
        nd, ns = self.bs.nd, self.bs.ns
        diag_p = H_pp[:, jnp.arange(nd), jnp.arange(nd)]
        diag_s = H_ss[jnp.arange(ns), jnp.arange(ns)]
        row_p = jnp.sum(jnp.abs(H_pp), axis=2) + jnp.sum(jnp.abs(H_ps), axis=2)
        row_s = (
            jnp.einsum("pis->s", jnp.abs(H_ps))
            + jnp.sum(jnp.abs(H_ss), axis=1)
        )
        return (
            self.from_blocks(diag_p, diag_s),
            self.from_blocks(row_p, row_s),
        )

    def j_mv(self, J, x):
        A_int, A_sep = J
        x_p, x_s = self.to_blocks(x)
        y = jnp.einsum("prk,pk->pr", A_int, x_p) + jnp.einsum(
            "prs,s->pr", A_sep, x_s
        )
        return self.rows_scatter(y)

    def j_rmv(self, J, y):
        A_int, A_sep = J
        y_p = self.rows_gather(y)
        x_p = jnp.einsum("prk,pr->pk", A_int, y_p)
        x_s = jnp.einsum("prs,pr->s", A_sep, y_p)
        return self.from_blocks(x_p, x_s)

    def j_row_norms(self, J):
        """Per-row 2-norms ||J_i|| as a global (m,) vector."""
        A_int, A_sep = J
        sq = jnp.sum(A_int * A_int, axis=2) + jnp.sum(A_sep * A_sep, axis=2)
        return jnp.sqrt(self.rows_scatter(sq))

    # ------------------------------------------------------- eq-row maps --
    def gather_eq(self, blocks):
        """Per-part row blocks (P, mr, k) -> eq rows (P, mre, k)."""
        padded = jnp.concatenate(
            [blocks, jnp.zeros_like(blocks[:, :1])], axis=1
        )
        P = self.bs.P
        return padded[jnp.arange(P)[:, None], self.eq_local]

    def eq_dense(self, y):
        """(m,) -> (m_eq,) dense eq ordering."""
        return y[self.eq_order]

    def eq_scatter(self, y_eq):
        """(m_eq,) -> (m,), zeros elsewhere."""
        out = jnp.zeros((self.bs.m,), y_eq.dtype)
        return out.at[self.eq_order].set(y_eq)


# --------------------------------------------------------------------------
# structured KKT operator for the elastic IPM
# --------------------------------------------------------------------------


class BbdOperator:
    """Structured stand-in for the dense (Q, A) pair inside the elastic IPM.

    Implements the same interface as ``qp_ipm.DenseOp`` — ``q_mv``/``a_mv``/
    ``a_rmv`` matvecs, ``stiff_allowed``, ``prepare`` — with the Jacobian and
    Lagrangian Hessian in padded local-dense block form.  ONE IPM, two
    linear-algebra backends.

    Stiff (Schur-path) rows are restricted to the *static* equality set so
    the dense Schur complement stays (m_eq, m_eq); near-active inequality
    rows condense into K with their true (large) ``1/E`` and the float64
    block-level refinement bounds the resulting conditioning error.
    """

    def __init__(self, maps: BlockMaps, J, H, opts):
        self.maps = maps
        self.J = J  # (A_int, A_sep) compute dtype
        self.H = H  # (H_pp, H_ps, H_ss)
        self.opts = opts
        # the static-eq Schur set folds *active* inequality rows into K with
        # bounded 1/E — harder systems than the dense hybrid's; four sweeps
        # (matvec-cheap) keep the solve usable through barrier-tight iterates
        self.ir_steps = max(4, opts.ir_steps)
        self.dtype = J[0].dtype
        f32 = jnp.float32
        self.J32 = jax.tree.map(lambda a: a.astype(f32), J)
        self.H32 = jax.tree.map(lambda a: a.astype(f32), H)

    def q_mv(self, x):
        return self.maps.h_mv(self.H, x)

    def a_mv(self, x):
        return self.maps.j_mv(self.J, x)

    def a_rmv(self, y):
        return self.maps.j_rmv(self.J, y)

    def stiff_allowed(self):
        return self.maps.is_eq

    def prepare(self, diag_k, invE_soft, stiff, E_stiff, delta0):
        """Assemble + factor the BBD K and the dense equality Schur
        complement; return ``(solve_block, delta)``."""
        maps = self.maps
        bs = maps.bs
        f32 = jnp.float32
        dtype = self.dtype
        A_int32, A_sep32 = self.J32
        H_pp32, H_ps32, H_ss32 = self.H32

        # ---- K blocks: H + diag(diag_k) + A' diag(invE) A (float32) -------
        d_p, d_s = maps.to_blocks(diag_k.astype(f32))
        e_rows = maps.rows_gather(invE_soft.astype(f32))  # (P, mr)
        AeI = A_int32 * e_rows[:, :, None]
        K_pp = H_pp32 + jnp.einsum("prk,prl->pkl", AeI, A_int32)
        diag_pp = jnp.where(maps.int_mask, d_p, 1.0)  # identity on padding
        K_pp = K_pp.at[:, jnp.arange(bs.nd), jnp.arange(bs.nd)].add(diag_pp)
        K_pp = maps.shard_p(K_pp)
        K_ps = H_ps32 + jnp.einsum("prk,prs->pks", AeI, A_sep32)
        K_ps = maps.shard_p(K_ps)
        K_ss = H_ss32 + jnp.einsum(
            "prs,prt->st", A_sep32 * e_rows[:, :, None], A_sep32
        )
        K_ss = K_ss.at[jnp.arange(bs.ns), jnp.arange(bs.ns)].add(d_s)

        # Jacobi equilibration (see DenseOp.prepare): unit-diagonal scaling
        # keeps the f32 factorization usable across barrier-ill-conditioned
        # iterates; the f64 block refinement then converges.
        sc_p = jax.lax.rsqrt(
            jnp.maximum(
                jnp.abs(K_pp[:, jnp.arange(bs.nd), jnp.arange(bs.nd)]), 1e-30
            )
        )  # (P, nd)
        sc_s = jax.lax.rsqrt(
            jnp.maximum(jnp.abs(jnp.diagonal(K_ss)), 1e-30)
        )  # (ns,)
        K_pp = K_pp * sc_p[:, :, None] * sc_p[:, None, :]
        K_ps = K_ps * sc_p[:, :, None] * sc_s[None, None, :]
        K_ss = K_ss * sc_s[:, None] * sc_s[None, :]

        fact = bbd_factorize(K_pp, K_ps, K_ss, delta0)
        delta64 = fact.delta.astype(dtype)
        # the ladder's delta applies to the equilibrated blocks — in unscaled
        # units that is K + delta * diag(K); the refinement target must match
        # (see DenseOp.prepare)
        diagK = maps.from_blocks(
            (1.0 / (sc_p * sc_p)).astype(dtype),
            (1.0 / (sc_s * sc_s)).astype(dtype),
        )

        def solve_K_blocks(r_pp, r_ss):
            """K^-1 applied in block layout, with (un)scaling."""
            if r_pp.ndim == 2:
                x_pp, x_ss = bbd_solve(fact, sc_p * r_pp, sc_s * r_ss)
                return sc_p * x_pp, sc_s * x_ss
            x_pp, x_ss = bbd_solve(
                fact, sc_p[:, :, None] * r_pp, sc_s[:, None] * r_ss
            )
            return sc_p[:, :, None] * x_pp, sc_s[:, None] * x_ss

        # ---- dense equality Schur: S = A_eq K^-1 A_eq' + diag(E_eq) -------
        m_eq, P = bs.m_eq, bs.P
        A_eq_int32 = maps.gather_eq(A_int32)  # (P, mre, nd)
        A_eq_sep32 = maps.gather_eq(A_sep32)  # (P, mre, ns)
        # RHS blocks of K^-1 A_eq' in dense eq ordering
        R_pp = jnp.zeros((P, bs.nd, m_eq + 1), f32)
        R_pp = R_pp.at[jnp.arange(P)[:, None], :, maps.eq_gidx].add(
            A_eq_int32
        )
        R_ss = jnp.zeros((bs.ns, m_eq + 1), f32)
        R_ss = R_ss.at[:, maps.eq_gidx.reshape(-1)].add(
            jnp.moveaxis(A_eq_sep32, -1, 0).reshape(bs.ns, -1)
        )
        KiA_pp, KiA_ss = solve_K_blocks(
            R_pp[..., :m_eq], R_ss[..., :m_eq]
        )

        def eq_contract(x_pp, x_ss):
            """A_eq @ x for block-laid-out (P, nd, k), (ns, k) -> (m_eq, k)."""
            part = jnp.einsum("prk,pkc->prc", A_eq_int32, x_pp) + jnp.einsum(
                "prs,sc->prc", A_eq_sep32, x_ss
            )
            out = jnp.zeros((m_eq + 1, part.shape[-1]), part.dtype)
            out = out.at[maps.eq_gidx.reshape(-1)].add(
                part.reshape(-1, part.shape[-1])
            )
            return out[:m_eq]

        S = eq_contract(KiA_pp, KiA_ss)
        E_eq = maps.eq_dense(E_stiff.astype(f32))
        stiff_eq = maps.eq_dense(stiff.astype(f32))
        # currently-soft eq rows get a huge diagonal -> dy ~ 0 there
        S = S + jnp.diag(E_eq + (1.0 - stiff_eq) * 1.0e12)
        scS = jax.lax.rsqrt(jnp.maximum(jnp.abs(jnp.diagonal(S)), 1e-30))
        LS = jnp.linalg.cholesky(S * scS[:, None] * scS[None, :])
        LSi = tri_inv(LS)

        def solve_S32(b):
            return scS * (LSi.T @ (LSi @ (scS * b)))

        def approx_block(r1, r2_eq):
            r_pp, r_ss = maps.to_blocks(r1.astype(f32))
            t_pp, t_ss = solve_K_blocks(r_pp, r_ss)
            b = (
                eq_contract(t_pp[..., None], t_ss[..., None])[:, 0]
                - r2_eq.astype(f32)
            )
            dy = solve_S32(b)
            dp_pp = t_pp - jnp.einsum("pkc,c->pk", KiA_pp, dy)
            dp_ss = t_ss - KiA_ss @ dy
            dp = maps.from_blocks(dp_pp, dp_ss).astype(dtype)
            return dp, dy.astype(dtype)

        q_mv, a_mv, a_rmv = self.q_mv, self.a_mv, self.a_rmv

        def K_mv(x):
            """Exact (K + delta diag(K)) @ x in the compute dtype."""
            return (
                q_mv(x)
                + (diag_k + delta64 * diagK) * x
                + a_rmv(invE_soft * a_mv(x))
            )

        def solve_block(r1, r2_full):
            """Solve [K+dI, A_t'; A_t, -E_t] with f32 factors + compute-dtype
            block refinement (rolled fori_loop — one traced sweep body).
            r2_full (m,) is masked to stiff rows; the returned dy is
            full-length with zeros off-stiff."""
            r2_eq = maps.eq_dense(r2_full)

            def sweep(_, carry):
                dp, dy_eq = carry
                dy_full = maps.eq_scatter(dy_eq)
                res1 = r1 - (
                    K_mv(dp) + a_rmv(jnp.where(stiff, dy_full, 0.0))
                )
                res2_full = jnp.where(
                    stiff, r2_full - (a_mv(dp) - E_stiff * dy_full), 0.0
                )
                ddp, ddy = approx_block(res1, maps.eq_dense(res2_full))
                return (dp + ddp, dy_eq + ddy)

            dp, dy_eq = lax.fori_loop(
                0, max(1, self.ir_steps), sweep, approx_block(r1, r2_eq)
            )
            dy_full = maps.eq_scatter(dy_eq)
            return dp, jnp.where(stiff, dy_full, 0.0)

        return solve_block, delta64
