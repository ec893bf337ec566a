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

from .linsolve import factorize_spd, solve_factorized, tri_inv

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


def bbd_factorize(
    K_pp: Array, K_ps: Array, K_ss: Array, delta0, min_pivot: float = 1e-3
) -> BbdFactor:
    """Factor the BBD matrix with the escalating-regularization ladder.

    Inputs are factor-dtype blocks (float32 normally; float64 in the rescue
    phase, with ``min_pivot`` relaxed accordingly); padded interior slots
    must carry an identity diagonal and zero couplings (the assembly in
    :class:`BbdOperator` does this via the structural masks).
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
    delta_floor = diag_scale * jnp.asarray(
        1e-7 if f32 == jnp.float32 else 1e-12, f32
    )
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
        ok = jnp.logical_and(ok, piv > min_pivot)
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

    delta, L_pp, W, L_ss, dS, ok, tries = lax.while_loop(
        cond, body, (delta0, L_pp0, W0, L_ss0, dS0, ok0, jnp.array(0))
    )

    # bisection refinement of an escalated delta — see linsolve.factorize_spd:
    # the x100 ladder's overshoot damps K and breaks the merit model's step
    # prediction; four log-bisection attempts tighten it to ~1.8x granularity
    def _refine(args):
        lo, hi, fac_hi = args

        def step(_, carry):
            lo, hi, fac_hi = carry
            mid = jnp.sqrt(lo * hi)
            fac_m = attempt(mid)
            ok_m = fac_m[4]
            return (
                jnp.where(ok_m, lo, mid),
                jnp.where(ok_m, mid, hi),
                jax.tree.map(
                    lambda a, b: jnp.where(ok_m, a, b), fac_m, fac_hi
                ),
            )

        lo, hi, fac_hi = lax.fori_loop(0, 4, step, (lo, hi, fac_hi))
        return hi, fac_hi

    escalated = jnp.logical_and(ok, tries > 0)
    fac0 = (L_pp, W, L_ss, dS, ok)
    delta_r, fac_r = lax.cond(
        escalated,
        _refine,
        lambda args: (args[1], args[2]),
        (jnp.maximum(delta / _REG_GROWTH, delta_floor * 1e-2), delta, fac0),
    )
    delta = jnp.where(escalated, delta_r, delta)
    L_pp, W, L_ss, dS, _ = jax.tree.map(
        lambda a, b: jnp.where(escalated, a, b), fac_r, fac0
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
        self.is_eq = jnp.asarray(bs.is_eq)  # (m,)

    #: device-array fields, in one pytree for passing through jit boundaries
    _ARRAY_FIELDS = (
        "int_idx", "int_mask", "sep_idx", "rows", "rows_mask",
        "Aint_mask", "Asep_mask", "Hpp_mask", "Hps_mask", "Hss_mask",
        "colJ_int", "colJ_sep", "colH_int", "colH_sep", "is_eq",
    )

    def arrays(self) -> dict:
        """The index/mask arrays as a pytree.  Inner-jitted functions that
        close over these embed them as dense literals in their lowered
        subfunction (region boundaries block constant hoisting) — at case118
        that is ~200K chars of StableHLO per subfunction, and the axon remote
        compile scales with module size.  Pass this dict as an ARGUMENT and
        rebuild the view with :meth:`bind` inside instead."""
        return {k: getattr(self, k) for k in self._ARRAY_FIELDS}

    def bind(self, arrs: dict) -> "BlockMaps":
        """Shallow view of this BlockMaps with the array fields replaced by
        (traced) values from ``arrs`` — see :meth:`arrays`."""
        new = object.__new__(BlockMaps)
        new.__dict__.update(self.__dict__)
        new.__dict__.update(arrs)
        return new

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



# --------------------------------------------------------------------------
# structured KKT operator for the elastic IPM
# --------------------------------------------------------------------------


_BIG = 1e20  # stand-in for +inf inside masked arithmetic (qp_ipm._BIG)


def part_schur_cap(bs) -> int:
    """Static per-part stiff-slot count of the dynamic Schur set: every
    equality slot plus headroom for active inequalities (the dense
    schur_cap heuristic, common.schur_cap_for, applied part-locally),
    rounded to a lane-friendly multiple of 8.  The global Schur block is
    (P * part_schur_cap, P * part_schur_cap)."""
    hp = max(8, (bs.mr - bs.mre + 3) // 4)
    return min(bs.mr, ((bs.mre + hp + 7) // 8) * 8)


class BbdOperator:
    """Structured stand-in for the dense (Q, A) pair inside the elastic IPM.

    Implements the same interface as ``qp_ipm.DenseOp`` — ``q_mv``/``a_mv``/
    ``a_rmv`` matvecs, ``stiff_allowed``/``cap_stiff``, ``prepare`` — with
    the Jacobian and Lagrangian Hessian in padded local-dense block form.
    ONE IPM, two linear-algebra backends.

    Stiff (Schur-path) rows are selected **dynamically per part** into a
    static number of part-local slots (``cap_p``): each part contributes its
    cap_p stiffest rows (equalities plus near-active inequalities), so the
    dense Schur complement is (P*cap_p, P*cap_p) with part-major ordering.
    An earlier design restricted the Schur set to the *static* equality rows
    and folded active inequalities into K through a floored ``1/E`` — the
    floor's softening error made QP steps miss the merit-model's prediction
    and ~40% of SQP steps were rejected (case30 b8: 18.9 mean SQP iters vs
    the dense hybrid's 11.1); with actives in the Schur set the floor only
    touches overflow rows and the step quality matches the dense path.
    """

    def __init__(self, maps: BlockMaps, J, H, opts):
        self.maps = maps
        self.J = J  # (A_int, A_sep) compute dtype
        self.H = H  # (H_pp, H_ps, H_ss)
        self.opts = opts
        self.dtype = J[0].dtype
        # factor dtype follows IpmOptions.factor_dtype like DenseOp: f32 MXU
        # factors + refinement normally, full-precision factors in the f64
        # stall-rescue phase (rescue_op)
        self.fdtype = (
            jnp.float32 if opts.factor_dtype == "float32" else self.dtype
        )
        # inner refinement sweeps per K/S application, same meaning as the
        # dense hybrid's ir_steps (refined solves, no outer block sweep).
        # Kept in full-precision mode too: equilibrated f64 factors of
        # cond ~1e14 barrier systems still benefit from ~2 sweeps.
        self.ir_steps = max(2, opts.ir_steps)
        self.Jf = jax.tree.map(lambda a: a.astype(self.fdtype), J)
        self.Hf = jax.tree.map(lambda a: a.astype(self.fdtype), H)
        self.cap_p = part_schur_cap(maps.bs)

    def rescue_op(self, keep_cap: bool = False):
        """Same blocks, full-precision factors — the structured analog of the
        dense stall-rescue swap (qp_ipm._solve_qp_impl do_polish block).
        ``keep_cap`` is accepted for interface parity; the BBD stiff set is
        always bounded per part (cap_p), so there is nothing to lift."""
        import dataclasses

        return BbdOperator(
            self.maps, self.J, self.H,
            dataclasses.replace(self.opts, factor_dtype="same", plane=False),
        )

    def q_mv(self, x):
        return self.maps.h_mv(self.H, x)

    def a_mv(self, x):
        return self.maps.j_mv(self.J, x)

    def a_rmv(self, y):
        return self.maps.j_rmv(self.J, y)

    def stiff_allowed(self):
        return jnp.ones((self.maps.bs.m,), bool)

    def cap_stiff(self, stiff, E, cap):
        """Per-part bounded stiff set: keep each part's ``cap_p`` stiffest
        rows (smallest E — equalities sort first by construction).  The
        static per-part cap keeps the Schur block at (P*cap_p, P*cap_p) and
        the selection part-local (shardable over the part axis); overflow
        rows fold into K via the bounded 1/E exactly like the dense hybrid's
        schur_cap overflow.  The IPM's ``cap`` argument (global schur_cap)
        does not apply to the structured backend."""
        maps = self.maps
        st_p = maps.rows_gather(stiff)  # (P, mr), padding False
        E_p = maps.rows_gather(E)
        # non-finite guard: axon top_k faults the device on inf/nan keys
        # (scripts/op_probe.py); poisoned rows fold into K like overflow
        key = jnp.where(
            jnp.logical_and(st_p, jnp.isfinite(E_p)), E_p, _BIG
        )
        _, sel = lax.top_k(-key, self.cap_p)
        keep = jnp.zeros_like(st_p).at[
            jnp.arange(maps.bs.P)[:, None], sel
        ].set(jnp.take_along_axis(st_p, sel, axis=1))
        return jnp.logical_and(stiff, maps.rows_scatter(keep))

    def prepare(self, diag_k, invE_soft, stiff, E_stiff, delta0):
        """Assemble + factor the BBD K and the dense stiff Schur
        complement; return ``(solve_block, delta)``."""
        maps = self.maps
        bs = maps.bs
        f32 = self.fdtype  # factor dtype (f32 normally, f64 in rescue)
        mixed = self.fdtype != self.dtype
        dtype = self.dtype
        A_int32, A_sep32 = self.Jf
        H_pp32, H_ps32, H_ss32 = self.Hf

        # ---- K blocks: H + diag(diag_k) + A' diag(invE) A (factor dtype) --
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

        # pivot probe only for f32 factors (refinement-convergence guard,
        # piv > sqrt(10 eps_f32) ~ 1e-3).  Full-precision factors escalate
        # on NaN alone, like the dense f64 path: probing f64 pivots at 1e-7
        # rejected LEGITIMATE factorizations of cond ~1e14 equilibrated
        # barrier systems, escalating delta to 1e-3 *relative* (the dense
        # path's NaN-floor delta is ~1e-12 relative) — the rescue then
        # solved a heavily damped wrong system and the IPM crawled
        # (measured: 300-bus warm-start QP, dense 29 iters to 1e-8, BBD
        # stuck at dual 3e-2 for 100+ iters).
        fact = bbd_factorize(
            K_pp, K_ps, K_ss, delta0,
            min_pivot=(1e-3 if mixed else 0.0),
        )
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

        q_mv, a_mv, a_rmv = self.q_mv, self.a_mv, self.a_rmv

        def K_mv(x):
            """Exact (K + delta diag(K)) @ x in the compute dtype."""
            return (
                q_mv(x)
                + (diag_k + delta64 * diagK) * x
                + a_rmv(invE_soft * a_mv(x))
            )

        # panel version: (n, k) column-wise through the structured matvecs
        K_mv_panel = jax.vmap(K_mv, in_axes=1, out_axes=1)

        def solve_K32_g(r):
            """Raw f32 factor application in GLOBAL layout, (n,[k])."""
            r_pp, r_ss = maps.to_blocks(r.astype(f32))
            x_pp, x_ss = solve_K_blocks(r_pp, r_ss)
            return maps.from_blocks(x_pp, x_ss)

        def solve_K_ref(r, K_apply):
            """f32 factor + compute-dtype refinement against the EXACT
            operator (rolled fori_loop).  This is the structured analog of
            the dense path's ``solve_factorized(fact_K, ., ir_steps)`` —
            every K application the IPM sees is ~compute-dtype accurate.
            An earlier design used raw f32 K/S applications inside an OUTER
            block-refinement sweep; on real-topology case118 stiff systems
            (cond(S) ~ 1e8-1e9 from the barrier-weight spread) that
            preconditioner is an *expansion* (error x2.3 per sweep,
            measured) — refinement must happen at the inner-solve level,
            exactly like the dense hybrid."""
            x = solve_K32_g(r).astype(dtype)

            def swp(_, x):
                return x + solve_K32_g(r - K_apply(x)).astype(dtype)

            return lax.fori_loop(0, self.ir_steps, swp, x)

        # ---- dynamic stiff Schur: per-part slots, part-major ordering ------
        # The IPM's capped stiff mask (cap_stiff) leaves at most cap_p rows
        # per part; gather them into static part-local slots so
        # S = A_t K^-1 A_t' + diag(E_t) is (P*cap_p, P*cap_p).  Unused slots
        # carry a zero A-row and unit diagonal (their dy stays 0: masked rhs).
        P, cap_p = bs.P, self.cap_p
        nst = P * cap_p
        st_p = maps.rows_gather(stiff)  # (P, mr) bool, padding False
        E_sp = maps.rows_gather(E_stiff.astype(dtype))
        # same non-finite top_k guard as cap_stiff (device-fault avoidance)
        key = jnp.where(
            jnp.logical_and(st_p, jnp.isfinite(E_sp)), E_sp,
            jnp.asarray(_BIG, dtype),
        )
        _, sel = lax.top_k(-key, cap_p)  # (P, cap_p) part-local slot indices
        sel_mask = jnp.take_along_axis(st_p, sel, axis=1)
        A_int64, A_sep64 = self.J
        A_sel_int = (
            jnp.take_along_axis(A_int64, sel[:, :, None], axis=1)
            * sel_mask[:, :, None]
        )  # (P, cap_p, nd) compute dtype
        A_sel_sep = (
            jnp.take_along_axis(A_sep64, sel[:, :, None], axis=1)
            * sel_mask[:, :, None]
        )  # (P, cap_p, ns)
        E_sel = jnp.where(
            sel_mask, jnp.take_along_axis(E_sp, sel, axis=1), 1.0
        )

        # A_t' in global layout (n, nst): column (q, c) = global slot
        # q*cap_p + c has interior support only in part q
        eyeP = jnp.eye(P, dtype=dtype)
        R_pp = (
            jnp.swapaxes(A_sel_int, 1, 2)[:, :, :, None] * eyeP[:, None, None, :]
        )  # (P, nd, cap_p, P) -> want (P, nd, P, cap_p)
        R_pp = jnp.moveaxis(R_pp, 3, 2).reshape(P, bs.nd, nst)
        R_ss = jnp.moveaxis(A_sel_sep, -1, 0).reshape(bs.ns, nst)
        At_g = maps.from_blocks(R_pp, R_ss)  # (n, nst) exact A_t'

        # refined panel K^-1 A_t' and compute-dtype Schur complement: the
        # stiff S goes through linsolve.factorize_spd (f32 factor with Jacobi
        # equilibration, pivot probe, escalating-delta ladder) with solves
        # refined against the compute-dtype S — the SAME machinery the dense
        # hybrid's S uses.  A raw f32 panel/Cholesky is a knife-edge here:
        # cond(S) at cold starts reaches the 1/eps_f32 range and the solve
        # accuracy depended on nothing but padding-induced rounding
        # (measured: 1.5e-3 vs 1.8e-1 relative error on the same system).
        KiA_g = solve_K_ref(At_g, K_mv_panel)  # (n, nst) compute dtype
        S = At_g.T @ KiA_g
        S = S + jnp.diag(
            E_sel.reshape(nst)
            + (1.0 - sel_mask.reshape(nst).astype(dtype))
        )
        fact_S = factorize_spd(
            S, jnp.zeros((), dtype), factor_dtype=self.fdtype,
            backend=self.opts.kkt_backend,
            min_pivot=(1e-3 if mixed else 0.0), equilibrate=True,
        )

        def solve_S(b):
            return solve_factorized(fact_S, b, ir_steps=self.ir_steps)

        def r2_pick(r2_full):
            """(m,) stiff-masked rhs -> (nst,) part-major compute dtype."""
            rp = maps.rows_gather(r2_full)
            return jnp.where(
                sel_mask, jnp.take_along_axis(rp, sel, axis=1), 0.0
            ).reshape(nst)

        def dy_scatter(dy):
            """(nst,) part-major dy -> (m,) global, zeros off-selection."""
            d2 = jnp.zeros((P, bs.mr), dy.dtype)
            d2 = d2.at[jnp.arange(P)[:, None], sel].add(
                jnp.where(sel_mask, dy.reshape(P, cap_p), 0.0)
            )
            return maps.rows_scatter(d2)

        def solve_block(r1, r2_full):
            """Solve [K+dI, A_t'; A_t, -E_t] with refined inner solves (the
            dense hybrid's design — no outer block sweep needed).
            r2_full (m,) is masked to stiff rows; the returned dy is
            full-length with zeros off-stiff."""
            t = solve_K_ref(r1, K_mv)
            b = At_g.T @ t - r2_pick(r2_full)
            dy_sel = solve_S(b)
            dp = t - KiA_g @ dy_sel
            dy_full = dy_scatter(dy_sel)
            return dp, jnp.where(stiff, dy_full, 0.0)

        return solve_block, delta64
