"""BBD separator-growth analysis at pegase scale (VERDICT r2 item 5).

The reference's ma57-backed sparse KKT runs case2869pegase
(/root/reference/examples/acopf/opf.jl:102).  Real pegase data cannot be
vendored in this zero-egress environment, so the scaling question — does the
vertex-separator partition (sqpsolver_tpu.structure) stay usable on meshed
topologies at 1354/2869-bus scale? — is answered on replicas of the REAL
vendored IEEE case118 (meshed inside every copy; the partitioner has to cut
through genuine 118-bus mesh structure, not just the weak inter-copy ties).

Host-side numpy only (no TPU time).  Prints a table:
    case  nb  n  m  P  nd  ns  m_eq  blocks_MB  sep_frac

blocks_MB = float32 HBM for the factored BBD blocks of ONE instance
(Li_pp + W + K_ps etc. dominate: ~P*nd^2 + 2*P*nd*ns + ns^2 + m_eq^2 words).

Usage:  python scripts/bbd_scaling.py [k1 k2 ...]   (default 1 2 4 8 12)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 12]
    from sqpsolver_tpu.models.acopf import acopf_polar
    from sqpsolver_tpu.models.matpower import load_case
    from sqpsolver_tpu.models.power import replicate_case
    from sqpsolver_tpu.structure import build_block_structure

    base = load_case("case118")
    print(f"{'case':>12} {'nb':>5} {'n':>6} {'m':>6} {'P':>4} {'nd':>5} "
          f"{'ns':>5} {'m_eq':>6} {'MB':>8} {'sep%':>6}")
    for k in ks:
        case = base if k == 1 else replicate_case(base, k)
        nlp = acopf_polar(case, scenario_batchable=False)
        gl = np.asarray(nlp.g_l, np.float64)
        gu = np.asarray(nlp.g_u, np.float64)
        bs = build_block_structure(
            nlp.n, nlp.m, nlp.structure, np.isfinite(gl) & (gl == gu)
        )
        words = (
            2.0 * bs.P * bs.nd * bs.nd     # K_pp + Li_pp
            + 3.0 * bs.P * bs.nd * bs.ns   # K_ps, W, KiA panels
            + 2.0 * bs.ns * bs.ns
            + 2.0 * bs.m_eq * bs.m_eq
            + bs.P * bs.mr * (bs.nd + bs.ns)  # A blocks
        )
        mb = words * 4 / 1e6
        print(f"{case.name:>12} {case.nb:>5} {nlp.n:>6} {nlp.m:>6} "
              f"{bs.P:>4} {bs.nd:>5} {bs.ns:>5} {bs.m_eq:>6} "
              f"{mb:>8.1f} {100.0 * bs.ns / nlp.n:>5.1f}%")


if __name__ == "__main__":
    main()
